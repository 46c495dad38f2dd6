#!/usr/bin/env python
"""Real-chip XLA-vs-Pallas engine equivalence.

The fused kernels update the distribution state IN PLACE (their
outputs alias the input HBM buffers) with hand-ordered DMAs; that
ordering can only race on real hardware -- the CPU interpret mode the
unit tests use executes DMAs sequentially and cannot catch it. This
regtest runs representative scenes through both engines on the real
device and compares fields.

Counterpart of the reference's AA-vs-AB access-pattern equivalence
drives (tests/gpu/access_pattern.sh:15-30): two step implementations
over the same scene must agree to fp32 roundoff.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (REPO, os.path.join(REPO, 'examples'),
           os.path.join(REPO, 'examples', 'binary_fluid')):
    if _p not in sys.path:
        sys.path.insert(0, _p)


def run(sim_cls, engine, **cfg):
    from sailfish_tpu.controller import LBSimulationController
    ctrl = LBSimulationController(sim_cls, default_config=dict(
        quiet=True, engine=engine, **cfg))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    r._fields_to_host()
    return r.engine, r.sim, r


def compare(name, sim_cls, fields, tol=1e-5, **cfg):
    import sailfish_tpu.node_type as snt
    _, sim_x, rx = run(sim_cls, 'xla', **cfg)
    ref = {f: np.array(getattr(sim_x, f)) for f in fields}
    eng, sim_p, _ = run(sim_cls, 'pallas', **cfg)
    assert eng == 'pallas', f'{name}: pallas engine not selected'
    # WET nodes only: dry/solid bookkeeping values legitimately differ
    # between engines (e.g. walls adjacent to tile padding see
    # different wrap sources) and carry no physics
    wet = np.isin(rx.maps.type_map,
                  [t for t in rx.maps.present_types
                   if snt.get_node_type(t).wet_node])
    worst = 0.0
    for f in fields:
        cur = np.array(getattr(sim_p, f))
        assert np.isfinite(cur[wet]).all(), f'{name}: non-finite {f}'
        worst = max(worst, float(np.max(np.abs((cur - ref[f])[wet]))))
    status = 'ok' if worst < tol else 'MISMATCH'
    print(f'{name:<28s} max wet-field diff {worst:.3g}  {status}')
    return worst < tol


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters3d', type=int, default=100)
    p.add_argument('--iters2d', type=int, default=200)
    args = p.parse_args()

    from sailfish_tpu import util
    util.enable_compile_cache()

    import fe_separation_3d
    import ldc_2d
    import ldc_3d
    import ldc_2d_entropic
    import sc_phase_separation
    import sc_separation_2d
    import taylor_green_2d

    ok = True
    ok &= compare(
        'ldc_3d 128^3 bgk', ldc_3d.LDCSim, ('rho', 'vx', 'vz'),
        lat_nx=128, lat_ny=128, lat_nz=128,
        max_iters=args.iters3d, every=args.iters3d)
    # 64^3 exercises tile padding (X 64->128) + the k-plane slab
    # pipeline (pick_slab_k -> 8) on real hardware
    ok &= compare(
        'ldc_3d 64^3 bgk padded', ldc_3d.LDCSim, ('rho', 'vx', 'vz'),
        lat_nx=64, lat_ny=64, lat_nz=64,
        max_iters=args.iters3d, every=args.iters3d)
    ok &= compare(
        'ldc_2d 1024^2 bgk', ldc_2d.LDCSim, ('rho', 'vx', 'vy'),
        lat_nx=1024, lat_ny=1024,
        max_iters=args.iters2d, every=args.iters2d)
    # ('y','x')-meshed fused path on real hardware: ghost-column lanes
    # + two-hop corner exchange on a one-chip mesh (N-device equality
    # is gated on the virtual CPU mesh, tests/test_sharded_pallas.py)
    ok &= compare(
        'tg_2d 2048^2 yx-mesh 1x1', taylor_green_2d.TaylorGreenSim,
        ('rho', 'vx', 'vy'), lat_nx=2048, lat_ny=2048, visc=0.01,
        max_iters=args.iters2d, every=args.iters2d, mesh='1x1')
    # entropic collision: fused product-form feq + series/Newton alpha
    # (the alpha convergence gate amplifies ulp differences; loose tol)
    ok &= compare(
        'ldc_2d 256^2 elbm', ldc_2d_entropic.EntropicLDCSim,
        ('rho', 'vx'), lat_nx=256, lat_ny=256, max_iters=50,
        every=50, tol=2e-5)
    # The Shan-Chen scenes run a SHORT fixed horizon regardless of
    # --iters2d: spinodal decomposition is an instability that
    # amplifies fp32 op-order differences exponentially (measured:
    # 1e-6 at 25 iters -> 0.2 at 200 iters, both engines healthy), so
    # long horizons test chaos, not implementation agreement.
    # single-component Shan-Chen: rho pre-pass + in-kernel psi forcing
    ok &= compare(
        'sc_single 2d', sc_phase_separation.SCSim, ('rho',),
        lat_nx=512, lat_ny=512, max_iters=30,
        every=30, tol=2e-5, seed=1)
    # binary Shan-Chen: multi-component kernel, K aliased outputs
    ok &= compare(
        'sc_binary 2d', sc_separation_2d.SeparationSCSim,
        ('rho', 'phi'), lat_nx=512, lat_ny=512,
        max_iters=30, every=30, tol=2e-5, seed=1)
    # binary free energy 3D: plane-pipeline multi kernel, 2 aliased
    # outputs + 5-plane phi stencil ghosts
    ok &= compare(
        'fe_binary 3d', fe_separation_3d.SeparationFESim3D,
        ('rho', 'phi'), lat_nx=128, lat_ny=64, lat_nz=32,
        max_iters=args.iters3d, every=args.iters3d, tol=2e-5, seed=1)
    # --precision=mixed (int16 storage, ops/mixed.py): both engines
    # quantize identically, so agreement is bounded by one int16 code
    # step (ws = w * range/32767; the XLA engine's fp32 op order on
    # TPU may flip a rounding boundary): tol covers 2 code steps of
    # the heaviest-weight distribution
    ok &= compare(
        'ldc_3d 128^3 bgk mixed16', ldc_3d.LDCSim,
        ('rho', 'vx', 'vz'), lat_nx=128, lat_ny=128, lat_nz=128,
        max_iters=args.iters3d, every=args.iters3d,
        precision='mixed', tol=3e-5)
    ok &= compare(
        'ldc_2d 1024^2 bgk mixed16', ldc_2d.LDCSim,
        ('rho', 'vx', 'vy'), lat_nx=1024, lat_ny=1024,
        max_iters=args.iters2d, every=args.iters2d,
        precision='mixed', tol=3e-5)
    print('PASS' if ok else 'FAIL')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
