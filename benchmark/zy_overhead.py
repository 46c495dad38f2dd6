#!/usr/bin/env python
"""Isolate the 3D ('z','y') fused-path overhead (VERDICT r3 item 4).

The zy mesh runs at a scale-invariant ~2030 MLUPS from 128^3 to 256^3
(vs ~3880 one-axis) -- per-BYTE that is half the streaming rate, so
either the kernel does 2x the work in y_ghosts mode or the XLA glue
around it duplicates the HBM traffic (e.g. a copy inserted because the
in-place-aliased f is also consumed by the face extraction). Layers,
all one device, no mask, periodic scene:

  a. plain kernel (local rolls),
  b. y_ghosts kernel with STATIC ghost-row inputs, no shard_map,
  c. b + per-step face extraction feeding the gy inputs (the copy
     hazard: f is consumed by both the aliased kernel and the faces),
  d. the full sharded path on a 1x1 ('z','y') mesh.

Usage: python benchmark/zy_overhead.py [--n 256] [--iters 60]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'examples'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--n', type=int, default=256)
    p.add_argument('--iters', type=int, default=60)
    p.add_argument('--warmup', type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sailfish_tpu import geo as geo_mod
    from sailfish_tpu import util
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.runner import SubdomainRunner
    util.enable_compile_cache()

    from sc_phase_separation_3d import SCSim3D  # periodic, no mask

    N = args.n
    nodes = N * N * N

    def build(mesh, overrides=None):
        cfg = dict(max_iters=0, quiet=True, lat_nx=N, lat_ny=N,
                   lat_nz=N, mesh=mesh)
        cfg.update(overrides or {})
        ctrl = LBSimulationController(SCSim3D, default_config=cfg)
        defaults = {}
        SCSim3D.update_defaults(defaults)
        defaults.update(ctrl._default_config)
        config = ctrl.config_parser.parse([], internal_defaults=defaults)
        SCSim3D.modify_config(config)
        # kill the SC coupling: probe the PLAIN kernel's y_ghosts cost
        config.G = 0.0
        sim = SCSim3D(config)
        runner = SubdomainRunner(sim, geo_mod.LBGeometry3D(config))
        runner._init_geometry()
        runner._init_fields()
        runner._init_state()
        return runner

    from sailfish_tpu.util import materialize as sync

    def timeit(fn, f):
        f = fn(f, args.warmup)
        sync(f)
        t0 = time.perf_counter()
        f = fn(f, args.iters)
        sync(f)
        dt = time.perf_counter() - t0
        return nodes * args.iters / dt / 1e6

    r = build('')
    assert r.engine == 'pallas', r.engine
    b = r.builder
    assert b.sc_coupling == 0.0

    from sailfish_tpu.ops.pallas_step import (cz_groups, make_kernel_3d,
                                              pick_slab_k)
    from sailfish_tpu.parallel.halo import pad_gy
    g = b.grid
    k = pick_slab_k(g.Q, N, N, N)
    kern = make_kernel_3d(b, N, N, N, k=k, y_ghosts=True)
    qperm, qinv, _ = cz_groups(g)
    qperm = jnp.asarray(np.asarray(qperm, np.int32))
    f0 = r.f[qperm]   # kernel layout (snapshot BEFORE the donated run)
    sync(f0)

    print(f'a_single {timeit(lambda f, n: r._run_steps(f, n), r.f):.1f}',
          flush=True)

    def faces(f):
        glo = f[:, -1]
        ghi = f[:, 0]
        face_hi = jnp.concatenate(
            [glo[:, None, -1], f[:, :, -1], ghi[:, None, -1]], axis=1)
        face_lo = jnp.concatenate(
            [glo[:, None, 0], f[:, :, 0], ghi[:, None, 0]], axis=1)
        gylo = pad_gy(jnp.swapaxes(face_hi, 0, 1))
        gyhi = pad_gy(jnp.swapaxes(face_lo, 0, 1))
        return glo, ghi, gylo, gyhi

    st = faces(f0)

    @jax.jit
    def run_b(f, n):
        def body(i, f):
            return kern(f, *st)
        return jax.lax.fori_loop(0, n, body, f)

    print(f'b_kernel_static_gy {timeit(run_b, f0):.1f}', flush=True)

    @jax.jit
    def run_c(f, n):
        def body(i, f):
            return kern(f, *faces(f))
        return jax.lax.fori_loop(0, n, body, f)

    print(f'c_kernel_live_faces {timeit(run_c, f0):.1f}', flush=True)

    r2 = build('1x1')
    assert r2.engine == 'pallas', r2.engine
    print(f'd_sharded_1x1 '
          f'{timeit(lambda f, n: r2._run_steps(f, n), r2.f):.1f}',
          flush=True)


if __name__ == '__main__':
    main()
