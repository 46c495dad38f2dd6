#!/usr/bin/env python
"""Single-chip MLUPS sweep over domain sizes and lattices.

Counterpart of the reference's benchmark/2d_1block.py + perftest harness
(perftest/tests.py:17-60): runs LDC at a series of domain sizes for D2Q9
and D3Q19 and writes `<out>.dat` rows of  size  mlups, the same figure of
merit as perftest/results/*/blocksize/*.
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def run_case(grid, n, iters, warmup, engine='auto'):
    import jax

    from sailfish_tpu import geo as geo_mod
    from sailfish_tpu import util
    from sailfish_tpu.runner import SubdomainRunner
    util.enable_compile_cache()

    if grid == 'D2Q9':
        sys.path.insert(0, os.path.join(REPO, 'examples'))
        from ldc_2d import LDCSim
        dims = {'lat_nx': n, 'lat_ny': n}
        geo_cls = geo_mod.LBGeometry2D
        nodes = n * n
    else:
        sys.path.insert(0, os.path.join(REPO, 'examples'))
        from ldc_3d import LDCSim
        dims = {'lat_nx': n, 'lat_ny': n, 'lat_nz': n, 'grid': grid}
        geo_cls = geo_mod.LBGeometry3D
        nodes = n ** 3

    from sailfish_tpu.controller import LBSimulationController
    ctrl = LBSimulationController(LDCSim, default_config=dict(
        max_iters=0, quiet=True, engine=engine, **dims))
    defaults = {}
    LDCSim.update_defaults(defaults)
    defaults.update(ctrl._default_config)
    config = ctrl.config_parser.parse([], internal_defaults=defaults)
    LDCSim.modify_config(config)
    sim = LDCSim(config)
    runner = SubdomainRunner(sim, geo_cls(config))
    runner._init_geometry()
    runner._init_fields()
    runner._init_state()

    from sailfish_tpu.util import materialize as sync

    # scale the measured chunk to a fixed work target: a single short
    # chunk through the remote-device tunnel measures round-trip
    # latency (~100 ms), not the kernel -- small domains need many more
    # iterations per sync
    # >= 3.4e9 node-updates per measurement (headline_protocol.md)
    iters = max(iters, int(3.4e9 / nodes))
    f = runner._run_steps(runner.f, warmup, 0)
    sync(f)
    t0 = time.perf_counter()
    f = runner._run_steps(f, iters, warmup)
    sync(f)
    dt = time.perf_counter() - t0
    return nodes * iters / dt / 1e6, runner.engine


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', type=str, default='single_chip')
    p.add_argument('--iters', type=int, default=100)
    p.add_argument('--warmup', type=int, default=20)
    p.add_argument('--engine', type=str, default='auto')
    p.add_argument('--sizes2d', type=str, default='256,512,1024,2048')
    p.add_argument('--sizes3d', type=str, default='64,128,192,256')
    args = p.parse_args()

    for grid, sizes in (('D2Q9', args.sizes2d), ('D3Q19', args.sizes3d)):
        fname = f'{args.out}_{grid.lower()}.dat'
        with open(fname, 'w') as out:
            for n in (int(s) for s in sizes.split(',') if s):
                mlups, engine = run_case(grid, n, args.iters, args.warmup,
                                         args.engine)
                line = f'{n} {mlups:.1f}'
                print(f'{grid} {line}  [{engine}]')
                out.write(line + '\n')
        print('wrote', fname)


if __name__ == '__main__':
    main()
