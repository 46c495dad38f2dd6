#!/usr/bin/env python
"""Isolate the 2D ('y','x') fused-path overhead (VERDICT r3 item 4).

The one-chip mesh rows (model_zoo_v5e.dat) show the x-sharded 2D path
at ~2.3x the single-device step cost even at 4096^2 per shard, where
any fixed per-step glue should have amortized. This bench splits that
cost into its three layers, all on ONE device:

  a. the plain single-device kernel (baseline; local rolls),
  b. the x_ghosts KERNEL alone -- same device, precomputed static
     ghost-column inputs, no shard_map (isolates the per-direction
     static lane concats + the xcol DMA pipeline),
  c. the full sharded path on a 1x1 ('y','x') mesh (adds build_xcols,
     shard_map, and the ppermute identities).

Usage: python benchmark/x_ghost_overhead.py [--n 4096] [--iters 120]
Writes one line per layer: name MLUPS.
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
    p.add_argument('--n', type=int, default=4096)
    p.add_argument('--iters', type=int, default=120)
    p.add_argument('--warmup', type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sailfish_tpu import geo as geo_mod
    from sailfish_tpu import util
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.runner import SubdomainRunner
    util.enable_compile_cache()

    from taylor_green_2d import TaylorGreenSim

    N = args.n
    nodes = N * N

    def build(mesh):
        ctrl = LBSimulationController(TaylorGreenSim, default_config=dict(
            max_iters=0, quiet=True, lat_nx=N, lat_ny=N, visc=0.01,
            mesh=mesh))
        defaults = {}
        TaylorGreenSim.update_defaults(defaults)
        defaults.update(ctrl._default_config)
        config = ctrl.config_parser.parse([], internal_defaults=defaults)
        TaylorGreenSim.modify_config(config)
        sim = TaylorGreenSim(config)
        runner = SubdomainRunner(sim, geo_mod.LBGeometry2D(config))
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

    # a. single-device kernel
    r = build('')
    assert r.engine == 'pallas', r.engine
    f0 = r.f + 0   # snapshot BEFORE the donated run deletes r.f
    sync(f0)
    print(f'a_single {timeit(lambda f, n: r._run_steps(f, n), r.f):.1f}',
          flush=True)

    # b. x_ghosts kernel alone: static ghost columns, no shard_map
    from sailfish_tpu.ops.pallas_step2d import make_kernel_2d, \
        pick_block_size
    b = r.builder
    g = b.grid
    by = pick_block_size(g.Q, N, N)
    kern = make_kernel_2d(b, N, N, by=by, x_ghosts=True)
    basis = g.basis
    xdirs = [i for i in range(g.Q) if int(basis[i][0]) != 0]

    def make_xcols(f):
        cols = []
        for i in xdirs:
            cx, cy = int(basis[i][0]), int(basis[i][1])
            src = f[i, :, N - 1] if cx == 1 else f[i, :, 0]
            if cy:
                src = jnp.roll(src, cy)
            cols.append(src)
        xc = jnp.stack(cols, axis=1).astype(jnp.float32)
        return jnp.pad(xc, ((0, 0), (0, 128 - len(xdirs))))

    @jax.jit
    def run_b(f, n):
        def body(i, f):
            return kern(f, f[:, -by:], f[:, :by], make_xcols(f))
        return jax.lax.fori_loop(0, n, body, f)

    print(f'b_kernel_xghosts {timeit(run_b, f0):.1f}', flush=True)

    # b2. x_ghosts kernel with the xcols built ONCE (stale values --
    # perf probe only): separates the per-step make_xcols glue from
    # the kernel's own concat/DMA cost
    xc0 = make_xcols(f0)

    @jax.jit
    def run_b2(f, n):
        def body(i, f):
            return kern(f, f[:, -by:], f[:, :by], xc0)
        return jax.lax.fori_loop(0, n, body, f)

    print(f'b2_kernel_static_cols {timeit(run_b2, f0):.1f}', flush=True)

    # c0. shard_map on a 1x1 ('y','x') mesh, STATIC ghosts/cols (no
    # ppermute, no per-step slicing): isolates the bare shard_map +
    # 2-axis-sharded-carry cost
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax import shard_map
    import numpy as np2
    devs = np.array(jax.devices()[:1]).reshape(1, 1)
    mesh = Mesh(devs, ('y', 'x'))
    fspec = P(None, 'y', 'x')
    glo0, ghi0 = f0[:, -by:] + 0, f0[:, :by] + 0
    sync(glo0)

    def lstep_c0(f):
        return kern(f, glo0, ghi0, xc0)

    smap_c0 = shard_map(lstep_c0, mesh=mesh, in_specs=(fspec,),
                        out_specs=fspec, check_vma=False)

    @jax.jit
    def run_c0(f, n):
        return jax.lax.fori_loop(0, n, lambda i, f: smap_c0(f), f)

    f0s = jax.device_put(f0, NamedSharding(mesh, fspec))
    sync(f0s)
    print(f'c0_shardmap_static {timeit(run_c0, f0s):.1f}', flush=True)

    # c1. + live slices and xcols, still no ppermute
    def lstep_c1(f):
        return kern(f, f[:, -by:], f[:, :by], make_xcols(f))

    smap_c1 = shard_map(lstep_c1, mesh=mesh, in_specs=(fspec,),
                        out_specs=fspec, check_vma=False)

    @jax.jit
    def run_c1(f, n):
        return jax.lax.fori_loop(0, n, lambda i, f: smap_c1(f), f)

    print(f'c1_shardmap_live {timeit(run_c1, f0s):.1f}', flush=True)

    # c2. + ghost blocks via ppermute (identity on 1x1), xcols static
    up = [(0, 0)]

    def lstep_c2(f):
        glo = jax.lax.ppermute(f[:, -by:], 'y', up)
        ghi = jax.lax.ppermute(f[:, :by], 'y', up)
        return kern(f, glo, ghi, xc0)

    smap_c2 = shard_map(lstep_c2, mesh=mesh, in_specs=(fspec,),
                        out_specs=fspec, check_vma=False)

    @jax.jit
    def run_c2(f, n):
        return jax.lax.fori_loop(0, n, lambda i, f: smap_c2(f), f)

    print(f'c2_ghost_ppermute {timeit(run_c2, f0s):.1f}', flush=True)

    # c3. + xcols column recv ppermutes (corner rows still local)
    def make_xcols_pp(f):
        recv_last = jax.lax.ppermute(f[:, :, N - 1], 'x', up)
        recv_first = jax.lax.ppermute(f[:, :, 0], 'x', up)
        cols = []
        for i in xdirs:
            cx, cy = int(basis[i][0]), int(basis[i][1])
            src = recv_last[i] if cx == 1 else recv_first[i]
            if cy:
                src = jnp.roll(src, cy)
            cols.append(src)
        xc = jnp.stack(cols, axis=1).astype(jnp.float32)
        return jnp.pad(xc, ((0, 0), (0, 128 - len(xdirs))))

    def lstep_c3(f):
        glo = jax.lax.ppermute(f[:, -by:], 'y', up)
        ghi = jax.lax.ppermute(f[:, :by], 'y', up)
        return kern(f, glo, ghi, make_xcols_pp(f))

    smap_c3 = shard_map(lstep_c3, mesh=mesh, in_specs=(fspec,),
                        out_specs=fspec, check_vma=False)

    @jax.jit
    def run_c3(f, n):
        return jax.lax.fori_loop(0, n, lambda i, f: smap_c3(f), f)

    print(f'c3_xcol_ppermute {timeit(run_c3, f0s):.1f}', flush=True)

    # c3b. like c3 but an optimization_barrier decouples the strided
    # column slice from the collective (probe: is the defensive copy
    # triggered by slice-feeding-a-collective, and does a barrier
    # break the pattern?)
    def make_xcols_bar(f):
        last = jax.lax.optimization_barrier(f[:, :, N - 1])
        first = jax.lax.optimization_barrier(f[:, :, 0])
        recv_last = jax.lax.ppermute(last, 'x', up)
        recv_first = jax.lax.ppermute(first, 'x', up)
        cols = []
        for i in xdirs:
            cx, cy = int(basis[i][0]), int(basis[i][1])
            src = recv_last[i] if cx == 1 else recv_first[i]
            if cy:
                src = jnp.roll(src, cy)
            cols.append(src)
        xc = jnp.stack(cols, axis=1).astype(jnp.float32)
        return jnp.pad(xc, ((0, 0), (0, 128 - len(xdirs))))

    def lstep_c3b(f):
        glo = jax.lax.ppermute(f[:, -by:], 'y', up)
        ghi = jax.lax.ppermute(f[:, :by], 'y', up)
        return kern(f, glo, ghi, make_xcols_bar(f))

    smap_c3b = shard_map(lstep_c3b, mesh=mesh, in_specs=(fspec,),
                         out_specs=fspec, check_vma=False)

    @jax.jit
    def run_c3b(f, n):
        return jax.lax.fori_loop(0, n, lambda i, f: smap_c3b(f), f)

    print(f'c3b_barrier_slice {timeit(run_c3b, f0s):.1f}', flush=True)

    # c4. + per-direction corner-row ppermutes (the full build_xcols)
    def make_xcols_full(f):
        recv_last = jax.lax.ppermute(f[:, :, N - 1], 'x', up)
        recv_first = jax.lax.ppermute(f[:, :, 0], 'x', up)
        cols = []
        for i in xdirs:
            cx, cy = int(basis[i][0]), int(basis[i][1])
            src = recv_last[i] if cx == 1 else recv_first[i]
            if cy:
                shifted = jnp.roll(src, cy)
                if cy == 1:
                    e = jax.lax.ppermute(src[N - 1:], 'y', up)
                    shifted = jnp.concatenate([e, shifted[1:]], axis=0)
                else:
                    e = jax.lax.ppermute(src[:1], 'y', up)
                    shifted = jnp.concatenate([shifted[:-1], e], axis=0)
                src = shifted
            cols.append(src)
        xc = jnp.stack(cols, axis=1).astype(jnp.float32)
        return jnp.pad(xc, ((0, 0), (0, 128 - len(xdirs))))

    def lstep_c4(f):
        glo = jax.lax.ppermute(f[:, -by:], 'y', up)
        ghi = jax.lax.ppermute(f[:, :by], 'y', up)
        return kern(f, glo, ghi, make_xcols_full(f))

    smap_c4 = shard_map(lstep_c4, mesh=mesh, in_specs=(fspec,),
                        out_specs=fspec, check_vma=False)

    @jax.jit
    def run_c4(f, n):
        return jax.lax.fori_loop(0, n, lambda i, f: smap_c4(f), f)

    print(f'c4_corner_ppermute {timeit(run_c4, f0s):.1f}', flush=True)

    # c. full sharded path on a 1x1 ('y','x') mesh
    r2 = build('1x1')
    assert r2.engine == 'pallas', r2.engine
    print(f'c_sharded_1x1 '
          f'{timeit(lambda f, n: r2._run_steps(f, n), r2.f):.1f}',
          flush=True)


if __name__ == '__main__':
    main()
