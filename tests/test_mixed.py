"""--precision=mixed: int16 fixed-point storage, fp32 math (ops/mixed.py).

The reference has no counterpart (its precision axis is single/double);
this mode halves the HBM bytes of the streaming-bound kernels. Gates:
the quantization grid is exact under round-trips, both engines produce
bit-identical trajectories, chunking does not leak extra rounding, and
transport physics survives 16-bit storage.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, 'examples')


def test_quant_roundtrip_identity():
    """quantize(dequantize(q)) == q for EVERY int16 code and every
    distribution -- the property that makes chunk boundaries, output
    and checkpoints rounding-free."""
    import jax.numpy as jnp

    from sailfish_tpu import lattice
    from sailfish_tpu.ops.mixed import MixedScales

    for name in ('D2Q9', 'D3Q19'):
        mx = MixedScales(lattice.get_grid(name))
        codes = jnp.arange(-32768, 32768, dtype=jnp.int16)
        for i in range(lattice.get_grid(name).Q):
            back = mx.quant_i(i, mx.dequant_i(i, codes))
            assert np.array_equal(np.asarray(back), np.asarray(codes)), \
                (name, i)


@pytest.mark.slow
def test_mixed_pallas_matches_xla_bitwise():
    """LDC 3D (walls in-kernel mask + native-BC lid rows): the fused
    kernel's in-register quantization must equal the XLA engine's
    whole-state quantization BITWISE."""
    from ldc_3d import LDCSim
    from sailfish_tpu.controller import LBSimulationController

    def run(engine):
        ctrl = LBSimulationController(LDCSim, default_config=dict(
            lat_nx=16, lat_ny=16, lat_nz=16, max_iters=12, every=12,
            quiet=True, engine=engine, precision='mixed'))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return np.asarray(r.f), np.array(r.sim.vx)

    f_x, vx_x = run('xla')
    f_p, vx_p = run('pallas')
    assert np.array_equal(f_x, f_p)
    assert np.array_equal(vx_x, vx_p)


@pytest.mark.slow
def test_mixed_chunk_independence():
    """12 iterations in one chunk == 3 chunks of 4: pad/crop round-trips
    through the public fp32 layout must not add rounding."""
    from ldc_3d import LDCSim
    from sailfish_tpu.controller import LBSimulationController

    def run(every):
        ctrl = LBSimulationController(LDCSim, default_config=dict(
            lat_nx=16, lat_ny=16, lat_nz=16, max_iters=12, every=every,
            quiet=True, engine='pallas', precision='mixed'))
        ctrl.run(ignore_cmdline=True)
        return np.asarray(ctrl._runner.f)

    assert np.array_equal(run(12), run(4))


def test_mixed_sharded_two_axis_yx():
    """('y','x')-sharded mixed stepping: ghost columns are dequantized
    on the XLA side (dequant is exact fp32 either way), so the
    x-sharded kernel composes with int16 storage. A flipped rounding
    tie at the shard seam would shift one code (~1e-5 in u); gate at a
    few steps."""
    from taylor_green_2d import TaylorGreenSim
    from sailfish_tpu.controller import LBSimulationController

    def run(mesh):
        ctrl = LBSimulationController(TaylorGreenSim, default_config=dict(
            lat_nx=256, lat_ny=128, max_iters=16, every=16, visc=0.01,
            quiet=True, mesh=mesh, engine='pallas', precision='mixed'))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.asarray(r.f), np.array(r.sim.vx)

    _, f_ref, vx_ref = run('')
    engine, f, vx = run('2x2')
    assert engine == 'pallas'
    assert np.max(np.abs(vx - vx_ref)) < 1e-4
    assert np.max(np.abs(f - f_ref)) < 1e-5


@pytest.mark.slow
def test_mixed_xla_patch_rows_match():
    """A scene with a non-native outflow plane (NTCopy) exercises the
    XLA compute_patch_plane path under mixed storage, alongside a
    native inlet row and bounce-back walls."""
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.models.single import LBFluidSim
    from sailfish_tpu.node_type import (NTCopy, NTEquilibriumVelocity,
                                        NTFullBBWall)
    from sailfish_tpu.subdomain import Subdomain3D

    class PipeSub(Subdomain3D):
        def boundary_conditions(self, hx, hy, hz):
            wall = (hy == 0) | (hy == self.gy - 1)
            self.set_node(wall, NTFullBBWall)
            inlet = (hz == 0) & ~wall
            self.set_node(inlet,
                          NTEquilibriumVelocity((0.0, 0.0, 0.02)))
            outlet = (hz == self.gz - 1) & ~wall
            self.set_node(outlet, NTCopy)

        def initial_conditions(self, sim, hx, hy, hz):
            sim.rho[:] = 1.0
            sim.vz[:] = 0.02

    class PipeSim(LBFluidSim):
        subdomain = PipeSub

    def run(engine):
        ctrl = LBSimulationController(PipeSim, default_config=dict(
            lat_nx=16, lat_ny=16, lat_nz=16, max_iters=10, every=10,
            quiet=True, engine=engine, precision='mixed',
            periodic_x=True))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return np.asarray(r.f)

    assert np.array_equal(run('xla'), run('pallas'))


def test_mixed_viscosity_decay():
    """Shear-wave decay: 16-bit storage keeps measured viscosity within
    1.5% (fp32 gives ~0.1%; bf16 storage would give ~35%)."""
    import jax
    import jax.numpy as jnp

    from sailfish_tpu import equilibrium as eq
    from sailfish_tpu import lattice
    from sailfish_tpu.ops.step import StepBuilder
    from sailfish_tpu.subdomain import NodeMaps

    N, visc, u0, steps = 64, 0.02, 0.01, 400
    grid = lattice.get_grid('D3Q19')
    maps = NodeMaps((8, 8, N), 3)
    b = StepBuilder(grid, maps, visc=visc, storage='int16')
    k = 2 * np.pi / N
    hx = np.arange(N)
    rho = jnp.ones((8, 8, N), jnp.float32)
    uy = jnp.asarray(np.tile(u0 * np.sin(k * hx), (8, 8, 1)),
                     jnp.float32)
    u = jnp.stack([jnp.zeros_like(rho), uy, jnp.zeros_like(rho)])
    f = eq.bgk_equilibrium(grid, rho, u)
    step = b.build()
    run = jax.jit(lambda f, n: jax.lax.fori_loop(
        0, n, lambda i, fc: step(fc, i), f), static_argnums=1)

    def mode_amp(f):
        _, u_out = eq.macroscopic(grid, b.streamed(f))
        return np.abs(np.fft.rfft(np.asarray(u_out[1][4, 4]))[1]) / N

    f = run(f, steps)
    a1 = mode_amp(f)
    f = run(f, steps)
    a2 = mode_amp(f)
    nu = -np.log(a2 / a1) / (k * k * steps)
    assert abs(nu - visc) / visc < 0.015, nu


def test_mixed_rejects_unsupported():
    """Shan-Chen / multiphase scenes must fail loudly, not clip
    silently."""
    import pytest

    from sailfish_tpu import lattice
    from sailfish_tpu.ops.step import StepBuilder
    from sailfish_tpu.subdomain import NodeMaps

    maps = NodeMaps((8, 8, 8), 3)
    with pytest.raises(NotImplementedError):
        StepBuilder(lattice.get_grid('D3Q19'), maps, visc=0.1,
                    sc_coupling=-5.0, storage='int16')


@pytest.mark.slow
def test_mixed_sharded_matches_single_device():
    """z-sharded fused stepping under mixed storage: the int16 ghost
    faces ppermuted over the ring must reproduce the single-device
    trajectory bitwise (and the ICI face bytes halve for free)."""
    from ldc_3d import LDCSim
    from sailfish_tpu.controller import LBSimulationController

    def run(mesh):
        ctrl = LBSimulationController(LDCSim, default_config=dict(
            lat_nx=16, lat_ny=16, lat_nz=16, max_iters=12, every=12,
            quiet=True, engine='pallas', precision='mixed', mesh=mesh))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return np.asarray(r.f)

    assert np.array_equal(run(''), run('4'))


@pytest.mark.slow
def test_mixed_2d_matches_xla_bitwise():
    """2D fused kernel under mixed storage (LDC 2D: wall mask +
    native-BC lid blocks) matches the XLA engine bitwise, and chunking
    is free of extra rounding."""
    from ldc_2d import LDCSim
    from sailfish_tpu.controller import LBSimulationController

    def run(engine, every):
        ctrl = LBSimulationController(LDCSim, default_config=dict(
            lat_nx=64, lat_ny=64, max_iters=12, every=every,
            quiet=True, engine=engine, precision='mixed'))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return np.asarray(r.f)

    f_x = run('xla', 12)
    f_p = run('pallas', 12)
    assert np.array_equal(f_x, f_p)
    assert np.array_equal(f_p, run('pallas', 4))


@pytest.mark.slow
def test_mixed_2d_sharded_matches_single_device():
    """y-sharded 2D fused stepping under mixed storage: bitwise vs the
    single-device kernel."""
    from ldc_2d import LDCSim
    from sailfish_tpu.controller import LBSimulationController

    def run(mesh):
        ctrl = LBSimulationController(LDCSim, default_config=dict(
            lat_nx=64, lat_ny=256, max_iters=12, every=12,
            quiet=True, engine='pallas', precision='mixed', mesh=mesh))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return np.asarray(r.f)

    assert np.array_equal(run(''), run('4'))
