"""z-sharded fused-kernel stepping (shard_map + ppermute ghost faces)
vs the XLA engine: the multi-chip analog of the reference's
regtest/subdomains suite for the fast path."""
import sys

import numpy as np
import pytest

sys.path.insert(0, 'examples')


def test_sharded_pallas_matches_xla():
    from sphere_3d import SphereSimulation
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.geo import LBGeometry3D

    def run(mesh, engine):
        ctrl = LBSimulationController(
            SphereSimulation, LBGeometry3D,
            default_config=dict(lat_nx=32, lat_ny=16, lat_nz=16,
                                max_iters=15, every=15, quiet=True,
                                mesh=mesh, engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx), np.array(r.sim.rho)

    _, vx_ref, rho_ref = run('', 'xla')
    engine, vx, rho = run('4', 'pallas')
    assert engine == 'pallas'
    assert np.max(np.abs(vx - vx_ref)) < 1e-5
    assert np.max(np.abs(rho - rho_ref)) < 1e-5


@pytest.mark.slow
def test_sharded_pallas_complex_bc_ldc():
    """The headline scene itself (LDC: lid plane = complex-BC patch) runs
    z-sharded on the fused kernel via dynamic patch planes and matches the
    XLA engine bitwise-ish."""
    from ldc_3d import LDCSim
    from sailfish_tpu.controller import LBSimulationController

    def run(mesh, engine):
        ctrl = LBSimulationController(LDCSim, default_config=dict(
            lat_nx=16, lat_ny=16, lat_nz=16, max_iters=12, every=12,
            quiet=True, mesh=mesh, engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx), np.array(r.sim.rho)

    _, vx_ref, rho_ref = run('', 'xla')
    engine, vx, rho = run('4', 'pallas')
    assert engine == 'pallas'
    assert np.max(np.abs(vx - vx_ref)) < 1e-5
    assert np.max(np.abs(rho - rho_ref)) < 1e-5


@pytest.mark.slow
def test_sharded_pallas_patch_on_shard_boundary():
    """Complex-BC planes falling on the first/last local row of a shard
    exercise the patch/ghost interaction: duct flow with velocity inlet
    planes along the SHARDED axis direction would patch every plane, so
    instead shard a cavity whose lid plane is the very last global row."""
    from ldc_3d import LDCSim
    from sailfish_tpu.controller import LBSimulationController

    def run(mesh, engine):
        ctrl = LBSimulationController(LDCSim, default_config=dict(
            lat_nx=16, lat_ny=16, lat_nz=16, max_iters=12, every=12,
            quiet=True, mesh=mesh, engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return np.array(r.sim.vx)

    vx_ref = run('', 'xla')
    vx2 = run('2', 'pallas')
    assert np.max(np.abs(vx2 - vx_ref)) < 1e-5


@pytest.mark.slow
def test_sharded_pallas_two_axis_zy():
    """('z','y')-sharded fused kernel (ghost-row overwrite + two-hop
    corner exchange) vs the XLA engine and vs the single-device fused
    engine, on both a periodic scene and the patched LDC."""
    from ldc_3d import LDCSim
    from sphere_3d import SphereSimulation
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.parallel.halo import ShardedPallasStep3D

    def run(sim_cls, mesh, engine, **cfg):
        ctrl = LBSimulationController(sim_cls, default_config=dict(
            max_iters=12, every=12, quiet=True, mesh=mesh,
            engine=engine, **cfg))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r, np.array(r.sim.vx), np.array(r.sim.rho)

    cfg = dict(lat_nx=32, lat_ny=16, lat_nz=16)
    _, vx_ref, rho_ref = run(SphereSimulation, '', 'xla', **cfg)
    r, vx, rho = run(SphereSimulation, '2x2', 'pallas', **cfg)
    assert isinstance(r._pallas, ShardedPallasStep3D)
    assert r._pallas.two_axis
    assert np.max(np.abs(vx - vx_ref)) < 1e-5
    assert np.max(np.abs(rho - rho_ref)) < 1e-5

    cfg = dict(lat_nx=16, lat_ny=16, lat_nz=16)
    _, vx_ref, rho_ref = run(LDCSim, '', 'xla', **cfg)
    _, vx, rho = run(LDCSim, '2x2', 'pallas', **cfg)
    assert np.max(np.abs(vx - vx_ref)) < 1e-5
    assert np.max(np.abs(rho - rho_ref)) < 1e-5

    # vs the single-device fused engine: tight epsilon (XLA CPU
    # FMA-contracts the interpret-mode kernel differently inside
    # shard_map; the wiring itself is value- and order-exact)
    _, vx_1, rho_1 = run(LDCSim, '', 'pallas', **cfg)
    assert np.max(np.abs(vx - vx_1)) < 1e-6
    assert np.max(np.abs(rho - rho_1)) < 1e-6


@pytest.mark.slow
def test_sharded_pallas_trt_ldc():
    """TRT collision through the sharded fused path."""
    from ldc_3d import LDCSim
    from sailfish_tpu.controller import LBSimulationController

    def run(mesh, engine):
        ctrl = LBSimulationController(LDCSim, default_config=dict(
            lat_nx=16, lat_ny=16, lat_nz=16, max_iters=12, every=12,
            quiet=True, model='trt', mesh=mesh, engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx)

    _, vx_ref = run('', 'xla')
    engine, vx = run('4', 'pallas')
    assert engine == 'pallas'
    assert np.max(np.abs(vx - vx_ref)) < 2e-6


@pytest.mark.slow
def test_pallas3d_les_forced_matches_xla():
    """LES-Smagorinsky (local tau field) + body force in the fused
    kernel vs the XLA engine."""
    from sphere_3d import SphereSimulation
    from sailfish_tpu.controller import LBSimulationController

    def run(engine):
        ctrl = LBSimulationController(SphereSimulation,
                                      default_config=dict(
            lat_nx=32, lat_ny=16, lat_nz=16, max_iters=15, every=15,
            quiet=True, subgrid='les-smagorinsky', visc=0.01,
            engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx)

    _, vx_ref = run('xla')
    engine, vx = run('pallas')
    assert engine == 'pallas'
    assert np.max(np.abs(vx - vx_ref)) < 1e-6


@pytest.mark.slow
@pytest.mark.parametrize('fimpl,model,les', [
    ('edm', 'bgk', False),
    ('velocity_shift', 'bgk', False),
    ('edm', 'mrt', False),
    ('edm', 'elbm', False),
    ('velocity_shift', 'bgk', True),
    ('edm', 'bgk', True),
])
def test_pallas3d_force_implementations_match_xla(fimpl, model, les):
    """--force_implementation {edm, velocity_shift} with a uniform
    static body force runs on the fused kernel (reference
    relaxation_common.mako:56-133; guo is exercised by every other
    forced test here) and matches the XLA engine across collision
    models and under the LES local-tau field (whose strain must use
    the UNSHIFTED velocity for every force implementation)."""
    from sphere_3d import SphereSimulation
    from sailfish_tpu.controller import LBSimulationController

    def run(engine):
        cfg = dict(lat_nx=32, lat_ny=16, lat_nz=16, max_iters=15,
                   every=15, quiet=True, model=model,
                   force_implementation=fimpl, engine=engine)
        if les:
            cfg.update(subgrid='les-smagorinsky', visc=0.01)
        ctrl = LBSimulationController(SphereSimulation,
                                      default_config=cfg)
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx), np.array(r.sim.rho)

    _, vx_ref, rho_ref = run('xla')
    engine, vx, rho = run('pallas')
    assert engine == 'pallas'
    assert np.max(np.abs(vx - vx_ref)) < 1e-6
    assert np.max(np.abs(rho - rho_ref)) < 1e-6


@pytest.mark.slow
def test_pallas2d_dynamic_force_matches_xla():
    """Time-dependent UNIFORM DynamicValue body forces ride a per-step
    SMEM operand into the fused kernel (force_now; reference
    lb_base.py:346-352): a strongly-driven pulsatile channel matches
    the XLA engine, including under --precision=mixed. The shipped
    poiseuille_pulsatile --drive=force scene is fused-eligible (its
    own forcing is too weak to gate numerics at test length)."""
    import jax.numpy as jnp

    from poiseuille_pulsatile import PulsatileSim
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.models.base import LBForcedSim
    from sailfish_tpu.models.single import LBFluidSim
    from sailfish_tpu.node_type import DynamicValue, NTFullBBWall
    from sailfish_tpu.subdomain import Subdomain2D

    class Dom(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            self.set_node((hy == 0) | (hy == self.gy - 1), NTFullBBWall)

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0

    class Sim(LBFluidSim, LBForcedSim):
        subdomain = Dom

        def __init__(self, config):
            super().__init__(config)
            self.add_body_force(DynamicValue(
                lambda t: 1e-4 * jnp.sin(0.05 * t), 0.0))

    def run(engine, **extra):
        ctrl = LBSimulationController(Sim, default_config=dict(
            lat_nx=256, lat_ny=128, visc=0.05, periodic_x=True,
            max_iters=40, every=40, quiet=True, engine=engine, **extra))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx), np.array(r.sim.rho)

    _, vx_ref, rho_ref = run('xla')
    engine, vx, rho = run('pallas')
    assert engine == 'pallas'
    assert np.max(np.abs(vx_ref)) > 1e-4   # the drive actually acted
    assert np.max(np.abs(vx - vx_ref)) < 1e-6
    assert np.max(np.abs(rho - rho_ref)) < 1e-6

    _, vx_mref, _ = run('xla', precision='mixed')
    engine, vx_m, _ = run('pallas', precision='mixed')
    assert engine == 'pallas'
    assert np.max(np.abs(vx_m - vx_mref)) < 1e-6

    # the shipped scene selects the fused engine off-CPU
    import jax
    ctrl = LBSimulationController(PulsatileSim, default_config=dict(
        lat_nx=256, lat_ny=128, visc=0.05, max_iters=0, every=0,
        quiet=True, drive='force'))
    ctrl.run(ignore_cmdline=True)
    real_backend = jax.default_backend
    jax.default_backend = lambda: 'tpu'
    try:
        assert ctrl._runner._select_engine(jnp.float32) == 'pallas'
    finally:
        jax.default_backend = real_backend


@pytest.mark.slow
def test_pallas3d_dynamic_force_matches_xla():
    """The 3D fused kernel under a time-dependent uniform body force
    (per-step SMEM force operand) vs the XLA engine."""
    import jax.numpy as jnp

    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.geo import LBGeometry3D
    from sailfish_tpu.models.base import LBForcedSim
    from sailfish_tpu.models.single import LBFluidSim
    from sailfish_tpu.node_type import DynamicValue, NTFullBBWall
    from sailfish_tpu.subdomain import Subdomain3D

    class Dom(Subdomain3D):
        def boundary_conditions(self, hx, hy, hz):
            self.set_node((hy == 0) | (hy == self.gy - 1), NTFullBBWall)

        def initial_conditions(self, sim, hx, hy, hz):
            sim.rho[:] = 1.0

    class Sim(LBFluidSim, LBForcedSim):
        subdomain = Dom

        def __init__(self, config):
            super().__init__(config)
            self.add_body_force(DynamicValue(
                lambda t: 1e-4 * jnp.sin(0.05 * t), 0.0, 0.0))

    def run(engine):
        ctrl = LBSimulationController(
            Sim, LBGeometry3D, default_config=dict(
                lat_nx=32, lat_ny=16, lat_nz=16, visc=0.05,
                periodic_x=True, periodic_z=True, max_iters=20,
                every=20, quiet=True, engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx)

    _, vx_ref = run('xla')
    engine, vx = run('pallas')
    assert engine == 'pallas'
    assert np.max(np.abs(vx_ref)) > 1e-6
    assert np.max(np.abs(vx - vx_ref)) < 1e-6


@pytest.mark.slow
def test_pallas2d_shallow_water_matches_xla():
    """The D2Q9 shallow-water equilibrium (LBFreeSurface; reference
    sym_equilibrium.py:73-89) runs on the fused kernel, single-device
    and y-sharded, and matches the XLA engine."""
    from fs_gaussian import FSSim
    from sailfish_tpu.controller import LBSimulationController

    def run(mesh, engine):
        ctrl = LBSimulationController(FSSim, default_config=dict(
            lat_nx=128, lat_ny=128, max_iters=20, every=20, quiet=True,
            mesh=mesh, engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.rho), np.array(r.sim.vx)

    _, rho_ref, vx_ref = run('', 'xla')
    engine, rho, vx = run('', 'pallas')
    assert engine == 'pallas'
    assert np.max(np.abs(rho - rho_ref)) < 1e-6
    assert np.max(np.abs(vx - vx_ref)) < 1e-6
    for mesh in ('2', '2x2'):
        engine, rho2, vx2 = run(mesh, 'pallas')
        assert engine == 'pallas', mesh
        assert np.max(np.abs(rho2 - rho_ref)) < 1e-6, mesh
        assert np.max(np.abs(vx2 - vx_ref)) < 1e-6, mesh


@pytest.mark.slow
@pytest.mark.parametrize('fimpl', ['edm', 'velocity_shift'])
def test_pallas2d_force_implementations_match_xla(fimpl):
    """The 2D fused kernel under edm / velocity_shift forcing (shared
    collide helpers; this pins the 2D factory) vs the XLA engine."""
    from poiseuille import PoiseuilleSim
    from sailfish_tpu.controller import LBSimulationController

    def run(engine):
        ctrl = LBSimulationController(PoiseuilleSim, default_config=dict(
            lat_nx=256, lat_ny=128, max_iters=20, every=20, quiet=True,
            visc=0.05, horizontal=True, force_implementation=fimpl,
            engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx), np.array(r.sim.rho)

    _, vx_ref, rho_ref = run('xla')
    engine, vx, rho = run('pallas')
    assert engine == 'pallas'
    assert np.max(np.abs(vx - vx_ref)) < 1e-6
    assert np.max(np.abs(rho - rho_ref)) < 1e-6


@pytest.mark.slow
def test_sharded_pallas2d_periodic_and_ldc():
    """y-sharded 2D fused kernel: periodic scene (ghost blocks) and the
    lid cavity (dynamic patch blocks) vs the XLA engine."""
    from ldc_2d import LDCSim
    from taylor_green_2d import TaylorGreenSim
    from sailfish_tpu.controller import LBSimulationController

    def run(sim_cls, mesh, engine, **cfg):
        ctrl = LBSimulationController(sim_cls, default_config=dict(
            quiet=True, mesh=mesh, engine=engine, **cfg))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx), np.array(r.sim.rho)

    cfg = dict(lat_nx=128, lat_ny=256, max_iters=20, every=20,
               visc=0.01)
    _, vx_ref, rho_ref = run(TaylorGreenSim, '', 'xla', **cfg)
    engine, vx, rho = run(TaylorGreenSim, '2', 'pallas', **cfg)
    assert engine == 'pallas'
    assert np.max(np.abs(vx - vx_ref)) < 1e-6
    assert np.max(np.abs(rho - rho_ref)) < 1e-5

    cfg = dict(lat_nx=128, lat_ny=256, max_iters=20, every=20)
    _, vx_ref, rho_ref = run(LDCSim, '', 'xla', **cfg)
    engine, vx, rho = run(LDCSim, '2', 'pallas', **cfg)
    assert engine == 'pallas'
    assert np.max(np.abs(vx - vx_ref)) < 1e-6
    assert np.max(np.abs(rho - rho_ref)) < 1e-5


@pytest.mark.slow
def test_sharded_pallas2d_two_axis_yx():
    """('y','x')-sharded 2D fused kernel: the x-roll wrap lanes are
    overwritten from ppermuted neighbor ghost columns, with the corner
    values flowing by a second ppermute hop (the TPU analog of the
    reference's corner/edge partial transfers,
    subdomain_connection.py:238-449). Periodic scene + a mask-BC
    bounce-back channel vs the XLA engine, on 2x2 and x-heavy 1x4
    meshes."""
    from poiseuille import PoiseuilleSim
    from taylor_green_2d import TaylorGreenSim
    from sailfish_tpu.controller import LBSimulationController

    def run(sim_cls, mesh, engine, **cfg):
        ctrl = LBSimulationController(sim_cls, default_config=dict(
            quiet=True, mesh=mesh, engine=engine, **cfg))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx), np.array(r.sim.rho)

    cfg = dict(lat_nx=256, lat_ny=128, max_iters=20, every=20,
               visc=0.01)
    _, vx_ref, rho_ref = run(TaylorGreenSim, '', 'xla', **cfg)
    for mesh in ('2x2', '1x4'):
        engine, vx, rho = run(TaylorGreenSim, mesh, 'pallas', **cfg)
        assert engine == 'pallas'
        assert np.max(np.abs(vx - vx_ref)) < 1e-6, mesh
        assert np.max(np.abs(rho - rho_ref)) < 1e-5, mesh

    # bounce-back walls at the y edges (mask class), periodic + body
    # force along the sharded x axis
    cfg = dict(lat_nx=256, lat_ny=128, max_iters=20, every=20,
               visc=0.05, horizontal=True)
    _, vx_ref, rho_ref = run(PoiseuilleSim, '', 'xla', **cfg)
    engine, vx, rho = run(PoiseuilleSim, '2x2', 'pallas', **cfg)
    assert engine == 'pallas'
    assert np.max(np.abs(vx - vx_ref)) < 1e-6
    assert np.max(np.abs(rho - rho_ref)) < 1e-5


@pytest.mark.slow
def test_pallas3d_shan_chen_matches_xla():
    """3D single-component Shan-Chen on the fused path vs XLA."""
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.models.single import LBSingleFluidShanChen
    from sailfish_tpu.subdomain import Subdomain3D

    class Sep3(Subdomain3D):
        def boundary_conditions(self, hx, hy, hz):
            pass

        def initial_conditions(self, sim, hx, hy, hz):
            sim.rho[:] = np.random.RandomState(7).rand(
                *sim.rho.shape) / 100 + 0.693

    class S3(LBSingleFluidShanChen):
        subdomain = Sep3

        @classmethod
        def update_defaults(cls, d):
            d.update(dict(G=-5.0, visc=1.0 / 6.0, periodic_x=True,
                          periodic_y=True, periodic_z=True,
                          sc_potential='classic', grid='D3Q19'))

    def run(engine):
        ctrl = LBSimulationController(S3, default_config=dict(
            lat_nx=32, lat_ny=16, lat_nz=16, max_iters=20, every=20,
            quiet=True, engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.rho)

    _, rho_a = run('xla')
    engine, rho_b = run('pallas')
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 2e-6


@pytest.mark.slow
def test_pallas3d_sc_emit_rho_bitwise():
    """The emit-rho Shan-Chen kernel (in-kernel post-stream density
    emission, (f, rho) carry) is bit-identical to the rho pre-pass
    path across slab depths (k=1 exercises the 2-program ring carry,
    k=4 the in-slab one) and with a wall mask."""
    import jax.numpy as jnp

    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.models.single import LBSingleFluidShanChen
    from sailfish_tpu.node_type import NTFullBBWall
    from sailfish_tpu.ops.pallas_step import PallasStep3D, make_kernel_3d
    from sailfish_tpu.subdomain import Subdomain3D

    class Sep3(Subdomain3D):
        walls = False

        def boundary_conditions(self, hx, hy, hz):
            if self.walls:
                self.set_node((hy == 0) | (hy == self.gy - 1),
                              NTFullBBWall)

        def initial_conditions(self, sim, hx, hy, hz):
            sim.rho[:] = np.random.RandomState(7).rand(
                *sim.rho.shape) / 100 + 0.693

    class S3(LBSingleFluidShanChen):
        subdomain = Sep3

        @classmethod
        def update_defaults(cls, d):
            d.update(dict(G=-5.0, visc=1.0 / 6.0, periodic_x=True,
                          periodic_y=True, periodic_z=True,
                          sc_potential='classic', grid='D3Q19'))

    for nz, walls in [(6, False), (16, False), (16, True)]:
        Sep3.walls = walls
        ctrl = LBSimulationController(S3, default_config=dict(
            lat_nx=32, lat_ny=16, lat_nz=nz, max_iters=0, every=10,
            quiet=True, engine='xla'))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        b, f0, shape = r.builder, r.f, (nz, 16, 32)

        p_new = PallasStep3D(b, shape, interpret=True)
        assert p_new.emit_rho, (nz, p_new.slab_k)
        p_old = PallasStep3D(b, shape, interpret=True)
        p_old.emit_rho = False
        p_old.kernel = make_kernel_3d(
            b, *shape, patch_rows=p_old.patch_rows,
            has_mask=p_old.has_mask, interpret=True, sc=True,
            k=p_old.slab_k)

        fa = p_new.run_steps(jnp.asarray(f0), 7)
        fb = p_old.run_steps(jnp.asarray(f0), 7)
        assert np.max(np.abs(np.asarray(fa) - np.asarray(fb))) == 0.0, \
            (nz, walls, p_new.slab_k)


def test_pallas3d_tile_padding_unaligned_domain():
    """Domains with Y%8/X%128 != 0 but solid outer layers run on the
    fused kernel via tile padding; wet-node state matches the XLA
    engine (solid-node bookkeeping values may differ -- they see
    different wrap sources and carry no physics)."""
    import sailfish_tpu.node_type as snt
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.models.base import LBForcedSim
    from sailfish_tpu.models.single import LBFluidSim
    from sailfish_tpu.node_type import NTFullBBWall
    from sailfish_tpu.subdomain import Subdomain3D

    class Duct(Subdomain3D):
        def boundary_conditions(self, hx, hy, hz):
            self.set_node((hy == 0) | (hy == self.gy - 1) |
                          (hz == 0) | (hz == self.gz - 1), NTFullBBWall)

        def initial_conditions(self, sim, hx, hy, hz):
            sim.rho[:] = 1.0

    class Sim(LBFluidSim, LBForcedSim):
        subdomain = Duct

        def __init__(self, config):
            super().__init__(config)
            self.add_body_force((1e-5, 0.0, 0.0))

    def run(engine):
        ctrl = LBSimulationController(Sim, default_config=dict(
            lat_nx=128, lat_ny=13, lat_nz=11, max_iters=15, every=15,
            quiet=True, periodic_x=True, engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        return r, np.asarray(r.f)

    r1, f1 = run('xla')
    # interpret mode skips padding; force it to exercise the pad path
    from sailfish_tpu.ops.pallas_step import PallasStep3D
    import sailfish_tpu.runner as runner_mod
    r2kw = {}
    ctrl = None
    import sailfish_tpu.ops.pallas_step as psmod
    orig_init = PallasStep3D.__init__

    def patched(self, builder, domain_shape, interpret=False, **kw):
        orig_init(self, builder, domain_shape, interpret=False, **kw)
        # rebuild kernels in interpret mode at the padded shape
        Zs, Ys, Xs = self.kshape
        self.kernel = psmod.make_kernel_3d(
            builder, Zs, Ys, Xs, patch_rows=self.patch_rows,
            has_mask=self.has_mask, interpret=True, sc=self.sc)
        if self.sc:
            self.rho_kernel = psmod.make_rho_kernel_3d(
                builder, Zs, Ys, Xs, interpret=True)

    PallasStep3D.__init__ = patched
    try:
        r2, f2 = run('pallas')
    finally:
        PallasStep3D.__init__ = orig_init
    assert r2.engine == 'pallas'

    wet = np.isin(r1.maps.type_map,
                  [t for t in r1.maps.present_types
                   if snt.get_node_type(t).wet_node])
    assert np.max(np.abs(f1[:, wet] - f2[:, wet])) < 1e-6


import pytest


@pytest.mark.parametrize('bc_pair,model', [
    ('equilibrium', 'bgk'), ('zouhe', 'bgk'),
    ('regularized', 'bgk'), ('regularized', 'mrt'),
])
@pytest.mark.slow
def test_pallas3d_native_bc_rows_match_xla(bc_pair, model):
    """The in-kernel native-BC path (mask codes >= 3: macro solve +
    reconstruction + collide inside the fused kernel, replacing the
    per-step XLA patch-plane prologue) must match the XLA engine for
    every local BC family, velocity inlet at z=0 + density outlet at
    z=Z-1."""
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.models.single import LBFluidSim
    from sailfish_tpu.node_type import (
        NTEquilibriumDensity, NTEquilibriumVelocity, NTFullBBWall,
        NTRegularizedDensity, NTRegularizedVelocity, NTZouHeDensity,
        NTZouHeVelocity)
    from sailfish_tpu.subdomain import Subdomain3D

    vel_cls, den_cls = {
        'equilibrium': (NTEquilibriumVelocity, NTEquilibriumDensity),
        'zouhe': (NTZouHeVelocity, NTZouHeDensity),
        'regularized': (NTRegularizedVelocity, NTRegularizedDensity),
    }[bc_pair]

    class Channel(Subdomain3D):
        def boundary_conditions(self, hx, hy, hz):
            walls = (hy == 0) | (hy == self.gy - 1)
            self.set_node(walls, NTFullBBWall)
            self.set_node((hz == 0) & ~walls,
                          vel_cls((0.0, 0.0, 0.03)))
            self.set_node((hz == self.gz - 1) & ~walls,
                          den_cls(1.0))

        def initial_conditions(self, sim, hx, hy, hz):
            sim.rho[:] = 1.0
            sim.vz[:] = 0.01

    class Sim(LBFluidSim):
        subdomain = Channel

    def run(engine):
        ctrl = LBSimulationController(Sim, default_config=dict(
            lat_nx=32, lat_ny=16, lat_nz=16, max_iters=20, every=20,
            quiet=True, periodic_x=True, engine=engine, model=model))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r, np.array(r.sim.rho), np.array(r.sim.vz)

    _, rho_a, vz_a = run('xla')
    rp, rho_b, vz_b = run('pallas')
    assert rp.engine == 'pallas'
    # uniform-parameter native BCs run IN-KERNEL (mask-code windows),
    # not through the patch prologue or the XLA window machinery
    assert rp._pallas.bc_rows == ()
    assert len(rp._pallas.kbc) == 2
    assert rp._pallas.xla_patch_rows == []
    assert np.max(np.abs(rho_a - rho_b)) < 2e-6
    assert np.max(np.abs(vz_a - vz_b)) < 2e-6


@pytest.mark.parametrize('bc_pair,model', [
    ('equilibrium', 'bgk'), ('zouhe', 'bgk'), ('regularized', 'mrt'),
])
@pytest.mark.slow
def test_pallas3d_xnormal_bc_faces_match_xla(bc_pair, model):
    """BC faces NORMAL TO X run fused through the in-kernel native-BC
    windows (the z-plane patch path cannot express them -- they put a
    node on every z-plane). Velocity inlet at x=0, density outlet at
    x=X-1, bounce-back walls normal to y; reference scene family:
    /root/reference/examples/duct_flow-style orientations."""
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.models.single import LBFluidSim
    from sailfish_tpu.node_type import (
        NTEquilibriumDensity, NTEquilibriumVelocity, NTFullBBWall,
        NTRegularizedDensity, NTRegularizedVelocity, NTZouHeDensity,
        NTZouHeVelocity)
    from sailfish_tpu.subdomain import Subdomain3D

    vel_cls, den_cls = {
        'equilibrium': (NTEquilibriumVelocity, NTEquilibriumDensity),
        'zouhe': (NTZouHeVelocity, NTZouHeDensity),
        'regularized': (NTRegularizedVelocity, NTRegularizedDensity),
    }[bc_pair]

    class Duct(Subdomain3D):
        def boundary_conditions(self, hx, hy, hz):
            walls = (hy == 0) | (hy == self.gy - 1)
            self.set_node(walls, NTFullBBWall)
            self.set_node((hx == 0) & ~walls,
                          vel_cls((0.03, 0.0, 0.0)))
            self.set_node((hx == self.gx - 1) & ~walls,
                          den_cls(1.0))

        def initial_conditions(self, sim, hx, hy, hz):
            sim.rho[:] = 1.0
            sim.vx[:] = 0.01

    class Sim(LBFluidSim):
        subdomain = Duct

    def run(engine):
        ctrl = LBSimulationController(Sim, default_config=dict(
            lat_nx=32, lat_ny=16, lat_nz=16, max_iters=20, every=20,
            quiet=True, periodic_z=True, engine=engine, model=model))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r, np.array(r.sim.rho), np.array(r.sim.vx)

    _, rho_a, vx_a = run('xla')
    rp, rho_b, vx_b = run('pallas')
    assert rp.engine == 'pallas'
    assert rp._pallas.bc_rows == ()
    assert rp._pallas.patch_rows == []
    assert len(rp._pallas.kbc) == 2
    # the windows cover single lane tiles, not the whole plane
    for _c, _t, _o, _r, _v, _slabs, _ys, (x0, x1) in rp._pallas.kbc:
        assert x1 - x0 <= 128
    assert np.max(np.abs(rho_a - rho_b)) < 2e-6
    assert np.max(np.abs(vx_a - vx_b)) < 2e-6


@pytest.mark.slow
def test_sharded_pallas_xnormal_bc_faces_zmesh():
    """x-normal BC faces on a z-sharded mesh: the in-kernel native-BC
    windows are identical in every shard (x is unsharded), the sharded
    mask gates application, and the result matches the XLA engine.
    Previously these scenes fell off the fused path in ANY
    decomposition."""
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.models.single import LBFluidSim
    from sailfish_tpu.node_type import (
        NTEquilibriumDensity, NTEquilibriumVelocity, NTFullBBWall)
    from sailfish_tpu.subdomain import Subdomain3D

    class Duct(Subdomain3D):
        def boundary_conditions(self, hx, hy, hz):
            walls = (hy == 0) | (hy == self.gy - 1)
            self.set_node(walls, NTFullBBWall)
            self.set_node((hx == 0) & ~walls,
                          NTEquilibriumVelocity((0.03, 0.0, 0.0)))
            self.set_node((hx == self.gx - 1) & ~walls,
                          NTEquilibriumDensity(1.0))

        def initial_conditions(self, sim, hx, hy, hz):
            sim.rho[:] = 1.0
            sim.vx[:] = 0.01

    class Sim(LBFluidSim):
        subdomain = Duct

    def run(mesh, engine):
        ctrl = LBSimulationController(Sim, default_config=dict(
            lat_nx=32, lat_ny=16, lat_nz=16, max_iters=15, every=15,
            quiet=True, periodic_z=True, mesh=mesh, engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r, np.array(r.sim.rho), np.array(r.sim.vx)

    _, rho_a, vx_a = run('', 'xla')
    rp, rho_b, vx_b = run('4', 'pallas')
    assert rp.engine == 'pallas'
    assert len(rp._pallas.kbc) == 2
    assert not rp._pallas.has_patches
    assert np.max(np.abs(rho_a - rho_b)) < 2e-6
    assert np.max(np.abs(vx_a - vx_b)) < 2e-6


def test_pallas3d_padding_rejects_shan_chen():
    """Tile padding is unsafe for the nonlocal psi stencil (edge wall
    nodes would sample pad columns instead of the periodic wrap): the
    fused path must refuse, not silently diverge from the XLA engine."""
    import pytest

    from sailfish_tpu.models.single import LBSingleFluidShanChen
    from sailfish_tpu.node_type import NTFullBBWall
    from sailfish_tpu.ops.pallas_step import PallasStep3D
    from sailfish_tpu.ops.step import StepBuilder
    from sailfish_tpu.subdomain import Subdomain3D, SubdomainSpec3D

    class Dom(Subdomain3D):
        def boundary_conditions(self, hx, hy, hz):
            self.set_node((hy == 0) | (hy == self.gy - 1), NTFullBBWall)

        def initial_conditions(self, sim, hx, hy, hz):
            sim.rho[:] = 1.0

    from sailfish_tpu.controller import LBSimulationController
    ctrl = LBSimulationController(
        type('S', (LBSingleFluidShanChen,), {'subdomain': Dom}),
        default_config=dict(
            lat_nx=128, lat_ny=12, lat_nz=8, max_iters=0, quiet=True,
            periodic_x=True, periodic_z=True, G=-5.0))
    ctrl.run(ignore_cmdline=True)
    b = ctrl._runner.builder
    assert b.sc_coupling != 0.0
    # interpret=False takes the padding branch (lat_ny=12 -> pad_y=4)
    with pytest.raises(NotImplementedError, match='psi stencil'):
        PallasStep3D(b, (8, 12, 128), interpret=False)


@pytest.mark.slow
def test_pallas3d_elbm_matches_xla():
    """Entropic collision (product feq + alpha dispatch) in the fused
    3D kernel vs the XLA engine, incl. the LDC lid patch plane."""
    from ldc_3d import LDCSim
    from sailfish_tpu.controller import LBSimulationController

    def run(engine):
        ctrl = LBSimulationController(LDCSim, default_config=dict(
            lat_nx=32, lat_ny=16, lat_nz=16, max_iters=15, every=15,
            quiet=True, model='elbm', engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx)

    _, vx_ref = run('xla')
    engine, vx = run('pallas')
    assert engine == 'pallas'
    # ELBM's Newton done-mask freeze amplifies ulp-level moment
    # differences into O(last-step) alpha differences; bitwise-style
    # 1e-6 equivalence is not attainable through the convergence gate
    assert np.max(np.abs(vx - vx_ref)) < 2e-5


@pytest.mark.slow
def test_sharded_sc_two_axis_zy():
    """Single-component Shan-Chen on a ('z','y') 2-axis mesh: the
    in-kernel psi sampling reads neighbor rho rows (y_fix), the rho
    carry's edge planes AND edge rows come from XLA streams of the
    ppermuted faces, corners ride the two-hop rr/gy extensions.
    Fields match the single-device fused engine to the same 1-ulp
    FMA-contraction epsilon the 1-axis test documents
    (test_multi_pallas.test_sharded_sc_single_3d_bitwise); the carry
    itself is checked BITWISE against a from-scratch recompute."""
    import jax

    from sc_phase_separation_3d import SCSim3D
    from sailfish_tpu.controller import LBSimulationController

    def run(mesh):
        ctrl = LBSimulationController(SCSim3D, default_config=dict(
            lat_nx=16, lat_ny=16, lat_nz=16, max_iters=10, every=10,
            quiet=True, engine='pallas', mesh=mesh, seed=7))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r, np.asarray(r.f)

    _, f1 = run('')
    _, f_z = run('4')     # 1-axis (existing path, regression anchor)
    r, f_zy = run('2x2')  # 2-axis
    assert np.max(np.abs(f1 - f_z)) < 1e-6
    assert np.max(np.abs(f1 - f_zy)) < 1e-6

    # carry self-consistency (order-exact): step the 2-axis carry a
    # few times and compare against _sharded_init recomputed from the
    # carried f -- the emitted interior rho, the XLA edge planes and
    # the rr edge-row arrays must all be BITWISE reproducible
    p = r._pallas
    assert p.two_axis and p.sc
    carry = p.pad_state(r.f)
    carry = jax.lax.fori_loop(0, 3, lambda i, c: p.step(c, i), carry)
    ref = p._sharded_init(carry[0])
    rho, rlo, rhi = (np.asarray(x) for x in carry[1:4])
    rho_ref, rlo_ref, rhi_ref = (np.asarray(x) for x in ref[1:4])
    zl = rho.shape[0] // p.nshards
    yl = rho.shape[1] // p.ny_shards
    for s in range(p.nshards):
        for t in range(p.ny_shards):
            blk = rho[s * zl:(s + 1) * zl, t * yl:(t + 1) * yl]
            rb = rho_ref[s * zl:(s + 1) * zl, t * yl:(t + 1) * yl]
            # interior planes' interior rows: in-kernel emission
            assert np.array_equal(blk[1:-1, 1:-1], rb[1:-1, 1:-1])
    assert np.array_equal(rlo, rlo_ref)   # fresh z-edge planes
    assert np.array_equal(rhi, rhi_ref)
    rr = tuple(np.asarray(x) for x in carry[8:10])
    rr_ref = tuple(np.asarray(x) for x in ref[8:10])
    for a, b in zip(rr, rr_ref):
        assert np.array_equal(a, b)       # fresh edge rows + corners


def _yrow_channel_classes(wall_cls):
    """A y-normal-wall channel (the turbulence-channel layout,
    examples/turbulence/channel_flow.py): complex-BC nodes on every
    z-plane but only two y-rows -- the patch_yrows kernel mode."""
    import numpy as np_
    from sailfish_tpu.models.base import LBForcedSim
    from sailfish_tpu.models.single import LBFluidSim
    from sailfish_tpu.subdomain import Subdomain3D

    class Chan(Subdomain3D):
        def boundary_conditions(self, hx, hy, hz):
            self.set_node((hy == 0) | (hy == self.gy - 1), wall_cls)

        def initial_conditions(self, sim, hx, hy, hz):
            sim.rho[:] = 1.0
            sim.vx[:] = 0.02 * np_.sin(2 * np_.pi * hz / self.gz) \
                * np_.sin(np_.pi * hy / self.gy)

    class ChanSim(LBFluidSim, LBForcedSim):
        subdomain = Chan

        @classmethod
        def modify_config(cls, config):
            config.periodic_x = True
            config.periodic_z = True

        def __init__(self, config):
            super().__init__(config)
            self.add_body_force((1e-5, 0.0, 0.0))

    return ChanSim


def _run_yrow_channel(wall_cls, engine, **extra):
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.geo import LBGeometry3D
    cfg = dict(lat_nx=32, lat_ny=16, lat_nz=16, visc=0.05,
               max_iters=20, every=20, quiet=True, engine=engine)
    cfg.update(extra)
    ctrl = LBSimulationController(
        _yrow_channel_classes(wall_cls), LBGeometry3D,
        default_config=cfg)
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    r._fields_to_host()
    return r, np.array(r.sim.vx), np.array(r.sim.vy), np.array(r.sim.rho)


def test_pallas3d_yrow_patches_tms_channel():
    """Neighbor-sampling BC rows NORMAL to y (TMS walls at y=0/Y-1, the
    turbulence-channel layout) run fused through the y-row patch mode
    (XLA prologue over all z + in-kernel row select) and match the XLA
    engine; plane patching would have overlaid every z-plane and
    refused (round-3 gap: regtest/channel_loglaw_live.py ran wholly on
    the XLA engine)."""
    from sailfish_tpu.node_type import NTWallTMS
    rp, vx_p, vy_p, rho_p = _run_yrow_channel(NTWallTMS, 'pallas')
    assert rp.engine == 'pallas'
    assert rp._pallas.patch_yrows == (0, 15)
    assert rp._pallas.patch_rows == [] and not rp._pallas.has_mask
    _, vx_x, vy_x, rho_x = _run_yrow_channel(NTWallTMS, 'xla')
    assert np.max(np.abs(vx_p - vx_x)) < 2e-6
    assert np.max(np.abs(vy_p - vy_x)) < 2e-6
    assert np.max(np.abs(rho_p - rho_x)) < 2e-6


@pytest.mark.slow
@pytest.mark.parametrize('wall', ['bbl', 'hbb'])
def test_pallas3d_yrow_patches_wall_families(wall):
    """Link-tagged half-way walls take the y-row patch path too; full-way
    walls stay on the in-kernel dry mask (no patches at all)."""
    from sailfish_tpu.node_type import NTFullBBWall, NTHalfBBWall
    cls = NTHalfBBWall if wall == 'bbl' else NTFullBBWall
    rp, vx_p, vy_p, rho_p = _run_yrow_channel(cls, 'pallas')
    assert rp.engine == 'pallas'
    if wall == 'bbl':
        assert rp._pallas.patch_yrows == (0, 15)
    else:
        assert rp._pallas.patch_yrows == () and rp._pallas.has_mask
    _, vx_x, vy_x, rho_x = _run_yrow_channel(cls, 'xla')
    assert np.max(np.abs(vx_p - vx_x)) < 2e-6
    assert np.max(np.abs(vy_p - vy_x)) < 2e-6
    assert np.max(np.abs(rho_p - rho_x)) < 2e-6


def test_sharded_pallas3d_yrow_channel_zmesh():
    """The turbulence-channel layout (complex-BC walls normal to y)
    runs FUSED on a z-sharded mesh: the wall rows are local to every
    shard, the global y-row recompute runs in GSPMD-land, and each
    shard's kernel selects its slice of the rows (round-4 gap: sharding
    the channel silently fell back to the ~10x-slower XLA engine)."""
    from sailfish_tpu.node_type import NTWallTMS
    from sailfish_tpu.parallel.halo import ShardedPallasStep3D
    rp, vx_1, vy_1, rho_1 = _run_yrow_channel(NTWallTMS, 'pallas')
    rs, vx_s, vy_s, rho_s = _run_yrow_channel(NTWallTMS, 'pallas',
                                              mesh='4')
    assert rs.engine == 'pallas'
    assert isinstance(rs._pallas, ShardedPallasStep3D)
    assert rs._pallas.patch_yrows == (0, 15)
    assert rs._pallas.patch_rows == [] and not rs._pallas.has_patches
    # sharded vs single-device fused: identical math modulo XLA's
    # context-dependent FMA contraction inside shard_map (CLAUDE.md)
    assert np.max(np.abs(vx_s - vx_1)) < 1e-6
    assert np.max(np.abs(vy_s - vy_1)) < 1e-6
    assert np.max(np.abs(rho_s - rho_1)) < 1e-6
    _, vx_x, vy_x, rho_x = _run_yrow_channel(NTWallTMS, 'xla')
    assert np.max(np.abs(vx_s - vx_x)) < 2e-6
    assert np.max(np.abs(rho_s - rho_x)) < 2e-6


@pytest.mark.slow
def test_sharded_pallas2d_x_sharded_lid():
    """Complex-BC (velocity lid) scenes on x-sharded 2D meshes: the
    dynamic patch planes are computed on the GLOBAL pre-step array
    outside shard_map (GSPMD resolves the windows' cross-seam
    samples) and arrive x-sharded. LDC on 2x2 and the x-heavy 1x4
    vs the XLA engine."""
    from ldc_2d import LDCSim
    from sailfish_tpu.controller import LBSimulationController

    def run(sim_cls, mesh, engine, **cfg):
        ctrl = LBSimulationController(sim_cls, default_config=dict(
            quiet=True, mesh=mesh, engine=engine, **cfg))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx), np.array(r.sim.rho)

    cfg = dict(lat_nx=256, lat_ny=128, max_iters=20, every=20)
    _, vx_ref, rho_ref = run(LDCSim, '', 'xla', **cfg)
    for mesh in ('2x2', '1x4'):
        engine, vx, rho = run(LDCSim, mesh, 'pallas', **cfg)
        assert engine == 'pallas'
        assert np.max(np.abs(vx - vx_ref)) < 1e-6, mesh
        assert np.max(np.abs(rho - rho_ref)) < 1e-5, mesh
