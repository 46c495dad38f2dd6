"""2D fused-kernel equivalence vs the XLA engine (interpret mode)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, 'examples')


def _run(sim_cls, engine, **cfg):
    from sailfish_tpu.controller import LBSimulationController
    ctrl = LBSimulationController(sim_cls, default_config=dict(
        quiet=True, engine=engine, **cfg))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    r._fields_to_host()
    return r.engine, np.array(r.sim.rho), np.array(r.sim.vx)


def test_pallas2d_matches_xla_periodic():
    from taylor_green_2d import TaylorGreenSim
    cfg = dict(lat_nx=128, lat_ny=128, max_iters=30, every=30, visc=0.01)
    _, rho_a, vx_a = _run(TaylorGreenSim, 'xla', **cfg)
    engine, rho_b, vx_b = _run(TaylorGreenSim, 'pallas', **cfg)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 1e-5
    assert np.max(np.abs(vx_a - vx_b)) < 1e-6


def test_pallas2d_matches_xla_ldc():
    """Walls (in-kernel mask) + lid (patched y-block)."""
    from ldc_2d import LDCSim
    cfg = dict(lat_nx=128, lat_ny=128, max_iters=25, every=25)
    _, rho_a, vx_a = _run(LDCSim, 'xla', **cfg)
    engine, rho_b, vx_b = _run(LDCSim, 'pallas', **cfg)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 1e-5
    assert np.max(np.abs(vx_a - vx_b)) < 1e-6


def test_pallas2d_small_domain_falls_back():
    """Fewer than 4 y-blocks -> auto falls back to XLA."""
    from taylor_green_2d import TaylorGreenSim
    from sailfish_tpu.controller import LBSimulationController
    ctrl = LBSimulationController(TaylorGreenSim, default_config=dict(
        lat_nx=16, lat_ny=16, max_iters=5, every=5, quiet=True,
        engine='pallas'))
    with pytest.raises(NotImplementedError):
        ctrl.run(ignore_cmdline=True)

def test_pallas2d_space_dependent_dynamic_matches_xla():
    """Space-dependent DynamicValue BCs must receive GLOBAL coordinates in
    the fused engine's boundary patches (window sub-builders previously
    rebuilt window-local index grids, producing NaN lids)."""
    import jax.numpy as jnp
    from sailfish_tpu.models.single import LBFluidSim
    from sailfish_tpu.node_type import DynamicValue, \
        NTEquilibriumVelocity, NTFullBBWall
    from sailfish_tpu.subdomain import Subdomain2D

    N = 128

    class Cav(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            wall = (hx == 0) | (hx == self.gx - 1) | (hy == 0)
            prof = DynamicValue(
                lambda t, hx, hy: 0.1 * (hx / N) * (1.0 - hx / N) * 4.0,
                0.0)
            self.set_node((hy == self.gy - 1) & ~wall,
                          NTEquilibriumVelocity(prof))
            self.set_node(wall, NTFullBBWall)

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0

    class Sim(LBFluidSim):
        subdomain = Cav

    cfg = dict(lat_nx=N, lat_ny=N, max_iters=25, every=25, visc=0.05)
    _, rho_a, vx_a = _run(Sim, 'xla', **cfg)
    engine, rho_b, vx_b = _run(Sim, 'pallas', **cfg)
    assert engine == 'pallas'
    assert np.all(np.isfinite(vx_b))
    assert np.max(np.abs(rho_a - rho_b)) < 1e-5
    assert np.max(np.abs(vx_a - vx_b)) < 1e-6
    # the lid actually carries the parabolic profile
    assert vx_b[-1, N // 2] > vx_b[-1, 3] > 0


@pytest.mark.slow
def test_pallas2d_mrt_matches_xla():
    """Parity-split MRT in the fused kernel vs the dense moment-space
    XLA reference."""
    from ldc_2d import LDCSim
    cfg = dict(lat_nx=128, lat_ny=128, max_iters=20, every=20,
               model='mrt')
    _, rho_a, vx_a = _run(LDCSim, 'xla', **cfg)
    engine, rho_b, vx_b = _run(LDCSim, 'pallas', **cfg)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 2e-6
    assert np.max(np.abs(vx_a - vx_b)) < 1e-6


def test_pallas2d_shan_chen_matches_xla():
    """Single-component Shan-Chen on the fused path (in-kernel psi
    forcing + rho pre-pass kernel) vs the XLA engine."""
    np.random.seed(42)
    from sc_phase_separation import SCSim
    cfg = dict(lat_nx=128, lat_ny=128, max_iters=25, every=25)
    _, rho_a, _ = _run(SCSim, 'xla', **cfg)
    np.random.seed(42)
    engine, rho_b, _ = _run(SCSim, 'pallas', **cfg)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 2e-6


@pytest.mark.parametrize('bc_pair', ['equilibrium', 'zouhe',
                                     'regularized'])
@pytest.mark.slow
def test_pallas2d_native_bc_blocks_match_xla(bc_pair):
    """2D native in-kernel BC blocks (velocity inlet y=0, density
    outlet y=Y-1) vs the XLA engine."""
    from sailfish_tpu.models.single import LBFluidSim
    from sailfish_tpu.node_type import (
        NTEquilibriumDensity, NTEquilibriumVelocity, NTFullBBWall,
        NTRegularizedDensity, NTRegularizedVelocity, NTZouHeDensity,
        NTZouHeVelocity)
    from sailfish_tpu.subdomain import Subdomain2D

    vel_cls, den_cls = {
        'equilibrium': (NTEquilibriumVelocity, NTEquilibriumDensity),
        'zouhe': (NTZouHeVelocity, NTZouHeDensity),
        'regularized': (NTRegularizedVelocity, NTRegularizedDensity),
    }[bc_pair]

    class Chan(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            walls = (hx == 0) | (hx == self.gx - 1)
            self.set_node(walls, NTFullBBWall)
            self.set_node((hy == 0) & ~walls, vel_cls((0.0, 0.03)))
            self.set_node((hy == self.gy - 1) & ~walls, den_cls(1.0))

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0
            sim.vy[:] = 0.01

    class Sim(LBFluidSim):
        subdomain = Chan

    from sailfish_tpu.controller import LBSimulationController

    def run(engine):
        ctrl = LBSimulationController(Sim, default_config=dict(
            lat_nx=64, lat_ny=64, max_iters=20, every=20, quiet=True,
            engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r, np.array(r.sim.rho), np.array(r.sim.vy)

    _, rho_a, vy_a = run('xla')
    rp, rho_b, vy_b = run('pallas')
    assert rp.engine == 'pallas'
    # uniform-parameter native BCs run IN-KERNEL (mask-code windows),
    # not through the patch prologue or the XLA window machinery
    assert rp._pallas.bc_blocks == ()
    assert len(rp._pallas.kbc) == 2
    assert rp._pallas.xla_patch_blocks == []
    assert np.max(np.abs(rho_a - rho_b)) < 2e-6
    assert np.max(np.abs(vy_a - vy_b)) < 2e-6


@pytest.mark.parametrize('bc_pair', ['equilibrium', 'zouhe',
                                     'regularized'])
@pytest.mark.slow
def test_pallas2d_xnormal_bc_cols_match_xla(bc_pair):
    """2D BC COLUMNS normal to x run fused through the in-kernel
    native-BC windows. Previously an x-normal column put a node in
    every y-block, forcing a full-domain prologue; now it costs one
    128-lane window per block. Velocity inlet x=0, density outlet
    x=X-1, bounce-back walls normal to y (the reference's 2D duct
    orientation, e.g. /root/reference/examples/poiseuille.py with
    horizontal flow)."""
    from sailfish_tpu.models.single import LBFluidSim
    from sailfish_tpu.node_type import (
        NTEquilibriumDensity, NTEquilibriumVelocity, NTFullBBWall,
        NTRegularizedDensity, NTRegularizedVelocity, NTZouHeDensity,
        NTZouHeVelocity)
    from sailfish_tpu.subdomain import Subdomain2D

    vel_cls, den_cls = {
        'equilibrium': (NTEquilibriumVelocity, NTEquilibriumDensity),
        'zouhe': (NTZouHeVelocity, NTZouHeDensity),
        'regularized': (NTRegularizedVelocity, NTRegularizedDensity),
    }[bc_pair]

    class Duct(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            walls = (hy == 0) | (hy == self.gy - 1)
            self.set_node(walls, NTFullBBWall)
            self.set_node((hx == 0) & ~walls, vel_cls((0.03, 0.0)))
            self.set_node((hx == self.gx - 1) & ~walls, den_cls(1.0))

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0
            sim.vx[:] = 0.01

    class Sim(LBFluidSim):
        subdomain = Duct

    from sailfish_tpu.controller import LBSimulationController

    def run(engine):
        ctrl = LBSimulationController(Sim, default_config=dict(
            lat_nx=256, lat_ny=64, max_iters=20, every=20, quiet=True,
            engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r, np.array(r.sim.rho), np.array(r.sim.vx)

    _, rho_a, vx_a = run('xla')
    rp, rho_b, vx_b = run('pallas')
    assert rp.engine == 'pallas'
    assert rp._pallas.bc_blocks == ()
    assert rp._pallas.patch_blocks == []
    assert len(rp._pallas.kbc) == 2
    # the windows cover single lane tiles, not whole rows
    for _c, _t, _o, _r, _v, blocks, (x0, x1) in rp._pallas.kbc:
        assert x1 - x0 <= 128
        assert len(blocks) == 64 // rp._pallas.by
    assert np.max(np.abs(rho_a - rho_b)) < 2e-6
    assert np.max(np.abs(vx_a - vx_b)) < 2e-6


@pytest.mark.slow
def test_pallas2d_elbm_matches_xla():
    """Entropic collision (product feq + series/Newton alpha) through
    the fused kernel, incl. the lid patch block (ELBM keeps the exact
    XLA prologue: the alpha gate would amplify the native prologue's
    summation-tree ulps)."""
    from ldc_2d_entropic import EntropicLDCSim
    cfg = dict(lat_nx=128, lat_ny=128, max_iters=25, every=25)
    _, rho_a, vx_a = _run(EntropicLDCSim, 'xla', **cfg)
    engine, rho_b, vx_b = _run(EntropicLDCSim, 'pallas', **cfg)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 1e-5
    assert np.max(np.abs(vx_a - vx_b)) < 1e-6


def test_pallas2d_lane_tiling_gate():
    """On real TPU (interpret=False) the fused 2D kernel refuses
    domains whose X is not lane-aligned (Mosaic rejects partial-tile
    plane DMAs at compile time); the auto engine then falls back to
    XLA instead of failing a remote compile."""
    from sailfish_tpu import lattice
    from sailfish_tpu.ops.pallas_step2d import PallasStep2D
    from sailfish_tpu.ops.step import StepBuilder
    from sailfish_tpu.subdomain import NodeMaps

    b = StepBuilder(lattice.D2Q9, NodeMaps((64, 64), 2), visc=0.1)
    with pytest.raises(NotImplementedError, match='X % 128'):
        PallasStep2D(b, (64, 64), interpret=False)
    # lane-aligned X passes the gate (construction only; no compile)
    b2 = StepBuilder(lattice.D2Q9, NodeMaps((64, 128), 2), visc=0.1)
    PallasStep2D(b2, (64, 128), interpret=False)
