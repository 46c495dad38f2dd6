"""Binary/ternary fluid model tests (counterparts of the reference's
examples/binary_fluid/ scenes and regtest coverage)."""
import numpy as np

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.binary import LBBinaryFluidFreeEnergy, \
    LBBinaryFluidShanChen
from sailfish_tpu.models.ternary import LBTernaryFluidShanChen
from sailfish_tpu.subdomain import Subdomain2D


class _NoBC(Subdomain2D):
    def boundary_conditions(self, hx, hy):
        pass


def test_binary_shan_chen_demixing():
    """Two components with repulsive cross-coupling demix
    (examples/binary_fluid/sc_separation_2d.py: G12=1.2, visc=1/6)."""
    N = 64

    class Sep(_NoBC):
        def initial_conditions(self, sim, hx, hy):
            rng = np.random.RandomState(7)
            sim.rho[:] = 1.0 + rng.rand(*sim.rho.shape) / 1000.0
            sim.phi[:] = 1.0 + rng.rand(*sim.phi.shape) / 1000.0

    class Sim(LBBinaryFluidShanChen):
        subdomain = Sep

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=N, lat_ny=N, grid='D2Q9', G12=1.2, visc=1.0 / 6.0,
        periodic_x=True, periodic_y=True, max_iters=1000, every=1000,
        quiet=True))
    ctrl.run(ignore_cmdline=True)
    ctrl._runner._fields_to_host()
    rho = ctrl._runner.sim.rho
    phi = ctrl._runner.sim.phi
    assert np.all(np.isfinite(rho)) and np.all(np.isfinite(phi))
    # demixing: both fields develop strong contrast and anticorrelate
    assert rho.max() - rho.min() > 0.5
    corr = np.corrcoef(rho.ravel(), phi.ravel())[0, 1]
    assert corr < -0.9, corr
    # per-component mass conservation
    assert abs(rho.mean() - 1.0005) < 0.01
    assert abs(phi.mean() - 1.0005) < 0.01


def test_free_energy_separation():
    """FE binary mixture separates; phi approaches +/-1 minima
    (examples/binary_fluid/fe_separation_2d.py parameters)."""
    N = 64

    class Sep(_NoBC):
        def initial_conditions(self, sim, hx, hy):
            rng = np.random.RandomState(11)
            sim.rho[:] = 1.0
            sim.phi[:] = 0.1 * (rng.rand(*sim.phi.shape) - 0.5)

    class Sim(LBBinaryFluidFreeEnergy):
        subdomain = Sep

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=N, lat_ny=N, grid='D2Q9', kappa=0.04, Gamma=1.0, A=0.04,
        tau_a=1.0, tau_b=0.8, tau_phi=1.0, periodic_x=True,
        periodic_y=True, max_iters=2500, every=2500, quiet=True))
    ctrl.run(ignore_cmdline=True)
    ctrl._runner._fields_to_host()
    phi = ctrl._runner.sim.phi
    rho = ctrl._runner.sim.rho
    assert np.all(np.isfinite(phi))
    # domains form: phi reaches a substantial fraction of the +/-1 minima
    assert phi.max() > 0.5 and phi.min() < -0.5, (phi.min(), phi.max())
    # total density stays near 1
    assert abs(rho.mean() - 1.0) < 1e-3


def test_ternary_shan_chen():
    """Three components with pairwise repulsion stay finite and conserve
    mass (examples/ternary_fluid/sc_drop_2d.py family)."""
    N = 48

    class Tern(_NoBC):
        def initial_conditions(self, sim, hx, hy):
            rng = np.random.RandomState(3)
            sim.rho[:] = 1.0 + rng.rand(N, N) / 1000.0
            sim.phi[:] = 1.0 + rng.rand(N, N) / 1000.0
            sim.theta[:] = 1.0 + rng.rand(N, N) / 1000.0

    class Sim(LBTernaryFluidShanChen):
        subdomain = Tern

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=N, lat_ny=N, grid='D2Q9', G12=1.0, G13=1.0, G23=1.0,
        visc=1.0 / 6.0, periodic_x=True, periodic_y=True,
        max_iters=500, every=500, quiet=True))
    ctrl.run(ignore_cmdline=True)
    ctrl._runner._fields_to_host()
    sim = ctrl._runner.sim
    for fld in (sim.rho, sim.phi, sim.theta):
        assert np.all(np.isfinite(fld))
        assert abs(fld.mean() - 1.0005) < 0.01
    assert sim.rho.max() - sim.rho.min() > 0.2


def _run_fe_separation(model, tau_a, tau_b, iters=60, N=48):
    class Sep(_NoBC):
        def initial_conditions(self, sim, hx, hy):
            rng = np.random.RandomState(11)
            sim.rho[:] = 1.0
            sim.phi[:] = 0.1 * (rng.rand(*sim.phi.shape) - 0.5)

    class Sim(LBBinaryFluidFreeEnergy):
        subdomain = Sep

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=N, lat_ny=N, grid='D2Q9', kappa=0.04, Gamma=1.0, A=0.04,
        tau_a=tau_a, tau_b=tau_b, tau_phi=1.0, model=model,
        periodic_x=True, periodic_y=True, max_iters=iters, every=iters,
        quiet=True))
    ctrl.run(ignore_cmdline=True)
    ctrl._runner._fields_to_host()
    return ctrl._runner.sim


def test_fe_mrt_reduces_to_bgk_at_tau_one():
    """With tau_a = tau_b = 1 every FE-MRT moment rate equals 1, so the
    operator must reproduce BGK(tau=1) to fp32 roundoff (reference
    free_energy_mrt_matrix, sym.py:450: rates are {0, 1, 1/tau0})."""
    bgk = _run_fe_separation('bgk', 1.0, 1.0)
    mrt = _run_fe_separation('mrt', 1.0, 1.0)
    assert np.max(np.abs(bgk.phi - mrt.phi)) < 1e-5
    assert np.max(np.abs(bgk.rho - mrt.rho)) < 1e-5


def test_fe_mrt_differs_from_bgk_off_tau_one():
    """Sanity: at tau != 1 the ghost-mode rates differ (1 vs 1/tau), so
    one collision on a strongly non-equilibrium state must differ, while
    conserving rho and phi identically."""
    import jax.numpy as jnp
    from sailfish_tpu import equilibrium as eqm
    from sailfish_tpu import lattice
    from sailfish_tpu.ops.multigrid import FreeEnergyStepBuilder
    from sailfish_tpu.subdomain import Subdomain2D as SD

    from sailfish_tpu.subdomain import SubdomainSpec2D

    class Empty(_NoBC):
        def initial_conditions(self, sim, hx, hy):
            pass

    class Cfg:
        periodic_x = True
        periodic_y = True

    grid = lattice.get_grid('D2Q9')
    dom = Empty((16, 16), SubdomainSpec2D((0, 0), (16, 16)), grid, Cfg())
    dom.reset()

    rng = np.random.RandomState(5)
    f0 = jnp.asarray(1.0 / grid.Q + 0.05 * rng.rand(grid.Q, 16, 16),
                     dtype=jnp.float32)
    f1 = jnp.asarray(0.02 * rng.rand(grid.Q, 16, 16) - 0.01,
                     dtype=jnp.float32)

    outs = {}
    for model in ('bgk', 'mrt'):
        b = FreeEnergyStepBuilder(
            grid, dom.maps, tau_a=0.7, tau_b=0.7, tau_phi=1.0,
            A=0.04, kappa=0.04, Gamma=1.0, model=model,
            dtype=jnp.float32)
        outs[model] = b.build()((f0, f1))
    d0 = np.max(np.abs(np.asarray(outs['bgk'][0])
                       - np.asarray(outs['mrt'][0])))
    assert d0 > 1e-5, d0
    # conserved moments are untouched by the rate change
    for k in range(2):
        rb = np.asarray(eqm.density(grid, outs['bgk'][k]))
        rm = np.asarray(eqm.density(grid, outs['mrt'][k]))
        assert np.max(np.abs(rb - rm)) < 1e-5


def test_fe_mrt_poiseuille_profile():
    """Force-driven FE-MRT Poiseuille at uniform phi=+1 must match the
    analytic parabola with nu = (tau_a - 1/2)/3 (exercises the
    moment-space (I - S/2) Guo forcing)."""
    from sailfish_tpu.models.base import LBForcedSim
    from sailfish_tpu.node_type import NTFullBBWall
    NY, NX = 32, 16
    F = 1e-6

    class Chan(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            self.set_node((hy == 0) | (hy == self.gy - 1), NTFullBBWall)

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0
            sim.phi[:] = 1.0

    class Sim(LBBinaryFluidFreeEnergy, LBForcedSim):
        subdomain = Chan

        def __init__(self, config):
            super().__init__(config)
            self.add_body_force((F, 0.0))

    tau_a = 0.8
    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=NX, lat_ny=NY, grid='D2Q9', kappa=0.04, Gamma=1.0,
        A=0.04, tau_a=tau_a, tau_b=tau_a, tau_phi=1.0, model='mrt',
        periodic_x=True, max_iters=6000, every=6000, quiet=True))
    ctrl.run(ignore_cmdline=True)
    ctrl._runner._fields_to_host()
    sim = ctrl._runner.sim
    nu = (tau_a - 0.5) / 3.0
    y = np.arange(NY, dtype=np.float64)
    # full-way bounce-back: no-slip planes half a cell beyond the last
    # fluid row
    ref = (F / (2.0 * nu)) * (y - 0.5) * (NY - 1.5 - y)
    prof = sim.vx[:, NX // 2]
    m = ref > 0
    err = np.max(np.abs(prof[m] - ref[m])) / ref.max()
    assert err < 0.02, err
