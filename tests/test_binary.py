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
