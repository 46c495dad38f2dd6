"""Stats mixins + entropic alpha output (regression for the mixin-hook
MRO shadowing bug found in verification)."""
import numpy as np

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.single import LBEntropicFluidSim, LBFluidSim
from sailfish_tpu.stats import KineticEnergyEnstrophyMixIn
from sailfish_tpu.subdomain import Subdomain2D


class _TGV(Subdomain2D):
    max_v = 0.02

    def boundary_conditions(self, hx, hy):
        pass

    def initial_conditions(self, sim, hx, hy):
        k = 2 * np.pi / self.gx
        sim.rho[:] = 1.0
        sim.vx[:] = -self.max_v * np.cos(k * hx) * np.sin(k * hy)
        sim.vy[:] = self.max_v * np.sin(k * hx) * np.cos(k * hy)


def test_ke_enstrophy_mixin():
    class Sim(LBFluidSim, KineticEnergyEnstrophyMixIn):
        subdomain = _TGV

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=64, lat_ny=64, visc=0.01, max_iters=200, every=200,
        quiet=True, periodic_x=True, periodic_y=True))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    ke, ens = r.sim.compute_ke_enstrophy(r)
    # analytic per-node KE of the TGV: u0^2/2 * mean(cos^2 sin^2 ...) =
    # u0^2/4 at t=0, decayed by exp(-4 nu k^2 t)
    k = 2 * np.pi / 64
    expect = 0.02 ** 2 / 4.0 * np.exp(-4 * 0.01 * k * k * 200)
    assert abs(ke - expect) / expect < 0.02, (ke, expect)
    # enstrophy of TGV: k^2 * 2 * KE (vorticity = 2k * streamfunction...)
    assert ens > 0
    ratio = ens / (ke * 2 * k * k)
    assert 0.9 < ratio < 1.1, ratio


def test_entropic_alpha_output():
    class Sim(LBEntropicFluidSim):
        subdomain = _TGV

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=32, lat_ny=32, visc=0.02, max_iters=50, every=50,
        quiet=True, periodic_x=True, periodic_y=True))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    r._fields_to_host()
    alpha = r.sim.alpha
    assert np.all(np.isfinite(alpha))
    # smooth resolved flow: alpha close to 2 everywhere
    assert abs(alpha.mean() - 2.0) < 0.05
    assert 'alpha' in r.sim.host_fields()
