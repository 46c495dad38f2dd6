"""Generic reduction/slice framework (counterpart of the reference's
data_processing.mako kernel generator)."""
import numpy as np

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.data_processing import DataProcessingMixIn
from sailfish_tpu.models.single import LBFluidSim
from sailfish_tpu.subdomain import Subdomain2D


class _TGV(Subdomain2D):
    u0 = 0.03

    def boundary_conditions(self, hx, hy):
        pass

    def initial_conditions(self, sim, hx, hy):
        k = 2 * np.pi / self.gx
        sim.rho[:] = 1.0
        sim.vx[:] = -self.u0 * np.cos(k * hx) * np.sin(k * hy)
        sim.vy[:] = self.u0 * np.sin(k * hx) * np.cos(k * hy)


def _run(sim_cls, iters=40, N=32):
    ctrl = LBSimulationController(sim_cls, default_config=dict(
        lat_nx=N, lat_ny=N, visc=0.02, max_iters=iters, every=iters,
        quiet=True, periodic_x=True, periodic_y=True))
    ctrl.run(ignore_cmdline=True)
    return ctrl._runner


def test_reductions_match_numpy():
    class Sim(LBFluidSim, DataProcessingMixIn):
        subdomain = _TGV

        def before_main_loop(self, runner):
            self.add_reduction(runner, 'mass', ['rho'])
            self.add_reduction(runner, 'ke_profile', ['usq'],
                               axis='y', op='mean')
            self.add_reduction(runner, 'uv_corr', ['vx', 'vy'],
                               stats=[[(0, 1), (1, 1)], [(0, 2)]])
            self.add_slice(runner, 'rho_row', 'y', 7,
                           fields=('rho', 'vx'))

    r = _run(Sim)
    sim = r.sim
    r._fields_to_host()
    rho, vx, vy = sim.rho, sim.vx, sim.vy

    mass = sim.compute_reduction(r, 'mass')
    np.testing.assert_allclose(mass[0], rho.sum(), rtol=1e-6)

    prof = sim.compute_reduction(r, 'ke_profile')
    np.testing.assert_allclose(prof[0], (vx**2 + vy**2).mean(axis=0),
                               rtol=1e-4, atol=1e-12)

    corr = sim.compute_reduction(r, 'uv_corr')
    # f32 accumulation under default x64-off jax vs f64 numpy
    np.testing.assert_allclose(corr[0], (vx * vy).sum(),
                               rtol=1e-3, atol=1e-12)
    np.testing.assert_allclose(corr[1], (vx**2).sum(), rtol=1e-4)

    sl = sim.compute_slice(r, 'rho_row')
    np.testing.assert_allclose(sl[0], rho[7], rtol=1e-6)
    np.testing.assert_allclose(sl[1], vx[7], rtol=1e-6, atol=1e-12)


def test_reduction_time_series_on_device():
    class Sim(LBFluidSim, DataProcessingMixIn):
        subdomain = _TGV

        def before_main_loop(self, runner):
            self.add_reduction(runner, 'ke', ['usq'], op='sum',
                               every=10)

    r = _run(Sim, iters=50)
    series = r.sim.reduction_series('ke')
    assert series.shape[0] == 5       # samples at iters 10..50
    ke = series[:, 0]
    assert np.all(ke > 0)
    # TGV kinetic energy decays monotonically
    assert np.all(np.diff(ke) < 0), ke
