"""Physics tests for the model catalog: MRT, ELBM, LES, Shan-Chen,
shallow water (counterparts of regtest/sc_phase_sep.py and the reference's
model examples)."""
import numpy as np
import pytest

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.single import LBEntropicFluidSim, LBFluidSim, \
    LBFreeSurface, LBSingleFluidShanChen
from sailfish_tpu.subdomain import Subdomain2D


def _shear_decay_sim(model, N=32, visc=0.05, u0=0.01, iters=400, **extra):
    class SW(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            pass

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0
            sim.vx[:] = u0 * np.sin(2 * np.pi * hy / N)

    class Sim(LBFluidSim):
        subdomain = SW

    cfg = dict(lat_nx=N, lat_ny=N, visc=visc, max_iters=iters, every=iters,
               quiet=True, periodic_x=True, periodic_y=True, model=model)
    cfg.update(extra)
    ctrl = LBSimulationController(Sim, default_config=cfg)
    ctrl.run(ignore_cmdline=True)
    ctrl._runner._fields_to_host()
    vx = ctrl._runner.sim.vx
    k = 2 * np.pi / N
    amp = abs(np.fft.rfft(vx[:, 0])[1]) * 2 / N
    return -np.log(amp / u0) / (k * k * iters)


@pytest.mark.parametrize('model', ['bgk', 'mrt', 'trt', 'elbm'])
def test_viscosity_all_models(model):
    nu = _shear_decay_sim(model)
    assert abs(nu - 0.05) / 0.05 < 0.02, (model, nu)


def test_les_smagorinsky_increases_dissipation():
    nu_plain = _shear_decay_sim('bgk', u0=0.05)
    nu_les = _shear_decay_sim('bgk', u0=0.05,
                              subgrid='les-smagorinsky',
                              smagorinsky_const=0.1)
    assert nu_les > nu_plain


def test_shan_chen_phase_separation():
    """Classic-potential Shan-Chen with supercritical coupling separates a
    perturbed uniform fluid into two phases (analog of
    regtest/sc_phase_sep.py)."""
    N = 64

    class SC(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            pass

        def initial_conditions(self, sim, hx, hy):
            rng = np.random.RandomState(42)
            sim.rho[:] = 0.693 + 0.05 * rng.rand(*sim.rho.shape)

    class Sim(LBSingleFluidShanChen):
        subdomain = SC

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=N, lat_ny=N, visc=1.0 / 6.0, max_iters=1500, every=1500,
        quiet=True, periodic_x=True, periodic_y=True, G=-5.0,
        sc_potential='classic'))
    ctrl.run(ignore_cmdline=True)
    ctrl._runner._fields_to_host()
    rho = ctrl._runner.sim.rho
    assert np.all(np.isfinite(rho))
    # phase separation: bimodal density far beyond initial perturbation
    assert rho.max() / rho.min() > 2.0, (rho.min(), rho.max())
    # mass conservation
    assert abs(rho.mean() - 0.718) < 0.02


def test_shallow_water_gravity_wave():
    """Free-surface model: a height bump spreads as a gravity wave at
    c = sqrt(g h) while conserving mass."""
    N = 64
    g0 = 0.01

    class Dam(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            pass

        def initial_conditions(self, sim, hx, hy):
            r2 = (hx - N / 2) ** 2 + (hy - N / 2) ** 2
            sim.rho[:] = 1.0 + 0.1 * np.exp(-r2 / 20.0)

    class Sim(LBFreeSurface):
        subdomain = Dam

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=N, lat_ny=N, visc=0.05, max_iters=200, every=200,
        quiet=True, periodic_x=True, periodic_y=True, gravity=g0))
    ctrl.run(ignore_cmdline=True)
    ctrl._runner._fields_to_host()
    h = ctrl._runner.sim.rho
    assert np.all(np.isfinite(h))
    mass0 = N * N * 1.0 + 0.1 * 20.0 * np.pi  # approx
    assert abs(h.sum() - mass0) / mass0 < 0.01
    # the bump has collapsed and radiated
    assert h[N // 2, N // 2] < 1.06


def test_entropic_sim_class():
    nu = _shear_decay_sim('bgk')  # baseline for comparison

    class SW(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            pass

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0
            sim.vx[:] = 0.01 * np.sin(2 * np.pi * hy / 32)

    class Sim(LBEntropicFluidSim):
        subdomain = SW

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=32, lat_ny=32, visc=0.05, max_iters=100, every=100,
        quiet=True, periodic_x=True, periodic_y=True))
    ctrl.run(ignore_cmdline=True)
    assert ctrl.config.model == 'elbm'
    ctrl._runner._fields_to_host()
    assert np.all(np.isfinite(ctrl._runner.sim.vx))
