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


def test_init_iters_consistent_initialization():
    """--init_iters relaxes the density field against the IC velocity
    at nu=1/6 (iteration pinned to 0), then restarts from
    feq(rho_relaxed, u_IC): the initial pressure field differs from
    cold start, the velocity field does not, and the subsequent run
    stays finite (reference controller.py:312,
    subdomain_runner.py:1625-1652)."""

    class TG(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            pass

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0
            sim.vx[:] = 0.05 * np.sin(2 * np.pi * hy / 32) \
                * np.cos(2 * np.pi * hx / 32)
            sim.vy[:] = -0.05 * np.cos(2 * np.pi * hy / 32) \
                * np.sin(2 * np.pi * hx / 32)

    class Sim(LBFluidSim):
        subdomain = TG

    def run(**extra):
        cfg = dict(lat_nx=32, lat_ny=32, visc=0.05, max_iters=0,
                   every=0, quiet=True, periodic_x=True,
                   periodic_y=True)
        cfg.update(extra)
        ctrl = LBSimulationController(Sim, default_config=cfg)
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return (r, np.array(r.sim.rho), np.array(r.sim.vx),
                np.array(r.sim.vy))

    _, rho_cold, vx_cold, vy_cold = run()
    r, rho_init, vx_init, vy_init = run(init_iters=50)
    assert r.config.visc == 0.05          # restored after the warmup
    assert r.sim.iteration == 0
    # the pressure field relaxed to something non-uniform...
    assert np.max(np.abs(rho_init - rho_cold)) > 1e-7
    assert np.all(np.isfinite(rho_init))
    # ...while the velocity field stayed at the user ICs (the tiny
    # residual is the post-stream measurement mixing the now
    # non-uniform rho field into the moment, ~0.06% of |u|)
    assert np.max(np.abs(vx_init - vx_cold)) < 1e-4
    assert np.max(np.abs(vy_init - vy_cold)) < 1e-4
    # and the subsequent run is stable
    _, rho2, vx2, _ = run(init_iters=50, max_iters=20, every=20)
    assert np.all(np.isfinite(rho2)) and np.all(np.isfinite(vx2))


def test_elbm_tunables():
    """--entropy_tolerance / --alpha_tolerance change the Newton stops
    (reference lb_single.py:43-50): a sloppy entropy tolerance stops
    the solve earlier and yields measurably different alphas on
    strongly sheared nodes; --entropic_equilibrium swaps the BGK
    model's equilibrium for the product form."""
    import jax.numpy as jnp
    from sailfish_tpu import lattice
    from sailfish_tpu.ops import entropic

    grid = lattice.get_grid('D2Q9')
    rng = np.random.RandomState(0)
    rho = jnp.asarray(1.0 + 0.05 * rng.rand(64).astype(np.float32))
    u = jnp.asarray(0.08 * (rng.rand(2, 64) - 0.5).astype(np.float32))
    feq = entropic.elbm_equilibrium(grid, rho, u)
    # push deviations well into the Newton branch (dev > 0.01)
    fneq = jnp.asarray(0.2 * (rng.rand(9, 64) - 0.5).astype(np.float32)) \
        * feq
    f = feq - fneq
    a_tight = np.asarray(entropic.entropic_alpha(
        grid, f, fneq, entropy_tol=1e-10, alpha_tol=1e-14))
    a_loose = np.asarray(entropic.entropic_alpha(
        grid, f, fneq, entropy_tol=1e-2, alpha_tol=1e-2))
    assert np.all(np.isfinite(a_tight)) and np.all(np.isfinite(a_loose))
    assert np.max(np.abs(a_tight - a_loose)) > 1e-5, \
        'tolerances had no effect on the Newton solve'

    # flag plumbing: config -> StepBuilder
    class SW(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            pass

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0
            sim.vx[:] = 0.01 * np.sin(2 * np.pi * hy / 32)

    class Sim(LBFluidSim):
        subdomain = SW

    def run(**extra):
        ctrl = LBSimulationController(Sim, default_config=dict(
            lat_nx=32, lat_ny=32, visc=0.05, max_iters=20, every=20,
            quiet=True, periodic_x=True, periodic_y=True, **extra))
        ctrl.run(ignore_cmdline=True)
        ctrl._runner._fields_to_host()
        return ctrl._runner, np.array(ctrl._runner.sim.vx)

    r_e, vx_e = run(model='elbm', entropy_tolerance=1e-3,
                    alpha_tolerance=1e-4)
    assert r_e.builder.entropy_tolerance == 1e-3
    assert r_e.builder.alpha_tolerance == 1e-4
    r_d, _ = run(model='elbm')   # 0.0 -> precision default
    assert r_d.builder.entropy_tolerance == 1e-6

    # --entropic_equilibrium: product-form feq under BGK collision
    r_b, vx_b = run()
    r_p, vx_p = run(entropic_equilibrium=True)
    assert r_b.builder.equilibrium == 'bgk'
    assert r_p.builder.equilibrium == 'elbm'
    assert np.all(np.isfinite(vx_p))
    assert np.max(np.abs(vx_p - vx_b)) > 1e-9, \
        'product-form equilibrium had no effect'


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
