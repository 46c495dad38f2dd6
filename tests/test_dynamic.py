"""Time-dependent BC parameters (DynamicValue / time series; counterpart
of reference node_type.py:471-626 sympy machinery)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.single import LBFluidSim
from sailfish_tpu.node_type import DynamicValue, \
    LinearlyInterpolatedTimeSeries, NTEquilibriumVelocity, NTFullBBWall
from sailfish_tpu.subdomain import Subdomain2D


def _pulsed_cavity(value_source, iters, **extra_cfg):
    N = 32

    class Cav(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            wall = (hx == 0) | (hx == self.gx - 1) | (hy == 0)
            self.set_node((hy == self.gy - 1) & ~wall,
                          NTEquilibriumVelocity(value_source))
            self.set_node(wall, NTFullBBWall)

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0

    class Sim(LBFluidSim):
        subdomain = Cav

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=N, lat_ny=N, visc=0.1, max_iters=iters, every=iters // 4,
        quiet=True, **extra_cfg))
    runner_lid = []

    orig = Sim.after_step

    def record(self, runner):
        runner._fields_to_host()
        runner_lid.append(float(runner.sim.vx[-1, N // 2]))
    Sim.after_step = record

    ctrl.run(ignore_cmdline=True)
    Sim.after_step = orig
    return np.array(runner_lid)


def test_dynamic_velocity_oscillates():
    om = 2 * np.pi / 200.0
    lid = _pulsed_cavity(DynamicValue(
        lambda t: 0.05 * jnp.sin(om * t), 0.0), 200)
    assert np.all(np.isfinite(lid))
    # lid velocity follows the prescribed oscillation: sign changes occur
    assert lid.max() > 0.01 and lid.min() < -0.01, lid


def test_time_series_param():
    series = LinearlyInterpolatedTimeSeries([0.0, 0.05, 0.0, -0.05],
                                            step_size=25)
    lid = _pulsed_cavity(DynamicValue(series.exprs[0], 0.0), 100)
    assert np.all(np.isfinite(lid))
    assert lid.max() > 0.01


def test_space_dependent_dynamic():
    """fn(t, hx, hy): parabolic lid profile."""
    N = 32

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

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=N, lat_ny=N, visc=0.1, max_iters=100, every=100,
        quiet=True))
    ctrl.run(ignore_cmdline=True)
    ctrl._runner._fields_to_host()
    vx = ctrl._runner.sim.vx
    # parabolic profile visible at the lid: center faster than edges
    assert vx[-1, N // 2] > vx[-1, 3] > 0
    assert vx[-1, N // 2] == pytest.approx(0.1, rel=0.1)


def test_dt_per_lattice_time_unit_scales_t():
    """--dt_per_lattice_time_unit: DynamicValue callables see physical
    time t = iteration * dt (reference lb_base.py:55-57,
    boundary.mako:80-83). Halving dt while doubling the callable's
    frequency must reproduce the baseline flow bitwise."""
    om = 2 * np.pi / 100.0
    base = _pulsed_cavity(DynamicValue(
        lambda t: 0.05 * jnp.sin(om * t), 0.0), 100)
    scaled = _pulsed_cavity(DynamicValue(
        lambda t: 0.05 * jnp.sin(2.0 * om * t), 0.0), 100,
        dt_per_lattice_time_unit=0.5)
    assert np.array_equal(base, scaled), (base, scaled)
    # and the flag actually changes the flow when the callable is fixed
    other = _pulsed_cavity(DynamicValue(
        lambda t: 0.05 * jnp.sin(2.0 * om * t), 0.0), 100)
    assert not np.allclose(base, other)


def test_spatial_array_matches_equation():
    """SpatialArray * time-ramp gives the same flow as the equivalent
    inline callable (reference SpatialArray, node_type.py:627)."""
    import sys
    sys.path.insert(0, 'examples')
    from poiseuille_sa import RampedPoiseuilleSim

    def run(mode):
        ctrl = LBSimulationController(RampedPoiseuilleSim,
                                      default_config=dict(
            lat_nx=48, lat_ny=32, visc=0.1, max_iters=300, every=300,
            quiet=True, velocity=mode))
        ctrl.run(ignore_cmdline=True)
        ctrl._runner._fields_to_host()
        return np.array(ctrl._runner.sim.vx)

    vx_eq = run('equation')
    vx_sa = run('spatial_array')
    assert np.all(np.isfinite(vx_sa))
    assert vx_sa.max() > 1e-4          # the ramp has begun
    # the SpatialArray profile is precomputed in f64, the inline
    # expression evaluates in f32 -- identical physics, fp-order noise
    np.testing.assert_allclose(vx_sa, vx_eq, rtol=2e-3, atol=5e-6)
