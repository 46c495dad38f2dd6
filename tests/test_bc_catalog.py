"""Coverage of the full BC catalog (counterpart of reference
tests/node_type.py + boundary physics checks)."""
import numpy as np
import pytest

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.base import LBForcedSim
from sailfish_tpu.models.single import LBFluidSim
from sailfish_tpu import node_type as nt
from sailfish_tpu.subdomain import Subdomain2D


def _channel(wall_cls, outflow_cls=None, N=32, iters=2000, **extra):
    """Body-force channel along x with the given wall type; optionally an
    outflow BC at x = gx-1 (then inflow via NTEquilibriumVelocity)."""

    class Chan(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            self.set_node((hy == 0) | (hy == self.gy - 1), wall_cls)
            if outflow_cls is not None:
                not_wall = (hy > 0) & (hy < self.gy - 1)
                self.set_node((hx == 0) & not_wall,
                              nt.NTEquilibriumVelocity((0.02, 0.0)))
                if outflow_cls in (nt.NTGradFreeflow,):
                    self.set_node((hx == self.gx - 1) & not_wall,
                                  outflow_cls())
                else:
                    self.set_node((hx == self.gx - 1) & not_wall,
                                  outflow_cls())

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0

    class Sim(LBFluidSim, LBForcedSim):
        subdomain = Chan

        def __init__(self, config):
            super().__init__(config)
            if outflow_cls is None:
                self.add_body_force((1e-5, 0.0))

    cfg = dict(lat_nx=N, lat_ny=N, visc=0.05, max_iters=iters,
               every=iters, quiet=True,
               periodic_x=outflow_cls is None)
    cfg.update(extra)
    ctrl = LBSimulationController(Sim, default_config=cfg)
    ctrl.run(ignore_cmdline=True)
    ctrl._runner._fields_to_host()
    return ctrl._runner.sim


def test_slip_wall_plug_flow():
    """Free-slip walls exert no drag: the forced channel approaches plug
    flow (flat profile) instead of a parabola."""
    sim = _channel(nt.NTSlip, iters=3000)
    prof = sim.vx[:, 16]
    interior = prof[1:-1]
    assert np.all(np.isfinite(prof))
    assert interior.mean() > 0.01
    # flat: wall-adjacent velocity within 5% of centerline
    assert interior[0] > 0.95 * interior[len(interior) // 2]


def test_noslip_vs_slip():
    no_slip = _channel(nt.NTFullBBWall, iters=3000)
    slip = _channel(nt.NTSlip, iters=3000)
    # same force, same time: slip channel carries much more flow
    assert slip.vx.mean() > 2.0 * no_slip.vx.mean()


@pytest.mark.parametrize('outflow', [nt.NTDoNothing, nt.NTCopy,
                                     nt.NTYuOutflow, nt.NTGradFreeflow,
                                     nt.NTNeumann])
def test_outflow_family(outflow):
    """Inflow + outflow channel: all outflow types sustain a finite
    through-flow. Free outflows (no density anchor) are run at gentle
    parameters -- with a fixed-velocity inlet and no pressure reference,
    the acoustic mode is only marginally damped (a property of the BC
    family, also noted for the reference's NTYuOutflow)."""
    sim = _channel(nt.NTFullBBWall, outflow, iters=800, visc=0.1)
    assert np.all(np.isfinite(sim.vx))
    mid = sim.vx[16, :]
    assert mid[1:-1].mean() > 0.004, (outflow.__name__, mid[1:-1].mean())
    # outflow column carries flow out
    assert mid[-1] > 0.002, outflow.__name__


def test_laminarize_damps_perturbations():
    N = 32

    class Lam(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            self.set_node(hx == self.gx - 1, nt.NTLaminarize(0.5))

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0
            sim.vx[:] = 0.05 + 0.02 * np.sin(2 * np.pi * hy / N)

    class Sim(LBFluidSim):
        subdomain = Lam

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=N, lat_ny=N, visc=0.05, max_iters=200, every=200,
        quiet=True, periodic_x=True, periodic_y=True))
    ctrl.run(ignore_cmdline=True)
    ctrl._runner._fields_to_host()
    vx = ctrl._runner.sim.vx
    assert np.all(np.isfinite(vx))
    # variance across the laminarization column is below the inlet column
    assert vx[:, -1].std() < vx[:, 4].std()


def test_zouhe_velocity_bc():
    """Zou-He lid cavity reaches the same flow as the regularized BC."""
    N = 32

    def cavity(vel_bc):
        class Cav(Subdomain2D):
            def boundary_conditions(self, hx, hy):
                wall = (hx == 0) | (hx == self.gx - 1) | (hy == 0)
                self.set_node((hy == self.gy - 1) & ~wall,
                              vel_bc((0.05, 0.0)))
                self.set_node(wall, nt.NTFullBBWall)

            def initial_conditions(self, sim, hx, hy):
                sim.rho[:] = 1.0

        class Sim(LBFluidSim):
            subdomain = Cav

        ctrl = LBSimulationController(Sim, default_config=dict(
            lat_nx=N, lat_ny=N, visc=0.1, max_iters=3000, every=3000,
            quiet=True))
        ctrl.run(ignore_cmdline=True)
        ctrl._runner._fields_to_host()
        return ctrl._runner.sim.vx

    vz = cavity(nt.NTZouHeVelocity)
    vr = cavity(nt.NTRegularizedVelocity)
    assert np.all(np.isfinite(vz))
    # compare away from the lid corners where the singular corner
    # treatment differs between the two BC families
    err = np.abs(vz[1:-6] - vr[1:-6]).max() / np.abs(vr).max()
    assert err < 0.05, err
