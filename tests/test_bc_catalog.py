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


def test_tms_wall_channel():
    """Tamm-Mott-Smith wall in a laminar forced channel: stable, carries
    flow, and stays close to the half-way bounce-back solution (the TMS
    target equals the BB state in fully-developed laminar flow)."""
    tms = _channel(nt.NTWallTMS, iters=3000)
    bb = _channel(nt.NTHalfBBWall, iters=3000)
    assert np.all(np.isfinite(tms.vx))
    prof_t = tms.vx[:, 16]
    prof_b = bb.vx[:, 16]
    assert prof_t[1:-1].mean() > 0.01
    err = np.abs(prof_t[2:-2] - prof_b[2:-2]).max() / prof_b.max()
    assert err < 0.1, err


def test_guo_density_channel():
    """Pressure-driven channel with Guo density BCs at both ends behaves
    like the equilibrium-density version (flow from high to low rho)."""
    N = 32

    def channel(density_bc):
        class Chan(Subdomain2D):
            def boundary_conditions(self, hx, hy):
                wall = (hy == 0) | (hy == self.gy - 1)
                self.set_node(wall, nt.NTFullBBWall)
                self.set_node((hx == 0) & ~wall, density_bc(1.02))
                self.set_node((hx == self.gx - 1) & ~wall,
                              density_bc(0.98))

            def initial_conditions(self, sim, hx, hy):
                sim.rho[:] = 1.0

        class Sim(LBFluidSim):
            subdomain = Chan

        ctrl = LBSimulationController(Sim, default_config=dict(
            lat_nx=N, lat_ny=N, visc=0.1, max_iters=1500, every=1500,
            quiet=True))
        ctrl.run(ignore_cmdline=True)
        ctrl._runner._fields_to_host()
        return ctrl._runner.sim

    guo = channel(nt.NTGuoDensity)
    equ = channel(nt.NTEquilibriumDensity)
    assert np.all(np.isfinite(guo.vx))
    mid_g = guo.vx[N // 2, 4:-4].mean()
    mid_e = equ.vx[N // 2, 4:-4].mean()
    assert mid_g > 0.005, mid_g
    assert abs(mid_g - mid_e) / mid_e < 0.15, (mid_g, mid_e)
    # prescribed density is held at the boundary columns
    assert abs(guo.rho[N // 2, 0] - 1.02) < 5e-3


def test_extended_copy_translation_equals_copy():
    """NTExtendedCopy with a pure translation by the inward normal is by
    construction the same operation as NTCopy."""
    N = 32

    def channel(use_extended):
        T = np.eye(4)
        T[0, 3] = -1.0   # read from x - 1: the neighbor along the inward
        #                  normal of the +x-edge outflow column

        class Chan(Subdomain2D):
            def boundary_conditions(self, hx, hy):
                wall = (hy == 0) | (hy == self.gy - 1)
                self.set_node(wall, nt.NTFullBBWall)
                not_wall = ~wall
                self.set_node((hx == 0) & not_wall,
                              nt.NTEquilibriumVelocity((0.02, 0.0)))
                if use_extended:
                    self.set_node((hx == self.gx - 1) & not_wall,
                                  nt.NTExtendedCopy(transformation=T))
                else:
                    self.set_node((hx == self.gx - 1) & not_wall,
                                  nt.NTCopy())

            def initial_conditions(self, sim, hx, hy):
                sim.rho[:] = 1.0

        class Sim(LBFluidSim):
            subdomain = Chan

        ctrl = LBSimulationController(Sim, default_config=dict(
            lat_nx=N, lat_ny=N, visc=0.1, max_iters=400, every=400,
            quiet=True))
        ctrl.run(ignore_cmdline=True)
        ctrl._runner._fields_to_host()
        return ctrl._runner.sim

    ext = channel(True)
    cpy = channel(False)
    assert np.all(np.isfinite(ext.vx))
    assert np.max(np.abs(ext.vx - cpy.vx)) < 1e-6
    assert np.max(np.abs(ext.rho - cpy.rho)) < 1e-6


def test_grad_outflow_uniform_stream():
    """A uniform equilibrium stream must pass through a Grad outflow
    unchanged: with f = feq, the nonequilibrium tensor vanishes and the
    reconstruction returns the equilibrium values exactly."""
    N = 24
    U = 0.03

    class Stream(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            self.set_node(hx == self.gx - 1, nt.NTGradFreeflow())
            self.set_node(hx == 0, nt.NTEquilibriumVelocity((U, 0.0)))

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0
            sim.vx[:] = U

    class Sim(LBFluidSim):
        subdomain = Stream

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=N, lat_ny=16, visc=0.05, max_iters=100, every=100,
        quiet=True, periodic_y=True))
    ctrl.run(ignore_cmdline=True)
    ctrl._runner._fields_to_host()
    vx = ctrl._runner.sim.vx
    assert np.all(np.isfinite(vx))
    np.testing.assert_allclose(vx[:, 1:], U, rtol=0, atol=5e-6)


def test_device_nan_gate_aborts():
    """--check_invalid_results_gpu stops the run when the state goes
    non-finite (in-device check; reference kernel_common.mako:203)."""
    N = 32

    class Bad(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            pass

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0
            # strongly sheared supersonic field at near-zero viscosity
            sim.vx[:] = 0.8 * np.sin(2 * np.pi * hy / 4.0)
            sim.vy[:] = 0.8 * np.sin(2 * np.pi * hx / 4.0)

    class Sim(LBFluidSim):
        subdomain = Bad

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=N, lat_ny=N, visc=1e-4, max_iters=2000, every=50,
        quiet=True, periodic_x=True, periodic_y=True,
        check_invalid_results_gpu=True))
    ctrl.run(ignore_cmdline=True)
    # aborted long before max_iters
    assert ctrl._runner.sim.iteration < 2000


def test_tms_missing_dists_are_target_equilibrium():
    """Port of the reference's tests/gpu/tms.py check: at a TMS node,
    the tagged (missing) distributions must equal the equilibrium at
    the target macros computed from the bounce-filled populations."""
    import jax.numpy as jnp
    from sailfish_tpu import lattice
    from sailfish_tpu import equilibrium as eq
    from sailfish_tpu.subdomain import SubdomainSpec2D, Subdomain2D
    from sailfish_tpu.ops.step import StepBuilder

    grid = lattice.get_grid('D2Q9')

    def vi(x, y):
        for i in range(grid.Q):
            if grid.basis[i][0] == x and grid.basis[i][1] == y:
                return i
        raise AssertionError

    # the reference's fixture values (tests/gpu/tms.py fi_start_2d)
    fi_start = {
        vi(0, 0): 0.4745, vi(1, 0): 0.1179, vi(-1, 0): 0.1045,
        vi(0, -1): 0.1809, vi(-1, -1): 0.03613, vi(1, -1): 0.00946,
        vi(1, 1): 0.02946, vi(0, 1): 0.1110, vi(-1, 1): 0.02613,
    }

    N = 16

    class Dom(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            self.set_node(hy == 0, nt.NTWallTMS)

    class Cfg:
        periodic_x = True
        periodic_y = False

    dom = Dom((8, N), SubdomainSpec2D((0, 0), (N, 8)), grid, Cfg())
    dom.reset()
    b = StepBuilder(grid, dom.maps, visc=1.0 / 12.0)

    f = np.tile(np.asarray(grid.weights, np.float32)[:, None, None],
                (1, 8, N))
    x0 = 5
    for k, v in fi_start.items():
        f[k, 0, x0] = v
    fj = jnp.asarray(f)
    # bypass the streaming gather (the reference test disables
    # propagation): fix_missing sees the node's own values
    fs = np.asarray(b.fix_missing(fj, fj))

    # expected target macros: bounce-filled populations
    filled = dict(fi_start)
    for k in fi_start:
        if grid.basis[k][1] == 1:
            filled[k] = fi_start[int(grid.opposite[k])]
    rho_bb = sum(filled.values())
    ux_bb = sum(grid.basis[k][0] * v for k, v in filled.items()) / rho_bb
    uy_bb = sum(grid.basis[k][1] * v for k, v in filled.items()) / rho_bb

    feq = np.asarray(eq.bgk_equilibrium(
        grid, jnp.asarray(np.float32(rho_bb)),
        jnp.asarray(np.array([ux_bb, uy_bb], np.float32))))
    for k in fi_start:
        if grid.basis[k][1] == 1:   # tagged (missing) directions
            np.testing.assert_allclose(fs[k, 0, x0], feq[k], rtol=2e-6,
                                       err_msg=str(k))
        else:                        # known populations untouched
            np.testing.assert_allclose(fs[k, 0, x0], fi_start[k],
                                       rtol=1e-6)
