"""Immersed-boundary particle tests (reference examples/ibm_cylinder.py
family; templates/ibm.mako kernels)."""
import numpy as np

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.single import LBIBMFluidSim, Particle
from sailfish_tpu.subdomain import Subdomain2D


def test_particle_drag_equilibrium():
    """A tethered particle in a body-force-driven channel is dragged
    downstream until the spring balances the flow; the fluid feels the
    reaction (slows near the particle)."""
    N = 32

    class Chan(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            pass

        def initial_conditions(self, sim, hx, hy):
            sim.rho[:] = 1.0

    class Sim(LBIBMFluidSim):
        subdomain = Chan

        def __init__(self, config):
            super().__init__(config)
            self.add_body_force((1e-5, 0.0))
            self.add_particle(Particle((16.0, 16.0), stiffness=0.05))
            self.add_particle(Particle((8.0, 8.0), stiffness=0.05))

    ctrl = LBSimulationController(Sim, default_config=dict(
        lat_nx=N, lat_ny=N, visc=0.05, max_iters=1500, every=1500,
        quiet=True, periodic_x=True, periodic_y=True))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    pos = r.sim.particle_positions(r)
    assert np.all(np.isfinite(pos))
    # both particles displaced downstream (+x) from their tether points
    assert pos[0, 0] > 16.0 and pos[0, 1] > 8.0
    # displacement is finite (spring holds them)
    assert pos[0, 0] < 20.0
    # y displacement negligible by symmetry
    assert abs(pos[1, 0] - 16.0) < 0.1
    r._fields_to_host()
    assert np.all(np.isfinite(r.sim.vx))
