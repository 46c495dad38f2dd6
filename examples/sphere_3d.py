#!/usr/bin/env python
"""Flow around a sphere in a duct (counterpart of reference
examples/sphere_3d.py): periodic-x body-force-driven flow, bounce-back
duct walls and an interior spherical obstacle."""

import numpy as np

from sailfish_tpu.geo import EqualSubdomainsGeometry3D
from sailfish_tpu.subdomain import Subdomain3D
from sailfish_tpu.node_type import NTFullBBWall
from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.single import LBFluidSim
from sailfish_tpu.models.base import LBForcedSim


class SphereBlock(Subdomain3D):
    def boundary_conditions(self, hx, hy, hz):
        wall_bc = NTFullBBWall
        diam = self.gy / 3.0
        z0 = self.gz / 2.0
        y0 = self.gy / 2.0
        x0 = 2.0 * diam

        wall_map = ((hy == 0) | (hy == self.gy - 1) |
                    (hz == 0) | (hz == self.gz - 1))
        self.set_node(wall_map, wall_bc)

        sphere_map = (np.square(hx - x0) + np.square(hy - y0) +
                      np.square(hz - z0)) <= np.square(diam / 2.0)
        self.set_node(sphere_map & ~wall_map, wall_bc)

    def initial_conditions(self, sim, hx, hy, hz):
        sim.rho[:] = 1.0


class SphereSimulation(LBFluidSim, LBForcedSim):
    subdomain = SphereBlock

    @classmethod
    def update_defaults(cls, defaults):
        defaults.update({
            'lat_nx': 128,
            'lat_ny': 64,
            'lat_nz': 64,
            'visc': 0.01,
            'grid': 'D3Q19'})

    @classmethod
    def modify_config(cls, config):
        config.periodic_x = True

    def __init__(self, config):
        super().__init__(config)
        self.add_body_force((1e-5, 0.0, 0.0))


if __name__ == '__main__':
    ctrl = LBSimulationController(SphereSimulation,
                                  EqualSubdomainsGeometry3D)
    ctrl.run()
