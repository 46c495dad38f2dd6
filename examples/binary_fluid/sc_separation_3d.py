#!/usr/bin/env python
"""3D binary Shan-Chen demixing (counterpart of reference
examples/binary_fluid/sc_separation_3d.py)."""

import numpy as np

from sailfish_tpu.geo import LBGeometry3D
from sailfish_tpu.subdomain import Subdomain3D
from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.binary import LBBinaryFluidShanChen


class SeparationDomain(Subdomain3D):
    def boundary_conditions(self, hx, hy, hz):
        pass

    def initial_conditions(self, sim, hx, hy, hz):
        sim.rho[:] = 1.0 + np.random.rand(*sim.rho.shape) / 1000.0
        sim.phi[:] = 1.0 + np.random.rand(*sim.phi.shape) / 1000.0


class SeparationSCSim(LBBinaryFluidShanChen):
    subdomain = SeparationDomain

    @classmethod
    def update_defaults(cls, defaults):
        defaults.update({
            'lat_nx': 128,
            'lat_ny': 128,
            'lat_nz': 128,
            'grid': 'D3Q19',
            'G12': 1.2,
            'visc': 1.0 / 6.0,
            'periodic_x': True,
            'periodic_y': True,
            'periodic_z': True})


if __name__ == '__main__':
    LBSimulationController(SeparationSCSim, LBGeometry3D).run()
