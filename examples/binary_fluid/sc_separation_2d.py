#!/usr/bin/env python
"""Binary Shan-Chen demixing (counterpart of reference
examples/binary_fluid/sc_separation_2d.py)."""

import numpy as np

from sailfish_tpu.geo import LBGeometry2D
from sailfish_tpu.subdomain import Subdomain2D
from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.binary import LBBinaryFluidShanChen


class SeparationDomain(Subdomain2D):
    def initial_conditions(self, sim, hx, hy):
        sim.rho[:] = 1.0 + np.random.rand(*sim.rho.shape) / 1000.0
        sim.phi[:] = 1.0 + np.random.rand(*sim.phi.shape) / 1000.0

    def boundary_conditions(self, hx, hy):
        pass


class SeparationSCSim(LBBinaryFluidShanChen):
    subdomain = SeparationDomain

    @classmethod
    def update_defaults(cls, defaults):
        defaults.update({
            'lat_nx': 256,
            'lat_ny': 256,
            'grid': 'D2Q9',
            'G12': 1.2,
            'visc': 1.0 / 6.0,
            'periodic_x': True,
            'periodic_y': True})


if __name__ == '__main__':
    LBSimulationController(SeparationSCSim, LBGeometry2D).run()
