#!/usr/bin/env python
"""3D spinodal decomposition of a single-component Shan-Chen fluid.

The 3D counterpart of sc_phase_separation.py: near-critical uniform
density with noise separates into liquid/vapor domains. Runs on the
fused kernel (in-kernel pseudopotential forcing + density pre-pass).
"""

import numpy as np

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.geo import LBGeometry3D
from sailfish_tpu.models.single import LBSingleFluidShanChen
from sailfish_tpu.subdomain import Subdomain3D


class SeparationSubdomain3D(Subdomain3D):
    def boundary_conditions(self, hx, hy, hz):
        pass

    def initial_conditions(self, sim, hx, hy, hz):
        sim.rho[:] = np.random.rand(*sim.rho.shape) / 100 + 0.693


class SCSim3D(LBSingleFluidShanChen):
    subdomain = SeparationSubdomain3D

    @classmethod
    def update_defaults(cls, defaults):
        defaults.update({
            'lat_nx': 128,
            'lat_ny': 128,
            'lat_nz': 128,
            'grid': 'D3Q19',
            'G': -5.0,
            'visc': 1.0 / 6.0,
            'periodic_x': True,
            'periodic_y': True,
            'periodic_z': True,
            'sc_potential': 'classic',
        })


if __name__ == '__main__':
    LBSimulationController(SCSim3D, LBGeometry3D).run()
