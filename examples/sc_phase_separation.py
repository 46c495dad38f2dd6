#!/usr/bin/env python
"""Spinodal decomposition of a single-component Shan-Chen fluid.

A uniform density near the critical point of the 'classic' exponential
pseudopotential (rho ~ 0.693 = ln 2, G below the critical coupling)
is seeded with small noise and separates into liquid and vapor domains
that coarsen over time.

Scene counterpart of the reference's examples/sc_phase_separation.py.
"""

import numpy as np

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.geo import LBGeometry2D
from sailfish_tpu.models.single import LBSingleFluidShanChen
from sailfish_tpu.subdomain import Subdomain2D


class SeparationSubdomain(Subdomain2D):
    def boundary_conditions(self, hx, hy):
        pass

    def initial_conditions(self, sim, hx, hy):
        # ln(2) mean density + 1% uniform noise to seed the instability
        sim.rho[:] = np.random.rand(*sim.rho.shape) / 100 + 0.693


class SCSim(LBSingleFluidShanChen):
    subdomain = SeparationSubdomain

    @classmethod
    def update_defaults(cls, defaults):
        defaults.update({
            'lat_nx': 256,
            'lat_ny': 256,
            'G': -5.0,
            'visc': 1.0 / 6.0,
            'periodic_x': True,
            'periodic_y': True,
            'sc_potential': 'classic',
            'every': 20,
        })


if __name__ == '__main__':
    LBSimulationController(SCSim, LBGeometry2D).run()
