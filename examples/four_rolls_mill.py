#!/usr/bin/env python
"""Four rolls mill: the Taylor-Green vortex held steady by a body force
(counterpart of reference examples/four_rolls_mill.py; the reference uses
a sympy DynamicValue force -- here the time-independent force is a
precomputed per-node field)."""

import numpy as np

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.base import LBForcedSim

from taylor_green_2d import TaylorGreenSim, TaylorGreenSubdomain


class FourRollsMill(TaylorGreenSim, LBForcedSim):
    def __init__(self, config):
        super().__init__(config)
        ny, nx = config.lat_ny, config.lat_nx
        kx = 2.0 * np.pi / nx
        ky = 2.0 * np.pi / ny
        ksq = kx * kx + ky * ky
        # steady state: the force exactly cancels the viscous decay of
        # the initial Taylor-Green field (d u / dt = -nu k^2 u)
        f = ksq * config.visc * TaylorGreenSubdomain.max_v
        hy, hx = np.mgrid[0:ny, 0:nx]
        accel = np.stack([
            -f * np.cos(kx * hx) * np.sin(ky * hy),
            +f * np.sin(kx * hx) * np.cos(ky * hy)])
        self.add_body_force(accel)


if __name__ == '__main__':
    LBSimulationController(FourRollsMill).run()
