#!/usr/bin/env python
"""Poiseuille-flow accuracy regression over a viscosity sweep.

Counterpart of the reference's ``regtest/poiseuille.py:38-80``: runs the
force-driven channel to steady state for several viscosities and wall
types and reports the max relative error of the velocity profile vs the
analytic parabola. Exits nonzero if any error exceeds tolerance.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (REPO, os.path.join(REPO, 'examples')):
    if _p not in sys.path:
        sys.path.insert(0, _p)

from poiseuille import PoiseuilleSim, PoiseuilleSubdomain  # noqa: E402
from sailfish_tpu.controller import LBSimulationController  # noqa: E402
from sailfish_tpu.geo import LBGeometry2D  # noqa: E402

TOL = 5e-3


def run_one(visc, wall, n=64, iters=12000):
    ctrl = LBSimulationController(PoiseuilleSim, LBGeometry2D,
                                  default_config=dict(
                                      lat_nx=n, lat_ny=n, visc=visc,
                                      max_iters=iters, every=iters,
                                      quiet=True, wall=wall,
                                      stationary=True))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    r._fields_to_host()
    prof = r.sim.vy[n // 2, :]
    ref = PoiseuilleSubdomain.velocity_profile(ctrl.config, np.arange(n))
    m = ref > 0
    return float(np.max(np.abs(prof[m] - ref[m])) / ref.max())


def main():
    failures = 0
    for wall in ('fullbb', 'halfbb'):
        for visc in (0.02, 0.05, 0.1, 0.3):
            err = run_one(visc, wall)
            status = 'ok' if err < TOL else 'FAIL'
            print(f'wall={wall} visc={visc}: max rel err {err:.2e} '
                  f'[{status}]')
            failures += err >= TOL
    return 1 if failures else 0


if __name__ == '__main__':
    sys.exit(main())
