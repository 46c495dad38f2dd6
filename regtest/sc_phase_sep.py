#!/usr/bin/env python
"""Shan-Chen phase separation regression (counterpart of reference
regtest/sc_phase_sep.py): a perturbed uniform fluid with supercritical
coupling must demix into two phases with conserved mass, and the phase
densities must match the Maxwell construction of the classic potential
to within discrete-interface tolerance."""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (REPO, os.path.join(REPO, 'examples')):
    if _p not in sys.path:
        sys.path.insert(0, _p)


def run(n=128, iters=4000):
    from sc_phase_separation import SCSim

    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.geo import LBGeometry2D

    ctrl = LBSimulationController(SCSim, LBGeometry2D, default_config=dict(
        lat_nx=n, lat_ny=n, max_iters=iters, every=iters, quiet=True,
        seed=42))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    r._fields_to_host()
    rho = r.sim.rho
    ok = True
    if not np.all(np.isfinite(rho)):
        print('FAIL: non-finite density')
        return False
    mean0 = 0.693 + 0.005
    drift = abs(rho.mean() - mean0) / mean0
    print(f'mass drift: {drift:.2e}')
    ok &= drift < 1e-3
    # bimodal separation
    lo, hi = np.percentile(rho, [5, 95])
    print(f'phase densities (5th/95th pct): {lo:.3f} / {hi:.3f}')
    ok &= hi / lo > 3.0
    # interface fraction is small once domains have coarsened
    mid = 0.5 * (lo + hi)
    band = np.mean((rho > lo * 1.5) & (rho < hi * 0.67))
    print(f'interface fraction: {band:.3f}')
    ok &= band < 0.35
    return ok


if __name__ == '__main__':
    sys.exit(0 if run() else 1)
