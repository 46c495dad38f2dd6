#!/usr/bin/env python
"""2D lid-driven cavity vs literature data.

Counterpart of the reference's ``regtest/ldc_2d.py``: runs the cavity at a
requested Reynolds number and compares mid-plane velocity profiles with
the golden data from the reference repository
(``regtest/ldc_golden/re100``, Ghia-style centerline profiles).
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for _p in (REPO, os.path.join(REPO, 'examples')):
    if _p not in sys.path:
        sys.path.insert(0, _p)

from ldc_2d import LDCBlock, LDCSim  # noqa: E402
from sailfish_tpu.controller import LBSimulationController  # noqa: E402

GOLDEN_DIR = os.environ.get(
    'LDC_GOLDEN', '/root/reference/regtest/ldc_golden')


def run(re=100, n=128, iters=None, tol=0.03):
    LDCBlock.max_v = 0.1
    visc = (n - 2) * LDCBlock.max_v / re
    iters = iters or int(20 * n * n / visc / 100)
    ctrl = LBSimulationController(LDCSim, default_config=dict(
        lat_nx=n, lat_ny=n, visc=visc, max_iters=iters, every=iters,
        quiet=True))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    r._fields_to_host()
    vx = r.sim.vx
    prof = (vx[:, n // 2] + vx[:, n // 2 - 1]) / 2 / LDCBlock.max_v
    ys = (np.arange(n) + 0.5) / n
    golden = np.loadtxt(os.path.join(GOLDEN_DIR, f're{re}'))
    interp = np.interp(golden[:, 0], ys, prof)
    err = float(np.max(np.abs(interp - golden[:, 1])))
    print(f'Re={re} N={n} iters={iters}: max err vs literature {err:.4f}')
    return err < tol


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('--re', type=int, default=100)
    p.add_argument('--n', type=int, default=128)
    p.add_argument('--iters', type=int, default=None)
    args = p.parse_args()
    sys.exit(0 if run(args.re, args.n, args.iters) else 1)
