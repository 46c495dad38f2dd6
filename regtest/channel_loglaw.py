#!/usr/bin/env python
"""Turbulent-channel law-of-the-wall validation.

Checks Reynolds statistics from examples/turbulence/channel_flow.py
against the log law u+ = ln(y+)/0.41 + 5.5 in the inertial range and
the friction balance at the wall. By default validates the stored run
(H=40, Re_tau=180, TMS wall, 300k iterations, stats from 150k; saved in
benchmark/results/channel_retau180_tms_stats.npz -- measured: mean
log-law error 1.8%, u_tau from the wall slope within 8%, wall-normal
rms ~0.85 u_tau). Pass a stats .npz to validate a fresh run:

  python examples/turbulence/channel_flow.py --H=40 --Re_tau=180 \
      --wall=tms --max_iters=300000 --every=5000 --output=out/ch
  python regtest/channel_loglaw.py out/ch_reyn_stats.300000.npz
"""

import math
import os
import sys

import numpy as np

KAPPA = 0.41
B = 5.5


def validate(path, H=40, Re_tau=180.0, u_center=0.05, tol_mean=0.05):
    d = np.load(path)
    # streamwise mean: 'u' since the wall-normal=y re-layout (walls on
    # the fused kernel's y-row patch path); 'w' in the stored pre-
    # re-layout artifact (wall-normal=x, streamwise=z)
    mean_w = d['u' if 'u' in d else 'w'][0]
    u_tau = u_center / (math.log(Re_tau) / KAPPA + B)
    visc = u_tau * H / Re_tau
    nx = mean_w.shape[0]
    y = np.minimum(np.arange(nx), nx - 1 - np.arange(nx)) + 0.5
    yp = y * u_tau / visc
    up = mean_w / u_tau

    sel = (yp > 30) & (yp < 120) & (np.arange(nx) < nx // 2)
    loglaw = np.log(yp[sel]) / KAPPA + B
    err = np.abs(up[sel] - loglaw) / loglaw
    u_tau_wall = math.sqrt(max(visc * (mean_w[2] - mean_w[1]), 1e-12))

    print(f'log-law rel err (30<y+<120): mean {err.mean():.3f} '
          f'max {err.max():.3f}')
    print(f'u_tau wall-slope {u_tau_wall:.5f} vs nominal {u_tau:.5f}')
    assert err.mean() < tol_mean, 'mean profile off the log law'
    assert abs(u_tau_wall - u_tau) / u_tau < 0.15, 'friction imbalance'
    print('ok')


if __name__ == '__main__':
    default = os.path.join(os.path.dirname(__file__), '..', 'benchmark',
                           'results', 'channel_retau180_tms_stats.npz')
    validate(sys.argv[1] if len(sys.argv) > 1 else default)
