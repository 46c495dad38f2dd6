#!/usr/bin/env python
"""Precompute a divergence-free perturbation for channel simulations.

Builds the curl of a periodically-smoothed random vector potential
(solenoidal by construction) and saves the three velocity components to
compressed npz files. For big channels this keeps the startup memory of
the simulation itself low: pass the output to channel_flow.py via
``--perturbation_file``. Counterpart of the reference's
examples/turbulence/utils/channel_make_rand_field.py (which uses
buffered gradients of filtered noise; the curl form used here is
divergence-free to machine precision rather than to stencil accuracy).

Usage:
    python channel_make_rand_field.py NX NY NZ H <target_directory>
"""

import os
import sys

import numpy as np
from scipy.ndimage import gaussian_filter

SEED = 1341351351


def make_divfree_field(nx, ny, nz, smooth, seed=SEED):
    """Return (wx, wy, wz), each shaped (z, y, x), periodic and
    divergence-free."""
    rng = np.random.RandomState(seed)
    shape = (nz, ny, nx)
    pot = [gaussian_filter(
        rng.standard_normal(shape).astype(np.float32), smooth,
        mode='wrap') for _ in range(3)]

    def periodic_gradient(a):
        # roll-based central differences: periodic on every axis, so
        # solenoidality holds on the wrap planes too (np.gradient's
        # one-sided edge stencils would break it there)
        return [(np.roll(a, -1, axis=ax) - np.roll(a, 1, axis=ax)) / 2.0
                for ax in range(a.ndim)]

    dA = [periodic_gradient(a) for a in pot]
    # array axes: 0 = z, 1 = y, 2 = x
    wx = dA[1][0] - dA[0][1]
    wy = dA[0][2] - dA[2][0]
    wz = dA[2][1] - dA[1][2]
    return wx, wy, wz


def main(argv):
    if len(argv) != 6:
        sys.stderr.write(__doc__)
        return 1
    nx, ny, nz, H = (int(v) for v in argv[1:5])
    target = argv[5]
    smooth = max(2.0, 5.0 * H / 40.0)
    wx, wy, wz = make_divfree_field(nx, ny, nz, smooth)
    base = os.path.join(target, 'rng_%d_%d_%d' % (nx, ny, nz))
    np.savez_compressed(base + '.npz', wx=wx, wy=wy, wz=wz)
    print('wrote %s.npz (shape %s)' % (base, wx.shape))
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv))
