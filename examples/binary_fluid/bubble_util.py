"""Geometry analysis for Taylor-bubble simulations.

Locates a bubble in an order-parameter field (``phi = 0`` taken as the
interface), measures its streamwise extent and mid-body width, and
estimates its velocity from two snapshots. Counterpart of the
reference's examples/binary_fluid/bubble_util.py.

Field layout follows the solver: ``phi[y, x]`` with x streamwise and
periodic; the outermost two y rows are wall nodes and are ignored.
"""

from collections import namedtuple

import numpy as np

Bubble = namedtuple('Bubble', 'start end len width mid')


def _zero_crossings(profile, x=None):
    """Sub-cell positions where a 1D profile changes sign.

    Linear interpolation between samples; returns an array of crossing
    coordinates (in units of ``x``, default sample index).
    """
    profile = np.asarray(profile, dtype=np.float64)
    if x is None:
        x = np.arange(len(profile), dtype=np.float64)
    idx = np.nonzero(profile[:-1] * profile[1:] < 0)[0]
    # p(x) = p0 + (p1-p0) * t  -> t = -p0 / (p1 - p0)
    t = -profile[idx] / (profile[idx + 1] - profile[idx])
    crossings = x[idx] + t * (x[idx + 1] - x[idx])
    # samples exactly on the interface are crossings themselves
    exact = x[np.nonzero(profile == 0.0)[0]]
    return np.sort(np.concatenate([crossings, exact]))


def find_bubble(phi):
    """Locate the bubble along the channel centerline.

    Returns a :class:`Bubble` with sub-cell interface positions
    ``start``/``end`` (periodic in x), streamwise length, the bubble
    width at its midpoint, and the integer midpoint column.
    """
    interior = phi[2:-2, :]
    nx = interior.shape[1]
    center = interior[interior.shape[0] // 2 + 1, :]

    gas = center < 0.0
    if not gas.any() or gas.all():
        raise ValueError('no interface on the centerline')

    if gas[0] and gas[-1]:
        # Bubble straddles the periodic seam: liquid in the middle.
        liquid_cols = np.nonzero(~gas)[0]
        lo, hi = liquid_cols.max(), liquid_cols.min()
    else:
        gas_cols = np.nonzero(gas)[0]
        lo, hi = gas_cols.min(), gas_cols.max()

    crossings = _zero_crossings(center)
    # Refine each end to the nearest sub-cell sign change.
    start = crossings[np.argmin(np.minimum(
        np.abs(crossings - lo), nx - np.abs(crossings - lo)))]
    end = crossings[np.argmin(np.minimum(
        np.abs(crossings - hi), nx - np.abs(crossings - hi)))]

    length = (end - start) % nx
    mid = int(round(start + length / 2.0)) % nx
    width = bubble_width(interior[:, mid])
    return Bubble(start, end, length, width, mid)


def bubble_width(profile):
    """Transverse extent of the gas phase on a wall-stripped column.

    The physical wall sits half a cell beyond the last fluid node
    (half-way bounce-back), hence the +0.5 offset.
    """
    if np.any(np.isnan(profile)):
        raise ValueError('profile contains wall NaNs; strip them first')
    y = np.arange(len(profile), dtype=np.float64) + 0.5
    edges = _zero_crossings(profile, y)
    if len(edges) < 2:
        raise ValueError('no transverse interface pair')
    return edges[-1] - edges[0]


def bubble_velocity(phi_a, phi_b, dt):
    """Streamwise bubble velocity between two snapshots ``dt`` apart."""
    a = find_bubble(phi_a)
    b = find_bubble(phi_b)
    nx = phi_a.shape[1]
    return ((b.start - a.start) % nx) / float(dt)
