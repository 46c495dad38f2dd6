"""Bubble analysis + turbulence aggregation utilities
(examples/binary_fluid/bubble_util.py,
examples/turbulence/utils/*.py — counterparts of the reference's
bubble_util.py and turbulence/utils scripts)."""
import sys

import numpy as np

sys.path.insert(0, 'examples/binary_fluid')
sys.path.insert(0, 'examples/turbulence/utils')

import aggregate_stats
import aggregate_timeseries
import bubble_util
import channel_make_rand_field


def _synthetic_phi(nx=128, ny=40, x0=30.0, x1=70.0, r=10.0):
    """phi < 0 inside an ellipse-ish bubble spanning [x0, x1]."""
    y, x = np.mgrid[0:ny, 0:nx].astype(np.float64)
    xc, yc = 0.5 * (x0 + x1), ny / 2.0
    a = 0.5 * (x1 - x0)
    phi = ((x - xc) / a) ** 2 + ((y - yc) / r) ** 2 - 1.0
    return phi


def test_find_bubble_basic():
    phi = _synthetic_phi()
    b = bubble_util.find_bubble(phi)
    assert abs(b.start - 30.0) < 1.0
    assert abs(b.end - 70.0) < 1.0
    assert abs(b.len - 40.0) < 2.0
    assert abs(b.mid - 50) <= 1
    assert abs(b.width - 20.0) < 2.0


def test_find_bubble_periodic_wrap():
    phi = _synthetic_phi()
    rolled = np.roll(phi, 80, axis=1)  # bubble now spans the seam
    b = bubble_util.find_bubble(rolled)
    assert abs(b.len - 40.0) < 2.0
    assert abs(((b.start - (30.0 + 80) % 128) % 128)) < 1.0


def test_bubble_velocity():
    phi = _synthetic_phi()
    moved = np.roll(phi, 7, axis=1)
    v = bubble_util.bubble_velocity(phi, moved, dt=14)
    assert abs(v - 0.5) < 0.1


def test_aggregate_stats_weighted(tmp_path):
    f1 = tmp_path / 'run_reyn_stats.100.npz'
    f2 = tmp_path / 'run_reyn_stats.200.npz'
    np.savez(f1, u=np.full((4, 8), 1.0))
    np.savez(f2, u=np.full((4, 8), 4.0))
    fields, sources = aggregate_stats.aggregate(
        [(str(f1), 1.0), (str(f2), 3.0)])
    np.testing.assert_allclose(fields['u'], 3.25)
    assert sources == [100, 200]


def test_aggregate_timeseries(tmp_path):
    names = []
    for i in range(3):
        fn = tmp_path / ('s.%d.npz' % i)
        np.savez(fn, u=np.full((4, 8), float(i)))
        names.append(str(fn))
    series = aggregate_timeseries.build_timeseries(1, names)
    assert series['u'].shape == (3, 4)
    np.testing.assert_allclose(series['u'][:, 0], [0.0, 1.0, 2.0])


def test_rand_field_divergence_free():
    wx, wy, wz = channel_make_rand_field.make_divfree_field(
        24, 20, 16, smooth=2.0)
    assert wx.shape == (16, 20, 24)
    # discrete divergence (periodic central differences) vanishes to
    # roundoff relative to the gradient magnitude
    div = (np.gradient(wz, axis=0) + np.gradient(wy, axis=1)
           + np.gradient(wx, axis=2))
    # interior only: np.gradient uses one-sided stencils at the edges
    inner = div[1:-1, 1:-1, 1:-1]
    scale = max(np.abs(wx).max(), np.abs(wy).max(), np.abs(wz).max())
    assert np.abs(inner).max() < 1e-5 * scale
