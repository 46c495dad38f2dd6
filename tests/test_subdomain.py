"""Node-map construction tests (counterpart of reference tests/subdomain.py:
node setting, orientation autodetection, link tagging)."""
import numpy as np
import pytest

from sailfish_tpu import lattice
from sailfish_tpu import node_type as nt
from sailfish_tpu.subdomain import Subdomain2D, Subdomain3D, SubdomainSpec2D


class _Cfg:
    periodic_x = False
    periodic_y = False
    periodic_z = False


def make_sub(cls, shape):
    spec = SubdomainSpec2D((0, 0), tuple(reversed(shape)))
    grid = lattice.D2Q9 if cls.dim == 2 else lattice.D3Q19
    return cls(shape, spec, grid, _Cfg())


class WallsSub(Subdomain2D):
    def boundary_conditions(self, hx, hy):
        self.set_node(hy == 0, nt.NTFullBBWall)
        self.set_node(hy == self.gy - 1,
                      nt.NTEquilibriumVelocity((0.05, 0.0)))


def test_set_node_and_types():
    sub = make_sub(WallsSub, (8, 10))
    sub.reset()
    m = sub.maps
    assert np.all(m.type_map[0, :] == nt.NTFullBBWall.id)
    assert np.all(m.type_map[-1, :] == nt.NTEquilibriumVelocity.id)
    assert np.all(m.type_map[1:-1, :] == 0)
    assert np.all(m.param_vel[0][-1, :] == 0.05)


def test_set_node_twice_raises():
    class Bad(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            self.set_node(hy == 0, nt.NTFullBBWall)
            self.set_node(hy == 0, nt.NTFullBBWall)
    sub = make_sub(Bad, (4, 4))
    with pytest.raises(AssertionError):
        sub.reset()


def test_orientation_autodetect():
    sub = make_sub(WallsSub, (8, 10))
    sub.reset()
    m = sub.maps
    # lid at y=gy-1: fluid is below => orientation -y (id 4: +x,-x,+y,-y)
    assert np.all(m.orientation[-1, 1:-1] == 4)


class HalfBBChannel(Subdomain2D):
    def boundary_conditions(self, hx, hy):
        self.set_node((hy == 0) | (hy == self.gy - 1), nt.NTHalfBBWall)


def test_link_tags():
    sub = make_sub(HalfBBChannel, (6, 8))
    sub.config.periodic_x = True
    sub.reset()
    m = sub.maps
    g = sub.grid
    # bottom wall row: distributions whose pull source has cy > 0 removed?
    # source x - c_i is below the wall (outside) when c_i points +y.
    tags = m.link_tags[0, 4]
    for i in range(g.Q):
        expect = g.basis[i][1] > 0   # cy > 0 => source below domain
        assert bool((tags >> i) & 1) == bool(expect), (i, g.basis[i])
    # interior fluid rows are untagged
    assert np.all(m.link_tags[1:-1, :] == 0)


def test_nouse_link_tags_crude_orientation():
    """--nouse_link_tags falls back to orientation-vector tagging
    (reference lb_base.py:86-92): identical to per-link probing on flat
    walls, cruder at corners."""
    precise = make_sub(HalfBBChannel, (6, 8))
    precise.config.periodic_x = True
    precise.reset()
    crude = make_sub(HalfBBChannel, (6, 8))
    crude.config.periodic_x = True
    crude.config.use_link_tags = False
    crude.reset()
    # flat periodic channel: both taggings agree everywhere
    assert np.array_equal(precise.maps.link_tags, crude.maps.link_tags)

    class Box(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            self.set_node((hy == 0) | (hy == self.gy - 1) |
                          (hx == 0) | (hx == self.gx - 1),
                          nt.NTHalfBBWall)

    precise_b = make_sub(Box, (6, 8))
    precise_b.reset()
    crude_b = make_sub(Box, (6, 8))
    crude_b.config.use_link_tags = False
    crude_b.reset()
    # the corner nodes differ: orientation carries one axis only
    assert not np.array_equal(precise_b.maps.link_tags,
                              crude_b.maps.link_tags)
    # but flat wall midpoints still agree
    assert precise_b.maps.link_tags[0, 3] == crude_b.maps.link_tags[0, 3]


def test_multifield_params():
    class MF(Subdomain2D):
        def boundary_conditions(self, hx, hy):
            sel = hy == self.gy - 1
            vx = 0.1 * hx / self.gx
            self.set_node(sel, nt.NTEquilibriumVelocity(
                nt.multifield((vx, 0.0), sel)))
    sub = make_sub(MF, (4, 6))
    sub.reset()
    vx_row = sub.maps.param_vel[0][-1, :]
    np.testing.assert_allclose(vx_row, 0.1 * np.arange(6) / 6)


class Cavity3D(Subdomain3D):
    def boundary_conditions(self, hx, hy, hz):
        wall = (hz == 0) | (hx == 0) | (hx == self.gx - 1) | \
               (hy == 0) | (hy == self.gy - 1)
        self.set_node(wall, nt.NTFullBBWall)
        self.set_node((hz == self.gz - 1) & ~wall,
                      nt.NTEquilibriumVelocity((0.02, 0.0, 0.0)))


def test_3d_orientation():
    sub = make_sub(Cavity3D, (6, 6, 6))
    sub.reset()
    m = sub.maps
    # lid at z=gz-1, fluid below: orientation -z = id 6
    assert np.all(m.orientation[-1, 1:-1, 1:-1] == 6)
