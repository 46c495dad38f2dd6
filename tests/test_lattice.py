"""Tier-1 lattice sanity tests (counterpart of reference tests/sym.py)."""
import numpy as np
import pytest

from sailfish_tpu import lattice


ALL = list(lattice.KNOWN_GRIDS.values())


@pytest.mark.parametrize('grid', ALL, ids=lambda g: g.name)
def test_basic_invariants(grid):
    assert grid.basis.shape == (grid.Q, grid.dim)
    assert abs(grid.weights.sum() - 1.0) < 1e-12
    # opposite is an involution mapping c -> -c
    assert np.all(grid.opposite[grid.opposite] == np.arange(grid.Q))
    assert np.all(grid.basis[grid.opposite] == -grid.basis)
    # rest vector first
    assert np.all(grid.basis[0] == 0)


@pytest.mark.parametrize('grid', ALL, ids=lambda g: g.name)
def test_quadrature_isotropy(grid):
    """Weights satisfy the standard lattice tensor identities up to 4th order:
    sum w c_a c_b = cs2 d_ab;  sum w c_a c_b c_c c_d = cs2^2 (dd+dd+dd)."""
    w = grid.weights
    c = grid.basis.astype(np.float64)
    cs2 = grid.cs2
    d = grid.dim
    # odd moments vanish
    assert np.allclose(np.einsum('i,ia->a', w, c), 0)
    assert np.allclose(np.einsum('i,ia,ib,ic->abc', w, c, c, c), 0)
    m2 = np.einsum('i,ia,ib->ab', w, c, c)
    assert np.allclose(m2, cs2 * np.eye(d), atol=1e-12)
    if grid.name == 'D3Q13':
        return  # D3Q13 is not 4th-order isotropic (known property)
    m4 = np.einsum('i,ia,ib,ic,id->abcd', w, c, c, c, c)
    expect = np.zeros((d, d, d, d))
    eye = np.eye(d)
    for a in range(d):
        for b in range(d):
            for cc in range(d):
                for dd in range(d):
                    expect[a, b, cc, dd] = cs2 ** 2 * (
                        eye[a, b] * eye[cc, dd] + eye[a, cc] * eye[b, dd]
                        + eye[a, dd] * eye[b, cc])
    assert np.allclose(m4, expect, atol=1e-12)


@pytest.mark.parametrize('grid', ALL, ids=lambda g: g.name)
def test_mrt_matrix(grid):
    m = grid.mrt_matrix
    # orthogonal rows (Gram-Schmidt invariant)
    gram = m @ m.T
    assert np.allclose(gram, np.diag(np.diag(gram)), atol=1e-9)
    assert np.allclose(m @ grid.mrt_inv, np.eye(grid.Q), atol=1e-9)
    # row 0 = density, rows 1..dim = momentum
    assert np.allclose(m[0], 1.0)
    for a in range(grid.dim):
        assert np.allclose(m[1 + a], grid.basis[:, a])
    assert len(grid.mrt_shear) == (2 if grid.dim == 2 else 5)


@pytest.mark.parametrize('grid', ALL, ids=lambda g: g.name)
def test_orientation_vectors_and_unknown_mask(grid):
    ovecs = grid.orientation_vectors
    assert ovecs.shape == (2 * grid.dim, grid.dim)
    for k in range(2 * grid.dim):
        axis, sign = divmod(k, 2)
        v = np.zeros(grid.dim)
        v[axis] = 1 if sign == 0 else -1
        assert np.all(ovecs[k] == v)
    # unknown dists at a wall with inward normal +x: those with cx > 0
    n = np.zeros(grid.dim, dtype=int)
    n[0] = 1
    mask = grid.unknown_mask(n)
    assert np.all(mask == (grid.basis[:, 0] > 0))


def test_slip_swap_d2q9():
    g = lattice.D2Q9
    perm = g.slip_swap(1)  # reflect cy
    for i in range(g.Q):
        v = g.basis[i].copy()
        v[1] = -v[1]
        assert np.all(g.basis[perm[i]] == v)


def test_relaxation_time():
    assert lattice.relaxation_time(1.0 / 6.0) == pytest.approx(1.0)
