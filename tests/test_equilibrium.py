"""Moment-recovery tests for equilibria (counterpart of reference
tests/sym_equilibrium.py:11-60)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sailfish_tpu import equilibrium as eq
from sailfish_tpu import lattice

ALL = list(lattice.KNOWN_GRIDS.values())


@pytest.mark.parametrize('grid', ALL, ids=lambda g: g.name)
def test_equilibrium_moments(grid):
    """BGK equilibrium recovers rho and rho*u exactly (lattice quadrature)."""
    rng = np.random.RandomState(0)
    shape = (4, 5) if grid.dim == 2 else (3, 4, 5)
    rho = jnp.asarray(1.0 + 0.1 * rng.rand(*shape))
    u = jnp.asarray(0.05 * (rng.rand(grid.dim, *shape) - 0.5))
    feq = eq.bgk_equilibrium(grid, rho, u)
    rho2, u2 = eq.macroscopic(grid, feq)
    np.testing.assert_allclose(np.asarray(rho2), np.asarray(rho), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize('grid', [lattice.D2Q9, lattice.D3Q19],
                         ids=lambda g: g.name)
def test_equilibrium_second_moment(grid):
    """Pi_eq_ab = rho cs2 d_ab + rho u_a u_b for 4th-order isotropic grids."""
    rho = jnp.asarray(np.full((4, 4) if grid.dim == 2 else (3, 3, 3), 1.1))
    u = jnp.asarray(np.full((grid.dim,) + rho.shape, 0.02))
    feq = np.asarray(eq.bgk_equilibrium(grid, rho, u))
    c = grid.basis.astype(np.float64)
    pi = np.einsum('ia,ib,i...->ab...', c, c, feq)
    rho_np, u_np = np.asarray(rho), np.asarray(u)
    expect = (grid.cs2 * rho_np[None, None] * np.eye(grid.dim).reshape(
        grid.dim, grid.dim, *([1] * rho_np.ndim))
        + rho_np[None, None] * u_np[None, :] * u_np[:, None])
    np.testing.assert_allclose(pi, expect, rtol=1e-5, atol=1e-8)


def test_incompressible_variant():
    g = lattice.D2Q9
    rho = jnp.full((4, 4), 1.2)
    u = jnp.full((2, 4, 4), 0.03)
    feq = eq.bgk_equilibrium(g, rho, u, incompressible=True)
    # density recovered exactly; momentum is rho0 * u = u
    rho2 = np.asarray(eq.density(g, feq))
    mom = np.asarray(eq.momentum(g, feq))
    np.testing.assert_allclose(rho2, 1.2, rtol=1e-6)
    np.testing.assert_allclose(mom, 0.03, rtol=1e-5)


def test_regularized_roundtrip():
    """regularized_f(rho, u, Pi^(1)) has the prescribed rho, u and Pi^(1)."""
    g = lattice.D2Q9
    rng = np.random.RandomState(1)
    rho = jnp.asarray(1.0 + 0.05 * rng.rand(3, 3))
    u = jnp.asarray(0.02 * (rng.rand(2, 3, 3) - 0.5))
    feq = eq.bgk_equilibrium(g, rho, u)
    f = feq + jnp.asarray(1e-3 * (rng.rand(g.Q, 3, 3) - 0.5))
    pi = eq.second_moment_noneq(g, f, feq)
    freg = eq.regularized_f(g, rho, u, pi)
    rho2, u2 = eq.macroscopic(g, freg)
    np.testing.assert_allclose(np.asarray(rho2), np.asarray(rho), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u), atol=1e-6)
    pi2 = eq.second_moment_noneq(g, freg, eq.bgk_equilibrium(g, rho2, u2))
    # The regularized reconstruction preserves the traceless-symmetric part.
    np.testing.assert_allclose(np.asarray(pi2), np.asarray(pi),
                               rtol=1e-3, atol=1e-7)
