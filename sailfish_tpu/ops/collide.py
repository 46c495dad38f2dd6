"""Collision operators as traced JAX functions.

TPU-native counterpart of the reference's generated relaxation kernels
(``templates/relaxation.mako:99-181`` BGK, ``relaxation_mrt.mako`` MRT,
``relaxation_common.mako:153`` Smagorinsky, ``:56-108`` Guo/EDM forces).

All operators map (f, rho, u, ...) -> post-collision f on the full field;
the caller masks out non-colliding (dry/excluded) nodes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sailfish_tpu import equilibrium as eq


def bgk_collide(grid, f, rho, u, tau_inv, *, incompressible=False):
    """f + (feq - f)/tau. tau_inv may be a scalar or a per-node field
    (LES). Reference: relaxation.mako:99-181."""
    feq = eq.bgk_equilibrium(grid, rho, u, incompressible=incompressible)
    return f + tau_inv * (feq - f)


def mrt_collide(grid, f, rho, u, rates, *, incompressible=False):
    """Multiple-relaxation-time collision in moment space.

    m = M f; m += s (m_eq - m); f' = M^-1 m, with m_eq = M feq so that the
    operator reduces exactly to BGK when all rates are equal
    (reference: relaxation_mrt.mako; matrices from sym.py:86-226).
    rates: (Q,) numpy vector from Grid.mrt_relaxation_rates.
    """
    dtype = f.dtype
    feq = eq.bgk_equilibrium(grid, rho, u, incompressible=incompressible)
    # Fold the diagonal relaxation into a single Q x Q matrix:
    # f' = f + Minv diag(s) M (feq - f) = f + R (feq - f).
    R = (grid.mrt_inv @ np.diag(np.asarray(rates)) @ grid.mrt_matrix)
    Rj = jnp.asarray(R, dtype=dtype)
    dneq = (feq - f).reshape(grid.Q, -1)
    upd = jnp.einsum('qp,pn->qn', Rj, dneq,
                     precision=jax.lax.Precision.HIGHEST
                     if dtype == jnp.float32 else None)
    return f + upd.reshape(f.shape)


def smagorinsky_tau_inv(grid, f, feq, rho, tau, cs_smag):
    """Effective 1/tau field with the Smagorinsky subgrid model.

    tau_total = tau + 0.5 (sqrt(tau^2 + 18 C^2 |Pi|/(rho cs^4 ...)) - tau)
    following the standard LBM-LES closure (reference:
    relaxation_common.mako:153-200, --subgrid les-smagorinsky).
    |Pi| = sqrt(2 Pi_ab Pi_ab) of the nonequilibrium stress.
    """
    pi = eq.second_moment_noneq(grid, f, feq)
    pi_mag = jnp.sqrt(2.0 * jnp.sum(pi * pi, axis=(0, 1)))
    tau_t = 0.5 * (jnp.sqrt(tau * tau
                            + 18.0 * (cs_smag ** 2) * pi_mag / rho) - tau)
    return 1.0 / (tau + tau_t)


def guo_force_terms(grid, u, force, tau_inv):
    """Guo (2002) forcing population increment.

    F_i = w_i (1 - 1/(2 tau)) [ 3 (c_i - u) + 9 (c_i . u) c_i ] . F
    (reference: sym_force.py:121-160). force: (dim, *S) or (dim,) vector.
    Returns (Q, *S) increment to add post-collision.
    """
    dtype = u.dtype
    w = grid.weights
    cu = eq.dot_cu(grid, u)                    # (Q, *S)
    cF = eq.dot_cu(grid, force)                # (Q, *S) via same +/- sums
    uF = jnp.sum(u * force, axis=0)            # (*S)
    shape = (grid.Q,) + (1,) * (cu.ndim - 1)
    wq = jnp.asarray(w, dtype=dtype).reshape(shape)
    pref = 1.0 - 0.5 * tau_inv
    return pref * wq * (3.0 * (cF - uF[None]) + 9.0 * cu * cF)


def edm_shift(grid, rho, u, force, *, incompressible=False):
    """Exact-difference-method forcing: feq(rho, u + F/rho) - feq(rho, u)
    (Kupershtokh; reference sym_force.edm_shift_velocity, sym_force.py:184).
    """
    du = force / rho[None]
    return (eq.bgk_equilibrium(grid, rho, u + du,
                               incompressible=incompressible)
            - eq.bgk_equilibrium(grid, rho, u, incompressible=incompressible))
