"""Entropic LBM (ELBM): product-form equilibrium + entropy-equality alpha.

Counterpart of the reference's generated entropic code
(``templates/entropic.mako``: ComputeACoeff/EstimateAlphaSeries :9-45,
CalculateEntropy :48-58, Newton solver EstimateAlphaFromEntropy :90-144,
dispatch EntropicRelaxationParam :160-184) and the product-form
equilibrium (``sym_equilibrium.elbm_equilibrium``, sym_equilibrium.py:123).

The per-node scalar Newton iteration becomes a fixed-count vectorized
loop with convergence masking -- data-independent control flow that XLA
and Pallas both like.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def elbm_equilibrium(grid, rho, u):
    """Product-form entropic equilibrium (Ansumali & Karlin, EPL 63 (2003)
    798; reference sym_equilibrium.py:123-155):

      feq_i = rho w_i prod_a (2 - sqrt(1+3 u_a^2)) B_a^{c_ia},
      B_a = (2 u_a + sqrt(1 + 3 u_a^2)) / (1 - u_a)
    """
    dtype = rho.dtype
    pref = rho
    Bs = []
    for a in range(grid.dim):
        ua = u[a]
        s = jnp.sqrt(1.0 + 3.0 * ua * ua)
        pref = pref * (2.0 - s)
        Bs.append((2.0 * ua + s) / (1.0 - ua))
    out = []
    for i in range(grid.Q):
        t = pref * jnp.asarray(grid.weights[i], dtype)
        for a in range(grid.dim):
            c = int(grid.basis[i][a])
            if c == 1:
                t = t * Bs[a]
            elif c == -1:
                t = t / Bs[a]
        out.append(t)
    return jnp.stack(out)


def _entropy(grid, f):
    """H(f) = sum_i f_i (ln f_i - ln w_i) (entropic.mako:48-58)."""
    shape = (grid.Q,) + (1,) * (f.ndim - 1)
    logw = jnp.asarray(np.log(grid.weights), f.dtype).reshape(shape)
    return jnp.sum(f * (jnp.log(f) - logw), axis=0)


def alpha_series(grid, f, fneq):
    """Asymptotic expansion of the entropy equality in powers of fneq/f
    (PRL 97, 010201 (2006) Eq. 12; reference entropic.mako:9-45 and
    sym.alpha_series, sym.py:431-447)."""
    inv = 1.0 / f
    t = fneq * inv
    p = fneq * t          # fneq^2 / f
    a1 = jnp.sum(p, axis=0) * 0.5
    p = p * t
    a2 = jnp.sum(p, axis=0) * (-1.0 / 6.0)
    p = p * t
    a3 = jnp.sum(p, axis=0) * (1.0 / 12.0)
    p = p * t
    a4 = jnp.sum(p, axis=0) * (-1.0 / 20.0)
    ia1 = 1.0 / a1
    return (2.0
            - 4.0 * a2 * ia1
            + 16.0 * a2 * a2 * ia1 * ia1
            - 8.0 * a3 * ia1
            + 80.0 * a2 * a3 * ia1 * ia1
            - 80.0 * a2 ** 3 * ia1 ** 3
            - 16.0 * a4 * ia1)


def alpha_newton(grid, f, fneq, alpha0, iters=20, entropy_tol=1e-6):
    """Vectorized Newton iteration on H(f + alpha fneq) = H(f)
    (entropic.mako:90-144), with the max-alpha positivity safeguard."""
    ent0 = _entropy(grid, f)
    # max alpha keeping f + alpha fneq > 0
    ratio = jnp.where(fneq < 0.0, -f / fneq, jnp.inf)
    max_alpha = jnp.min(ratio, axis=0)
    shape = (grid.Q,) + (1,) * (f.ndim - 1)
    logw = jnp.asarray(np.log(grid.weights), f.dtype).reshape(shape)

    def body(_, alpha):
        t = f + alpha[None] * fneq
        t = jnp.maximum(t, 1e-12)
        h = jnp.log(t) - logw
        ent = jnp.sum(t * h, axis=0)
        dent = jnp.sum(fneq * (h + 1.0), axis=0)
        inc = ent - ent0
        new_alpha = alpha - inc / dent
        new_alpha = jnp.where(new_alpha > max_alpha,
                              0.5 * (alpha + max_alpha), new_alpha)
        new_alpha = jnp.where(jnp.isfinite(new_alpha), new_alpha, 1.1)
        done = jnp.abs(inc) < entropy_tol
        return jnp.where(done, alpha, new_alpha)

    return jax.lax.fori_loop(0, iters, body, alpha0)


def entropic_alpha(grid, f, fneq, alpha0=None):
    """Dispatch exactly as the reference (entropic.mako:160-184):
    tiny deviation -> 2; small -> series; large -> Newton."""
    dev = jnp.max(jnp.abs(fneq) / jnp.maximum(f, 1e-12), axis=0)
    a_series = alpha_series(grid, f, fneq)
    if alpha0 is None:
        alpha0 = jnp.full(dev.shape, 2.0, dtype=f.dtype)
    a_newton = alpha_newton(grid, f, fneq, alpha0)
    alpha = jnp.where(dev < 1e-6, 2.0,
                      jnp.where(dev < 0.01, a_series, a_newton))
    # safeguard (reference dies here; we clamp to BGK-equivalent)
    alpha = jnp.where(jnp.isfinite(alpha) & (alpha >= 1.0), alpha, 2.0)
    return alpha


def elbm_collide(grid, f, rho, u, tau, alpha0=None):
    """ELBM collision: f' = f + alpha beta (feq - f), beta = 1/(2 tau);
    alpha == 2 recovers BGK (reference relaxation.mako ELBM_relaxate
    :56-97). Returns (f', alpha)."""
    feq = elbm_equilibrium(grid, rho, u)
    fneq = feq - f
    alpha = entropic_alpha(grid, f, fneq, alpha0)
    beta = 1.0 / (2.0 * tau)
    return f + (alpha * beta)[None] * fneq, alpha
