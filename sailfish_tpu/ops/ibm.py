"""Immersed-boundary method: Lagrangian particles coupled to the fluid.

Counterpart of the reference's IBM support (lb_single.LBIBMFluidSim
:350-405, templates/ibm.mako): particles tethered to reference positions
by Hookean springs spread their forces onto the grid with the phi_2
kernel (support 2, w = prod_a (1 - |x_a - X_a|)), the LB step runs with
that force field, and particle positions advance by the interpolated
fluid velocity (Euler).

Note: the reference's 3D spreading/interpolation loops only cover a
single z layer (ibm.mako:29,85 ``z < zmin + 1``) -- a bug; this
implementation uses the full 2-point support along every axis.

Scatter/gather use jnp advanced indexing: particle counts are small
relative to the grid, so XLA's scatter-add is cheap next to the fused
fluid step.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

from sailfish_tpu.ops.step import StepBuilder


def _corner_weights(pos, dim):
    """For positions (dim, Np) returns per-corner (idx tuples, weights).

    Corners are the 2^dim integer nodes around each particle; weights the
    phi_2 tensor product. Index arrays are in array-axis order
    ([z,] y, x); positions are (x, y[, z])."""
    base = [jnp.floor(pos[a]).astype(jnp.int32) for a in range(dim)]
    frac = [pos[a] - base[a].astype(pos.dtype) for a in range(dim)]
    out = []
    for corner in itertools.product((0, 1), repeat=dim):
        w = None
        idx = []
        for a, c in enumerate(corner):
            wa = frac[a] if c else (1.0 - frac[a])
            w = wa if w is None else w * wa
            idx.append(base[a] + c)
        # array axis order: reverse (x, y, z) -> (z, y, x)
        out.append((tuple(reversed(idx)), w))
    return out


def spread_forces(pos, ref_pos, stiffness, shape, dtype):
    """Hookean spring forces spread onto the grid -> (dim, *shape)
    (ibm.mako SpreadParticleForcesStiff)."""
    dim = pos.shape[0]
    spring = -stiffness[None] * (pos - ref_pos)     # (dim, Np)
    force = jnp.zeros((dim,) + tuple(shape), dtype=dtype)
    for idx, w in _corner_weights(pos, dim):
        # clamp to the domain (particles should stay inside)
        idx = tuple(jnp.clip(i, 0, n - 1)
                    for i, n in zip(idx, shape))
        for a in range(dim):
            force = force.at[(a,) + idx].add(w * spring[a])
    return force


def interpolate_velocity(u, pos):
    """Fluid velocity at particle positions -> (dim, Np)
    (ibm.mako UpdateParticlePosition)."""
    dim = pos.shape[0]
    shape = u.shape[1:]
    vel = None
    for idx, w in _corner_weights(pos, dim):
        idx = tuple(jnp.clip(i, 0, n - 1) for i, n in zip(idx, shape))
        sample = jnp.stack([u[(a,) + idx] for a in range(dim)])
        contrib = w[None] * sample
        vel = contrib if vel is None else vel + contrib
    return vel


class IBMStepBuilder(StepBuilder):
    """Fluid step + particle update. State = (f, positions)."""

    def __init__(self, grid, maps, *, ref_positions, stiffness,
                 **kwargs):
        super().__init__(grid, maps, **kwargs)
        self.ref_pos = jnp.asarray(ref_positions, dtype=self.dtype)
        self.stiffness = jnp.asarray(stiffness, dtype=self.dtype)

    def build(self):
        from sailfish_tpu import equilibrium as eq
        shape = self.maps.type_map.shape
        wet = self.dev['wet']

        def step(state, it=0):
            f, pos = state
            force = spread_forces(pos, self.ref_pos, self.stiffness,
                                  shape, self.dtype)
            fs = self.fix_missing(self.gather(f), f)
            rho, u = eq.macroscopic(self.grid, fs)
            params = self.bc_params(it)
            rho, u = self._solve_macro_bc(fs, rho, u, params)
            fs2 = self._pre_collision_bc(fs, rho, u)
            # IBM spring forces are FORCE densities: accel = F / rho
            accel = force / rho[None]
            if self.force_dev is not None:
                accel = accel + self.force_dev
            u_eq = u + 0.5 * accel
            feq = self.feq(rho, u_eq)
            fpost = fs2 + self.tau_inv * (feq - fs2)
            from sailfish_tpu.ops import collide as co
            fpost = fpost + co.guo_force_terms(self.grid, u_eq, accel,
                                               self.tau_inv, rho)
            if self.has_dry:
                fpost = jnp.where(wet[None], fpost, fs2)
            fpost = self._post_collision(fs2, fpost)
            fpost = self._apply_tms(fpost, rho, u)
            fpost = self._guo_density_overlay(fs, fpost, params)
            # particle update from the post-collision velocity field
            u_new = u + 0.5 * accel
            vel = interpolate_velocity(u_new, pos)
            return (fpost, pos + vel)

        return step

    def macro_fields(self, state, it=0):
        f, _ = state
        return super().macro_fields(f, it)
