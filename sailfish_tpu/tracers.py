"""Passive tracer particles advected by the flow.

Counterpart of the reference's ``templates/tracers.mako`` (Euler advection
by the local fluid velocity with periodic wrapping; the reference's Python
integration was left as a TODO at lb_base.py:302 -- this module restores
the capability natively)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class TracerParticles:
    """Tracks N passive tracers on the device.

    positions: (dim, N) float array in (x, y[, z]) order, lattice units.
    """

    def __init__(self, positions, domain_shape):
        pos = np.asarray(positions, dtype=np.float64)
        assert pos.ndim == 2
        self.dim = pos.shape[0]
        # domain_shape is (.., z, y, x); sizes per (x, y, z) component
        self.sizes = tuple(reversed(domain_shape))
        self.positions = jnp.asarray(pos, dtype=jnp.float32)
        self._advect = jax.jit(self._advect_impl)

    def _advect_impl(self, pos, u):
        """One Euler step: x += u(floor(x)), periodic wrap
        (tracers.mako:75-104)."""
        idx = []
        for a in range(self.dim):
            ia = jnp.clip(pos[a].astype(jnp.int32), 0, self.sizes[a] - 1)
            idx.append(ia)
        # u is (dim, [z,] y, x): index with reversed component order
        gather_idx = tuple(reversed(idx))
        vel = jnp.stack([u[a][gather_idx] for a in range(self.dim)])
        new = pos + vel
        for a in range(self.dim):
            n = float(self.sizes[a])
            new = new.at[a].set(jnp.where(new[a] >= n, new[a] - n,
                                jnp.where(new[a] < 0.0, new[a] + n,
                                          new[a])))
        return new

    def update(self, runner):
        """Advance tracers by one (output-interval) step using the current
        velocity field."""
        _, u = runner._macro(runner.f)
        if isinstance(u, tuple):
            u = u[-1]
        self.positions = self._advect(self.positions, u)
        return self.positions

    def to_numpy(self):
        return np.asarray(self.positions)

    # checkpoint protocol (sim.register_checkpoint_object)
    def checkpoint_state(self):
        return {'positions': self.to_numpy()}

    def restore_checkpoint_state(self, state):
        self.positions = jnp.asarray(state['positions'],
                                     dtype=jnp.float32)
