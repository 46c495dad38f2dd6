#!/usr/bin/env python
"""Lid-driven cavity convergence monitor: ||u_n - u_{n-1}|| over time.

Runs the MRT cavity and records the change of the velocity-magnitude
field between samples -- a steady-state convergence diagnostic.
Counterpart of the reference's examples/ldc_2d_unorm.py, with the norm
sampled through a per-iteration device hook instead of host-side
after_step work.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ldc_2d import LDCSim
from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.geo import LBGeometry2D


class LDCSimUnorm(LDCSim):
    @classmethod
    def update_defaults(cls, defaults):
        super().update_defaults(defaults)
        defaults.update({
            'lat_nx': 128,
            'lat_ny': 128,
            'max_iters': 30000,
            'every': 250,
            'visc': 0.16011,
            'model': 'mrt',
        })

    @classmethod
    def add_options(cls, group, dim):
        group.add_argument('--unorm_every', type=int, default=523,
                           help='velocity-norm sampling stride')

    def before_main_loop(self, runner):
        cfg = self.config
        every = cfg.unorm_every
        nslots = cfg.max_iters // every + 2
        shape = (cfg.lat_ny, cfg.lat_nx)
        builder = runner.builder

        def umag(f):
            _, u = builder.macro_fields(f)
            return jnp.sqrt(jnp.sum(u * u, axis=0))

        init = (jnp.zeros(shape, jnp.float32),
                jnp.zeros((nslots, 3), jnp.float32))

        def hook(f, state, it):
            def do(state):
                u_prev, series = state
                u = umag(f)
                n = float(np.prod(shape))
                du = jnp.sqrt(jnp.sum((u - u_prev) ** 2)) / n
                un = jnp.sqrt(jnp.sum(u * u)) / n
                row = jnp.stack([jnp.asarray(it, jnp.float32), du, un])
                return u, series.at[it // every].set(row)

            return jax.lax.cond(jnp.mod(it, every) == 0, do,
                                lambda s: s, state)

        self._unorm_hook = self.add_device_hook(init, hook, every=every)
        self._unorm_runner = runner

    def unorm_series(self):
        _, series = self._unorm_runner.device_hook_state[self._unorm_hook]
        series = np.asarray(series)
        return series[series[:, 0] > 0][1:]  # drop the bootstrap sample

    def after_step(self, runner):
        if self.iteration >= self.config.max_iters and self.config.output:
            s = self.unorm_series()
            np.savez(f'{self.config.output}_unorm.npz',
                     it=s[:, 0], du_norm=s[:, 1], u_norm=s[:, 2])


if __name__ == '__main__':
    LBSimulationController(LDCSimUnorm, LBGeometry2D).run()
