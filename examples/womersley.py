#!/usr/bin/env python
"""Womersley flow: oscillatory pressure-driven pipe flow (counterpart of
reference examples/womersley.py). Demonstrates time-dependent boundary
conditions via DynamicValue; the reference uses sympy ``sin(S.time *
omega)``, here a jnp callable of the iteration number."""

from math import sqrt

import numpy as np

import jax.numpy as jnp

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.geo import EqualSubdomainsGeometry3D
from sailfish_tpu.node_type import NTEquilibriumDensity, DynamicValue

from poiseuille_3d import PoiseuilleSim, PoiseuilleSubdomain

omega = 0.0005
visc = 0.01


class WomersleySubdomain(PoiseuilleSubdomain):
    max_v = 0.04

    def _set_pressure_bc(self, hx, hy, hz, wall_map):
        inlet_map, outlet_map = self._inlet_outlet_maps(hx, hy, hz,
                                                        wall_map)
        dp = self.pressure_delta

        self.set_node(inlet_map, NTEquilibriumDensity(DynamicValue(
            lambda t: 1.0 + 1.5 * dp * jnp.sin(t * omega))))
        self.set_node(outlet_map, NTEquilibriumDensity(DynamicValue(
            lambda t: 1.0 - 1.5 * dp * jnp.sin(t * omega))))

        log = self.config.logger if hasattr(self.config, 'logger') else None
        if log:
            log.info('Re = %.2f' % (self.max_v * self.channel_width(
                self.config) / 2.0 / visc))
            log.info('Wo = %.2f' % (self.channel_width(self.config) / 2.0
                                    * sqrt(omega / visc)))

    def womersley_profile(self, r, t, alpha, omega_):
        """Analytic oscillatory profile (for validation)."""
        from scipy.special import jv
        dpdx = self.pressure_delta * self.channel_length
        A = 1j
        return np.real(
            (1 - jv(0, 1j ** 1.5 * alpha * r) / jv(0, 1j ** 1.5 * alpha))
            * np.exp(1j * omega_ * t) * A / omega_ * 1j) * dpdx


class WomersleySim(PoiseuilleSim):
    subdomain = WomersleySubdomain

    @classmethod
    def update_defaults(cls, defaults):
        PoiseuilleSim.update_defaults(defaults)
        defaults.update({
            'drive': 'pressure',
            'grid': 'D3Q19',
            'lat_nx': 256,
            'visc': visc,
        })


if __name__ == '__main__':
    LBSimulationController(WomersleySim, EqualSubdomainsGeometry3D).run()
