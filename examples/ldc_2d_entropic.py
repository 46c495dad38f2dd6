#!/usr/bin/env python
"""Entropic-LBM 2D lid-driven cavity with alpha-field output (counterpart
of reference examples/ldc_2d_entropic.py)."""

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.single import LBEntropicFluidSim

import ldc_2d

ldc_2d.LDCBlock.max_v = 0.01


class EntropicLDCSim(LBEntropicFluidSim):
    subdomain = ldc_2d.LDCBlock

    @classmethod
    def update_defaults(cls, defaults):
        defaults.update({
            'lat_nx': 256,
            'lat_ny': 256,
            'visc': 1e-4})


if __name__ == '__main__':
    LBSimulationController(EntropicLDCSim).run()
