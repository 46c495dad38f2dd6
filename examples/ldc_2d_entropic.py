#!/usr/bin/env python
"""Entropic-LBM 2D lid-driven cavity with alpha-field output (counterpart
of reference examples/ldc_2d_entropic.py)."""

from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.single import LBEntropicFluidSim

import ldc_2d


class EntropicLDCBlock(ldc_2d.LDCBlock):
    # slower lid (the entropic run targets a higher Re via visc, not
    # lid speed); subclassed -- mutating ldc_2d.LDCBlock.max_v would
    # leak into every later import of the shared scene
    max_v = 0.01


class EntropicLDCSim(LBEntropicFluidSim):
    subdomain = EntropicLDCBlock

    @classmethod
    def update_defaults(cls, defaults):
        defaults.update({
            'lat_nx': 256,
            'lat_ny': 256,
            'visc': 1e-4})


if __name__ == '__main__':
    LBSimulationController(EntropicLDCSim).run()
