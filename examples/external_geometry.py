#!/usr/bin/env python
"""Load geometry from an external Boolean .npy file (True = wall);
counterpart of reference examples/external_geometry.py. Generate such
files from STL meshes with utils/voxelizer."""

import os

import numpy as np

from sailfish_tpu.subdomain import Subdomain3D
from sailfish_tpu.node_type import NTFullBBWall
from sailfish_tpu.controller import LBSimulationController
from sailfish_tpu.models.single import LBFluidSim
from sailfish_tpu.models.base import LBForcedSim


def _make_default_pipe(path):
    """Sinusoidally constricted pipe (reference examples pipe.npy)."""
    a = np.zeros((41, 41, 128), dtype=bool)
    hz, hy, hx = np.mgrid[0:41, 0:41, 0:128]
    a[(hz - 20) ** 2 + (hy - 20) ** 2 >
      (19.3 * (0.8 + 0.2 * np.sin(2 * np.pi * hx / 128.0))) ** 2] = True
    np.save(path, a)
    return path


class ExternalSubdomain(Subdomain3D):
    def initial_conditions(self, sim, hx, hy, hz):
        sim.rho[:] = 1.0

    def boundary_conditions(self, hx, hy, hz):
        if hasattr(self.config, '_wall_map'):
            partial_wall_map = self.select_subdomain(
                self.config._wall_map, hx, hy, hz)
            self.set_node(partial_wall_map, NTFullBBWall)


class ExternalSimulation(LBFluidSim, LBForcedSim):
    subdomain = ExternalSubdomain

    @classmethod
    def add_options(cls, group, dim):
        group.add_argument('--geometry', type=str, default='pipe.npy',
                           help='Boolean .npy file defining walls')

    @classmethod
    def update_defaults(cls, defaults):
        defaults.update({
            'visc': 0.01,
            'grid': 'D3Q19',
            'periodic_x': True})

    @classmethod
    def modify_config(cls, config):
        if not config.geometry:
            return
        if config.geometry == 'pipe.npy':
            path = os.path.join(os.path.dirname(
                os.path.realpath(__file__)), config.geometry)
            if not os.path.exists(path):
                _make_default_pipe(path)
            config.geometry = path
        wall_map = np.load(config.geometry)
        config._wall_map = wall_map
        config.lat_nz, config.lat_ny, config.lat_nx = wall_map.shape

    def __init__(self, config):
        super().__init__(config)
        self.add_body_force((1e-5, 0.0, 0.0))


if __name__ == '__main__':
    ctrl = LBSimulationController(ExternalSimulation)
    ctrl.run()
