"""Matplotlib visualization engine (headless frame writer).

Counterpart of the reference's ``sailfish/vis_mpl.py`` (:15) and the
pygame 2D engine (vis_2d.py): renders the velocity magnitude (plus any
scalar fields) of each output step to PNG frames, usable in batch/headless
environments. 3D fields are rendered as their mid-plane slice.
"""

from __future__ import annotations

import os

import numpy as np

from sailfish_tpu.vis import FluidVis, register_engine


@register_engine
class MatplotlibVis(FluidVis):
    name = 'mpl'

    def __init__(self, config, fields_fn, out_dir=None):
        super().__init__(config, fields_fn)
        self.out_dir = out_dir or (getattr(config, 'output', '') or
                                   'vis') + '_frames'
        os.makedirs(self.out_dir, exist_ok=True)
        import matplotlib
        matplotlib.use('Agg')

    @staticmethod
    def _to2d(arr):
        if arr.ndim == 3:
            return arr[arr.shape[0] // 2]
        return arr

    def update(self, iteration):
        import matplotlib.pyplot as plt
        fields = self.fields_fn()
        v = fields.pop('v', None)
        panels = {}
        if v is not None:
            vmag = np.sqrt(sum(np.square(self._to2d(c)) for c in v))
            panels['|v|'] = vmag
        for name, arr in fields.items():
            panels[name] = self._to2d(np.asarray(arr))
        n = len(panels)
        fig, axes = plt.subplots(1, n, figsize=(5 * n, 4.2))
        if n == 1:
            axes = [axes]
        for ax, (name, arr) in zip(axes, panels.items()):
            im = ax.imshow(arr, origin='lower', cmap='viridis')
            ax.set_title(f'{name}  it={iteration}')
            fig.colorbar(im, ax=ax, shrink=0.8)
        fig.tight_layout()
        fname = os.path.join(self.out_dir, f'frame_{iteration:07d}.png')
        fig.savefig(fname, dpi=100)
        plt.close(fig)
        return fname
