"""Visualization engine base classes and registry.

Counterpart of the reference's ``sailfish/vis.py`` (FluidVis :8,23). The
reference forks pygame/mayavi GUI processes from the machine master
(master.py:182-233); those interactive engines are replaced by the
headless matplotlib engine (vis_mpl) writing frames, and by the zmq slice
server (vis_mixin) for live remote viewing -- a deliberate drop of the
ropenglhack/pygame stack (SURVEY.md section 2.7).
"""

from __future__ import annotations


class FluidVis:
    """Base class for visualization engines."""

    name = None

    #: dict of field name -> 2D array transformations for display
    @classmethod
    def add_options(cls, group):
        return False

    def __init__(self, config, fields_fn):
        """:param fields_fn: callable returning {name: 2D array}."""
        self.config = config
        self.fields_fn = fields_fn

    def update(self, iteration):
        raise NotImplementedError


_ENGINES = {}


def register_engine(cls):
    _ENGINES[cls.name] = cls
    return cls


def engine_by_name(name):
    if name not in _ENGINES:
        from sailfish_tpu import vis_mpl  # noqa: F401  (registers 'mpl')
    try:
        return _ENGINES[name]
    except KeyError:
        raise ValueError(f'unknown vis engine {name!r}; '
                         f'known: {sorted(_ENGINES)}')
