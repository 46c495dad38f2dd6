"""2D fused-kernel equivalence vs the XLA engine (interpret mode)."""
import sys

import numpy as np
import pytest

sys.path.insert(0, 'examples')


def _run(sim_cls, engine, **cfg):
    from sailfish_tpu.controller import LBSimulationController
    ctrl = LBSimulationController(sim_cls, default_config=dict(
        quiet=True, engine=engine, **cfg))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    r._fields_to_host()
    return r.engine, np.array(r.sim.rho), np.array(r.sim.vx)


def test_pallas2d_matches_xla_periodic():
    from taylor_green_2d import TaylorGreenSim
    cfg = dict(lat_nx=128, lat_ny=128, max_iters=30, every=30, visc=0.01)
    _, rho_a, vx_a = _run(TaylorGreenSim, 'xla', **cfg)
    engine, rho_b, vx_b = _run(TaylorGreenSim, 'pallas', **cfg)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 1e-5
    assert np.max(np.abs(vx_a - vx_b)) < 1e-6


def test_pallas2d_matches_xla_ldc():
    """Walls (in-kernel mask) + lid (patched y-block)."""
    from ldc_2d import LDCSim
    cfg = dict(lat_nx=128, lat_ny=128, max_iters=25, every=25)
    _, rho_a, vx_a = _run(LDCSim, 'xla', **cfg)
    engine, rho_b, vx_b = _run(LDCSim, 'pallas', **cfg)
    assert engine == 'pallas'
    assert np.max(np.abs(rho_a - rho_b)) < 1e-5
    assert np.max(np.abs(vx_a - vx_b)) < 1e-6


def test_pallas2d_small_domain_falls_back():
    """Fewer than 4 y-blocks -> auto falls back to XLA."""
    from taylor_green_2d import TaylorGreenSim
    from sailfish_tpu.controller import LBSimulationController
    ctrl = LBSimulationController(TaylorGreenSim, default_config=dict(
        lat_nx=16, lat_ny=16, max_iters=5, every=5, quiet=True,
        engine='pallas'))
    with pytest.raises(NotImplementedError):
        ctrl.run(ignore_cmdline=True)