"""Fused-engine eligibility: requested-pallas errors name the reason,
and auto-mode fallback to the XLA engine is logged loudly (the
eligibility cliff is 4-7x; it must never be silent)."""
import logging
import sys

import numpy as np
import pytest

sys.path.insert(0, 'examples')
sys.path.insert(0, 'examples/binary_fluid')

from sailfish_tpu.controller import LBSimulationController  # noqa: E402


def _ldc_runner(**cfg):
    from ldc_3d import LDCSim
    base = dict(lat_nx=16, lat_ny=16, lat_nz=16, max_iters=0, every=0,
                quiet=True)
    base.update(cfg)
    ctrl = LBSimulationController(LDCSim, default_config=base)
    ctrl.run(ignore_cmdline=True)
    return ctrl._runner


def test_pallas_request_error_names_reason():
    """engine=pallas on an ineligible configuration raises with the
    specific blocker, not a generic catalog."""
    import jax
    from ldc_3d import LDCSim
    ctrl = LBSimulationController(LDCSim, default_config=dict(
        lat_nx=16, lat_ny=16, lat_nz=16, max_iters=0, every=0,
        quiet=True, engine='pallas', precision='double'))
    try:
        with pytest.raises(ValueError, match='fp32'):
            ctrl.run(ignore_cmdline=True)
    finally:
        # x64 is process-global; don't leak it into later tests
        jax.config.update('jax_enable_x64', False)


def test_auto_fallback_warns(monkeypatch, caplog):
    """auto-selection landing on the XLA engine for a reason other
    than the CPU backend logs a WARNING naming the reason."""
    import jax
    import jax.numpy as jnp
    r = _ldc_runner()
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    with caplog.at_level(logging.WARNING):
        engine = r._select_engine(jnp.float64)
    assert engine == 'xla'
    assert any('fp32' in rec.getMessage() for rec in caplog.records), \
        [rec.getMessage() for rec in caplog.records]


def test_sharded_multiphase_2axis_eligible_3axis_falls_back(monkeypatch,
                                                            caplog):
    """('y','x')-meshed multi-component scenes are fused-eligible
    (col_io boundary emission); a 3-axis-style unsupported mesh still
    falls back, naming the sharding blocker."""
    import jax
    import jax.numpy as jnp
    from fe_separation_2d import SeparationFESim
    np.random.seed(3)
    ctrl = LBSimulationController(SeparationFESim, default_config=dict(
        quiet=True, lat_nx=128, lat_ny=128, max_iters=0, every=0))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')

    class FusedMesh:
        axis_names = ('y', 'x')

    r.mesh = FusedMesh()
    assert r._select_engine(jnp.float32) == 'pallas'

    class BadMesh:
        axis_names = ('x', 'y')  # transposed order: GSPMD-only

    r.mesh = BadMesh()
    with caplog.at_level(logging.WARNING):
        engine = r._select_engine(jnp.float32)
    assert engine == 'xla'
    assert any('shard fused on' in rec.getMessage()
               for rec in caplog.records), \
        [rec.getMessage() for rec in caplog.records]


def test_fe_mrt_fused_eligible(monkeypatch):
    """--model=mrt on the FE binary model runs fused (the moment-wise
    FE-MRT relaxation, pallas_multi2d.fe_mrt_relax) -- the round-4
    fallback is gone."""
    import jax
    import jax.numpy as jnp
    from fe_separation_2d import SeparationFESim
    np.random.seed(3)
    ctrl = LBSimulationController(SeparationFESim, default_config=dict(
        quiet=True, lat_nx=128, lat_ny=128, max_iters=0, every=0,
        model='mrt'))
    ctrl.run(ignore_cmdline=True)
    r = ctrl._runner
    monkeypatch.setattr(jax, 'default_backend', lambda: 'tpu')
    assert r._select_engine(jnp.float32) == 'pallas'
