"""z-sharded fused-kernel stepping (shard_map + ppermute ghost faces)
vs the XLA engine: the multi-chip analog of the reference's
regtest/subdomains suite for the fast path."""
import sys

import numpy as np

sys.path.insert(0, 'examples')


def test_sharded_pallas_matches_xla():
    from sphere_3d import SphereSimulation
    from sailfish_tpu.controller import LBSimulationController
    from sailfish_tpu.geo import LBGeometry3D

    def run(mesh, engine):
        ctrl = LBSimulationController(
            SphereSimulation, LBGeometry3D,
            default_config=dict(lat_nx=32, lat_ny=16, lat_nz=16,
                                max_iters=15, every=15, quiet=True,
                                mesh=mesh, engine=engine))
        ctrl.run(ignore_cmdline=True)
        r = ctrl._runner
        r._fields_to_host()
        return r.engine, np.array(r.sim.vx), np.array(r.sim.rho)

    _, vx_ref, rho_ref = run('', 'xla')
    engine, vx, rho = run('4', 'pallas')
    assert engine == 'pallas'
    assert np.max(np.abs(vx - vx_ref)) < 1e-5
    assert np.max(np.abs(rho - rho_ref)) < 1e-5


def test_sharded_pallas_rejects_complex_bc():
    """Under sharding, scenes with complex-BC planes are refused by the
    fused kernel (explicit request errors; auto falls back to XLA)."""
    import pytest

    from ldc_3d import LDCSim
    from sailfish_tpu.controller import LBSimulationController

    ctrl = LBSimulationController(LDCSim, default_config=dict(
        lat_nx=16, lat_ny=16, lat_nz=16, max_iters=10, every=10,
        quiet=True, mesh='4', engine='pallas'))
    with pytest.raises(NotImplementedError):
        ctrl.run(ignore_cmdline=True)
