"""--precision=double end-to-end (reference codegen.py:19-29 text
transform; here just jax_enable_x64 + dtype plumbing, XLA engine)."""
import os

import pytest
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_ldc(tmp_path, precision):
    base = str(tmp_path / ('out_' + precision))
    cmd = [sys.executable, os.path.join(REPO, 'examples', 'ldc_2d.py'),
           '--platform=cpu', '--precision=' + precision,
           '--lat_nx=32', '--lat_ny=32', '--max_iters=50', '--every=50',
           '--quiet', '--output=' + base]
    env = dict(os.environ)
    env['PYTHONPATH'] = os.pathsep.join(
        [REPO] + [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
                  if p])
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    return dict(np.load(base + '.0.0000050.npz'))


@pytest.mark.slow
def test_double_precision_runs_and_matches_single(tmp_path):
    dbl = _run_ldc(tmp_path, 'double')
    sgl = _run_ldc(tmp_path, 'single')
    assert dbl['rho'].dtype == np.float64
    assert sgl['rho'].dtype == np.float32
    for k in ('rho', 'vx', 'vy'):
        mask = np.isfinite(sgl[k])
        np.testing.assert_allclose(
            dbl[k][mask], sgl[k][mask].astype(np.float64),
            rtol=0, atol=5e-5)
