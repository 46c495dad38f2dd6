"""channel_cube's coupled recirculation step on a z-sharded mesh.

The reference runs the buffer and main regions as separate subdomains
with a one-way zmq connection (reference
examples/turbulence/channel_cube.py + subdomain_connection.py:410);
here both regions are jit-global arrays and the exit-plane -> ghost
-plane transfer crosses shard boundaries on a z-mesh, where GSPMD
lowers it to a collective permute. Gate: the 2-device run is bitwise
identical to the single-device run (same invariant as
tests/test_physics.py's GSPMD gates).
"""
import os

import pytest
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# buf_az=3, H=6 -> cube h=4, buffer length 12 (divisible by 2);
# main_az=4.75 -> lat_nz = 19 + 1 ghost = 20 (divisible by 2).
FLAGS = ['--H=6', '--Re_tau=60', '--buf_az=3', '--main_az=4.75',
         '--ay=2.5', '--stats_every=5']


def _run(tmp_path, tag, extra):
    base = str(tmp_path / ('cc_' + tag))
    cmd = [sys.executable,
           os.path.join(REPO, 'examples', 'turbulence',
                        'channel_cube.py'),
           '--platform=cpu', '--max_iters=10', '--every=10',
           '--seed=1234', '--quiet', '--output=' + base] + FLAGS + extra
    env = dict(os.environ)
    env['PYTHONPATH'] = os.pathsep.join(
        [REPO] + [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
                  if p])
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                        + ' --xla_force_host_platform_device_count=8')
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    return dict(np.load(base + '.0.0000010.npz'))


@pytest.mark.slow
def test_channel_cube_zmesh_matches_single(tmp_path):
    one = _run(tmp_path, 'one', [])
    two = _run(tmp_path, 'two', ['--mesh=2'])
    assert (one['node_type'] == two['node_type']).all()
    for k in ('rho', 'vx', 'vy', 'vz'):
        a, b = one[k], two[k]
        mask = np.isfinite(a)
        assert (np.isfinite(b) == mask).all()
        np.testing.assert_array_equal(a[mask], b[mask])
