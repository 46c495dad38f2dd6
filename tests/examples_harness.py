#!/usr/bin/env python
"""Golden-file harness over the example suite.

Counterpart of the reference's tests/goldens.sh / make_goldens.sh /
run_examples.sh (:1-20): every example runs a fixed short number of
iterations with a fixed seed; outputs are stored as goldens
(``--make``) or compared against them (default). Smoke mode (``--smoke``)
just checks that every example runs and produces finite fields.

Not collected by pytest (no test_ prefix); run explicitly:
    python tests/examples_harness.py --smoke
"""

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, 'tests', 'goldens')

# example -> extra flags (kept small so everything runs in seconds)
EXAMPLES = {
    'ldc_2d.py': ['--lat_nx=32', '--lat_ny=32'],
    'ldc_3d.py': ['--lat_nx=16', '--lat_ny=16', '--lat_nz=16'],
    'poiseuille.py': ['--lat_nx=32', '--lat_ny=32'],
    'poiseuille_3d.py': ['--lat_nx=16', '--lat_ny=16', '--lat_nz=16'],
    'cylinder.py': ['--lat_nx=64', '--lat_ny=32'],
    'taylor_green_2d.py': ['--lat_nx=32', '--lat_ny=32'],
    'sphere_3d.py': ['--lat_nx=32', '--lat_ny=16', '--lat_nz=16'],
    'sc_phase_separation.py': ['--lat_nx=32', '--lat_ny=32'],
    'sc_phase_separation_3d.py': ['--lat_nx=16', '--lat_ny=16',
                                  '--lat_nz=16'],
    'external_geometry.py': [],
    'womersley.py': ['--lat_nx=32', '--lat_ny=12', '--lat_nz=12'],
    'binary_fluid/sc_separation_2d.py': ['--lat_nx=32', '--lat_ny=32'],
    'binary_fluid/fe_separation_2d.py': ['--lat_nx=32', '--lat_ny=32'],
    'duct_flow.py': ['--lat_nx=16', '--lat_ny=16', '--lat_nz=8'],
    'sc_drop.py': ['--lat_nx=48', '--lat_ny=48'],
    'four_rolls_mill.py': ['--lat_nx=32', '--lat_ny=32'],
    'ibm_cylinder.py': ['--lat_nx=48', '--lat_ny=24'],
    'ldc_2d_entropic.py': ['--lat_nx=32', '--lat_ny=32'],
    'binary_fluid/sc_rayleigh_taylor_2d.py': ['--lat_nx=32',
                                              '--lat_ny=32'],
    'binary_fluid/fe_poiseuille_2d.py': ['--lat_nx=32', '--lat_ny=32'],
    'binary_fluid/sc_separation_3d.py': ['--lat_nx=16', '--lat_ny=16',
                                         '--lat_nz=16'],
    'square_cylinder_2d.py': ['--lat_nx=64', '--lat_ny=32'],
    'turbulence/channel_flow.py': ['--H=8', '--Re_tau=60', '--wall=tms',
                                   '--stats_every=5'],
    'turbulence/kida_vortex.py': ['--lat_nx=16', '--lat_ny=16',
                                  '--lat_nz=16', '--visc=0.01',
                                  '--stats_every=5'],
    'fs_gaussian.py': ['--lat_nx=32', '--lat_ny=32'],
    'poiseuille_pulsatile.py': ['--lat_nx=48', '--lat_ny=24'],
    'poiseuille_sa.py': ['--lat_nx=48', '--lat_ny=32',
                         '--velocity=spatial_array'],
    'ldc_2d_unorm.py': ['--lat_nx=32', '--lat_ny=32',
                        '--unorm_every=7'],
    'binary_fluid/sc_laplace_2d.py': ['--lat_nx=64', '--lat_ny=64'],
    'binary_fluid/sc_drop_2d.py': ['--lat_nx=64', '--lat_ny=64'],
    'binary_fluid/sc_poiseuille_2d.py': ['--lat_nx=66', '--lat_ny=32'],
    'binary_fluid/sc_capillary_wave_2d.py': ['--lat_nx=64',
                                             '--lat_ny=66'],
    'binary_fluid/fe_capillary_wave_2d.py': ['--lat_nx=64',
                                             '--lat_ny=66'],
    'binary_fluid/fe_separation_3d.py': ['--lat_nx=16', '--lat_ny=16',
                                         '--lat_nz=16'],
    'binary_fluid/fe_viscous_fingering.py': ['--lat_nx=160',
                                             '--lat_ny=32',
                                             '--lat_nz=16'],
    'binary_fluid/binary_microchannel.py': ['--H=17'],
    'binary_fluid/sc_separation_3d_walls.py': ['--lat_nx=24',
                                               '--lat_ny=24',
                                               '--lat_nz=24'],
    'ternary_fluid/sc_drop_2d.py': ['--lat_nx=64', '--lat_ny=64'],
    'binary_fluid/sc_capillary.py': ['--lat_nx=96', '--lat_ny=32'],
    'turbulence/channel_cube.py': ['--H=6', '--Re_tau=60',
                                   '--buf_az=3', '--main_az=5',
                                   '--ay=2.5', '--stats_every=5'],
    'porous_anisotropy.py': ['--lat_nx=16', '--lat_ny=16',
                             '--lat_nz=16', '--porosity=0.75'],
}

ITERS = 20


def run_example(name, flags, out_base):
    cmd = [sys.executable, os.path.join(REPO, 'examples', name),
           '--platform=cpu', f'--max_iters={ITERS}', f'--every={ITERS}',
           '--seed=1234', '--quiet', f'--output={out_base}'] + flags
    env = dict(os.environ)
    env['PYTHONHASHSEED'] = '0'
    env['PYTHONPATH'] = os.pathsep.join(
        [REPO] + [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
                  if p])
    r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       cwd=os.path.join(REPO, 'examples'))
    if r.returncode != 0:
        raise RuntimeError(f'{name} failed:\n{r.stdout}\n{r.stderr}')
    fname = f'{out_base}.0.{ITERS:07d}.npz'
    if not os.path.exists(fname):
        raise RuntimeError(f'{name}: no output file {fname}')
    return fname


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--make', action='store_true',
                   help='store outputs as goldens')
    p.add_argument('--smoke', action='store_true',
                   help='only check examples run and are finite')
    p.add_argument('--only', type=str, default='')
    args = p.parse_args()

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    failures = []
    for name, flags in EXAMPLES.items():
        if args.only and args.only not in name:
            continue
        tag = name.replace('/', '_').replace('.py', '')
        try:
            with tempfile.TemporaryDirectory() as tmp:
                np.random.seed(1234)
                out = run_example(name, flags, os.path.join(tmp, tag))
                data = dict(np.load(out))
                finite = all(np.all(np.isfinite(v)) for v in data.values())
                if not finite:
                    raise RuntimeError('non-finite output')
                golden = os.path.join(GOLDEN_DIR, tag + '.npz')
                if args.make:
                    np.savez(golden, **data)
                    status = 'golden written'
                elif args.smoke or not os.path.exists(golden):
                    status = 'ok (smoke)'
                else:
                    ref = np.load(golden)
                    for k in ref.keys():
                        # atol covers cross-session CPU FMA-contraction
                        # drift (XLA re-associates differently across
                        # jax builds/machines; fe_poiseuille_2d once
                        # accumulated 1.7e-7 on ~5e-6 near-zero vy over
                        # 20 iters with NO code change). Physics values
                        # are 1e-3..1, so 5e-7 still catches real
                        # regressions.
                        np.testing.assert_allclose(
                            data[k], ref[k], rtol=1e-5, atol=5e-7,
                            err_msg=f'{name}:{k}')
                    status = 'matches golden'
            print(f'{name:<40s} {status}')
        except Exception as e:
            print(f'{name:<40s} FAIL: {e}')
            failures.append(name)
    if failures:
        print('FAILURES:', failures)
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
