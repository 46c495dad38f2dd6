#!/usr/bin/env python
"""Wall shear stress from a simulation output file.

Counterpart of the reference's ``utils/wss.py``: given an output .npz
(rho + velocity fields) and the wall map (recomputed from a geometry
.npy or inferred from zero-velocity nodes), computes the magnitude of
the viscous shear stress on wall-adjacent fluid nodes:

    tau_w = rho nu |du_t / dn|

approximated with one-sided first-order differences along the wall
normal (the reference uses the same near-wall gradient estimate).
"""

import argparse
import sys

import numpy as np


def wall_shear_stress(rho, vel, wall, visc):
    """vel: (dim, *S); wall: bool (*S). Returns (wss, mask) where wss is
    defined on fluid nodes adjacent to a wall."""
    dim = vel.shape[0]
    fluid = ~wall
    wss = np.zeros(rho.shape, dtype=np.float64)
    near_wall = np.zeros(rho.shape, dtype=bool)
    for axis in range(rho.ndim):
        for sign in (1, -1):
            wall_n = np.roll(wall, -sign, axis=axis)
            sel = fluid & wall_n
            if not sel.any():
                continue
            # normal = axis direction; tangential velocity = components
            # perpendicular to it. One-sided gradient toward the interior.
            interior = np.roll(vel, sign, axis=1 + axis)
            comp_of_axis = rho.ndim - 1 - axis  # array axis -> (x,y,z)
            dut = 0.0
            for a in range(dim):
                if a == comp_of_axis:
                    continue
                # du_t/dn ~ (u_t(interior) - u_t(node)) with u_t(wall)=0:
                # use the node value itself over half spacing
                dut = dut + np.square(vel[a])
            tau = rho * visc * 2.0 * np.sqrt(dut)  # wall at half spacing
            wss[sel] = np.maximum(wss[sel], tau[sel])
            near_wall |= sel
    return wss, near_wall


def main():
    p = argparse.ArgumentParser()
    p.add_argument('output', help='simulation output .npz')
    p.add_argument('--visc', type=float, required=True)
    p.add_argument('--geometry', type=str, default='',
                   help='bool .npy wall map; default: zero-velocity nodes')
    p.add_argument('--save', type=str, default='',
                   help='write wss field to this .npy')
    args = p.parse_args()

    data = np.load(args.output)
    rho = data['rho']
    comps = [data[k] for k in ('vx', 'vy', 'vz') if k in data]
    vel = np.stack(comps)
    if args.geometry:
        wall = np.load(args.geometry)
    elif 'node_type' in data:
        wall = data['node_type'] != 0
    else:
        print('no --geometry given and no node_type field in the output; '
              'rerun the simulation with this build (outputs include '
              'node_type) or pass a wall-map .npy')
        return 1
    wss, mask = wall_shear_stress(rho, vel, wall, args.visc)
    vals = wss[mask]
    if vals.size == 0:
        print('no wall-adjacent fluid nodes found')
        return 1
    print(f'wall-adjacent nodes: {vals.size}')
    print(f'WSS mean: {vals.mean():.4e}  max: {vals.max():.4e}  '
          f'p95: {np.percentile(vals, 95):.4e}')
    if args.save:
        np.save(args.save, wss)
        print('wrote', args.save)
    return 0


if __name__ == '__main__':
    sys.exit(main())
