#!/usr/bin/env python
"""Bit-exact / tolerance comparison of two simulation outputs.

Counterpart of the reference's utils/compare_results.py:17-21 (the golden
file harness, tests/goldens.sh)."""

import argparse
import sys

import numpy as np


def compare(file_a, file_b, rtol=0.0, atol=0.0):
    a = np.load(file_a)
    b = np.load(file_b)
    keys_a, keys_b = set(a.keys()), set(b.keys())
    ok = True
    if keys_a != keys_b:
        print(f'key mismatch: {sorted(keys_a ^ keys_b)}')
        ok = False
    for k in sorted(keys_a & keys_b):
        x, y = a[k], b[k]
        if x.shape != y.shape:
            print(f'{k}: shape mismatch {x.shape} vs {y.shape}')
            ok = False
            continue
        if rtol == 0.0 and atol == 0.0:
            same = np.array_equal(x, y)
            if not same:
                d = np.max(np.abs(x.astype(np.float64)
                                  - y.astype(np.float64)))
                print(f'{k}: NOT bit-exact (max abs diff {d:.3e})')
                ok = False
        else:
            if not np.allclose(x, y, rtol=rtol, atol=atol):
                d = np.max(np.abs(x.astype(np.float64)
                                  - y.astype(np.float64)))
                print(f'{k}: outside tolerance (max abs diff {d:.3e})')
                ok = False
    return ok


def main():
    p = argparse.ArgumentParser()
    p.add_argument('file_a')
    p.add_argument('file_b')
    p.add_argument('--rtol', type=float, default=0.0)
    p.add_argument('--atol', type=float, default=0.0)
    args = p.parse_args()
    if compare(args.file_a, args.file_b, args.rtol, args.atol):
        print('match')
        return 0
    return 1


if __name__ == '__main__':
    sys.exit(main())
