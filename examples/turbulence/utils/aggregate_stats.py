#!/usr/bin/env python
"""Time-average Reynolds-statistics files (no space averaging).

Each input is a ``*_reyn_stats.<iter>.npz`` written by a simulation
using ReynoldsStatsMixIn; every stored field is averaged across the
inputs with optional per-file weights. Counterpart of the reference's
examples/turbulence/utils/aggregate_stats.py.

Usage:
    python aggregate_stats.py <output.npz> <input[,weight]> ...
"""

import re
import sys

import numpy as np


def source_iteration(fname):
    """Iteration number encoded in the stats filename (-1 if absent)."""
    m = re.search(r'\.(\d+)\.npz$', fname)
    return int(m.group(1)) if m else -1


def aggregate(inputs):
    """Weighted field-wise mean over npz files.

    ``inputs`` is a list of (filename, weight). Returns (fields dict,
    list of source iterations). Weights are normalized by their sum.
    """
    total = {}
    weight_sum = 0.0
    sources = []
    for fname, weight in inputs:
        with np.load(fname) as data:
            for key in data.files:
                arr = weight * data[key]
                if key in total:
                    total[key] += arr
                else:
                    total[key] = arr
        weight_sum += weight
        sources.append(source_iteration(fname))
    for key in total:
        total[key] /= weight_sum
    return total, sources


def main(argv):
    if len(argv) < 3:
        sys.stderr.write(__doc__)
        return 1
    inputs = []
    for arg in argv[2:]:
        fname, _, weight = arg.partition(',')
        inputs.append((fname, float(weight) if weight else 1.0))
    fields, sources = aggregate(inputs)
    np.savez(argv[1], sources=np.asarray(sources), **fields)
    print('averaged %d files -> %s' % (len(inputs), argv[1]))
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv))
