#!/usr/bin/env python
"""Space-average Reynolds-stats files into a convergence time series.

Every input file contributes one row per field: the field averaged over
the requested array axis. Stacking the rows in filename order gives a
time series useful for judging statistical convergence. Counterpart of
the reference's examples/turbulence/utils/aggregate_timeseries.py.

Usage:
    python aggregate_timeseries.py <axis> <output.npz> <input-glob> ...
"""

import glob
import sys

import numpy as np


def build_timeseries(axis, filenames):
    series = {}
    for fname in filenames:
        with np.load(fname) as data:
            for key in data.files:
                row = np.average(data[key], axis=axis)
                if key in series:
                    series[key] = np.vstack([series[key], row])
                else:
                    series[key] = np.atleast_2d(row)
    return series


def main(argv):
    if len(argv) < 4:
        sys.stderr.write(__doc__)
        return 1
    axis = int(argv[1])
    filenames = []
    for pattern in argv[3:]:
        filenames.extend(sorted(glob.glob(pattern)))
    if not filenames:
        sys.stderr.write('no input files matched\n')
        return 1
    series = build_timeseries(axis, filenames)
    np.savez(argv[2], **series)
    print('%d snapshots -> %s' % (len(filenames), argv[2]))
    return 0


if __name__ == '__main__':
    sys.exit(main(sys.argv))
