#!/usr/bin/env python
"""Convert simulation .npz output files to VTK XML ImageData (.vti).

Self-contained writer (no tvtk/vtk dependency): scalar fields and any
vx/vy[/vz] triple (merged into one vector array) are emitted as
base64-encoded inline point data, readable by ParaView/VisIt.
Counterpart of the reference's utils/npz_to_vti.py.

Usage:
    npz_to_vti.py out.0.0001000.npz [more.npz ...] [--spacing 1 1 1]
"""

import argparse
import base64
import os
import struct
import sys

import numpy as np


def _b64_block(raw):
    """VTK inline binary: uint32 byte count header + payload, base64."""
    header = struct.pack('<I', len(raw))
    return base64.b64encode(header + raw).decode()


def _data_array(name, arr, ncomp):
    body = _b64_block(np.ascontiguousarray(
        arr, dtype=np.float32).tobytes())
    return (f'<DataArray type="Float32" Name="{name}" '
            f'NumberOfComponents="{ncomp}" format="binary">'
            f'{body}</DataArray>')


def convert(path, out=None, spacing=(1.0, 1.0, 1.0)):
    data = np.load(path)
    fields = {k: data[k] for k in data.files}

    # group velocity components into a vector array
    vec = None
    comps = [k for k in ('vx', 'vy', 'vz') if k in fields]
    if len(comps) >= 2:
        stacked = np.stack([fields.pop(k) for k in comps], axis=-1)
        if stacked.shape[-1] == 2:   # pad 2D vectors to 3 components
            pad = np.zeros(stacked.shape[:-1] + (1,), stacked.dtype)
            stacked = np.concatenate([stacked, pad], axis=-1)
        vec = stacked

    ref = vec[..., 0] if vec is not None else next(iter(fields.values()))
    shape = ref.shape                   # (gy, gx) or (gz, gy, gx)
    nx = shape[-1]
    ny = shape[-2]
    nz = shape[-3] if len(shape) == 3 else 1
    extent = f'0 {nx - 1} 0 {ny - 1} 0 {nz - 1}'
    sx, sy, sz = spacing

    arrays = []
    for name, arr in sorted(fields.items()):
        if arr.shape != shape:
            continue                    # skip non-grid metadata arrays
        arrays.append(_data_array(name, arr, 1))
    if vec is not None:
        arrays.append(_data_array('v', vec, 3))

    out = out or os.path.splitext(path)[0] + '.vti'
    with open(out, 'w') as fp:
        fp.write('<?xml version="1.0"?>\n')
        fp.write('<VTKFile type="ImageData" version="0.1" '
                 'byte_order="LittleEndian">\n')
        fp.write(f'<ImageData WholeExtent="{extent}" Origin="0 0 0" '
                 f'Spacing="{sx} {sy} {sz}">\n')
        fp.write(f'<Piece Extent="{extent}">\n<PointData>\n')
        for a in arrays:
            fp.write(a + '\n')
        fp.write('</PointData>\n</Piece>\n</ImageData>\n</VTKFile>\n')
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument('files', nargs='+')
    p.add_argument('--spacing', type=float, nargs=3,
                   default=(1.0, 1.0, 1.0))
    args = p.parse_args(argv)
    for f in args.files:
        print(convert(f, spacing=tuple(args.spacing)))
    return 0


if __name__ == '__main__':
    sys.exit(main())
