#!/usr/bin/env python
"""Client for the Vis2DSliceMixIn slice server.

Connects to a running simulation's data (XPUB) and control (REP) ports,
optionally reconfigures the served slice, and renders received frames
with matplotlib -- live when a display is available, or to PNG files
with --save. Counterpart of the reference's wx-based
utils/visualizer.py front end.

Usage:
    visualizer.py --data_port P [--ctrl_port P --token T]
                  [--axis 2 --position 16 --field 0 --every 50]
                  [--save out_%06d.png --frames 100]
"""

import argparse
import json
import sys
import zlib

import numpy as np


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument('--host', type=str, default='127.0.0.1')
    p.add_argument('--data_port', type=int, required=True)
    p.add_argument('--ctrl_port', type=int, default=0)
    p.add_argument('--token', type=str, default='')
    p.add_argument('--axis', type=int, default=None)
    p.add_argument('--position', type=int, default=None)
    p.add_argument('--field', type=int, default=None)
    p.add_argument('--every', type=int, default=None)
    p.add_argument('--save', type=str, default='',
                   help='PNG filename pattern (e.g. frame_%%06d.png); '
                        'empty = interactive window')
    p.add_argument('--frames', type=int, default=0,
                   help='stop after N frames (0 = run forever)')
    p.add_argument('--cmap', type=str, default='viridis')
    return p.parse_args(argv)


def send_control(args):
    """Push any requested slice-config changes to the REP socket."""
    updates = {k: getattr(args, k) for k in
               ('axis', 'position', 'field', 'every')
               if getattr(args, k) is not None}
    if not updates:
        return
    if not (args.ctrl_port and args.token):
        print('control update requested but --ctrl_port/--token missing',
              file=sys.stderr)
        return
    import zmq
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.REQ)
    sock.connect(f'tcp://{args.host}:{args.ctrl_port}')
    updates['token'] = args.token
    sock.send_json(updates)
    reply = sock.recv_json()
    if not reply.get('ack'):
        print('control update rejected (bad token?)', file=sys.stderr)
    sock.close()


def frames(args):
    import zmq
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.SUB)
    sock.connect(f'tcp://{args.host}:{args.data_port}')
    sock.setsockopt(zmq.SUBSCRIBE, b'')
    while True:
        header, payload = sock.recv_multipart()
        meta = json.loads(header.decode())
        arr = np.frombuffer(zlib.decompress(payload),
                            dtype=np.float32).reshape(meta['shape'])
        yield meta, arr


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    send_control(args)

    import matplotlib
    if args.save:
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    image = None
    count = 0
    for meta, arr in frames(args):
        if image is None:
            image = ax.imshow(arr, origin='lower', cmap=args.cmap)
            cbar = fig.colorbar(image, ax=ax)
        else:
            image.set_data(arr)
            image.set_clim(float(arr.min()), float(arr.max()))
        ax.set_title(f"{meta['field']}  it={meta['iteration']}")
        if args.save:
            fig.savefig(args.save % count
                        if '%' in args.save else args.save)
        else:
            plt.pause(0.01)
        count += 1
        if args.frames and count >= args.frames:
            break
    return 0


if __name__ == '__main__':
    sys.exit(main())
