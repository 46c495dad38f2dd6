"""On-line 2D slice visualization server.

Counterpart of the reference's ``sailfish/vis_mixin.py`` (Vis2DSliceMixIn
:36): extracts 2D slices of 3D (or 2D) fields and serves them over ZeroMQ
so a remote viewer can watch a running simulation. Protocol: an XPUB data
socket publishing zlib-compressed float32 slices with a JSON header, and a
REP control socket accepting {'token', 'axis', 'position', 'field',
'every'} updates, matching the reference's port/token option surface.
"""

from __future__ import annotations

import hashlib
import json
import os
import zlib

import numpy as np

from sailfish_tpu.models.base import LBMixIn


class VisConfig:
    """(reference vis_mixin.py:26-33)"""

    def __init__(self):
        self.every = 100
        self.axis = 0
        self.position = 0
        self.field = 0
        self.levels = 256


class Vis2DSliceMixIn(LBMixIn):
    """Serves 2D slices of the velocity/scalar fields over zmq
    (reference vis_mixin.py:36-270)."""

    @classmethod
    def add_options(cls, group, dim):
        group.add_argument('--visualizer_port', type=int, default=0,
                           help='control (REP) port; 0 = random')
        group.add_argument('--visualizer_data_port', type=int, default=0,
                           help='data (XPUB) port; 0 = random')
        group.add_argument('--visualizer_auth_token', type=str, default='',
                           help='control auth token; empty = generated')

    def before_main_loop(self, runner):
        import zmq
        self._vis_config = VisConfig()
        self._ctx = zmq.Context()
        self._sock = self._ctx.socket(zmq.XPUB)
        self._ctrl_sock = self._ctx.socket(zmq.REP)

        cfg = runner.config
        if cfg.visualizer_data_port > 0:
            self._port = cfg.visualizer_data_port
            self._sock.bind(f'tcp://*:{self._port}')
        else:
            self._port = self._sock.bind_to_random_port('tcp://*')
        if cfg.visualizer_port > 0:
            self._ctrl_port = cfg.visualizer_port
            self._ctrl_sock.bind(f'tcp://*:{self._ctrl_port}')
        else:
            self._ctrl_port = self._ctrl_sock.bind_to_random_port('tcp://*')

        if cfg.visualizer_auth_token:
            self._authtoken = cfg.visualizer_auth_token
        else:
            self._authtoken = hashlib.md5(os.urandom(64)).hexdigest()
        try:
            from sailfish_tpu import util
            util.get_logger(cfg).info(
                'Visualization data port %d, control port %d, token %s',
                self._port, self._ctrl_port, self._authtoken)
        except Exception:
            pass
        self._vis_runner = runner

    def _field_slices(self, runner):
        """name -> 2D numpy slice according to the current VisConfig."""
        runner._fields_to_host()
        sim = runner.sim
        fields = dict(sim.host_fields())
        v = fields.pop('v', None)
        out = {}
        if v is not None:
            for name, comp in zip(('vx', 'vy', 'vz'), v):
                out[name] = comp
        out.update(fields)
        vc = self._vis_config
        sliced = {}
        for name, arr in out.items():
            if arr.ndim == 3:
                # axis 0 = x, 1 = y, 2 = z (user convention); array axes
                # are (z, y, x)
                ax = arr.ndim - 1 - vc.axis
                pos = int(np.clip(vc.position, 0, arr.shape[ax] - 1))
                sliced[name] = np.take(arr, pos, axis=ax)
            else:
                sliced[name] = arr
        return sliced

    def _poll_control(self):
        import zmq
        while True:
            try:
                msg = self._ctrl_sock.recv_json(flags=zmq.NOBLOCK)
            except zmq.Again:
                return
            ok = isinstance(msg, dict) and \
                msg.get('token') == self._authtoken
            if ok:
                vc = self._vis_config
                for key in ('every', 'axis', 'position', 'field'):
                    if key in msg:
                        setattr(vc, key, int(msg[key]))
            self._ctrl_sock.send_json({'ack': bool(ok)})

    def after_step(self, runner):
        vc = getattr(self, '_vis_config', None)
        if vc is None:
            return
        if runner.sim.iteration % vc.every != 0:
            return
        self._poll_control()
        slices = self._field_slices(runner)
        names = sorted(slices)
        name = names[vc.field % len(names)]
        arr = np.ascontiguousarray(slices[name], dtype=np.float32)
        header = json.dumps({
            'field': name, 'fields': names, 'shape': arr.shape,
            'iteration': runner.sim.iteration, 'axis': vc.axis,
            'position': vc.position}).encode()
        self._sock.send_multipart([header, zlib.compress(arr.tobytes())])


def connect_slice_client(data_port, host='127.0.0.1'):
    """Convenience client: returns an iterator of (header dict, 2D array)
    published by a running Vis2DSliceMixIn (the counterpart of
    utils/visualizer.py's web frontend data path)."""
    import zmq
    ctx = zmq.Context()
    sock = ctx.socket(zmq.SUB)
    sock.connect(f'tcp://{host}:{data_port}')
    sock.setsockopt(zmq.SUBSCRIBE, b'')

    def gen():
        while True:
            header, payload = sock.recv_multipart()
            meta = json.loads(header.decode())
            arr = np.frombuffer(zlib.decompress(payload),
                                dtype=np.float32).reshape(meta['shape'])
            yield meta, arr

    return gen()
