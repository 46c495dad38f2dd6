"""Logging, timing, misc helpers (counterpart of sailfish/util.py)."""

from __future__ import annotations

import logging
from collections import namedtuple

import numpy as np

TimingInfo = namedtuple('TimingInfo', ('iters', 'elapsed', 'mlups'))


class SimpleEvent:
    """Single-process stand-in for multiprocessing.Event (the reference's
    quit_event; master.py:94-97)."""

    def __init__(self):
        self._flag = False

    def set(self):
        self._flag = True

    def is_set(self):
        return self._flag

    def clear(self):
        self._flag = False


class TimingStats:
    """Aggregates per-phase wall times (reference profile.py:54-103)."""

    def __init__(self):
        self.phases = {}

    def add(self, phase, dt):
        self.phases.setdefault(phase, []).append(dt)

    def summary(self):
        return {k: (float(np.mean(v)), float(np.min(v)), float(np.max(v)),
                    float(np.std(v)))
                for k, v in self.phases.items()}


def enable_compile_cache(path=None):
    """Enable JAX's persistent compilation cache. TPU kernel compiles for
    the fused step take minutes (remote compile service); the cache brings
    repeat runs of the same configuration down to seconds."""
    import os

    import jax
    if jax.default_backend() == 'cpu':
        # The axon remote-compile service may AOT-compile CPU code for a
        # different host microarchitecture (SIGILL risk); cache only
        # accelerator binaries.
        return
    path = path or os.path.expanduser('~/.cache/sailfish_tpu_jax')
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:   # pragma: no cover - cache is best-effort
        pass


_logger = None


def get_logger(config=None):
    """Console+file logger (reference util.py:187-213)."""
    global _logger
    if _logger is not None:
        return _logger
    logger = logging.getLogger('sailfish_tpu')
    logger.setLevel(logging.DEBUG)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            '[%(relativeCreated)6.0f %(levelname)5s] %(message)s'))
        logger.addHandler(handler)
        if config is not None and getattr(config, 'log', None):
            fh = logging.FileHandler(config.log)
            logger.addHandler(fh)
    if config is not None:
        if getattr(config, 'silent', False):
            logger.setLevel(logging.ERROR)
        elif getattr(config, 'quiet', False):
            logger.setLevel(logging.WARNING)
        elif getattr(config, 'verbose', False):
            logger.setLevel(logging.DEBUG)
        else:
            logger.setLevel(logging.INFO)
    _logger = logger
    return logger


def reset_logger():
    global _logger
    _logger = None


def kinetic_energy(vfield):
    """Mean kinetic energy of a (dim, ...) velocity field
    (reference util.py:215-230)."""
    return float(np.mean(np.sum(np.square(vfield), axis=0))) / 2.0


def vorticity2d(vx, vy):
    dvy_dx = np.gradient(vy, axis=-1)
    dvx_dy = np.gradient(vx, axis=-2)
    return dvy_dx - dvx_dy


def enstrophy2d(vx, vy):
    w = vorticity2d(vx, vy)
    return float(np.mean(w * w)) / 2.0


def energy_spectrum(vfield):
    """Isotropic kinetic-energy spectrum (reference util.py:231-292)."""
    dim = vfield.shape[0]
    ks = None
    e_k = None
    fts = [np.fft.fftn(vfield[a]) for a in range(dim)]
    mag = sum(np.abs(ft) ** 2 for ft in fts)
    shape = vfield.shape[1:]
    grids = np.meshgrid(*[np.fft.fftfreq(n) * n for n in shape],
                        indexing='ij')
    kmag = np.sqrt(sum(g * g for g in grids))
    kbins = np.arange(0.5, int(np.max(shape) // 2) + 1)
    which = np.digitize(kmag.flat, kbins)
    e = np.zeros(len(kbins) + 1)
    np.add.at(e, which, mag.flat)
    return e[1:-1] / (2.0 * np.prod(shape))


def cluster_env_spec():
    """Autodetect a multi-host launch from scheduler environment
    variables (counterpart of the reference's PBS/LSF cluster-spec
    detection, util.py:92-128, repurposed for jax.distributed).

    Returns (coordinator_address, num_processes, process_id) with None
    entries for anything the environment does not determine."""
    import os
    env = os.environ

    # SLURM (srun)
    if 'SLURM_PROCID' in env and 'SLURM_NTASKS' in env:
        coord = None
        nodelist = env.get('SLURM_STEP_NODELIST',
                           env.get('SLURM_NODELIST', ''))
        if nodelist:
            # first hostname of the (possibly compressed) node list
            head = nodelist.split(',')[0]
            if '[' in head:
                prefix, rng = head.split('[', 1)
                head = prefix + rng.split('-')[0].split(',')[0].rstrip(']')
            coord = head + ':8476'
        return coord, int(env['SLURM_NTASKS']), int(env['SLURM_PROCID'])

    # OpenMPI / mpirun
    if 'OMPI_COMM_WORLD_SIZE' in env:
        return (None, int(env['OMPI_COMM_WORLD_SIZE']),
                int(env['OMPI_COMM_WORLD_RANK']))

    # generic PMI rank (set by pbsdsh/blaunch/mpiexec process managers);
    # a scheduler allocation alone carries no per-process rank, so
    # without one of these the caller must pass --process_id explicitly
    def pmi_rank():
        for var in ('PMIX_RANK', 'PMI_RANK'):
            if var in env:
                return int(env[var])
        return None

    # PBS: the node file lists one line per allocated slot; rank comes
    # from pbsdsh (PBS_TASKNUM/PBS_VNODENUM) or the PMI layer
    if 'PBS_NODEFILE' in env:
        try:
            with open(env['PBS_NODEFILE']) as nf:
                hosts = [l.strip() for l in nf if l.strip()]
        except OSError:
            hosts = []
        if hosts:
            num = len(hosts)
            pid = pmi_rank()
            for var in ('PBS_TASKNUM', 'PBS_VNODENUM'):
                if pid is None and var in env:
                    pid = int(env[var])
            if pid is None:
                return hosts[0] + ':8476', num, None
            return hosts[0] + ':8476', num, pid

    # LSF: one LSB_HOSTS entry per slot; blaunch sets LSF_PM_TASKID
    # (1-based)
    if 'LSB_HOSTS' in env:
        hosts = env['LSB_HOSTS'].split()
        if hosts:
            pid = pmi_rank()
            if pid is None and 'LSF_PM_TASKID' in env:
                pid = int(env['LSF_PM_TASKID']) - 1
            return hosts[0] + ':8476', len(hosts), pid

    return None, None, None


def init_distributed(config, log=None):
    """Multi-host bootstrap: jax.distributed.initialize driven by
    explicit flags or scheduler env autodetection (the TPU-native
    replacement for the reference's execnet/SSH cluster startup,
    controller.py:496-658). Returns True if initialization ran."""
    import jax

    coord = getattr(config, 'coordinator_address', '') or None
    num = getattr(config, 'num_processes', 0) or None
    pid = getattr(config, 'process_id', -1)
    pid = None if pid is None or pid < 0 else pid
    if coord is None or num is None or pid is None:
        auto = cluster_env_spec()
        coord = coord or auto[0]
        num = num if num is not None else auto[1]
        pid = pid if pid is not None else auto[2]
    if num is not None and num > 1 and pid is None:
        raise RuntimeError(
            'multi-host launch detected (%d processes) but no per-process '
            'rank: the scheduler allocation carries no PMI rank variable. '
            'Launch through a process manager (srun/mpiexec/pbsdsh/'
            'blaunch) or pass --process_id explicitly.' % num)
    kwargs = {}
    if coord is not None:
        kwargs['coordinator_address'] = coord
    if num is not None:
        kwargs['num_processes'] = num
    if pid is not None:
        kwargs['process_id'] = pid
    if log is not None:
        log.info('multi-host init: %s', kwargs or 'TPU-pod autodetect')
    # on TPU pods jax.distributed.initialize() autodetects everything;
    # elsewhere the flags/env provide the spec
    jax.distributed.initialize(**kwargs)
    return True


def materialize(tree, n=2):
    """Force completion of a device computation by materializing a tiny
    slice of its first leaf on the host. jax.block_until_ready alone is
    not reliable for every array on the remote-device stack and can
    return before execution finishes (absurd benchmark numbers)."""
    import jax
    import numpy as np
    return np.asarray(jax.tree.leaves(tree)[0].ravel()[:n])
