"""Simulation runner: owns device state, the jitted step, and the main loop.

Counterpart of the reference's ``sailfish/subdomain_runner.py`` (:45 class,
:1537 run, :1668 main, :960 step). The TPU design collapses the reference's
process-per-GPU + two-stream + zmq machinery into one JAX process: the
whole domain lives in (optionally sharded) device arrays, the inner loop is
a jitted ``lax.fori_loop`` over collide-and-propagate steps (no host sync
between outputs), and multi-chip halo exchange is compiler-scheduled
(parallel/ shard_map wrapper).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from sailfish_tpu import equilibrium as eq
from sailfish_tpu import io as sio
from sailfish_tpu import util
from sailfish_tpu.parallel import mesh as pmesh


class SubdomainRunner:
    """Runs one simulation (whole domain; sharded over the mesh)."""

    def __init__(self, sim, geo, output=None, quit_event=None,
                 master_addr=None, summary_addr=None):
        self.sim = sim
        self.config = sim.config
        self.geo = geo
        self._output = output
        self._quit_event = quit_event or util.SimpleEvent()
        self._profile = util.TimingStats()
        self._timing_infos = []

    # -- initialization ------------------------------------------------------

    def _domain_shape(self):
        cfg = self.config
        if self.sim.dim == 2:
            return (cfg.lat_ny, cfg.lat_nx)
        return (cfg.lat_nz, cfg.lat_ny, cfg.lat_nx)

    def _init_geometry(self):
        shape = self._domain_shape()
        spec = self.geo.subdomains()[0].__class__(
            (0,) * self.sim.dim, tuple(reversed(shape)))
        self._subdomain = self.sim.subdomain(
            shape, spec, self.sim.grid, self.config)
        self._subdomain.reset()
        self.maps = self._subdomain.maps

    def _init_fields(self):
        shape = self._domain_shape()
        self.sim.init_fields(shape)
        args = self._subdomain._get_mgrid()
        self._subdomain.initial_conditions(self.sim, *args)

    def _init_state(self):
        dtype = self.config.dtype
        rho = jnp.asarray(self.sim.rho, dtype=dtype)
        u = jnp.asarray(np.stack(self.sim.velocity_components()),
                        dtype=dtype)
        self.f = eq.bgk_equilibrium(self.sim.grid, rho, u,
                                    incompressible=self.config.incompressible)
        self.builder = self.sim.make_step_builder(self.maps, dtype)
        self.mesh = None
        mesh_shape = pmesh.parse_mesh_shape(
            getattr(self.config, 'mesh', ''), self.sim.dim)
        if mesh_shape is not None:
            self.mesh = pmesh.make_mesh(mesh_shape, self.sim.dim)
            pmesh.validate_divisible(self._domain_shape(), self.mesh)
            self.f = pmesh.shard_dists(self.f, self.mesh, self.sim.dim)
            self.builder.shard_constants(self.mesh)
        step = self.builder.build()

        @jax.jit
        def run_steps(f, n):
            return jax.lax.fori_loop(0, n, lambda i, fc: step(fc), f)

        self._run_steps = run_steps
        self._macro = jax.jit(self.builder.macro_fields)

    # -- output & checkpoint -------------------------------------------------

    def _fields_to_host(self):
        rho, u = self._macro(self.f)
        rho = np.asarray(rho, dtype=np.float64)
        u = np.asarray(u, dtype=np.float64)
        self.sim.rho[...] = rho
        comps = self.sim.velocity_components()
        for a in range(self.sim.dim):
            comps[a][...] = u[a]

    def _output_fields(self):
        self._fields_to_host()
        if self._output is not None:
            self._output.save(self.sim.iteration)

    def save_checkpoint(self):
        """(reference subdomain_runner.py:1414-1431)"""
        fname = sio.checkpoint_filename(
            self.config.checkpoint_file,
            sio.filename_iter_digits(self.config.max_iters), 0,
            self.sim.iteration)
        data = {'state': np.array([self.sim.iteration], dtype=np.int64),
                'dist0a': np.asarray(self.f)}
        np.savez(fname, **data)

    def restore_checkpoint(self, fname):
        """(reference subdomain_runner.py:1433-1448)"""
        cpoint = np.load(fname, allow_pickle=True)
        self.sim.iteration = int(cpoint['state'][0])
        self.f = jnp.asarray(cpoint['dist0a'], dtype=self.config.dtype)

    # -- main loop -----------------------------------------------------------

    def run(self):
        self._init_geometry()
        self._init_fields()
        self._init_state()
        if self.config.restore_from:
            self.restore_checkpoint(
                sio.resolve_checkpoint(self.config.restore_from))
        self.sim.before_main_loop(self)
        return self.main()

    def _block_until_ready(self):
        jax.block_until_ready(self.f)

    def main(self):
        cfg = self.config
        sim = self.sim
        log = util.get_logger(cfg)
        total_nodes = int(np.prod(self._domain_shape()))
        bench_t0 = None
        bench_iters0 = 0
        t_start = time.time()
        mlups_history = []

        while sim.iteration < cfg.max_iters:
            if self._quit_event.is_set():
                break
            # how many steps until the next host interaction
            remaining = cfg.max_iters - sim.iteration
            chunk = cfg.every if cfg.every > 0 else remaining
            if cfg.checkpoint_every > 0:
                to_cp = cfg.checkpoint_every - (
                    sim.iteration % cfg.checkpoint_every)
                chunk = min(chunk, to_cp)
            chunk = max(1, min(chunk, remaining))
            t0 = time.time()
            self.f = self._run_steps(self.f, chunk)
            self._block_until_ready()
            t1 = time.time()
            sim.iteration += chunk
            mlups = total_nodes * chunk / (t1 - t0) / 1e6
            mlups_history.append(mlups)
            if cfg.mode == 'benchmark' and \
                    sim.iteration >= cfg.benchmark_sample_from:
                if bench_t0 is None:
                    bench_t0 = t1
                    bench_iters0 = sim.iteration
            if not cfg.quiet and cfg.perf_stats_every > 0 and \
                    (sim.iteration % cfg.perf_stats_every) < chunk:
                log.info('iteration:%d speed:%.2f MLUPS',
                         sim.iteration, mlups)
            if sim.need_output():
                self._output_fields()
                if cfg.check_invalid_results_host:
                    if not np.all(np.isfinite(self.sim.rho)):
                        log.error('invalid results (NaN/Inf) detected; '
                                  'aborting')
                        break
            sim.after_step(self)
            for hook in sim._mixin_after_step:
                hook(sim, self)
            if sim.need_checkpoint():
                self.save_checkpoint()

        if cfg.final_checkpoint and cfg.checkpoint_file:
            self.save_checkpoint()
        if cfg.output and cfg.every <= 0:
            self._output_fields()
        elapsed = time.time() - t_start
        result = util.TimingInfo(
            iters=sim.iteration, elapsed=elapsed,
            mlups=np.mean(mlups_history[1:]) if len(mlups_history) > 1
            else (mlups_history[0] if mlups_history else 0.0))
        if bench_t0 is not None and sim.iteration > bench_iters0:
            result = util.TimingInfo(
                iters=sim.iteration, elapsed=elapsed,
                mlups=total_nodes * (sim.iteration - bench_iters0)
                / (time.time() - bench_t0) / 1e6)
        self.timing = result
        return result
