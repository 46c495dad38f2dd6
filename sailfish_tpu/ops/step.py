"""The fused collide-and-propagate step as a traced JAX function.

TPU-native counterpart of the reference's generated CollideAndPropagate
kernel (``templates/models/lb_single_fluid.mako:161-229``: getDist ->
fixMissingDistributions -> getMacro -> precollisionBoundaryConditions ->
relaxate -> postcollisionBoundaryConditions -> propagate). There is no
runtime codegen: a ``StepBuilder`` specializes a jittable python function
at trace time using the *static* set of node types / orientations present
in the scene, so only the BC branches actually used are materialized, as
dense masked selects (TPUs prefer masking over divergent branching).

Streaming is the pull scheme on an AB buffer pair: the output array is a
fresh buffer and the input may be donated by the caller. Periodic wrap is
the natural semantics of jnp.roll; non-periodic domain edges must be
covered by boundary nodes, which either reconstruct or never re-emit the
wrapped values (same contract as the reference's ghost layer).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sailfish_tpu import equilibrium as eq
from sailfish_tpu import node_type as nt
from sailfish_tpu.equilibrium import signed_sum
from sailfish_tpu.ops import collide as co


def pull(arr, vec):
    """Value of ``arr`` at x - vec (vec in (cx, cy[, cz]) order), i.e. the
    streaming gather: roll by +vec with (z, y, x) axis order."""
    shifts, axes = [], []
    for a, comp in enumerate(vec):
        if comp:
            shifts.append(int(comp))
            axes.append(arr.ndim - 1 - a)
    return jnp.roll(arr, shifts, axes) if shifts else arr


def sample(arr, vec):
    """Value of ``arr`` at x + vec."""
    return pull(arr, [-int(c) for c in vec])


class StepBuilder:
    """Builds the single-device step function for a single-fluid model.

    Parameters mirror what the reference assembles into its Mako context
    (subdomain_runner.py:182-248, lb_single.py:52-70): lattice, relaxation
    model, forces, subgrid model, and the encoded node maps.
    """

    def __init__(self, grid, maps, *, model='bgk', visc=None, tau=None,
                 incompressible=False, regularized=False,
                 smagorinsky=0.0, body_force=None, force_model='guo',
                 dtype=jnp.float32):
        from sailfish_tpu import lattice as lat
        self.grid = grid
        self.maps = maps
        self.model = model
        self.tau = float(tau if tau is not None
                         else lat.relaxation_time(visc))
        self.tau_inv = 1.0 / self.tau
        self.incompressible = incompressible
        self.regularized = regularized
        self.smagorinsky = smagorinsky
        self.body_force = body_force      # None | (dim,) numpy | field
        self.force_model = force_model
        self.dtype = dtype
        self._prepare_static()

    # -- static (trace-time) preprocessing ----------------------------------

    def _prepare_static(self):
        g = self.grid
        m = self.maps
        tm = m.type_map
        self.present = m.present_types

        def mask_of(tids):
            sel = np.isin(tm, list(tids))
            return sel

        wet_ids = [t for t in self.present if nt.get_node_type(t).wet_node]
        self.wet_np = mask_of(wet_ids)
        self.has_dry = not bool(self.wet_np.all())

        # (type, orientation) instances for orientation-driven BCs.
        self.bc_instances = []
        for tid in self.present:
            cls = nt.get_node_type(tid)
            if not cls.needs_orientation or cls in (nt.NTFullBBWall,):
                continue
            if cls in (nt.NTHalfBBWall, nt.NTWallTMS):
                continue  # handled via link tags
            sel = tm == tid
            for k in np.unique(m.orientation[sel]):
                if k == 0:
                    continue
                self.bc_instances.append(
                    (tid, int(k), sel & (m.orientation == int(k))))

        self.fullbb_np = (mask_of([nt.NTFullBBWall.id])
                          if nt.NTFullBBWall.id in self.present else None)
        self.halfbb_np = None
        half_ids = [t for t in self.present
                    if nt.get_node_type(t).link_tags]
        if half_ids:
            self.halfbb_np = mask_of(half_ids)
        self.slip_np = None
        if nt.NTSlip.id in self.present:
            self.slip_np = tm == nt.NTSlip.id

        # Device constants.
        dev = {}
        dev['wet'] = jnp.asarray(self.wet_np)
        if self.fullbb_np is not None:
            dev['fullbb'] = jnp.asarray(self.fullbb_np)
        if self.halfbb_np is not None:
            # Per-direction boolean tag planes (only Q-1 bits, bit0 unused).
            tags = m.link_tags
            dev['tags'] = jnp.asarray(
                np.stack([(tags >> i) & 1 for i in range(g.Q)]).astype(bool))
        if self.slip_np is not None:
            dev['slip_orient'] = jnp.asarray(m.orientation
                                             * self.slip_np.astype(np.int32))
        needs_params = any(
            nt.get_node_type(t).param_names for t in self.present)
        if needs_params:
            dev['rho_bc'] = jnp.asarray(m.param_rho, dtype=self.dtype)
            dev['vel_bc'] = jnp.asarray(m.param_vel, dtype=self.dtype)
        self.dev = dev
        self.bc_masks_dev = [
            (tid, k, jnp.asarray(sel)) for tid, k, sel in self.bc_instances]

        if self.body_force is not None:
            bf = np.asarray(self.body_force, dtype=np.float64)
            if bf.ndim == 1:
                bf = bf.reshape((g.dim,) + (1,) * len(m.type_map.shape))
            self.force_dev = jnp.asarray(bf, dtype=self.dtype)
        else:
            self.force_dev = None

        if self.model == 'mrt':
            self.mrt_rates = g.mrt_relaxation_rates(self.tau)

    def shard_constants(self, mesh):
        """Re-place the closed-over node-data constants with shardings
        matching the distribution array, so the jit-SPMD partitioner keeps
        all BC work local to each shard."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from sailfish_tpu.parallel import mesh as pm
        dim = self.grid.dim
        for k, v in list(self.dev.items()):
            self.dev[k] = pm.shard_field(v, mesh, dim)
        self.bc_masks_dev = [(tid, kk, pm.shard_field(m, mesh, dim))
                             for tid, kk, m in self.bc_masks_dev]
        if self.force_dev is not None:
            if any(s == 1 for s in self.force_dev.shape[1:]):
                # broadcast force vector: replicate
                self.force_dev = jax.device_put(
                    self.force_dev, NamedSharding(mesh, P()))
            else:
                self.force_dev = pm.shard_field(self.force_dev, mesh, dim)

    # -- pieces --------------------------------------------------------------

    def _solve_macro_bc(self, f, rho, u):
        """Apply per-BC macroscopic overrides (reference boundary.mako
        getMacro dispatch :466+; rho/velocity solves follow Zou & He)."""
        g = self.grid
        fs = [f[i] for i in range(g.Q)]
        for tid, k, mask in self.bc_masks_dev:
            cls = nt.get_node_type(tid)
            n = g.orientation_vectors[k - 1]
            cn = g.basis @ n                       # (Q,) in {-1,0,1}
            s0 = signed_sum((cn == 0).astype(int), fs)
            sin = signed_sum((cn < 0).astype(int), fs)
            axis = (k - 1) // 2
            if 'velocity' in cls.param_names:
                u_bc = self.dev['vel_bc']
                un = signed_sum(n, [u_bc[a] for a in range(g.dim)])
                rho_s = (s0 + 2.0 * sin) / (1.0 - un)
                rho = jnp.where(mask, rho_s, rho)
                u = jnp.where(mask[None], u_bc, u)
            elif 'density' in cls.param_names:
                rho_bc = self.dev['rho_bc']
                un = 1.0 - (s0 + 2.0 * sin) / rho_bc
                # u = u_n * n
                uvec = jnp.stack([un * int(n[a]) for a in range(g.dim)])
                rho = jnp.where(mask, rho_bc, rho)
                u = jnp.where(mask[None], uvec, u)
            elif cls is nt.NTDoNothing or cls is nt.NTCopy or \
                    cls is nt.NTYuOutflow or cls is nt.NTNeumann:
                continue  # standard macro
        return rho, u

    def _noneq_bb(self, f, feq, unknown):
        """Replace unknown f_i by f_opp + feq_i - feq_opp (non-equilibrium
        bounce-back; reference sym.noneq_bb, sym.py:750)."""
        g = self.grid
        out = []
        for i in range(g.Q):
            if unknown[i]:
                o = int(g.opposite[i])
                out.append(f[o] + feq[i] - feq[o])
            else:
                out.append(f[i])
        return jnp.stack(out)

    def _pre_collision_bc(self, f, rho, u):
        """Distribution reconstruction at BC nodes
        (reference boundary.mako:322-465)."""
        g = self.grid
        for tid, k, mask in self.bc_masks_dev:
            cls = nt.get_node_type(tid)
            n = g.orientation_vectors[k - 1]
            unknown = g.unknown_mask(n)
            if cls in (nt.NTEquilibriumVelocity, nt.NTEquilibriumDensity):
                feq = eq.bgk_equilibrium(g, rho, u,
                                         incompressible=self.incompressible)
                f = jnp.where(mask[None], feq, f)
            elif cls in (nt.NTZouHeVelocity, nt.NTZouHeDensity):
                feq = eq.bgk_equilibrium(g, rho, u,
                                         incompressible=self.incompressible)
                fz = self._noneq_bb(f, feq, unknown)
                # Tangential momentum fixup (reference sym.zouhe_fixup,
                # sym.py:768): distribute the residual tangential momentum
                # over the unknown populations.
                mom = eq.momentum(g, fz)
                naxis = (k - 1) // 2
                for a in range(g.dim):
                    if a == naxis:
                        continue
                    coeff = np.where(unknown, g.basis[:, a], 0)
                    denom = float(np.sum(coeff * g.basis[:, a]))
                    if denom == 0.0:
                        continue
                    dj = rho * u[a] - mom[a]
                    corr = jnp.stack([
                        (float(coeff[i]) / denom) * dj if coeff[i] else
                        jnp.zeros_like(dj) for i in range(g.Q)])
                    fz = fz + corr
                f = jnp.where(mask[None], fz, f)
            elif cls in (nt.NTRegularizedVelocity, nt.NTRegularizedDensity):
                feq = eq.bgk_equilibrium(g, rho, u,
                                         incompressible=self.incompressible)
                fnb = self._noneq_bb(f, feq, unknown)
                pi = eq.second_moment_noneq(g, fnb, feq)
                freg = eq.regularized_f(g, rho, u, pi,
                                        incompressible=self.incompressible)
                f = jnp.where(mask[None], freg, f)
        return f

    def _collide(self, f, rho, u):
        g = self.grid
        tau_inv = self.tau_inv
        feq = None
        if self.smagorinsky > 0.0:
            feq = eq.bgk_equilibrium(g, rho, u,
                                     incompressible=self.incompressible)
            tau_inv = co.smagorinsky_tau_inv(
                g, f, feq, rho, self.tau, self.smagorinsky)[None]
        u_eq = u
        if self.force_dev is not None and self.force_model == 'guo':
            # Velocity shift: u* = u + F/(2 rho) enters the equilibrium
            # (reference sym_force.py:121-160).
            u_eq = u + 0.5 * self.force_dev / rho[None]
        if self.model == 'mrt':
            fpost = co.mrt_collide(g, f, rho, u_eq, self.mrt_rates,
                                   incompressible=self.incompressible)
        else:
            feq2 = eq.bgk_equilibrium(g, rho, u_eq,
                                      incompressible=self.incompressible)
            fpost = f + tau_inv * (feq2 - f)
        if self.force_dev is not None:
            if self.force_model == 'guo':
                fpost = fpost + co.guo_force_terms(
                    g, u_eq, self.force_dev, self.tau_inv)
            else:
                fpost = fpost + co.edm_shift(
                    g, rho, u, self.force_dev,
                    incompressible=self.incompressible)
        return fpost

    def _post_collision(self, f_in, fpost):
        """Dry-node handling: full bounce-back reflection & slip
        (reference propagation via bb_swap_pairs, sym.py:468-533)."""
        g = self.grid
        if self.fullbb_np is not None:
            frefl = f_in[jnp.asarray(g.opposite)]
            fpost = jnp.where(self.dev['fullbb'][None], frefl, fpost)
        if self.slip_np is not None:
            so = self.dev['slip_orient']
            for k in np.unique(self.maps.orientation[self.slip_np]):
                if k == 0:
                    continue
                axis = (int(k) - 1) // 2
                perm = g.slip_swap(axis)
                fslip = f_in[jnp.asarray(perm)]
                fpost = jnp.where((so == int(k))[None], fslip, fpost)
        return fpost

    def _propagate(self, f_in, fpost):
        """Pull-streaming + post-stream fixups (halfbb links, outflow)."""
        g = self.grid
        streamed = jnp.stack([pull(fpost[i], g.basis[i])
                              for i in range(g.Q)])
        if self.halfbb_np is not None:
            tags = self.dev['tags']
            fixed = []
            for i in range(g.Q):
                o = int(g.opposite[i])
                fixed.append(jnp.where(tags[i], fpost[o], streamed[i]))
            streamed = jnp.stack(fixed)
        for tid, k, mask in self.bc_masks_dev:
            cls = nt.get_node_type(tid)
            n = g.orientation_vectors[k - 1]
            unknown = g.unknown_mask(n)
            if cls is nt.NTDoNothing:
                upd = [jnp.where(mask, f_in[i], streamed[i])
                       if unknown[i] else streamed[i] for i in range(g.Q)]
                streamed = jnp.stack(upd)
            elif cls is nt.NTCopy:
                neigh = jnp.stack([sample(streamed[i], n)
                                   for i in range(g.Q)])
                streamed = jnp.where(mask[None], neigh, streamed)
            elif cls is nt.NTYuOutflow:
                n1 = jnp.stack([sample(streamed[i], n) for i in range(g.Q)])
                n2 = jnp.stack([sample(streamed[i], 2 * np.asarray(n))
                                for i in range(g.Q)])
                extrap = 2.0 * n1 - n2
                upd = [jnp.where(mask, extrap[i], streamed[i])
                       if unknown[i] else streamed[i] for i in range(g.Q)]
                streamed = jnp.stack(upd)
            elif cls is nt.NTNeumann:
                # f_i(t+1, x) = f_opp(i)^c(t, x + c_i) + 6 w_i phi . c_i ;
                # with phi = u(x - 2n) + 2 * gradient. Defer the gradient
                # term (param) to the scalar field; zero-gradient default.
                pass
        return streamed

    # -- public --------------------------------------------------------------

    def macro_fields(self, f):
        """rho, u for output, with BC overrides applied so boundary values
        are meaningful."""
        rho, u = eq.macroscopic(self.grid, f)
        rho, u = self._solve_macro_bc(f, rho, u)
        if self.force_dev is not None:
            u = u + 0.5 * self.force_dev / rho[None]
        return rho, u

    def build(self):
        """Returns step(f) -> f_next (un-jitted; caller jits/shards)."""
        wet = self.dev['wet']

        def step(f):
            rho, u = eq.macroscopic(self.grid, f)
            rho, u = self._solve_macro_bc(f, rho, u)
            f2 = self._pre_collision_bc(f, rho, u)
            fpost = self._collide(f2, rho, u)
            if self.has_dry:
                fpost = jnp.where(wet[None], fpost, f2)
            fpost = self._post_collision(f2, fpost)
            return self._propagate(f2, fpost)

        return step
