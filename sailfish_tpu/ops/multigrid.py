"""Multi-distribution (binary / ternary) step builders.

Counterpart of the reference's two-/three-grid models
(``sailfish/lb_binary.py``, ``lb_ternary.py``) and their generated kernels
(``templates/models/lb_binary_fluid.mako``, ``binary_shan_chen.mako``,
``ternary_shan_chen.mako``). The reference's NNSubdomainRunner two-phase
step (macro-field exchange before collision, subdomain_runner.py:1840)
collapses here into one traced function: neighbor macro fields are just
shifted gathers that XLA/GSPMD turns into halo exchanges.

Each component reuses the single-grid StepBuilder for its BC machinery
(walls, inflow/outflow); the couplings (common velocity, Shan-Chen
cross-forces, free-energy chemical potential) live in this module.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from sailfish_tpu import equilibrium as eq
from sailfish_tpu.equilibrium import signed_sum
from sailfish_tpu.ops import collide as co
from sailfish_tpu.ops.step import StepBuilder, pull, sample


def laplacian_and_grad(field, dim, boundary_mask=None):
    """Isotropic laplacian and gradient stencils minimizing spurious
    currents at drop interfaces (Phys Rev E 77, 046702 (2008); reference
    templates/finite_difference_optimized.mako:40-49). Periodic wrap."""
    def at(*vec):
        return sample(field, vec)

    if dim == 2:
        fe, fw = at(1, 0), at(-1, 0)
        fn, fs = at(0, 1), at(0, -1)
        fne, fnw = at(1, 1), at(-1, 1)
        fse, fsw = at(1, -1), at(-1, -1)
        grad = jnp.stack([
            (-fnw - fsw + fse + fne) / 12.0 + (fe - fw) / 3.0,
            (-fse - fsw + fne + fnw) / 12.0 + (fn - fs) / 3.0,
        ])
        lap = (fnw + fne + fsw + fse + 4.0 * (fe + fw + fn + fs)
               - 20.0 * field) / 6.0
        return lap, grad
    fe, fw = at(1, 0, 0), at(-1, 0, 0)
    fn, fs = at(0, 1, 0), at(0, -1, 0)
    ft, fb = at(0, 0, 1), at(0, 0, -1)
    fne, fnw = at(1, 1, 0), at(-1, 1, 0)
    fse, fsw = at(1, -1, 0), at(-1, -1, 0)
    fte, ftw = at(1, 0, 1), at(-1, 0, 1)
    fbe, fbw = at(1, 0, -1), at(-1, 0, -1)
    ftn, fts = at(0, 1, 1), at(0, -1, 1)
    fbn, fbs = at(0, 1, -1), at(0, -1, -1)
    grad = jnp.stack([
        (-fnw - fsw - ftw - fbw + fse + fne + fte + fbe) / 12.0
        + (fe - fw) / 6.0,
        (-fse - fsw - fts - fbs + fne + fnw + ftn + fbn) / 12.0
        + (fn - fs) / 6.0,
        (-fbe - fbw - fbn - fbs + fte + ftw + ftn + fts) / 12.0
        + (ft - fb) / 6.0,
    ])
    lap = ((fnw + fne + fse + fsw + fte + ftw + ftn + fts
            + fbe + fbw + fbn + fbs) / 6.0
           + (ft + fb + fe + fw + fn + fs) / 3.0 - 4.0 * field)
    return lap, grad


class MultigridStepBuilder:
    """Base for K-component models: one StepBuilder per component for BC
    handling, shared node maps, coupled collision implemented by
    subclasses via ``collide_all``."""

    def __init__(self, grid, maps, taus, *, body_force=None,
                 body_forces=None, force_model='guo', dtype=None,
                 time_unit=1.0):
        if force_model != 'guo':
            raise NotImplementedError(
                'multi-component models implement Guo body forcing only '
                f'(got --force_implementation={force_model}); edm and '
                'velocity_shift cover single-fluid models')
        import sailfish_tpu.node_type as nt
        for bad in (nt.NTGuoDensity, nt.NTWallTMS):
            if bad.id in maps.present_types:
                raise NotImplementedError(
                    f'{bad.__name__} is not supported in multi-component '
                    'models yet (single-fluid StepBuilder only)')
        self.grid = grid
        self.maps = maps
        self.taus = [float(t) for t in taus]
        self.dtype = dtype
        if body_forces is None:
            body_forces = [body_force] + [None] * (len(self.taus) - 1)
        for bf in body_forces:
            if bf is not None and (isinstance(bf, nt.DynamicValue)
                                   or any(callable(c) for c in tuple(bf))):
                raise NotImplementedError(
                    'DynamicValue body forces cover single-fluid models '
                    'only (StepBuilder.force_at); multi-component models '
                    'take constant per-component forces')
        self.body_forces = body_forces
        self.body_force = body_forces[0]
        self.components = []
        for k, tau in enumerate(self.taus):
            self.components.append(StepBuilder(
                grid, maps, model='bgk', tau=tau,
                body_force=body_forces[k],
                dtype=dtype, time_unit=time_unit))
        # convenience: all components share masks
        self.b0 = self.components[0]

    def shard_constants(self, mesh):
        for c in self.components:
            c.shard_constants(mesh)

    # subclasses implement
    def collide_all(self, fss, rhos, u):
        raise NotImplementedError

    def common_velocity(self, fss, rhos):
        raise NotImplementedError

    def _streamed_all(self, state):
        return [c.fix_missing(c.gather(f), f)
                for c, f in zip(self.components, state)]

    def build(self):
        def step(state, it=0):
            fss = self._streamed_all(state)
            rhos = [eq.density(self.grid, fs) for fs in fss]
            u = self.common_velocity(fss, rhos)
            # macroscopic BC overrides apply to the fluid component
            rho0, u = self.b0._solve_macro_bc(fss[0], rhos[0], u,
                                              self.b0.bc_params(it))
            rhos = [rho0] + rhos[1:]
            fss = [c._pre_collision_bc(fs, rho, u)
                   for c, fs, rho in zip(self.components, fss, rhos)]
            fposts = self.collide_all(fss, rhos, u)
            out = []
            for c, fs, fpost in zip(self.components, fss, fposts):
                if c.has_dry:
                    fpost = jnp.where(c.dev['wet'][None], fpost, fs)
                out.append(c._post_collision(fs, fpost))
            return tuple(out)

        return step

    def macro_fields(self, state, it=0):
        fss = self._streamed_all(state)
        rhos = [eq.density(self.grid, fs) for fs in fss]
        u = self.common_velocity(fss, rhos)
        rho0, u = self.b0._solve_macro_bc(fss[0], rhos[0], u,
                                          self.b0.bc_params(it))
        return ([rho0] + rhos[1:], u)


class ShanChenMultiStepBuilder(MultigridStepBuilder):
    """K-component Shan-Chen mixture (reference lb_binary.py:375-517,
    lb_ternary.py): common velocity
      u' = (sum_k mom_k / tau_k) / (sum_k rho_k / tau_k)
    and per-component equilibrium velocity u_k = u' + tau_k F_k / rho_k
    with pseudopotential cross-forces F_k."""

    def __init__(self, grid, maps, taus, couplings, *, potential='linear',
                 body_force=None, body_forces=None, force_model='guo',
                 dtype=None, time_unit=1.0):
        """couplings: dict {(j, k): G_jk} (symmetric; includes (k, k) for
        self-interaction, cf. reference force_couplings)."""
        super().__init__(grid, maps, taus, body_force=body_force,
                         body_forces=body_forces, force_model=force_model,
                         dtype=dtype, time_unit=time_unit)
        self.couplings = dict(couplings)
        self.potential = potential

    def common_velocity(self, fss, rhos):
        g = self.grid
        num = None
        den = None
        for fs, rho, tau in zip(fss, rhos, self.taus):
            mom = eq.momentum(g, fs)
            num = mom / tau if num is None else num + mom / tau
            den = rho / tau if den is None else den + rho / tau
        return num / den[None]

    def _forces(self, rhos):
        g = self.grid
        K = len(rhos)
        forces = [None] * K
        for (j, k), G in self.couplings.items():
            if G == 0.0:
                continue
            Fj = co.shan_chen_force(g, rhos[j], rhos[k], G, self.potential)
            forces[j] = Fj if forces[j] is None else forces[j] + Fj
            if j != k:
                Fk = co.shan_chen_force(g, rhos[k], rhos[j], G,
                                        self.potential)
                forces[k] = Fk if forces[k] is None else forces[k] + Fk
        return forces

    def collide_all(self, fss, rhos, u):
        forces = self._forces(rhos)
        out = []
        for k, (c, fs, rho) in enumerate(zip(self.components, fss, rhos)):
            u_eq = u
            if forces[k] is not None:
                u_eq = u_eq + self.taus[k] * forces[k] / rho[None]
            out.append(c._collide(fs, rho, u, u_eq=u_eq))
        return out


def _fe_weights(grid):
    """Free-energy stencil weights (reference lb_binary.py:196-269):
    returns dict of per-direction coefficient vectors (index 0 = rest,
    zero entries there)."""
    Q = grid.Q
    dim = grid.dim
    wi = np.zeros(Q)
    wxx = np.zeros(Q)
    wyy = np.zeros(Q)
    wzz = np.zeros(Q)
    wxy = np.zeros(Q)
    wyz = np.zeros(Q)
    wxz = np.zeros(Q)
    for i in range(1, Q):
        x = grid.basis[i]
        n2 = int(x @ x)
        wxy[i] = x[0] * x[1] / 4.0
        if dim == 3:
            wyz[i] = x[1] * x[2] / 4.0
            wxz[i] = x[0] * x[2] / 4.0
            if n2 == 1:
                wi[i] = 1.0 / 6.0
                wxx[i] = 5.0 / 12.0 if abs(x[0]) == 1 else -1.0 / 3.0
                wyy[i] = 5.0 / 12.0 if abs(x[1]) == 1 else -1.0 / 3.0
                wzz[i] = 5.0 / 12.0 if abs(x[2]) == 1 else -1.0 / 3.0
            else:
                wi[i] = 1.0 / 12.0
                wxx[i] = -1.0 / 24.0 if abs(x[0]) == 1 else 1.0 / 12.0
                wyy[i] = -1.0 / 24.0 if abs(x[1]) == 1 else 1.0 / 12.0
                wzz[i] = -1.0 / 24.0 if abs(x[2]) == 1 else 1.0 / 12.0
        else:
            if n2 == 1:
                wi[i] = 1.0 / 3.0
                wxx[i] = 1.0 / 3.0 if abs(x[0]) == 1 else -1.0 / 6.0
                wyy[i] = 1.0 / 3.0 if abs(x[1]) == 1 else -1.0 / 6.0
            else:
                wi[i] = 1.0 / 12.0
                wxx[i] = -1.0 / 24.0
                wyy[i] = -1.0 / 24.0
    return dict(wi=wi, wxx=wxx, wyy=wyy, wzz=wzz, wxy=wxy, wyz=wyz,
                wxz=wxz)


class FreeEnergyStepBuilder(MultigridStepBuilder):
    """Binary free-energy model (Landau functional; Phys Rev E 78, 056709;
    reference lb_binary.LBBinaryFluidFreeEnergy :139 and
    sym_equilibrium.free_energy_equilibrium_* :15-72).

    Component 0: fluid density distribution, relaxing at the
    phi-interpolated tau (relaxation_common.mako:156-164); component 1:
    order parameter, relaxing at tau_phi."""

    def __init__(self, grid, maps, *, tau_a, tau_b, tau_phi, A, kappa,
                 Gamma, wall_grad_phase=0.0, body_force=None,
                 eq_force_map=None, model='bgk', force_model='guo',
                 dtype=None, time_unit=1.0):
        super().__init__(grid, maps, [(tau_a + tau_b) / 2.0, tau_phi],
                         body_force=body_force, force_model=force_model,
                         dtype=dtype, time_unit=time_unit)
        #: fluid-grid collision: 'bgk' or 'mrt' (reference --model,
        #: lb_binary.py:175; MRT relaxation relaxation.mako:15-54)
        if model not in ('bgk', 'mrt'):
            raise ValueError(f'free-energy model must be bgk or mrt, '
                             f'got {model!r}')
        self.fe_model = model
        if model == 'mrt':
            self._prepare_fe_mrt()
        #: target_grid -> force source grid (None = bare fluid velocity);
        #: reference use_force_for_equilibrium (lb_base.py:341-367)
        self.eq_force_map = dict(eq_force_map or {})
        self.tau_a = float(tau_a)
        self.tau_b = float(tau_b)
        self.tau_phi = float(tau_phi)
        self.A = float(A)
        self.kappa = float(kappa)
        self.Gamma = float(Gamma)
        self.wall_grad_phase = float(wall_grad_phase)
        self.fe_w = {k: jnp.asarray(v) for k, v in _fe_weights(grid).items()}
        # wetting: mirror phi into dry (wall) nodes along the orientation
        m = maps
        import sailfish_tpu.node_type as nt
        dry = ~np.isin(m.type_map, [t for t in m.present_types
                                    if nt.get_node_type(t).wet_node])
        self._dry_orient = jnp.asarray(m.orientation * dry.astype(np.int32))
        self._has_dry_nodes = bool(dry.any())

    def _prepare_fe_mrt(self):
        """FE-MRT projection matrices (reference sym.free_energy_mrt_matrix,
        sym.py:450-466): per-moment rates are 0 for the conserved moments,
        1/tau0 (the LOCAL phi-interpolated tau) for the shear-stress
        moments, and exactly 1 for every remaining kinetic moment. Since
        tau0 varies per node, split M^-1 diag(s) M into two constant Q x Q
        projections applied at trace time:
          relax = P_rest @ fneq + (1/tau0) * P_shear @ fneq."""
        g = self.grid
        e_shear = np.zeros(g.Q)
        e_shear[g.mrt_shear] = 1.0
        e_rest = np.ones(g.Q)
        e_rest[g.mrt_shear] = 0.0
        e_rest[g.mrt_conserved] = 0.0
        self._fe_p_shear = g.mrt_inv @ np.diag(e_shear) @ g.mrt_matrix
        self._fe_p_rest = g.mrt_inv @ np.diag(e_rest) @ g.mrt_matrix

    def _fe_mrt_project(self, arr, inv_tau0):
        """M^-1 diag(s) M @ arr with the per-node shear rate 1/tau0."""
        dtype = arr.dtype
        flat = arr.reshape(self.grid.Q, -1)
        prec = (jax.lax.Precision.HIGHEST
                if dtype == jnp.float32 else None)
        rest = jnp.einsum('qp,pn->qn', jnp.asarray(self._fe_p_rest, dtype),
                          flat, precision=prec).reshape(arr.shape)
        shear = jnp.einsum('qp,pn->qn', jnp.asarray(self._fe_p_shear, dtype),
                           flat, precision=prec).reshape(arr.shape)
        return rest + inv_tau0[None] * shear

    def common_velocity(self, fss, rhos):
        u = eq.momentum(self.grid, fss[0]) / rhos[0][None]
        if self.body_force is not None:
            bf = np.asarray(self.body_force, dtype=np.float64).reshape(
                (self.grid.dim,) + (1,) * rhos[0].ndim)
            u = u + 0.5 * jnp.asarray(bf, u.dtype)
        return u

    def _phi_with_wetting(self, phi):
        """Fill dry (wall) nodes with the wetting condition
        phi_wall = phi_fluid_neighbor - wall_grad (1st order; reference
        --bc_wall_grad_phase, lb_binary.py:161-167)."""
        if not self._has_dry_nodes:
            return phi
        out = phi
        for k in range(1, 2 * self.grid.dim + 1):
            vec = self.grid.orientation_vectors[k - 1]
            neigh = jnp.stack([sample(phi, vec)])[0]
            mirrored = neigh - self.wall_grad_phase
            out = jnp.where(self._dry_orient == k, mirrored, out)
        return out

    def _eq_velocity(self, u, target):
        """Velocity entering ``target``'s equilibrium, honoring
        use_force_for_equilibrium overrides. ``u`` is the
        common_velocity output (shifted by half the grid-0 force)."""
        if target not in self.eq_force_map:
            return u
        g = self.grid
        u_base = u
        if self.body_force is not None:
            bf = np.asarray(self.body_force, dtype=np.float64).reshape(
                (g.dim,) + (1,) * (u.ndim - 1))
            u_base = u - 0.5 * jnp.asarray(bf, u.dtype)
        src = self.eq_force_map[target]
        if src is None:
            return u_base
        f_src = self.body_forces[src]
        if f_src is None:
            return u_base
        fs = np.asarray(f_src, dtype=np.float64).reshape(
            (g.dim,) + (1,) * (u.ndim - 1))
        return u_base + 0.5 * jnp.asarray(fs, u.dtype)

    def collide_all(self, fss, rhos, u):
        g = self.grid
        rho, phi = rhos
        phi_w = self._phi_with_wetting(phi)
        lap, grad = laplacian_and_grad(phi_w, g.dim)
        A, kappa, Gamma = self.A, self.kappa, self.Gamma

        u0 = self._eq_velocity(u, 0)
        u1 = self._eq_velocity(u, 1)
        cu = eq.dot_cu(g, u0)                   # (Q, *S)
        usq = jnp.sum(u0 * u0, axis=0)
        if u1 is u0:
            cu1, usq1 = cu, usq
        else:
            cu1 = eq.dot_cu(g, u1)
            usq1 = jnp.sum(u1 * u1, axis=0)
        w = self.fe_w

        # fluid equilibrium (free_energy_equilibrium_fluid; cssq=1/3 so
        # the lambda terms vanish)
        pb = rho / 3.0 + A * (-(phi * phi) / 2.0
                              + 0.75 * phi ** 4)
        kphl = kappa * phi * lap
        gx = grad[0]
        gy = grad[1]
        gz = grad[2] if g.dim == 3 else None
        feq_parts = []
        for i in range(1, g.Q):
            t = w['wi'][i] * (pb - kphl + rho * cu[i]
                              + 1.5 * (cu[i] * cu[i] * rho
                                       - rho * usq / 3.0))
            t = t + kappa * (w['wxx'][i] * gx * gx + w['wyy'][i] * gy * gy
                             + w['wxy'][i] * gx * gy)
            if g.dim == 3:
                t = t + kappa * (w['wzz'][i] * gz * gz
                                 + w['wyz'][i] * gy * gz
                                 + w['wxz'][i] * gx * gz)
            feq_parts.append(t)
        feq0 = rho - sum(feq_parts)
        feq = jnp.stack([feq0] + feq_parts)

        # order-parameter equilibrium
        mu = A * (-phi + phi ** 3) - kappa * lap
        geq_parts = []
        for i in range(1, g.Q):
            t = w['wi'][i] * (Gamma * mu + cu1[i] * phi
                              + 1.5 * phi * (cu1[i] * cu1[i]
                                             - usq1 / 3.0))
            geq_parts.append(t)
        geq0 = phi - sum(geq_parts)
        geq = jnp.stack([geq0] + geq_parts)

        # phi-interpolated relaxation time (relaxation_common.mako:156-164)
        tau0 = self.tau_b + (jnp.clip(phi, -1.0, 1.0) + 1.0) * \
            (self.tau_a - self.tau_b) * 0.5
        inv_tau0 = 1.0 / tau0
        if self.fe_model == 'mrt':
            # FE-MRT (reference relaxation.mako:15-54): non-conserved
            # non-shear moments of the fluid grid relax fully (rate 1);
            # shear moments at the LOCAL 1/tau0; order parameter stays
            # BGK at tau_phi (the reference's grid_idx==1 branch).
            fpost0 = fss[0] - self._fe_mrt_project(fss[0] - feq, inv_tau0)
        else:
            fpost0 = fss[0] + (feq - fss[0]) * inv_tau0[None]
        if self.body_force is not None:
            bf = np.asarray(self.body_force, dtype=np.float64).reshape(-1)
            fvec = jnp.asarray(bf, u.dtype).reshape(
                (g.dim,) + (1,) * rho.ndim)
            if self.fe_model == 'mrt':
                # moment-space Guo forcing: (I - S/2) F_i with the same
                # per-moment rates as the collision (the MRT
                # generalization of the (1 - 1/(2 tau)) prefactor; the
                # reference instead adds the prefactor-free Kusumaatmaja
                # term, sym_force.py:162-182 -- identical to O(F) with
                # 2nd-order discrete accuracy here)
                Fi = co.guo_force_terms(g, u, fvec, 0.0, rho)
                fpost0 = fpost0 + Fi - 0.5 * self._fe_mrt_project(
                    Fi, inv_tau0)
            else:
                # the discrete-force correction must use the LOCAL
                # phi-interpolated tau, matching the collision above
                fpost0 = fpost0 + co.guo_force_terms(
                    g, u, fvec, inv_tau0, rho)
        fpost1 = fss[1] + (geq - fss[1]) / self.tau_phi
        return [fpost0, fpost1]
