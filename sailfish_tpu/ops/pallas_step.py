"""Fused stream+collide Pallas TPU kernel (3D).

The performance core: one kernel pass reads every distribution exactly once
(Q shifted-plane DMA gathers from HBM), collides locally in VMEM, and
writes the post-collision plane back -- ~2*Q*4 bytes of HBM traffic per
node per step, the LBM speed-of-light. This replaces the reference's
generated CollideAndPropagate CUDA kernel
(templates/models/lb_single_fluid.mako:161-229).

Layout (chosen for Mosaic's tiling rules -- the last two array dims are
(sublane, lane) tiled (8, 128), so DMA offsets there must be aligned):
  * State is (Q, Z+2, Y, X): ghost planes only along z (dim 1, untiled ->
    arbitrary DMA offsets allowed). y and x shifts are performed in VMEM
    as rolls of the full (Y, X) plane, making them globally periodic
    exactly like jnp.roll; the z ghost ring carries z periodicity (the
    counterpart of the reference's ghost envelope, controller.py:482-494).
  * Grid over z: each program DMAs Q contiguous (Y, X) planes from
    z+1-c_z (pull streaming as plane-shifted reads), rolls by (c_y, c_x),
    collides, and writes the (Q, Y, X) result to plane z+1 of the output.

Boundary handling (the TPU analog of the reference's bulk/boundary kernel
split, subdomain_runner.py:48-63), designed to avoid ANY full-array
dynamic-update-slice (XLA copies the whole 2.6 GB buffer per DUS):
  * full-way bounce-back (dry) and excluded nodes are handled IN-KERNEL
    via a per-plane int32 mask (0 fluid / 1 reflect / 2 keep);
  * z-planes containing any other boundary type ("complex" BCs: velocity/
    density/outflow/half-way walls) are recomputed exactly by the XLA
    StepBuilder machinery in a prologue and the kernel overlays those
    planes with a plane-sized HBM->HBM DMA;
  * the periodic z ghost planes of the output are written by the edge
    programs themselves (no post-pass).

Reference for the kernel patterns: /opt/skills/guides/pallas_guide.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sailfish_tpu import equilibrium as eq
from sailfish_tpu import node_type as nt


# -- node classification -----------------------------------------------------

#: BC families whose whole phase chain (macro solve -> reconstruction ->
#: collide) is elementwise on the node -- no neighbor sampling, so the
#: 3D kernel can run them natively on their rows instead of paying the
#: per-step XLA patch-plane prologue (which costs ~constant time and
#: dominates small domains; see BASELINE notes). The outflow family,
#: link-tagged walls and TMS sample neighbors or the node's own
#: pre-stream state and stay on the patch path.
NATIVE_BC_TYPES = (nt.NTEquilibriumVelocity, nt.NTEquilibriumDensity,
                   nt.NTZouHeVelocity, nt.NTZouHeDensity,
                   nt.NTRegularizedVelocity, nt.NTRegularizedDensity)


def classify_nodes(maps, native_bc=False, return_patch_mask=False):
    """Split nodes into kernel-native vs patch-requiring classes.

    Returns (mask, patch_rows[, bc_instances][, patch_mask]): mask is
    int32 (*S) with
    0 = collide, 1 = dry reflect (NTFullBBWall), 2 = keep (excluded
    nodes), 3+j = native-BC instance j (``native_bc=True`` only);
    patch_rows is the sorted list of z-planes containing any node type
    the kernel does not handle natively; bc_instances is a list of
    (type_id, orientation_code) in mask-code order. A NATIVE_BC_TYPES
    node that shares a row with a patch-requiring node keeps mask 0 --
    the patch overlay recomputes the whole row anyway. With
    ``return_patch_mask=True`` the boolean per-node patch-requiring map
    is appended (used to project onto y-rows for wall-normal-y scenes,
    PallasStep3D patch_yrows)."""
    tm = maps.type_map
    mask = np.zeros(tm.shape, dtype=np.int32)
    patch_needed = np.zeros(tm.shape, dtype=bool)
    native_sels = []
    native_ids = {c.id for c in NATIVE_BC_TYPES} if native_bc else set()
    for tid in maps.present_types:
        cls = nt.get_node_type(tid)
        sel = tm == tid
        if tid == nt._NTFluid.id:
            continue
        elif cls is nt.NTFullBBWall:
            mask[sel] = 1
        elif cls.excluded or cls.propagation_only:
            mask[sel] = 2
        elif tid in native_ids:
            for k in np.unique(maps.orientation[sel]):
                if k == 0:
                    # orientation could not be detected; fall back
                    patch_needed |= sel & (maps.orientation == 0)
                    continue
                native_sels.append(
                    (tid, int(k), sel & (maps.orientation == int(k))))
        else:
            patch_needed |= sel
    rows = sorted(int(z) for z in
                  np.unique(np.nonzero(patch_needed)[0]))
    bc_instances = []
    if native_bc:
        for tid, k, sel in native_sels:
            # native nodes on patch rows are covered by the row overlay
            sel = sel.copy()
            if rows:
                sel[rows] = False
            if not sel.any():
                continue
            mask[sel] = 3 + len(bc_instances)
            bc_instances.append((tid, k, sel))
        if return_patch_mask:
            return mask, rows, bc_instances, patch_needed
        return mask, rows, bc_instances
    if return_patch_mask:
        return mask, rows, patch_needed
    return mask, rows


def window_shifted(plane, window, shift):
    """plane[window - shift] with periodic wrap, built from static slices
    only (reads just the window-sized region). ``window``: python slices
    per axis (spatial, unpadded coords); ``shift``: source offset in array
    axis order."""
    out = plane
    for ax, (w, s) in enumerate(zip(window, shift)):
        n = plane.shape[ax]
        lo, hi = w.start - s, w.stop - s
        idx = [slice(None)] * plane.ndim

        def part(a, b):
            idx2 = list(idx)
            idx2[ax] = slice(a, b)
            return out[tuple(idx2)]

        if lo >= 0 and hi <= n:
            out = part(lo, hi)
        elif lo < 0:
            out = jnp.concatenate([part(n + lo, n), part(0, hi)], axis=ax)
        else:  # hi > n
            out = jnp.concatenate([part(lo, n), part(0, hi - n)], axis=ax)
    return out


def cz_groups(grid):
    """Q-axis layout for the 3D kernels: a permutation sorting the
    directions into contiguous c_z groups, its inverse, and the
    (c_z, start, count) runs in permuted space.

    Rationale: every plane's pull gathers read from only three source
    planes (z, z-1, z+1). With the state stored in this layout each
    source moves as ONE strided DMA instead of one DMA per direction --
    the kernels measure as DMA-issue-bound, not bandwidth-bound, so
    cutting ~19 copies/plane to 3 is the single biggest perf lever.
    In-kernel math stays in STANDARD direction order (via the inverse
    map), keeping fp32 results identical to the XLA engine."""
    cz = [int(v) for v in grid.basis[:, 2]]
    perm = sorted(range(grid.Q), key=lambda i: cz[i])
    inv = [0] * grid.Q
    for ch, i in enumerate(perm):
        inv[i] = ch
    groups = []
    s = 0
    for idx in range(1, grid.Q + 1):
        if idx == grid.Q or cz[perm[idx]] != cz[perm[s]]:
            groups.append((cz[perm[s]], s, idx - s))
            s = idx
    return perm, inv, groups


def gy_pad_channels(Q, mixed=None):
    """Padded channel extent of the 3D kernels' (Z+2, Qp, X) gy
    ghost-row inputs: Mosaic rejects dynamically offset memref slices
    whose trailing extents are not sublane-tile-aligned (8 for fp32,
    16 for int16), so the callers pad the Q dim with zeros."""
    sub_t = 16 if mixed is not None else 8
    return -(-Q // sub_t) * sub_t


# -- the kernel --------------------------------------------------------------

class _ForceProxy:
    """Builder wrapper handing the collide helpers a RUNTIME body-force
    vector (traced SMEM scalars) in place of the baked constants.
    Created inside a kernel body for time-dependent uniform forces
    (--force_implementation x DynamicValue(t)); every other attribute
    forwards to the real builder."""

    def __init__(self, builder, fvec):
        self._builder = builder
        self._rt_force = tuple(fvec)

    def __getattr__(self, name):
        return getattr(self._builder, name)


def _has_force(builder):
    """True when the collide applies a body force: a baked static vector
    (force_dev) or a runtime one (_ForceProxy)."""
    return (getattr(builder, '_rt_force', None) is not None
            or builder.force_dev is not None)


def rt_force_eligible(builder):
    """True when the builder's body force is a TIME-ONLY uniform
    DynamicValue: the fused kernels then take force(t) as a per-step
    SMEM operand (evaluated in XLA by force_now) instead of baking
    constants (reference lb_base.py:346-352 accepts such forces)."""
    if builder.force_expr is None:
        return False
    for e in builder.force_expr:
        if nt.DynamicValue.arity(e) > 1:
            return False
        try:
            v = nt.DynamicValue.evaluate(e, 0.0, ())
        except Exception:
            return False
        if np.ndim(v) != 0:
            return False
    return True


def force_now(builder, it):
    """force(t) as a (dim,) dtype vector for the kernels' SMEM operand
    (mirrors StepBuilder.force_at for the time-only uniform case)."""
    t = jnp.asarray(it, dtype=builder.dtype) * builder.time_unit
    vals = [jnp.reshape(jnp.asarray(nt.DynamicValue.evaluate(e, t, ()),
                                    dtype=builder.dtype), ())
            for e in builder.force_expr]
    return jnp.stack(vals)


def _force_vec(builder):
    """Per-component body-force accelerations: trace-time floats for
    static forces, traced scalars through a _ForceProxy."""
    rt = getattr(builder, '_rt_force', None)
    if rt is not None:
        return rt
    return tuple(float(v) for v in
                 np.asarray(builder.body_force,
                            dtype=np.float64).reshape(-1))


def _moments(builder, fs):
    """Macroscopic moments from Q (Y, X) VMEM planes: returns
    (rho, u list, usq, uF) with the equilibrium-velocity shift of the
    builder's --force_implementation applied (reference
    relaxation_common.mako:109-133 fluid_velocity): guo shifts by a/2
    and carries uF for the post-collision Guo term, velocity_shift
    shifts by tau*a with no post term, edm leaves the bare velocity
    (the force enters as the feq difference, _edm_term)."""
    g = builder.grid
    dtype = fs[0].dtype
    rho = fs[0]
    for i in range(1, g.Q):
        rho = rho + fs[i]
    mom = [eq.signed_sum(g.basis[:, a], fs) for a in range(g.dim)]
    inv_rho = 1.0 / rho
    u = [m * inv_rho for m in mom]
    uF = None
    if _has_force(builder):
        fvec = _force_vec(builder)
        if builder.force_model == 'guo':
            # body-force values are accelerations: u* = u + a/2
            u = [ua + jnp.asarray(0.5 * fvec[a], dtype)
                 for a, ua in enumerate(u)]
            uF = u[0] * jnp.asarray(fvec[0], dtype)
            for a in range(1, g.dim):
                uF = uF + u[a] * jnp.asarray(fvec[a], dtype)
        elif builder.force_model == 'velocity_shift':
            u = [ua + jnp.asarray(builder.tau * fvec[a], dtype)
                 for a, ua in enumerate(u)]
    usq = u[0] * u[0]
    for a in range(1, g.dim):
        usq = usq + u[a] * u[a]
    return rho, u, usq, uF


def _feq_i(builder, rho, usq, cu, i):
    """Second-order equilibrium for direction i given cu = c_i . u
    (bgk Hermite, the incompressible He-Luo variant, or the D2Q9
    shallow-water form -- matches equilibrium.shallow_water_equilibrium
    / reference sym_equilibrium.py:73-89, where rho is the water
    height)."""
    w = builder.grid.weights
    dtype = rho.dtype
    if getattr(builder, 'equilibrium', 'bgk') == 'shallow_water':
        grav = builder.gravity
        if i == 0:
            return rho - jnp.asarray(w[0], dtype) * rho * (
                (15.0 / 8.0) * grav * rho - 3.0 * usq)
        return jnp.asarray(w[i], dtype) * rho * (
            1.5 * grav * rho + 3.0 * cu + 4.5 * cu * cu - 1.5 * usq)
    poly = 3.0 * cu + 4.5 * cu * cu - 1.5 * usq
    if builder.incompressible:
        return jnp.asarray(w[i], dtype) * (rho + poly)
    return jnp.asarray(w[i], dtype) * (rho + rho * poly)


def _force_term(builder, mom, cu, i):
    """Guo forcing increment for direction i (base-tau prefactor, like
    the XLA engine's guo_force_terms call)."""
    g = builder.grid
    rho, u, usq, uF = mom
    dtype = rho.dtype
    fvec = _force_vec(builder)
    cF = sum(float(g.basis[i][a]) * fvec[a] for a in range(g.dim))
    pref = (1.0 - 0.5 * builder.tau_inv) * g.weights[i]
    cF = jnp.asarray(cF, dtype)
    return jnp.asarray(pref, dtype) * rho * (
        3.0 * (cF - uF) + 9.0 * cu * cF)


def _edm_prep(builder, mom):
    """Shifted-velocity planes (u + a, |u + a|^2) for the exact-difference
    forcing term (reference sym_force.edm_shift_velocity,
    sym_force.py:184: the shift is the acceleration). mom's u is the BARE
    velocity for edm (_moments applies no equilibrium shift)."""
    g = builder.grid
    rho, u, usq, uF = mom
    dtype = rho.dtype
    fvec = _force_vec(builder)
    u2 = [ua + jnp.asarray(fvec[a], dtype) for a, ua in enumerate(u)]
    usq2 = u2[0] * u2[0]
    for a in range(1, g.dim):
        usq2 = usq2 + u2[a] * u2[a]
    return u2, usq2


def _edm_term(builder, mom, edm, i):
    """Exact-difference-method increment for direction i:
    feq_i(rho, u + a) - feq_i(rho, u) (matches ops/collide.edm_shift)."""
    g = builder.grid
    rho, u, usq, uF = mom
    u2, usq2 = edm
    cu2 = eq.signed_sum(g.basis[i], u2)
    cu = eq.signed_sum(g.basis[i], u)
    return (_feq_i(builder, rho, usq2, cu2, i)
            - _feq_i(builder, rho, usq, cu, i))


def mrt_pair_rates(builder):
    """(s_even, s_odd) for the parity-split MRT/TRT form, or raise if
    the rate vector does not decompose that way (then the XLA engine
    must run the scene). StepBuilder's Gram-Schmidt rates (shear + even
    ghosts + energy at 1/tau, odd ghosts at the TRT-magic rate,
    lattice.py:161-185) always qualify."""
    g = builder.grid
    rates = np.asarray(builder.mrt_rates, dtype=np.float64)
    cons = set(int(k) for k in g.mrt_conserved)
    s_e = s_o = None
    for k in range(g.Q):
        if k in cons:
            continue
        if g.mrt_parity[k] > 0:
            if s_e is None:
                s_e = rates[k]
            elif abs(s_e - rates[k]) > 1e-12:
                raise NotImplementedError(
                    'non-uniform even MRT rates; fused kernel supports '
                    'the parity-split (TRT-style) rate structure only')
        else:
            if s_o is None:
                s_o = rates[k]
            elif abs(s_o - rates[k]) > 1e-12:
                raise NotImplementedError('non-uniform odd MRT rates')
    return float(s_e), float(s_o)


def _collide_prepass(builder, fs, mom):
    """Whole-plane precomputation shared by the pairwise collide:
    conserved-moment corrections for MRT/TRT and the local Smagorinsky
    tau field for LES. Everything is built from on-the-fly fneq planes
    (compute is ~free; the kernel is HBM-bound)."""
    g = builder.grid
    rho, u, usq, uF = mom
    dtype = rho.dtype
    extra = {}
    is_mrt = builder.model in ('mrt', 'trt')
    les = builder.smagorinsky > 0.0
    if _has_force(builder) and builder.force_model == 'edm':
        extra['edm'] = _edm_prep(builder, mom)
    if not (is_mrt or les):
        return extra

    if les:
        # XLA reference computes the strain from feq at the UNSHIFTED
        # velocity (ops/step.py smagorinsky block runs before the force
        # shift); undo the equilibrium shift _moments applied (none for
        # edm, whose mom carries the bare velocity)
        if _has_force(builder) and \
                builder.force_model in ('guo', 'velocity_shift'):
            fvec = _force_vec(builder)
            s = 0.5 if builder.force_model == 'guo' else builder.tau
            u0 = [ua - jnp.asarray(s * fvec[a], dtype)
                  for a, ua in enumerate(u)]
        else:
            u0 = u
        usq0 = u0[0] * u0[0]
        for a in range(1, g.dim):
            usq0 = usq0 + u0[a] * u0[a]
        ab = [(a, b) for a in range(g.dim) for b in range(a, g.dim)]
        pi = [None] * len(ab)
        for j in range(g.Q):
            cu0 = eq.signed_sum(g.basis[j], u0)
            fneq = fs[j] - _feq_i(builder, rho, usq0, cu0, j)
            for t, (a, b) in enumerate(ab):
                coef = int(g.basis[j][a]) * int(g.basis[j][b])
                if coef:
                    term = fneq if coef == 1 else \
                        (-fneq if coef == -1 else float(coef) * fneq)
                    pi[t] = term if pi[t] is None else pi[t] + term
        strain = None
        for t, (a, b) in enumerate(ab):
            if pi[t] is None:
                continue
            sq = pi[t] * pi[t]
            if a != b:
                sq = sq + sq
            strain = sq if strain is None else strain + sq
        tau = builder.tau
        cs = builder.smagorinsky
        tau_t = 0.5 * (jnp.sqrt(jnp.asarray(tau * tau, dtype)
                                + 36.0 * (cs * cs)
                                * jnp.sqrt(strain)) - tau)
        extra['tau_inv'] = 1.0 / (tau + tau_t)

    if is_mrt:
        s_e, s_o = mrt_pair_rates(builder)
        extra['rates'] = (s_e, s_o)
        cons = [int(k) for k in g.mrt_conserved]
        m_planes = []
        for k in cons:
            acc = None
            for j in range(g.Q):
                coef = float(g.mrt_matrix[k, j])
                if coef == 0.0:
                    continue
                cu = eq.signed_sum(g.basis[j], u)
                fneq = fs[j] - _feq_i(builder, rho, usq, cu, j)
                term = fneq if coef == 1.0 else \
                    (-fneq if coef == -1.0 else
                     jnp.asarray(coef, dtype) * fneq)
                acc = term if acc is None else acc + term
            m_planes.append(acc)
        extra['cons'] = (cons, m_planes)
    return extra


def _mrt_corr(builder, extra, i, dtype):
    """Conserved-moment correction restoring the zero relaxation rate on
    rho/momentum (only nonzero net effect under forcing, where the
    equilibrium velocity is shifted)."""
    g = builder.grid
    s_e, s_o = extra['rates']
    cons, m_planes = extra['cons']
    corr = None
    for k, m in zip(cons, m_planes):
        if m is None:
            continue
        s_k = s_e if g.mrt_parity[k] > 0 else s_o
        coef = float(g.mrt_inv[i, k]) * s_k
        if coef == 0.0:
            continue
        term = jnp.asarray(coef, dtype) * m
        corr = term if corr is None else corr + term
    return corr


def _collide_pair(builder, fi, fo, mom, i, o, extra):
    """Post-collision values for the (i, opposite) direction pair.

    BGK (optionally with a local LES tau field) or parity-split MRT/TRT
    (reference relaxation_mrt.mako; rate structure per mrt_pair_rates).
    Returns (vi, vo); vo is None when i == o (rest particle)."""
    g = builder.grid
    rho, u, usq, uF = mom
    dtype = fi.dtype
    cu_i = eq.signed_sum(g.basis[i], u)
    if builder.model in ('mrt', 'trt'):
        s_e, s_o = extra['rates']
        feq_i = _feq_i(builder, rho, usq, cu_i, i)
        fneq_i = fi - feq_i
        if o == i:
            vi = fi - jnp.asarray(s_e, dtype) * fneq_i
            vo = None
        else:
            cu_o = eq.signed_sum(g.basis[o], u)
            feq_o = _feq_i(builder, rho, usq, cu_o, o)
            fneq_o = fo - feq_o
            hp = 0.5 * (fneq_i + fneq_o)
            hm = 0.5 * (fneq_i - fneq_o)
            vi = fi - jnp.asarray(s_e, dtype) * hp \
                - jnp.asarray(s_o, dtype) * hm
            vo = fo - jnp.asarray(s_e, dtype) * hp \
                + jnp.asarray(s_o, dtype) * hm
        corr_i = _mrt_corr(builder, extra, i, dtype)
        if corr_i is not None:
            vi = vi + corr_i
        if vo is not None:
            corr_o = _mrt_corr(builder, extra, o, dtype)
            if corr_o is not None:
                vo = vo + corr_o
    else:
        tau_inv = extra.get('tau_inv')
        if tau_inv is None:
            tau_inv = jnp.asarray(builder.tau_inv, dtype)
        feq_i = _feq_i(builder, rho, usq, cu_i, i)
        vi = fi + tau_inv * (feq_i - fi)
        vo = None
        if o != i:
            cu_o = eq.signed_sum(g.basis[o], u)
            feq_o = _feq_i(builder, rho, usq, cu_o, o)
            vo = fo + tau_inv * (feq_o - fo)
    if uF is not None:
        vi = vi + _force_term(builder, mom, cu_i, i)
        if vo is not None:
            cu_o = eq.signed_sum(g.basis[o], u)
            vo = vo + _force_term(builder, mom, cu_o, o)
    elif 'edm' in extra:
        vi = vi + _edm_term(builder, mom, extra['edm'], i)
        if vo is not None:
            vo = vo + _edm_term(builder, mom, extra['edm'], o)
    return vi, vo


def _collide_elbm(builder, fs, mom, skip=None):
    """Entropic collision of all Q planes at once (reference
    relaxation.mako ELBM_relaxate :56-97). Reuses ops/entropic verbatim
    on the stacked VMEM planes so the op order -- product-form feq,
    series/Newton alpha dispatch, f + alpha beta fneq -- matches the
    XLA engine to fp32 roundoff. ``skip``: lanes whose result the
    caller overwrites (dry/keep/BC); see entropic.entropic_alpha.
    Returns a (Q, ...) array."""
    from sailfish_tpu.ops import entropic
    g = builder.grid
    rho, u, usq, uF = mom
    fstk = jnp.stack(fs)
    fpost, _ = entropic.elbm_collide(
        g, fstk, rho, u, builder.tau, skip=skip,
        entropy_tol=getattr(builder, 'entropy_tolerance', 1e-6),
        alpha_tol=getattr(builder, 'alpha_tolerance', 1e-10))
    if uF is not None:
        terms = []
        for i in range(g.Q):
            cu = eq.signed_sum(g.basis[i], u)
            terms.append(_force_term(builder, mom, cu, i))
        fpost = fpost + jnp.stack(terms)
    elif _has_force(builder) and builder.force_model == 'edm':
        edm = _edm_prep(builder, mom)
        fpost = fpost + jnp.stack(
            [_edm_term(builder, mom, edm, i) for i in range(g.Q)])
    return fpost


def _bc_row_values(builder, instances, fsl, mask_row, bcp):
    """Native-BC phase chain for one row, elementwise on the (Y, X)
    plane: macroscopic solve (ops/step._solve_macro_bc), distribution
    reconstruction (_pre_collision_bc) and collision, mirroring the XLA
    engine's formulas with per-direction SCALAR-constant loops (Pallas
    kernels cannot capture (Q,)-shaped constants, so the stacked-weight
    eq/co helpers are off limits; op order differs from ops/step.py only
    at summation-tree level, i.e. fp32 ulps). ``fsl`` holds the row's
    post-stream planes in STANDARD direction order; ``bcp`` is the
    (1 + dim, Y, X) parameter plane [rho_bc, vel...]; ``instances`` is
    the (type_id, orientation) list in mask-code order (mask 3 + idx).
    Returned values are only meaningful where mask_row >= 3."""
    g = builder.grid
    dtype = fsl[0].dtype
    opp = [int(o) for o in g.opposite]
    pairs = [(i, opp[i]) for i in range(g.Q) if i <= opp[i]]

    # raw macroscopic (XLA: eq.macroscopic -- sum + signed_sum / rho)
    rho = fsl[0]
    for i in range(1, g.Q):
        rho = rho + fsl[i]
    u = [eq.signed_sum(g.basis[:, a], fsl) / rho for a in range(g.dim)]

    rho_bc = bcp[0]
    vel_bc = [bcp[1 + a] for a in range(g.dim)]
    insts = [(nt.get_node_type(tid), k, mask_row == (3 + idx))
             for idx, (tid, k) in enumerate(instances)]

    # -- macro solve (instance masks are disjoint: order-independent) --
    for cls, k, m in insts:
        n = g.orientation_vectors[k - 1]
        cn = g.basis @ n
        s0 = eq.signed_sum((cn == 0).astype(int), fsl)
        sin = eq.signed_sum((cn < 0).astype(int), fsl)
        if 'velocity' in cls.param_names:
            un = eq.signed_sum(n, vel_bc)
            rho_s = (s0 + 2.0 * sin) / (1.0 - un)
            rho = jnp.where(m, rho_s, rho)
            u = [jnp.where(m, vel_bc[a], u[a]) for a in range(g.dim)]
        else:
            un = 1.0 - (s0 + 2.0 * sin) / rho_bc
            rho = jnp.where(m, rho_bc, rho)
            u = [jnp.where(m, un * float(n[a]), u[a])
                 for a in range(g.dim)]

    def feq_full(rho_, u_):
        """Per-direction bgk equilibrium (matches eq.bgk_equilibrium /
        the kernel's _feq_i formula)."""
        usq_ = u_[0] * u_[0]
        for a in range(1, g.dim):
            usq_ = usq_ + u_[a] * u_[a]
        return [_feq_i(builder, rho_, usq_, eq.signed_sum(g.basis[i], u_),
                       i) for i in range(g.Q)]

    def noneq_bb(fs, feqp, unknown):
        """Unknown f_i <- f_opp + feq_i - feq_opp (sym.noneq_bb)."""
        return [fs[opp[i]] + feqp[i] - feqp[opp[i]] if unknown[i]
                else fs[i] for i in range(g.Q)]

    # -- reconstruction (_pre_collision_bc) --
    fs2 = list(fsl)
    for cls, k, m in insts:
        n = g.orientation_vectors[k - 1]
        unknown = g.unknown_mask(n)
        if cls in (nt.NTEquilibriumVelocity, nt.NTEquilibriumDensity):
            feqp = feq_full(rho, u)
            fs2 = [jnp.where(m, feqp[i], fs2[i]) for i in range(g.Q)]
        elif cls in (nt.NTZouHeVelocity, nt.NTZouHeDensity):
            feqp = feq_full(rho, u)
            fz = noneq_bb(fs2, feqp, unknown)
            mom_z = [eq.signed_sum(g.basis[:, a], fz)
                     for a in range(g.dim)]
            naxis = (k - 1) // 2
            for a in range(g.dim):
                if a == naxis:
                    continue
                coeff = np.where(unknown, g.basis[:, a], 0)
                denom = float(np.sum(coeff * g.basis[:, a]))
                if denom == 0.0:
                    continue
                dj = rho * u[a] - mom_z[a]
                fz = [fz[i] + (float(coeff[i]) / denom) * dj
                      if coeff[i] else fz[i] for i in range(g.Q)]
            fs2 = [jnp.where(m, fz[i], fs2[i]) for i in range(g.Q)]
        elif cls in (nt.NTRegularizedVelocity, nt.NTRegularizedDensity):
            feqp = feq_full(rho, u)
            fnb = noneq_bb(fs2, feqp, unknown)
            fneq = [fnb[i] - feqp[i] for i in range(g.Q)]
            c = g.basis.astype(np.float64)
            cs2 = g.cs2
            pi = {}
            for a in range(g.dim):
                for b in range(a, g.dim):
                    pi[(a, b)] = eq.signed_sum(c[:, a] * c[:, b], fneq)
            freg = []
            for i in range(g.Q):
                acc = None
                for a in range(g.dim):
                    for b in range(g.dim):
                        coef = c[i, a] * c[i, b] - \
                            (cs2 if a == b else 0.0)
                        if abs(coef) < 1e-14:
                            continue
                        t = coef * pi[(min(a, b), max(a, b))]
                        acc = t if acc is None else acc + t
                w = float(g.weights[i])
                term = 0.0 if acc is None else \
                    jnp.asarray(w / (2.0 * cs2 * cs2), dtype) * acc
                freg.append(feqp[i] + term)
            fs2 = [jnp.where(m, freg[i], fs2[i]) for i in range(g.Q)]

    # -- collision: the kernel's own pairwise machinery with the
    # overridden macros (the fluid path this mirrors is
    # equivalence-tested against ops/step._collide) --
    uF = None
    u_c = list(u)
    if _has_force(builder):
        fvec = _force_vec(builder)
        if builder.force_model == 'guo':
            u_c = [ua + jnp.asarray(0.5 * fvec[a], dtype)
                   for a, ua in enumerate(u_c)]
            uF = u_c[0] * jnp.asarray(fvec[0], dtype)
            for a in range(1, g.dim):
                uF = uF + u_c[a] * jnp.asarray(fvec[a], dtype)
        elif builder.force_model == 'velocity_shift':
            u_c = [ua + jnp.asarray(builder.tau * fvec[a], dtype)
                   for a, ua in enumerate(u_c)]
        # edm: bare velocity; _collide_prepass/_collide_pair add the
        # feq-difference term
    usq = u_c[0] * u_c[0]
    for a in range(1, g.dim):
        usq = usq + u_c[a] * u_c[a]
    mom = (rho, u_c, usq, uF)
    if builder.model == 'elbm':
        fpost = _collide_elbm(builder, fs2, mom)
        return [fpost[i] for i in range(g.Q)]
    extra = _collide_prepass(builder, fs2, mom)
    out = [None] * g.Q
    for i, o in pairs:
        fi = fs2[i]
        fo = fs2[o] if o != i else None
        vi, vo = _collide_pair(builder, fi, fo, mom, i, o, extra)
        out[i] = vi
        if o != i:
            out[o] = vo
    return out



def _sc_psi(builder, rho):
    """Pseudopotential (ops/collide.SHAN_CHEN_POTENTIALS)."""
    if builder.sc_potential == 'classic':
        return 1.0 - jnp.exp(-rho)
    return rho


def _sc_shift_moments(builder, mom, psi_of, shape_yx, y_fix=None,
                      x_fix=None):
    """Velocity-shift Shan-Chen forcing: u_eq = u + tau F / rho with
    F = -G psi(x) sum_i w_i psi(x + c_i) c_i (matches the XLA engine's
    shan_chen_force exactly; reference shan_chen.mako:9-84).

    ``psi_of(k)`` returns the psi plane at perpendicular offset k
    (3D: the z offset of a (Y, X) plane; 2D: the y row shift of a
    (by, X) block); the in-plane shifts are applied here as periodic
    lane/sublane rolls.

    ``y_fix(p, cy, dz)`` (3D y-sharded meshes): called after the
    sublane y-roll and before the lane x-roll, to overwrite the one
    wrapped edge row of the rolled psi plane with the y-neighbor's
    psi row (the local periodic wrap is wrong under y-sharding).

    ``x_fix(p, cx, cy)`` (2D x-sharded meshes): applied INSTEAD of
    the lane x-roll -- shifts the psi block one lane (static concat)
    with the wrap lane standing in from the x-neighbor's psi value
    (pallas_step2d builds it from a raw-rho ghost column)."""
    g = builder.grid
    rho, u, usq, uF = mom
    dtype = rho.dtype
    # memoize the psi planes at trace time: the classic potential's exp
    # would otherwise be re-evaluated once per direction
    psi_cache = {}

    def psi_at(k):
        if k not in psi_cache:
            psi_cache[k] = psi_of(k)
        return psi_cache[k]

    acc = [None] * g.dim
    for i in range(1, g.Q):
        cx, cy = int(g.basis[i][0]), int(g.basis[i][1])
        if g.dim == 3:
            p = psi_at(int(g.basis[i][2]))
            # in-plane axes counted from the END: psi windows may carry
            # a leading slab dim ((k, Y, X) in the k-batched 3D kernel)
            rolls = ((cy, p.ndim - 2, shape_yx[0]),
                     (cx, p.ndim - 1, shape_yx[1]))
        else:
            p = psi_at(cy)
            rolls = ((cx, p.ndim - 1, shape_yx[1]),)
        for c, ax, n in rolls:
            if c:
                if x_fix is not None and g.dim == 2:
                    p = x_fix(p, c, cy)
                    continue
                # psi at x + c: roll by -c (sample semantics)
                p = pltpu.roll(p, (-c) % n, axis=ax)
                if y_fix is not None and g.dim == 3 \
                        and ax == p.ndim - 2:
                    p = y_fix(p, c, int(g.basis[i][2]))
        w = float(g.weights[i])
        for a in range(g.dim):
            c = int(g.basis[i][a])
            if c:
                term = (w * c) * p
                acc[a] = term if acc[a] is None else acc[a] + term
    pref = jnp.asarray(-builder.sc_coupling, dtype) * psi_at(0)
    shift = jnp.asarray(builder.tau, dtype) / rho
    u = [ua + shift * (pref * acc[a]) for a, ua in enumerate(u)]
    usq = u[0] * u[0]
    for a in range(1, g.dim):
        usq = usq + u[a] * u[a]
    if uF is not None:
        fvec = _force_vec(builder)
        uF = u[0] * jnp.asarray(fvec[0], dtype)
        for a in range(1, g.dim):
            uF = uF + u[a] * jnp.asarray(fvec[a], dtype)
    return rho, u, usq, uF


def pick_slab_k(Q, Z, Y, X, sc=False, has_mask=False,
                budget=24 * 2 ** 20, k_max=8):
    """Largest slab depth k (<= k_max, dividing Z, pipeline depth >= 4
    programs) whose double-buffered VMEM working set fits the budget;
    1 otherwise. Batching k z-planes per program amortizes the ~2-5 us
    per-program DMA-issue/control overhead that dominates small
    domains (64^3 measured 652 MLUPS at k=1 vs the ~5400 streaming
    roofline); large domains are bandwidth-bound and keep k=1. Models
    with a heavy whole-slab prepass (MRT/TRT conserved moments, LES
    strain) lose a few %% at k=8 (measured 3127 vs 3449 at 128^3 MRT)
    -- callers cap k_max=4 for those."""
    for k in (8, 4, 2):
        if k > k_max or Z % k or Z // k < 4:
            continue
        b = 2 * Q * k * Y * X * 4
        if has_mask:
            b += 2 * k * Y * X * 4
        if sc:
            b += 2 * (k + 2) * Y * X * 4
        if b <= budget:
            return k
    return 1


def make_kernel_3d(builder, Z, Y, X, patch_rows=(), has_mask=False,
                   interpret=False, dyn_patches=False, max_patches=0,
                   sc=False, emit_rho=False, edge_io=False,
                   y_ghosts=False, k=1, mixed=None, patch_yrows=(),
                   face_io=False, rt_force=False, kbc=()):
    """Fused step kernel, software-pipelined across the z grid: gathers
    for the next slab of k z-planes are prefetched into the other buffer
    slot while the current slab computes (double buffering;
    pallas_guide.md 'Double Buffering'), the collision runs pairwise in
    place (halving VMEM), and the output write is asynchronous, drained
    before its slot is reused. ``k`` > 1 batches k consecutive planes
    per grid program (one strided window DMA per c_z group regardless of
    k), amortizing per-program overhead on small domains
    (pick_slab_k).

    State is UNPADDED (Q, Z, Y, X); the z-neighbor planes beyond the local
    extent come in as separate ghost inputs (Q, Y, X). On one device the
    caller passes periodic slices of the state itself; under a z-sharded
    mesh the caller passes ppermute'd neighbor faces -- the same kernel
    serves both (the TPU-native replacement for the reference's
    collect/distribute halo kernels, kernel_utils.mako:477-950).

    Signature: fused(f, ghost_lo, ghost_hi[, mask][, patch_vals]) -> out.

    With ``dyn_patches=True`` the patch planes are selected at RUN time
    instead of trace time: the kernel takes an int32 (Z,) SMEM map
    (``row -> patch slot or -1``) plus a (Q, max_patches, Y, X) plane
    array. One traced program then serves every shard of a z-sharded
    mesh, whichever global planes carry complex BCs (the multi-chip
    counterpart of the reference running arbitrary scenes on any
    decomposition, subdomain_connection.py:415-449). Signature becomes
    fused(f, ghost_lo, ghost_hi[, mask], patch_map, patch_vals) -> out.

    With ``sc=True`` (single-component Shan-Chen) three extra inputs
    follow the ghosts: the POST-STREAM density field (Z, Y, X) plus its
    two periodic ghost planes, computed by the caller in a cheap XLA
    pre-pass. The pseudopotential force is evaluated in-kernel from the
    three neighboring rho planes and shifts the equilibrium velocity by
    tau F / rho, exactly matching the XLA engine's shan_chen_force
    (ops/collide.py:95; reference shan_chen.mako sc_calculate_force).

    With ``emit_rho=True`` (requires ``sc``) the kernel additionally
    RETURNS next step's post-stream density as a second output, making
    the per-step rho pre-pass (make_rho_kernel_3d, ~80 B/node of HBM
    traffic) unnecessary: after the collision the post-collision slab
    is in VMEM, so the streamed sum sum_i f_i(x - c_i) for the next
    step can be computed on the spot. Plane z needs post-collision
    planes z-1..z+1, so the emission lags the pipeline by one plane (a
    2-plane ring carries the previous slab's tail); the periodic wrap
    planes 0 and Z-1 are emitted in the B-1 epilogue from a stash of
    planes 0/1 taken at the first program(s). Emitted values are
    bit-identical to the pre-pass kernel's (same source values, same
    roll/summation order). Signature becomes fused(f, glo, ghi, rho,
    rglo, rghi[, mask]) -> (out, rho_next), with rho aliased in place
    like f; the caller carries (f, rho) between steps. Requires
    Z/k >= 3.

    With ``edge_io=True`` (requires ``emit_rho``; the z-sharded mode)
    the wrap epilogue is dropped -- a shard cannot emit its edge
    planes (they need the neighbor's post-collision faces) -- and the
    two local edge planes of the rho INPUT are read from separate
    (Y, X) inputs ``rlo``/``rhi`` instead of the rho array (whose edge
    planes are stale under aliasing). The sharded caller computes them
    in XLA from ppermuted post-collision faces with the identical
    summation order (parallel.halo). Signature becomes fused(f, glo,
    ghi, rho, rglo, rghi, rlo, rhi[, mask]) -> (out, rho_next).

    With ``y_ghosts=True`` (the second mesh axis: a ('z','y')-sharded
    domain, parallel.halo.ShardedPallasStep3D) the in-VMEM y-roll of
    the pull no longer wraps correctly at the two local y-edge rows,
    so two extra inputs follow the z-ghosts: ``gylo``/``gyhi`` of
    shape (Z+2, Qp, X) -- the channel dim PADDED to the sublane tile
    (8; 16 under mixed), see the scratch note -- holding the
    y-neighbors' boundary rows (y=Y-1
    from below, y=0 from above) for every SOURCE plane -1..Z (the +-1
    entries carry the z+y corner rows, which the caller obtains by
    y-ppermuting the z-ghost-extended faces -- the standard two-hop
    corner exchange, reference subdomain_connection.py:238-449). After
    the rolls, each direction with c_y != 0 has its one wrapped edge
    row overwritten with the x-rolled ghost row. One (k+2)-row window
    DMA per slab per side; row values equal the local wrap when the
    mesh has one y-shard, so results match the 1-axis kernel exactly.
    With ``sc`` AND ``y_ghosts`` (a ('z','y')-sharded Shan-Chen
    scene; requires edge_io) four row inputs follow ``rlo``/``rhi``,
    all of shape (Z+2, 1, X) indexed so entry j+1 holds the row of
    plane j (entries 0 / Z+1 = the z-ghost planes):
      * ``rylo``/``ryhi``: the y-neighbors' post-stream rho boundary
        rows (y = Y-1 from below / y = 0 from above), used to fix the
        wrapped edge row of each y-rolled psi plane
        (_sc_shift_moments's y_fix hook);
      * ``rrlo``/``rrhi``: the CORRECT local edge rows (y = 0 / Y-1)
        of every rho plane -- the in-kernel emission cannot produce
        them on a y-shard, so each plane's edge rows are overwritten
        from these at psi-assembly time (a by-value no-op for the
        fresh z-edge/ghost planes, whose rows the caller copies in).
    The sharded caller computes all four in XLA from ppermuted faces
    with the emission's exact summation order (parallel.halo).

    With ``patch_yrows`` (static y-row indices) the complex-BC rows run
    NORMAL to z: scenes like the turbulence channel (walls normal to y)
    put BC nodes on every z-plane, so plane patching would overlay the
    whole domain. Instead the caller's XLA prologue recomputes those few
    y-rows over ALL z (compute_patch_yrow) into a (Z, Q, R, X) array;
    each program DMAs its slab's (k, Q, R, X) window alongside the
    gathers and selects the rows into the post-collision slab right
    before the store (the select folds into
    the existing plane store, and the patched rows ride the normal
    output write, so no separate overlay DMA or drain is needed).
    Signature: fused(f, ghost_lo, ghost_hi[, mask], ypatch) -> out.
    Mutually exclusive with patch_rows/dyn_patches/sc/y_ghosts; ELBM
    excluded (the garbage pre-overlay rows would join the Newton
    convergence vote).

    With ``face_io=True`` (requires ``y_ghosts``, excludes ``sc``) the
    kernel RETURNS its own boundary faces as four extra outputs --
    ``zlo``/``zhi`` (Q, Y, X): output planes z=0 / Z-1; ``ylo``/``yhi``
    (Z, Qp, X): output rows y=0 / Y-1 of every plane, channel dim
    padded like the gy inputs -- so the sharded caller never slices the
    state in XLA. Measured motivation (benchmark/zy_overhead.py,
    256^3 v5e): the y_ghosts kernel alone runs at 3567 MLUPS, but
    extracting f[:, :, -1] per step in XLA craters the loop to 1245 --
    the strided row slice makes f consumed by BOTH the in-place-aliased
    kernel and the slice, forcing a whole-array defensive copy. With
    face emission the state has exactly one consumer (the kernel) and
    the carried faces feed the next step's ppermutes directly. Values
    are the stored post-collision codes, so faces are bitwise equal to
    slices of the output. Complex-BC planes are overlaid AFTER the slab
    store, so their face rows are stale in the emitted arrays; the
    caller fixes those few rows in XLA from the patch planes it already
    computed (parallel.halo). Signature appends
    ``(zlo, zhi, ylo, yhi)`` to the output tuple.

    With ``kbc`` (in-kernel native BCs) each entry is a static spec
    ``(code, tid, orient, rho, (vx, vy, vz), slabs, (y0, y1),
    (x0, x1))`` describing one native-BC instance (see
    NATIVE_BC_TYPES) whose prescribed parameters are spatially
    UNIFORM: the full local phase chain (_bc_row_values -- the same
    math the Pallas patch prologue runs) is evaluated directly inside
    the kernel on the instance's tile-rounded static window and merged
    into the stored slab wherever ``mask == code``. No prologue
    kernel, no overlay DMA, no extra inputs (the scalars are baked
    into the trace) -- and, unlike the z-plane patch path, NO
    orientation restriction: BC faces normal to x or y run fused at
    the same cost as z-faces (the window bounds the extra compute).
    ``slabs`` is the static set of slab indices containing instance
    nodes; other slabs skip the evaluation entirely. Requires
    ``has_mask``; excluded for sc/ELBM (same reasons as patch_yrows)
    and dynamic parameters (scalars are trace-time constants).

    With ``mixed`` set (a MixedScales; --precision=mixed) the state,
    ghosts and patch planes are int16 fixed-point codes (ops/mixed.py):
    the DMA pipeline, rolls and ghost-row overwrites move raw codes
    (HALVING both the HBM streaming bytes and, sharded, the ICI face
    bytes), values are dequantized per distribution right before the
    moments/collide math (fp32 throughout) and requantized in register
    before the slab write. dry/keep nodes select the RAW pre-collision
    codes, exactly like the fp32 kernel selects pre-collision values.
    Requires sc=False (Shan-Chen density deviations exceed any useful
    fixed-point range).
    """
    g = builder.grid
    Q = g.Q
    dtype = builder.dtype
    # storage dtype: what the state arrays/DMAs/scratch hold; compute
    # stays in `dtype` (fp32) via mixed.dequant_i/quant_i at the edges
    sdtype = jnp.int16 if mixed is not None else dtype
    assert not (mixed is not None and sc)
    basis = g.basis  # (Q, 3) as (cx, cy, cz)
    patch_rows = tuple(int(r) for r in patch_rows)
    assert not (patch_rows and dyn_patches)
    patch_yrows = tuple(int(r) for r in patch_yrows)
    if patch_yrows:
        assert not (patch_rows or dyn_patches or sc or y_ghosts)
        assert builder.model != 'elbm'
    R_y = len(patch_yrows)
    kbc = tuple(kbc)
    if kbc:
        assert has_mask, 'in-kernel BCs are addressed via mask codes'
        assert not sc and builder.model != 'elbm'
        assert not rt_force
        # face_io emits rows at store time, before the BC merge would
        # correct them; combine only after wiring emit-after-merge
        assert not face_io
    assert Z % k == 0, (Z, k)
    B = Z // k
    if emit_rho:
        assert sc and not patch_rows and not dyn_patches
        assert B >= 3, (B, 'emit_rho needs >= 3 pipeline programs')
    assert not (edge_io and not emit_rho)
    # sc + y_ghosts (a ('z','y')-sharded Shan-Chen scene) additionally
    # requires edge_io and takes four more row inputs -- see below
    assert not (y_ghosts and sc and not edge_io)
    assert not (face_io and not y_ghosts)
    Qp = gy_pad_channels(Q, mixed) if y_ghosts else Q
    opp = [int(o) for o in g.opposite]
    # bounce-back pairs for in-place processing
    pairs = [(i, opp[i]) for i in range(Q) if i <= opp[i]]
    # cz-grouped Q layout: state/ghosts/patches arrive PERMUTED (see
    # cz_groups); in-kernel math uses standard indices via ipos
    perm, ipos, groups = cz_groups(g)
    # permuted-space extents of the c_z groups (used by the emit-rho
    # ring/stash buffers, which carry only the channels emission reads)
    n_m1 = n_p1 = 0
    s_0 = s_p1 = Q
    for gcz, gst, gcnt in groups:
        if gcz == -1:
            n_m1 = gcnt
        elif gcz == 0:
            s_0 = gst
        elif gcz == 1:
            s_p1 = gst
            n_p1 = gcnt
    # first program that performs the regular k-plane emission
    # [base-1, base+k-2] (k=1 lacks the base-2 ring plane before b=2)
    r0 = 2 if k == 1 else 1
    # slabs containing complex-BC rows drain their own output write (the
    # patch overlay must follow it); every other slab is drained by the
    # successor's prefetch or the epilogue
    patch_slabs = sorted({r // k for r in patch_rows})

    def slab_has_patch_static(b):
        return b in patch_slabs

    def kernel(*refs):
        idx = 0
        f_hbm = refs[idx]; idx += 1
        glo_hbm = refs[idx]; idx += 1
        ghi_hbm = refs[idx]; idx += 1
        gylo_hbm = gyhi_hbm = None
        if y_ghosts:
            gylo_hbm = refs[idx]; idx += 1   # (Z+2, Q, X)
            gyhi_hbm = refs[idx]; idx += 1
        rho_hbm = rglo_hbm = rghi_hbm = rlo_hbm = rhi_hbm = None
        rylo_hbm = ryhi_hbm = rrlo_hbm = rrhi_hbm = None
        if sc:
            rho_hbm = refs[idx]; idx += 1
            rglo_hbm = refs[idx]; idx += 1
            rghi_hbm = refs[idx]; idx += 1
            if edge_io:
                rlo_hbm = refs[idx]; idx += 1
                rhi_hbm = refs[idx]; idx += 1
            if y_ghosts:
                rylo_hbm = refs[idx]; idx += 1   # (Z+2, 1, X)
                ryhi_hbm = refs[idx]; idx += 1
                rrlo_hbm = refs[idx]; idx += 1
                rrhi_hbm = refs[idx]; idx += 1
        mask_hbm = None
        patch_hbm = None
        pmap_ref = None
        if has_mask:
            mask_hbm = refs[idx]; idx += 1
        if patch_rows:
            patch_hbm = refs[idx]; idx += 1
        if dyn_patches:
            pmap_ref = refs[idx]; idx += 1
            patch_hbm = refs[idx]; idx += 1
        ypatch_hbm = None
        if patch_yrows:
            ypatch_hbm = refs[idx]; idx += 1   # (Z, Q, R_y, X)
        cb = builder
        if rt_force:
            force_ref = refs[idx]; idx += 1    # SMEM (dim,) force(t)
            cb = _ForceProxy(builder, tuple(
                force_ref[a] for a in range(builder.grid.dim)))
        out_hbm = refs[idx]; idx += 1
        rho_out_hbm = None
        if emit_rho:
            rho_out_hbm = refs[idx]; idx += 1
        zlo_out = zhi_out = ylo_out = yhi_out = None
        yl1_out = yh2_out = None
        if face_io:
            zlo_out = refs[idx]; idx += 1   # (Q, Y, X)
            zhi_out = refs[idx]; idx += 1   # (Q, Y, X)
            ylo_out = refs[idx]; idx += 1   # (Z, Qp, X)
            yhi_out = refs[idx]; idx += 1   # (Z, Qp, X)
            if sc:
                yl1_out = refs[idx]; idx += 1  # (Z, Qp, X) row 1
                yh2_out = refs[idx]; idx += 1  # (Z, Qp, X) row Y-2
        fs_buf = refs[idx]; idx += 1       # (2, Q, k, Y, X)
        fwork = None
        if mixed is not None:
            fwork = refs[idx]; idx += 1    # (Q, k, Y, X) fp32
        gylo_buf = gyhi_buf = None
        if y_ghosts:
            gylo_buf = refs[idx]; idx += 1  # (2, k+2, Q, X)
            gyhi_buf = refs[idx]; idx += 1
        ylo_st = yhi_st = yl1_st = yh2_st = None
        if face_io:
            ylo_st = refs[idx]; idx += 1    # (2, k, Qp, X)
            yhi_st = refs[idx]; idx += 1
            if sc:
                yl1_st = refs[idx]; idx += 1
                yh2_st = refs[idx]; idx += 1
        mask_buf = None
        if has_mask:
            mask_buf = refs[idx]; idx += 1  # (2, k, Y, X)
        rho_buf = None
        rylo_buf = ryhi_buf = rrlo_buf = rrhi_buf = None
        if sc:
            rho_buf = refs[idx]; idx += 1   # (2, k+2, Y, X)
            if y_ghosts:
                rylo_buf = refs[idx]; idx += 1  # (2, k+2, 1, X)
                ryhi_buf = refs[idx]; idx += 1
                rrlo_buf = refs[idx]; idx += 1
                rrhi_buf = refs[idx]; idx += 1
        ypatch_buf = None
        if patch_yrows:
            ypatch_buf = refs[idx]; idx += 1  # (2, k, Q, R_y, X)
        ring0 = ring1 = stash0 = stash1 = remit_buf = redge_buf = None
        if emit_rho:
            ring0 = refs[idx]; idx += 1     # (2, n_p1, Y, X) pc base-2
            ring1 = refs[idx]; idx += 1     # (2, Q-s_0, Y, X) pc base-1
            if not edge_io:
                stash0 = refs[idx]; idx += 1  # (s_p1, Y, X) pc plane 0
                stash1 = refs[idx]; idx += 1  # (n_m1, Y, X) pc plane 1
            remit_buf = refs[idx]; idx += 1  # (2, k, Y, X)
            if not edge_io:
                redge_buf = refs[idx]; idx += 1  # (2, Y, X)
        in_sems = refs[idx]; idx += 1       # DMA (2, Q+10)
        out_sems = refs[idx]; idx += 1      # DMA (2,)
        remit_sems = redge_sems = None
        if emit_rho:
            remit_sems = refs[idx]; idx += 1  # DMA (2,)
            if not edge_io:
                redge_sems = refs[idx]; idx += 1  # DMA (2,)
        face_sems = zface_sems = None
        if face_io:
            face_sems = refs[idx]; idx += 1   # DMA (2, 2)
            zface_sems = refs[idx]; idx += 1  # DMA (2,)

        b0 = pl.program_id(0)
        base = b0 * k
        slot = jax.lax.rem(b0, 2)
        nslot = jax.lax.rem(b0 + 1, 2)

        def slab_has_patch_dyn(base_expr):
            """Traced any-patch-row-in-slab predicate (dyn mode)."""
            got = None
            for j in range(k):
                c = pmap_ref[base_expr + j] >= 0
                got = c if got is None else (got | c)
            return got

        def start_gathers(slab_b, slab_base, s):
            """Start the input DMAs for slab [slab_base, slab_base+k)
            into slot ``s``: ONE strided k-plane window DMA per c_z
            value, starting at slab_base - c_z (pull source for
            direction i at plane z is z - c_z; edge slabs split off the
            one plane that reads a ghost input)."""
            for gi, (cz, st, cnt) in enumerate(groups):
                dst = fs_buf.at[s, pl.ds(st, cnt)]
                sem = in_sems.at[s, gi]
                if cz == 0:
                    pltpu.make_async_copy(
                        f_hbm.at[pl.ds(st, cnt), pl.ds(slab_base, k)],
                        dst, sem).start()
                elif cz == 1:
                    @pl.when(slab_b == 0)
                    def _(st=st, cnt=cnt, sem=sem):
                        pltpu.make_async_copy(
                            glo_hbm.at[pl.ds(st, cnt)],
                            fs_buf.at[s, pl.ds(st, cnt), 0],
                            sem).start()
                        if k > 1:
                            pltpu.make_async_copy(
                                f_hbm.at[pl.ds(st, cnt),
                                         pl.ds(0, k - 1)],
                                fs_buf.at[s, pl.ds(st, cnt),
                                          pl.ds(1, k - 1)],
                                sem).start()

                    @pl.when(slab_b > 0)
                    def _(st=st, cnt=cnt, dst=dst, sem=sem,
                          slab_base=slab_base):
                        pltpu.make_async_copy(
                            f_hbm.at[pl.ds(st, cnt),
                                     pl.ds(slab_base - 1, k)],
                            dst, sem).start()
                else:
                    @pl.when(slab_b == B - 1)
                    def _(st=st, cnt=cnt, sem=sem, slab_base=slab_base):
                        if k > 1:
                            pltpu.make_async_copy(
                                f_hbm.at[pl.ds(st, cnt),
                                         pl.ds(slab_base + 1, k - 1)],
                                fs_buf.at[s, pl.ds(st, cnt),
                                          pl.ds(0, k - 1)],
                                sem).start()
                        pltpu.make_async_copy(
                            ghi_hbm.at[pl.ds(st, cnt)],
                            fs_buf.at[s, pl.ds(st, cnt), k - 1],
                            sem).start()

                    @pl.when(slab_b < B - 1)
                    def _(st=st, cnt=cnt, dst=dst, sem=sem,
                          slab_base=slab_base):
                        pltpu.make_async_copy(
                            f_hbm.at[pl.ds(st, cnt),
                                     pl.ds(slab_base + 1, k)],
                            dst, sem).start()
            if y_ghosts:
                # ghost-row windows for source planes
                # [slab_base-1, slab_base+k+1) -> rows slab_base..+k+2
                # of the (Z+2)-indexed face arrays
                pltpu.make_async_copy(
                    gylo_hbm.at[pl.ds(slab_base, k + 2)],
                    gylo_buf.at[s], in_sems.at[s, Q + 4]).start()
                pltpu.make_async_copy(
                    gyhi_hbm.at[pl.ds(slab_base, k + 2)],
                    gyhi_buf.at[s], in_sems.at[s, Q + 5]).start()
            if has_mask:
                pltpu.make_async_copy(
                    mask_hbm.at[pl.ds(slab_base, k)], mask_buf.at[s],
                    in_sems.at[s, Q]).start()
            if patch_yrows:
                # (k, Q, R_y, X) window of the prologue's y-rows; the
                # Q+1 sem slot is free (sc excludes patch_yrows)
                pltpu.make_async_copy(
                    ypatch_hbm.at[pl.ds(slab_base, k)],
                    ypatch_buf.at[s], in_sems.at[s, Q + 1]).start()
            if sc:
                # rho rows slab_base-1 .. slab_base+k (periodic edges
                # read the ghost inputs; under edge_io the STALE local
                # edge rows 0 / Z-1 read the rlo/rhi inputs instead)
                if edge_io:
                    # emit_rho guarantees B >= 3: slabs 0 and B-1
                    # are distinct programs
                    @pl.when(slab_b == 0)
                    def _():
                        pltpu.make_async_copy(
                            rlo_hbm, rho_buf.at[s, 1],
                            in_sems.at[s, Q + 2]).start()
                        if k > 1:
                            pltpu.make_async_copy(
                                rho_hbm.at[pl.ds(1, k - 1)],
                                rho_buf.at[s, pl.ds(2, k - 1)],
                                in_sems.at[s, Q + 2]).start()

                    @pl.when(slab_b == B - 1)
                    def _():
                        if k > 1:
                            pltpu.make_async_copy(
                                rho_hbm.at[pl.ds(Z - k, k - 1)],
                                rho_buf.at[s, pl.ds(1, k - 1)],
                                in_sems.at[s, Q + 2]).start()
                        pltpu.make_async_copy(
                            rhi_hbm, rho_buf.at[s, k],
                            in_sems.at[s, Q + 2]).start()

                    @pl.when((slab_b > 0) & (slab_b < B - 1))
                    def _(slab_base=slab_base):
                        pltpu.make_async_copy(
                            rho_hbm.at[pl.ds(slab_base, k)],
                            rho_buf.at[s, pl.ds(1, k)],
                            in_sems.at[s, Q + 2]).start()
                else:
                    pltpu.make_async_copy(
                        rho_hbm.at[pl.ds(slab_base, k)],
                        rho_buf.at[s, pl.ds(1, k)],
                        in_sems.at[s, Q + 2]).start()

                @pl.when(slab_b == 0)
                def _():
                    pltpu.make_async_copy(rglo_hbm, rho_buf.at[s, 0],
                                          in_sems.at[s, Q + 1]).start()

                if edge_io and k == 1:
                    # row slab_base-1 == 0 exactly at slab 1 (k == 1)
                    @pl.when(slab_b == 1)
                    def _():
                        pltpu.make_async_copy(
                            rlo_hbm, rho_buf.at[s, 0],
                            in_sems.at[s, Q + 1]).start()

                    @pl.when(slab_b > 1)
                    def _(slab_base=slab_base):
                        pltpu.make_async_copy(
                            rho_hbm.at[slab_base - 1], rho_buf.at[s, 0],
                            in_sems.at[s, Q + 1]).start()
                else:
                    @pl.when(slab_b > 0)
                    def _(slab_base=slab_base):
                        pltpu.make_async_copy(
                            rho_hbm.at[slab_base - 1], rho_buf.at[s, 0],
                            in_sems.at[s, Q + 1]).start()

                @pl.when(slab_b == B - 1)
                def _():
                    pltpu.make_async_copy(rghi_hbm,
                                          rho_buf.at[s, k + 1],
                                          in_sems.at[s, Q + 3]).start()

                if edge_io and k == 1:
                    # row slab_base+k == Z-1 exactly at slab B-2
                    @pl.when(slab_b == B - 2)
                    def _():
                        pltpu.make_async_copy(
                            rhi_hbm, rho_buf.at[s, k + 1],
                            in_sems.at[s, Q + 3]).start()

                    @pl.when(slab_b < B - 2)
                    def _(slab_base=slab_base):
                        pltpu.make_async_copy(
                            rho_hbm.at[slab_base + k],
                            rho_buf.at[s, k + 1],
                            in_sems.at[s, Q + 3]).start()
                else:
                    @pl.when(slab_b < B - 1)
                    def _(slab_base=slab_base):
                        pltpu.make_async_copy(
                            rho_hbm.at[slab_base + k],
                            rho_buf.at[s, k + 1],
                            in_sems.at[s, Q + 3]).start()
                if y_ghosts:
                    # (Z+2)-indexed row arrays: entries slab_base ..
                    # slab_base+k+1 <-> planes slab_base-1..slab_base+k
                    # (leading dim untiled -> arbitrary offsets)
                    for j, (arr, buf) in enumerate(
                            ((rylo_hbm, rylo_buf), (ryhi_hbm, ryhi_buf),
                             (rrlo_hbm, rrlo_buf),
                             (rrhi_hbm, rrhi_buf))):
                        pltpu.make_async_copy(
                            arr.at[pl.ds(slab_base, k + 2)], buf.at[s],
                            in_sems.at[s, Q + 6 + j]).start()

        def wait_gather_plus(slab_b, s):
            """Wait only the cz=+1 group of slot ``s``. Mirrors the
            start structure (slab 0 split the window into ghost +
            remainder; the waits must match those copies)."""
            for gi, (cz, st, cnt) in enumerate(groups):
                if cz != 1:
                    continue
                sem = in_sems.at[s, gi]

                @pl.when(slab_b == 0)
                def _(st=st, cnt=cnt, sem=sem):
                    pltpu.make_async_copy(
                        glo_hbm.at[pl.ds(st, cnt)],
                        fs_buf.at[s, pl.ds(st, cnt), 0], sem).wait()
                    if k > 1:
                        pltpu.make_async_copy(
                            f_hbm.at[pl.ds(st, cnt), pl.ds(0, k - 1)],
                            fs_buf.at[s, pl.ds(st, cnt),
                                      pl.ds(1, k - 1)], sem).wait()

                @pl.when(slab_b > 0)
                def _(st=st, cnt=cnt, sem=sem):
                    pltpu.make_async_copy(
                        f_hbm.at[pl.ds(st, cnt), pl.ds(0, k)],
                        fs_buf.at[s, pl.ds(st, cnt)], sem).wait()

        def wait_gathers(s):
            # the cz=+1 group of slab b0 (reading the old last row of
            # slab b0-1) was already drained by the PREDECESSOR program
            # before it overwrote that row in place -- except for slab
            # 0, whose gathers started in this very program's prologue
            for gi, (cz, st, cnt) in enumerate(groups):
                if cz == 1:
                    continue
                sem = in_sems.at[s, gi]
                if cz == 0:
                    pltpu.make_async_copy(
                        f_hbm.at[pl.ds(st, cnt), pl.ds(0, k)],
                        fs_buf.at[s, pl.ds(st, cnt)], sem).wait()
                    continue

                # cz=-1: the last slab split the window (remainder +
                # ghost); the waits must match those copies
                @pl.when(b0 == B - 1)
                def _(st=st, cnt=cnt, sem=sem):
                    if k > 1:
                        pltpu.make_async_copy(
                            f_hbm.at[pl.ds(st, cnt), pl.ds(0, k - 1)],
                            fs_buf.at[s, pl.ds(st, cnt),
                                      pl.ds(0, k - 1)], sem).wait()
                    pltpu.make_async_copy(
                        ghi_hbm.at[pl.ds(st, cnt)],
                        fs_buf.at[s, pl.ds(st, cnt), k - 1], sem).wait()

                @pl.when(b0 < B - 1)
                def _(st=st, cnt=cnt, sem=sem):
                    pltpu.make_async_copy(
                        f_hbm.at[pl.ds(st, cnt), pl.ds(0, k)],
                        fs_buf.at[s, pl.ds(st, cnt)], sem).wait()

            @pl.when(b0 == 0)
            def _():
                wait_gather_plus(b0, s)
            if y_ghosts:
                pltpu.make_async_copy(
                    gylo_hbm.at[pl.ds(0, k + 2)], gylo_buf.at[s],
                    in_sems.at[s, Q + 4]).wait()
                pltpu.make_async_copy(
                    gyhi_hbm.at[pl.ds(0, k + 2)], gyhi_buf.at[s],
                    in_sems.at[s, Q + 5]).wait()
            if has_mask:
                pltpu.make_async_copy(mask_hbm.at[pl.ds(0, k)],
                                      mask_buf.at[s],
                                      in_sems.at[s, Q]).wait()
            if patch_yrows:
                pltpu.make_async_copy(ypatch_hbm.at[pl.ds(0, k)],
                                      ypatch_buf.at[s],
                                      in_sems.at[s, Q + 1]).wait()
            if sc:
                if edge_io:
                    # edge slabs split the window copy (edge row from
                    # rlo/rhi + remainder); the waits must match
                    edge_slab = (b0 == 0) | (b0 == B - 1)

                    @pl.when(edge_slab)
                    def _():
                        pltpu.make_async_copy(
                            rho_hbm.at[0], rho_buf.at[s, 1],
                            in_sems.at[s, Q + 2]).wait()
                        if k > 1:
                            pltpu.make_async_copy(
                                rho_hbm.at[pl.ds(0, k - 1)],
                                rho_buf.at[s, pl.ds(1, k - 1)],
                                in_sems.at[s, Q + 2]).wait()

                    @pl.when(jnp.logical_not(edge_slab))
                    def _():
                        pltpu.make_async_copy(
                            rho_hbm.at[pl.ds(0, k)],
                            rho_buf.at[s, pl.ds(1, k)],
                            in_sems.at[s, Q + 2]).wait()
                else:
                    pltpu.make_async_copy(rho_hbm.at[pl.ds(0, k)],
                                          rho_buf.at[s, pl.ds(1, k)],
                                          in_sems.at[s, Q + 2]).wait()
                pltpu.make_async_copy(rho_hbm.at[0], rho_buf.at[s, 0],
                                      in_sems.at[s, Q + 1]).wait()
                pltpu.make_async_copy(rho_hbm.at[0],
                                      rho_buf.at[s, k + 1],
                                      in_sems.at[s, Q + 3]).wait()
                if y_ghosts:
                    for j, (arr, buf) in enumerate(
                            ((rylo_hbm, rylo_buf), (ryhi_hbm, ryhi_buf),
                             (rrlo_hbm, rrlo_buf),
                             (rrhi_hbm, rrhi_buf))):
                        pltpu.make_async_copy(
                            arr.at[pl.ds(0, k + 2)], buf.at[s],
                            in_sems.at[s, Q + 6 + j]).wait()

        def pre_write_waits():
            """In-place safety (out aliases f): the successor slab's
            cz=+1 gather reads the OLD last row of this slab; it must
            have landed in VMEM before this program's write overwrites
            that row."""

            @pl.when(b0 + 1 < B)
            def _():
                wait_gather_plus(b0 + 1, nslot)

        def wait_out(s):
            pltpu.make_async_copy(fs_buf.at[s],
                                  out_hbm.at[:, pl.ds(0, k)],
                                  out_sems.at[s]).wait()

        # -- pipeline bookkeeping ------------------------------------------
        # Each slab's output write is drained exactly once: by the
        # successor's prefetch reusing the slot, by the slab itself when
        # it overlays patch rows, or by the B-1 epilogue for the last
        # two slabs.
        prev_drained_own = None
        for b in patch_slabs:
            cond = b0 - 1 == b
            prev_drained_own = cond if prev_drained_own is None else \
                (prev_drained_own | cond)
        if dyn_patches:
            prev_drained_own = (b0 >= 1) & slab_has_patch_dyn(
                jnp.maximum(b0 - 1, 0) * k)

        @pl.when(b0 == 0)
        def _():
            start_gathers(b0, base, slot)

        @pl.when(b0 + 1 < B)
        def _():
            do_wait = b0 >= 1
            if prev_drained_own is not None:
                do_wait = do_wait & jnp.logical_not(prev_drained_own)

            @pl.when(do_wait)
            def _():
                wait_out(nslot)
            start_gathers(b0 + 1, base + k, nslot)

        def face_copies(s, base_expr):
            """The y-face row DMAs of slab ``base_expr`` staged in
            slot ``s`` (face_io; sc adds rows 1 / Y-2 for the XLA-side
            rho edge-row streaming)."""
            copies = [
                pltpu.make_async_copy(
                    ylo_st.at[s], ylo_out.at[pl.ds(base_expr, k)],
                    face_sems.at[s, 0]),
                pltpu.make_async_copy(
                    yhi_st.at[s], yhi_out.at[pl.ds(base_expr, k)],
                    face_sems.at[s, 1])]
            if sc:
                copies.append(pltpu.make_async_copy(
                    yl1_st.at[s], yl1_out.at[pl.ds(base_expr, k)],
                    face_sems.at[s, 2]))
                copies.append(pltpu.make_async_copy(
                    yh2_st.at[s], yh2_out.at[pl.ds(base_expr, k)],
                    face_sems.at[s, 3]))
            return copies

        def emit_faces(i, vi):
            """face_io: stage the post-collision edge rows (the exact
            stored codes) of channel i's slab for the y-face outputs."""
            ch = ipos[i]
            ylo_st[slot, :, ch] = vi[:, 0]
            yhi_st[slot, :, ch] = vi[:, Y - 1]
            if sc:
                yl1_st[slot, :, ch] = vi[:, 1]
                yh2_st[slot, :, ch] = vi[:, Y - 2]

        def zero_face_pad():
            """Deterministic tile-padding channels (Q..Qp): staging
            slots recycle, so without this the emitted arrays would
            carry stale garbage there (unread by any consumer, but it
            breaks carry-bitwise test gates)."""
            if Qp == Q:
                return
            z = jnp.zeros((k, Qp - Q, X), sdtype)
            for st in ([ylo_st, yhi_st] +
                       ([yl1_st, yh2_st] if sc else [])):
                st[slot, :, pl.ds(Q, Qp - Q)] = z

        # -- compute (every slab; complex-BC rows are overlaid after) ------
        wait_gathers(slot)
        if face_io:
            # recycle the face staging slot: the DMA that read it two
            # slabs ago must have drained before this slab's stores
            @pl.when(b0 >= 2)
            def _():
                for c in face_copies(slot, (b0 - 2) * k):
                    c.wait()
            zero_face_pad()
        # roll each slab in place (y/x periodic shifts of the pull);
        # buffer channel ipos[i] holds standard direction i. Mixed
        # storage dequantizes INTO the fp32 work buffer first: Mosaic
        # has no 16-bit vector rotate, and one dequant per plane here
        # plus one requant at the store is the conversion minimum
        # anyway (the DMAs stay int16).
        def yg_shift_rows(i, sl):
            """y-sharded: the wrapped edge row's position after the
            y-shift is STATIC (row 0 for c_y=+1, Y-1 for -1), so the
            y-roll, the neighbor-row substitution and the ghost row's
            own x-shift all fold into ONE static sublane concat of the
            raw ghost row with the unshifted plane (the later x-roll
            rotates plane and ghost row together) -- an exact
            permutation + substitution. The previous roll + whole-
            plane select + row lane-concat ran the zy mesh at a fixed
            ~2030 MLUPS ceiling from 128^3 to 256^3 (per-node cost,
            not glue; model_zoo_v5e.dat r4)."""
            cy = int(basis[i][1])
            cz = int(basis[i][2])
            ch = ipos[i]
            gbuf = gylo_buf if cy == 1 else gyhi_buf
            rows = gbuf[slot, pl.ds(1 - cz, k), ch][:, None]  # (k,1,X)
            if mixed is not None:
                rows = mixed.dequant_i(i, rows)
            if cy == 1:
                return jnp.concatenate([rows, sl[:, :Y - 1]], axis=1)
            return jnp.concatenate([sl[:, 1:], rows], axis=1)

        for i in range(Q):
            cx, cy = int(basis[i][0]), int(basis[i][1])
            if mixed is not None:
                sl = mixed.dequant_i(i, fs_buf[slot, ipos[i]])
                if y_ghosts and cy:
                    sl = yg_shift_rows(i, sl)
                elif cy:
                    sl = pltpu.roll(sl, cy % Y, axis=1)
                if cx:
                    sl = pltpu.roll(sl, cx % X, axis=2)
                fwork[ipos[i]] = sl
            elif cy or cx:
                sl = fs_buf[slot, ipos[i]]          # (k, Y, X)
                if y_ghosts and cy:
                    sl = yg_shift_rows(i, sl)
                elif cy:
                    sl = pltpu.roll(sl, cy % Y, axis=1)
                if cx:
                    sl = pltpu.roll(sl, cx % X, axis=2)
                fs_buf[slot, ipos[i]] = sl

        # moments (read all slabs before any in-place overwrite)
        if mixed is not None:
            fsl = [fwork[ipos[i]] for i in range(Q)]
        else:
            fsl = [fs_buf[slot, ipos[i]] for i in range(Q)]
        mom_u = _moments(cb, fsl)
        if sc:
            psi_cache = {}
            yiota = jax.lax.broadcasted_iota(jnp.int32, (1, Y, 1), 1)

            def psi_of(dz):
                if dz not in psi_cache:
                    r = rho_buf[slot, pl.ds(1 + dz, k)]
                    if y_ghosts:
                        # the carry's edge rows are stale on a y-shard
                        # (the emission cannot produce them); read the
                        # fresh rows instead. For the z-edge/ghost
                        # planes this rewrites identical values.
                        lo = rrlo_buf[slot, pl.ds(1 + dz, k)]  # (k,1,X)
                        hi = rrhi_buf[slot, pl.ds(1 + dz, k)]
                        r = jnp.where(yiota == 0, lo, r)
                        r = jnp.where(yiota == Y - 1, hi, r)
                    psi_cache[dz] = _sc_psi(builder, r)
                return psi_cache[dz]

            y_fix = None
            if y_ghosts:
                psi_row_cache = {}

                def psi_row(side, dz):
                    if (side, dz) not in psi_row_cache:
                        buf = ryhi_buf if side == 1 else rylo_buf
                        psi_row_cache[(side, dz)] = _sc_psi(
                            builder, buf[slot, pl.ds(1 + dz, k)])
                    return psi_row_cache[(side, dz)]

                def y_fix(p, cy, dz):
                    # psi sample at y+cy: the y-roll (-cy) wrapped one
                    # edge row through the local boundary; overwrite it
                    # with the y-neighbor's psi row of the same source
                    # plane (x-rolled afterwards with the whole plane)
                    edge = Y - 1 if cy == 1 else 0
                    return jnp.where(yiota == edge, psi_row(cy, dz), p)

            mom_u = _sc_shift_moments(cb, mom_u, psi_of, (Y, X),
                                      y_fix=y_fix)
        if has_mask:
            m = mask_buf[slot]
            is_dry = m == 1
            is_keep = m == 2

        yp_fix = None
        if patch_yrows:
            yp_iota = jax.lax.broadcasted_iota(jnp.int32, (1, Y, 1), 1)

            def yp_fix(i, v):
                """Overlay the prologue's exact complex-BC y-rows into
                the post-collision slab before the store (the in-kernel
                values there are wrapped-roll garbage, never written)."""
                ch = ipos[i]
                for jr, r in enumerate(patch_yrows):
                    rows = ypatch_buf[slot, :, ch, jr]      # (k, X)
                    if mixed is not None:
                        rows = mixed.dequant_i(i, rows)
                    v = jnp.where(yp_iota == r, rows[:, None], v)
                return v

        if builder.model == 'elbm':
            # overlaid rows' collide results are discarded; keep their
            # (possibly 2-cycling) lanes out of the Newton loop's
            # convergence vote (see pallas_step2d)
            prow = []
            for j in range(k):
                if dyn_patches:
                    prow.append(pmap_ref[base + j] >= 0)
                    continue
                pj = None
                for r in patch_rows:
                    c = base + j == r
                    pj = c if pj is None else pj | c
                prow.append(pj)
            skip = (m != 0) if has_mask else None
            if any(p is not None for p in prow):
                pvec = jnp.stack([jnp.asarray(False) if p is None
                                  else p for p in prow])[:, None, None]
                skip = pvec if skip is None else (skip | pvec)
            fpost = _collide_elbm(cb, fsl, mom_u, skip=skip)
            for i in range(Q):
                vi = fpost[i]
                if has_mask:
                    vi = jnp.where(is_dry, fsl[opp[i]],
                                   jnp.where(is_keep, fsl[i], vi))
                if mixed is not None:
                    vi = mixed.quant_i(i, vi)
                if face_io:
                    emit_faces(i, vi)
                fs_buf[slot, ipos[i]] = vi
        else:
            extra = _collide_prepass(cb, fsl, mom_u)
            # pairwise collide+store in place: out_i depends only on
            # fs_i/fs_opp (+ whole-slab moments), both read before
            # either is overwritten within a pair
            for i, o in pairs:
                if mixed is not None:
                    fi = fwork[ipos[i]]
                    fo = fwork[ipos[o]] if o != i else None
                else:
                    fi = fs_buf[slot, ipos[i]]
                    fo = fs_buf[slot, ipos[o]] if o != i else None
                vi, vo = _collide_pair(cb, fi, fo, mom_u, i, o,
                                       extra)
                if o == i:
                    if has_mask:
                        vi = jnp.where(is_dry | is_keep, fi, vi)
                    if yp_fix is not None:
                        vi = yp_fix(i, vi)
                    if mixed is not None:
                        vi = mixed.quant_i(i, vi)
                    if face_io:
                        emit_faces(i, vi)
                    fs_buf[slot, ipos[i]] = vi
                    continue
                if has_mask:
                    vi2 = jnp.where(is_dry, fo,
                                    jnp.where(is_keep, fi, vi))
                    vo = jnp.where(is_dry, fi,
                                   jnp.where(is_keep, fo, vo))
                    vi = vi2
                if yp_fix is not None:
                    vi = yp_fix(i, vi)
                    vo = yp_fix(o, vo)
                if mixed is not None:
                    vi = mixed.quant_i(i, vi)
                    vo = mixed.quant_i(o, vo)
                if face_io:
                    emit_faces(i, vi)
                    emit_faces(o, vo)
                fs_buf[slot, ipos[i]] = vi
                fs_buf[slot, ipos[o]] = vo

        if kbc:
            # in-kernel native BCs: run the full local phase chain on
            # each instance's static window (pre-collision post-stream
            # values were captured in fsl above) and merge the results
            # into the stored slab by mask code. Slabs outside the
            # instance's static slab set skip the evaluation.
            for code, tid, ko, rho_s, vel_s, slabs, (wy0, wy1), \
                    (wx0, wx1) in kbc:
                pred = None
                if len(slabs) < B:
                    for bb in slabs:
                        c = b0 == bb
                        pred = c if pred is None else pred | c

                def apply_inst(code=code, tid=tid, ko=ko, rho_s=rho_s,
                               vel_s=vel_s, wy0=wy0, wy1=wy1, wx0=wx0,
                               wx1=wx1):
                    mw = mask_buf[slot][:, wy0:wy1, wx0:wx1]
                    sel = mw == code
                    mrow = jnp.where(sel, 3, 0)
                    fsw = [fsl[i][:, wy0:wy1, wx0:wx1]
                           for i in range(Q)]
                    vals = _bc_row_values(cb, [(tid, ko)], fsw, mrow,
                                          [rho_s] + list(vel_s))
                    for i in range(Q):
                        vi = vals[i]
                        if mixed is not None:
                            vi = mixed.quant_i(i, vi)
                        cur = fs_buf[slot, ipos[i], :, wy0:wy1,
                                     wx0:wx1]
                        fs_buf[slot, ipos[i], :, wy0:wy1, wx0:wx1] = \
                            jnp.where(sel, vi, cur)

                if pred is None:
                    apply_inst()
                else:
                    pl.when(pred)(apply_inst)

        pre_write_waits()
        pltpu.make_async_copy(fs_buf.at[slot],
                              out_hbm.at[:, pl.ds(base, k)],
                              out_sems.at[slot]).start()

        if face_io:
            for c in face_copies(slot, base):
                c.start()

            # z-face one-shots: the first/last output plane straight
            # from the post-collision slab (immediate wait -- once per
            # call, and the slot may be recycled before any later drain
            # point)
            @pl.when(b0 == 0)
            def _():
                c = pltpu.make_async_copy(
                    fs_buf.at[slot, :, 0], zlo_out, zface_sems.at[0])
                c.start()
                c.wait()

            @pl.when(b0 == B - 1)
            def _():
                c = pltpu.make_async_copy(
                    fs_buf.at[slot, :, k - 1], zhi_out,
                    zface_sems.at[1])
                c.start()
                c.wait()

            @pl.when(b0 == B - 1)
            def _():
                # drain the outstanding face emissions (no successor
                # exists to recycle these staging slots)
                for c in face_copies(slot, base):
                    c.wait()
                if B >= 2:
                    for c in face_copies(nslot, (B - 2) * k):
                        c.wait()

        # -- emit-rho: next step's post-stream density from the
        # post-collision slab now sitting in VMEM (see docstring) ------
        if emit_rho:
            def pc_src(i, s):
                """Post-collision plane base+s of direction i
                (s in [-2, k-1]; negative planes from the ring)."""
                ch = ipos[i]
                if s >= 0:
                    return fs_buf[slot, ch, s]
                if s == -1:
                    return ring1[nslot, ch - s_0]
                return ring0[nslot, ch - s_p1]

            def emitted_rho(src):
                """Streamed density sum_i src_i(x-cx, y-cy); source
                selection, roll and summation order identical to
                make_rho_kernel_3d for bit-equality."""
                acc = None
                for i in range(Q):
                    cx, cy = int(basis[i][0]), int(basis[i][1])
                    plane = src(i)
                    if cy:
                        plane = pltpu.roll(plane, cy % Y, axis=0)
                    if cx:
                        plane = pltpu.roll(plane, cx % X, axis=1)
                    acc = plane if acc is None else acc + plane
                return acc

            def remit_copy_reg(s, base_expr):
                return pltpu.make_async_copy(
                    remit_buf.at[s],
                    rho_out_hbm.at[pl.ds(base_expr - 1, k)],
                    remit_sems.at[s])

            def remit_copy_pro(s):
                # program-0 prologue (k>=3): planes [1, k-2]
                return pltpu.make_async_copy(
                    remit_buf.at[s, pl.ds(0, k - 2)],
                    rho_out_hbm.at[pl.ds(1, k - 2)],
                    remit_sems.at[s])

            def emit_planes(j_lo, j_hi):
                for off, j in enumerate(range(j_lo, j_hi)):
                    remit_buf[slot, off] = emitted_rho(
                        lambda i, j=j: pc_src(
                            i, j - int(basis[i][2])))

            @pl.when(b0 >= r0)
            def _():
                # drain the emission that last used this staging slot
                @pl.when(b0 >= r0 + 2)
                def _():
                    remit_copy_reg(slot, (b0 - 2) * k).wait()
                if k >= 3:
                    @pl.when(b0 == 2)
                    def _():
                        remit_copy_pro(slot).wait()
                emit_planes(-1, k - 1)
                remit_copy_reg(slot, base).start()

            if k >= 3:
                @pl.when(b0 == 0)
                def _():
                    emit_planes(1, k - 1)
                    remit_copy_pro(slot).start()

            # stash pc planes 0/1 for the periodic wrap emission
            if not edge_io:
                @pl.when(b0 == 0)
                def _():
                    stash0[...] = fs_buf[slot, pl.ds(0, s_p1), 0]
                    if k >= 2:
                        stash1[...] = fs_buf[slot, pl.ds(0, n_m1), 1]
                if k == 1:
                    @pl.when(b0 == 1)
                    def _():
                        stash1[...] = fs_buf[slot, pl.ds(0, n_m1), 0]

            # ring update: carry this slab's last two pc planes
            # (emission above read the PREVIOUS slab's ring via nslot)
            if k == 1:
                ring0[slot] = ring1[nslot, pl.ds(s_p1 - s_0, n_p1)]
            else:
                ring0[slot] = fs_buf[slot, pl.ds(s_p1, n_p1), k - 2]
            ring1[slot] = fs_buf[slot, pl.ds(s_0, Q - s_0), k - 1]

            if not edge_io:
                @pl.when(b0 == B - 1)
                def _():
                    # periodic wrap planes: Z-1 (needs pc Z-2, Z-1, 0)
                    # and 0 (needs pc Z-1, 0, 1); skipped under edge_io
                    # (the sharded caller computes the edge planes in
                    # XLA from ppermuted post-collision faces)
                    def src_last(i):
                        cz = int(basis[i][2])
                        ch = ipos[i]
                        if cz == 1:          # source plane Z-2
                            if k >= 2:
                                return fs_buf[slot, ch, k - 2]
                            return ring0[slot, ch - s_p1]
                        if cz == 0:          # source plane Z-1
                            return fs_buf[slot, ch, k - 1]
                        return stash0[ch]    # cz=-1: source plane Z -> 0

                    def src_first(i):
                        cz = int(basis[i][2])
                        ch = ipos[i]
                        if cz == 1:          # source plane -1 -> Z-1
                            return fs_buf[slot, ch, k - 1]
                        if cz == 0:          # source plane 0
                            return stash0[ch]
                        return stash1[ch]    # cz=-1: source plane 1

                    redge_buf[0] = emitted_rho(src_last)
                    redge_buf[1] = emitted_rho(src_first)
                    c0 = pltpu.make_async_copy(redge_buf.at[0],
                                               rho_out_hbm.at[Z - 1],
                                               redge_sems.at[0])
                    c1 = pltpu.make_async_copy(redge_buf.at[1],
                                               rho_out_hbm.at[0],
                                               redge_sems.at[1])
                    c0.start()
                    c1.start()
                    c0.wait()
                    c1.wait()

            @pl.when(b0 == B - 1)
            def _():
                # drain the outstanding slab emissions (no successor
                # exists to recycle these staging slots)
                remit_copy_reg(slot, base).wait()
                if B - 2 >= r0:
                    remit_copy_reg(nslot, (B - 2) * k).wait()
                elif B - 2 == 0 and k >= 3:
                    remit_copy_pro(nslot).wait()

        # -- patch overlay: complex-BC rows computed exactly by the XLA
        # machinery replace the in-kernel values (which are garbage
        # there but never read by anyone: successors gather OLD values,
        # pre_write_waits orders the one hazard) ------------------------
        def overlay_patches():
            wait_out(slot)   # overlay must follow the slab write
            if dyn_patches:
                for j in range(k):
                    @pl.when(pmap_ref[base + j] >= 0)
                    def _(j=j):
                        p = jnp.maximum(pmap_ref[base + j], 0)
                        c = pltpu.make_async_copy(
                            patch_hbm.at[:, p],
                            out_hbm.at[:, base + j],
                            out_sems.at[slot])
                        c.start()
                        c.wait()
                return
            for jp, r in enumerate(patch_rows):
                @pl.when(b0 == r // k)
                def _(jp=jp, r=r):
                    c = pltpu.make_async_copy(patch_hbm.at[:, jp],
                                              out_hbm.at[:, r],
                                              out_sems.at[slot])
                    c.start()
                    c.wait()

        if dyn_patches:
            @pl.when(slab_has_patch_dyn(base))
            def _():
                overlay_patches()
        elif patch_slabs:
            cond = None
            for b in patch_slabs:
                c = (b0 == b)
                cond = c if cond is None else (cond | c)

            @pl.when(cond)
            def _():
                overlay_patches()

        # epilogue: drain the last two slabs' writes (no successor
        # prefetch exists for them; patch slabs already drained their
        # own)
        if dyn_patches:
            @pl.when(b0 == B - 1)
            def _():
                @pl.when(jnp.logical_not(
                        slab_has_patch_dyn((B - 1) * k)))
                def _():
                    wait_out(slot)
                if B >= 2:
                    @pl.when(jnp.logical_not(
                            slab_has_patch_dyn((B - 2) * k)))
                    def _():
                        wait_out(nslot)
        else:
            @pl.when(b0 == B - 1)
            def _():
                if not slab_has_patch_static(B - 1):
                    wait_out(slot)
                if B >= 2 and not slab_has_patch_static(B - 2):
                    wait_out(nslot)

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    if y_ghosts:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * 2
    if sc:
        n_sc = 5 if edge_io else 3
        if y_ghosts:
            n_sc += 4
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * n_sc
    scratch = [
        pltpu.VMEM((2, Q, k, Y, X), sdtype),
    ]
    if mixed is not None:
        # fp32 view of the CURRENT slab (post-roll, pre-collide); the
        # double-buffered staging stays int16
        scratch.append(pltpu.VMEM((Q, k, Y, X), dtype))
    if y_ghosts:
        # channel dim padded to the sublane tile: Mosaic rejects a
        # dynamically offset memref slice whose trailing extents are
        # not tile-aligned (observed at 256^3: slicing (k+2, 19, 256)
        # of the (Z+2, 19, X) input fails; (k+2, 24, 256) compiles).
        # The callers ship (Z+2, Qp, X) ghost-row arrays; int16 tiles
        # are (16, 128), so mixed storage pads to 16.
        scratch.append(pltpu.VMEM((2, k + 2, Qp, X), sdtype))
        scratch.append(pltpu.VMEM((2, k + 2, Qp, X), sdtype))
    if face_io:
        scratch.append(pltpu.VMEM((2, k, Qp, X), sdtype))   # ylo_st
        scratch.append(pltpu.VMEM((2, k, Qp, X), sdtype))   # yhi_st
        if sc:
            scratch.append(pltpu.VMEM((2, k, Qp, X), sdtype))  # yl1
            scratch.append(pltpu.VMEM((2, k, Qp, X), sdtype))  # yh2
    if has_mask:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((2, k, Y, X), jnp.int32))
    if sc:
        scratch.append(pltpu.VMEM((2, k + 2, Y, X), dtype))
        if y_ghosts:
            for _ in range(4):
                scratch.append(pltpu.VMEM((2, k + 2, 1, X), dtype))
    if patch_yrows:
        scratch.append(pltpu.VMEM((2, k, Q, R_y, X), sdtype))
    if emit_rho:
        scratch.append(pltpu.VMEM((2, n_p1, Y, X), dtype))      # ring0
        scratch.append(pltpu.VMEM((2, Q - s_0, Y, X), dtype))   # ring1
        if not edge_io:
            scratch.append(pltpu.VMEM((s_p1, Y, X), dtype))     # stash0
            scratch.append(pltpu.VMEM((n_m1, Y, X), dtype))     # stash1
        scratch.append(pltpu.VMEM((2, k, Y, X), dtype))         # remit
        if not edge_io:
            scratch.append(pltpu.VMEM((2, Y, X), dtype))        # redge
    if patch_rows:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if dyn_patches:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if patch_yrows:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if rt_force:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    scratch.append(pltpu.SemaphoreType.DMA((2, Q + 10)))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if emit_rho:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))           # remit
        if not edge_io:
            scratch.append(pltpu.SemaphoreType.DMA((2,)))       # redge
    if face_io:
        scratch.append(
            pltpu.SemaphoreType.DMA((2, 4 if sc else 2)))       # faces
        scratch.append(pltpu.SemaphoreType.DMA((2,)))           # zfaces

    # k > 1 working sets exceed the default 16 MB scoped-vmem limit;
    # v5e has headroom, so request what the buffers need plus margin
    sbytes = 2 if mixed is not None else 4
    vmem_need = 2 * Q * k * Y * X * sbytes
    if mixed is not None:
        vmem_need += Q * k * Y * X * 4
    if y_ghosts:
        vmem_need += 4 * (k + 2) * max(Q, 8) * X * sbytes
    if face_io:
        vmem_need += (8 if sc else 4) * k * Qp * X * sbytes
    if has_mask:
        vmem_need += 2 * k * Y * X * 4
    if patch_yrows:
        # R_y rows tile-round to 8 sublanes per (slab, q)
        vmem_need += 2 * k * Q * max(R_y, 8) * X * sbytes
    for _c, _t, _o, _r, _v, _s, (_y0, _y1), (_x0, _x1) in kbc:
        # in-kernel BC temporaries: the window's Q-direction phase
        # chain lives alongside the slab during the merge
        vmem_need += 2 * Q * k * (_y1 - _y0) * (_x1 - _x0) * 4
    if sc:
        vmem_need += 2 * (k + 2) * Y * X * 4
    if emit_rho:
        vmem_need += (2 * n_p1 + 2 * (Q - s_0) + 2 * k) * Y * X * 4
        if not edge_io:
            vmem_need += (s_p1 + n_m1 + 2) * Y * X * 4
    # margin: Mosaic stack temporaries (moments/feq/psi planes inside
    # the collide) scale with the slab size; the limit is only a gate,
    # not an allocation, so be generous -- two slab-sized sets plus
    # fixed headroom
    margin = 8 * 2 ** 20 + 2 * Q * k * Y * X * 4
    vmem_limit = min(max(16 * 2 ** 20, vmem_need + margin),
                     100 * 2 ** 20)

    out_shape = jax.ShapeDtypeStruct((Q, Z, Y, X), sdtype)
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    # in-place update: TPU HBM streams ~1.8x faster when the write
    # lands in the read buffer (measured 513 vs 283 GB/s on v5e for
    # the same copy kernel). The kernel never reads out_hbm, and
    # pre_write_waits() orders the one cross-plane hazard, so this
    # is correct whether or not XLA honors the alias.
    io_aliases = {0: 0}
    if emit_rho:
        out_shape = [out_shape, jax.ShapeDtypeStruct((Z, Y, X), dtype)]
        out_specs = [out_specs, pl.BlockSpec(memory_space=pl.ANY)]
        # rho updates in place too: program b writes planes <=
        # base+k-2, every read of those planes (gathers of programs
        # <= b+1) has already landed by emission time
        io_aliases[3 + (2 if y_ghosts else 0)] = 1
    if face_io:
        n_face = 6 if sc else 4
        faces = [jax.ShapeDtypeStruct((Q, Y, X), sdtype),
                 jax.ShapeDtypeStruct((Q, Y, X), sdtype)] + \
            [jax.ShapeDtypeStruct((Z, Qp, X), sdtype)] * (n_face - 2)
        if emit_rho:
            out_shape = out_shape + faces
            out_specs = out_specs + \
                [pl.BlockSpec(memory_space=pl.ANY)] * n_face
        else:
            out_shape = [out_shape] + faces
            out_specs = [out_specs] + \
                [pl.BlockSpec(memory_space=pl.ANY)] * n_face
    fused = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=vmem_limit),
        input_output_aliases=io_aliases,
        interpret=interpret,
    )
    return fused


def _bc_patch_compute(builder, bc_instances, fsl, mrow, bcp):
    """Shared full-row/block phase chain for the 2D/3D Pallas patch
    prologues: fluid pairwise collide (the main kernel's machinery),
    the local-BC solves (_bc_row_values), then the dry/keep/BC merge.
    ``fsl`` holds post-stream planes in STANDARD direction order."""
    g = builder.grid
    Q = g.Q
    opp = [int(o) for o in g.opposite]
    pairs = [(i, opp[i]) for i in range(Q) if i <= opp[i]]
    mom_u = _moments(builder, fsl)
    if builder.model == 'elbm':
        fpost = _collide_elbm(builder, fsl, mom_u, skip=mrow != 0)
        base = [fpost[i] for i in range(Q)]
    else:
        extra = _collide_prepass(builder, fsl, mom_u)
        base = [None] * Q
        for i, o in pairs:
            fo = fsl[o] if o != i else None
            vi, vo = _collide_pair(builder, fsl[i], fo, mom_u, i, o,
                                   extra)
            base[i] = vi
            if o != i:
                base[o] = vo
    vals = _bc_row_values(builder, bc_instances, fsl, mrow, bcp)
    is_dry = mrow == 1
    is_keep = mrow == 2
    any_bc = mrow >= 3
    out = []
    for i in range(Q):
        v = jnp.where(is_dry, fsl[opp[i]],
                      jnp.where(is_keep, fsl[i], base[i]))
        out.append(jnp.where(any_bc, vals[i], v))
    return out


def make_bc_patch_kernel_3d(builder, Z, R, Y, X, bc_instances,
                            interpret=False, mixed=None):
    """Pallas patch-plane prologue for native-BC rows.

    One tiny program per complex-BC row: pull-gathers the row's
    post-stream distributions from the PRE-step state (3 source rows,
    one strided DMA per c_z group), runs the full row phase chain --
    fluid pairwise collide, the local-BC solves (_bc_row_values),
    dry/keep handling -- and emits the (Q, R, Y, X) post-collision
    patch planes that the main kernel's EXISTING overlay path consumes
    (permuted Q layout). This replaces the ~40 small XLA ops of
    compute_patch_plane for NATIVE_BC_TYPES rows while leaving the
    main kernel untouched: tracing BC branches inside the main kernel
    measurably slowed every grid program (~-20%% at 128^3/256^3,
    register/VMEM pressure), whereas a separate tiny kernel costs only
    its own ~plane-sized work.

    Signature: bc(f, mask_rows, bcp, rows) -> patches (Q, R, Y, X);
    ``f`` in the kernel's PERMUTED Q layout (padded), ``rows`` int32
    in SMEM, ``bcp`` = (1 + 3, R, Y, X) parameter planes."""
    g = builder.grid
    Q = g.Q
    dtype = builder.dtype
    # mixed storage: raw int16 codes move through the DMAs/rolls, the
    # row phase chain runs on dequantized fp32, the emitted patch
    # planes are requantized (the main kernel overlays raw codes)
    sdtype = jnp.int16 if mixed is not None else dtype
    basis = g.basis
    perm, ipos, groups = cz_groups(g)

    def kernel(f_hbm, mask_hbm, bcp_hbm, rows_ref, out_hbm,
               src_buf, mask_buf, bcp_buf, sems):
        r = pl.program_id(0)
        row = rows_ref[r]
        rm1 = jax.lax.rem(row - 1 + Z, Z)
        rp1 = jax.lax.rem(row + 1, Z)
        # pull sources: the cz group reads row - cz (periodic)
        for gi, (cz, st, cnt) in enumerate(groups):
            src = row if cz == 0 else (rm1 if cz == 1 else rp1)
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(st, cnt), src],
                src_buf.at[pl.ds(st, cnt)], sems.at[0]).start()
        cm = pltpu.make_async_copy(mask_hbm.at[r], mask_buf,
                                   sems.at[1])
        cp = pltpu.make_async_copy(bcp_hbm.at[:, r], bcp_buf,
                                   sems.at[2])
        cm.start()
        cp.start()
        for gi, (cz, st, cnt) in enumerate(groups):
            pltpu.make_async_copy(
                f_hbm.at[pl.ds(st, cnt), 0],
                src_buf.at[pl.ds(st, cnt)], sems.at[0]).wait()
        cm.wait()
        cp.wait()

        # assemble the post-stream planes in standard direction order
        fsl = []
        for i in range(Q):
            cx, cy = int(basis[i][0]), int(basis[i][1])
            p = src_buf[ipos[i]]
            if mixed is not None:
                # dequant BEFORE the rolls: Mosaic has no 16-bit rotate
                p = mixed.dequant_i(i, p)
            if cy:
                p = pltpu.roll(p, cy % Y, axis=0)
            if cx:
                p = pltpu.roll(p, cx % X, axis=1)
            fsl.append(p)
        mrow = mask_buf[...]
        out = _bc_patch_compute(builder, bc_instances, fsl, mrow,
                                bcp_buf)
        for i in range(Q):
            vi = out[i]
            if mixed is not None:
                vi = mixed.quant_i(i, vi)
            src_buf[ipos[i]] = vi  # permuted layout for the overlay
        co = pltpu.make_async_copy(src_buf, out_hbm.at[:, r],
                                   sems.at[0])
        co.start()
        co.wait()

    # the row phase chain's Mosaic stack temporaries span many
    # plane-sized intermediates: budget generously (gate, not alloc)
    vmem_need = (3 * Q + 5) * Y * X * 4
    return pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3 +
                 [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, R, Y, X), sdtype),
        scratch_shapes=[pltpu.VMEM((Q, Y, X), sdtype),
                        pltpu.VMEM((Y, X), jnp.int32),
                        pltpu.VMEM((4, Y, X), dtype),
                        pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(max(16 * 2 ** 20,
                                     vmem_need + 8 * 2 ** 20),
                                 100 * 2 ** 20)),
        interpret=interpret,
    )



#: z-rows of context a patch plane's BC machinery may sample
#: (worst case: NTYuOutflow reads 2n - c_i -> |dz| <= 3)
PATCH_HALO = 3


def compute_patch_plane(g, sub, f, r, Z, Y, X, it=0, qinv=None,
                        pad_yx=(0, 0), mixed=None):
    """Run the window sub-builder's full phase sequence for global z-row
    ``r`` and return the (Q, Y, X) post-collision plane (standard Q
    order).

    All reads go through a compact (Q, 2*PATCH_HALO+1, Y, X) slab sliced
    out of ``f`` with whole-array plane slices. Slicing per-distribution
    3D views (f[i]) instead makes XLA materialize each 3D view -- ~GBs of
    spurious HBM traffic per step at 256^3.

    ``f`` may be in the kernel layout (cz-grouped Q order per
    ``cz_groups``, tile-padded Y/X): pass ``qinv`` and ``pad_yx`` and
    only the thin slab is converted back (a whole-state un-permute
    would copy GBs per step)."""
    rows = [((r + o) % Z) for o in range(-PATCH_HALO, PATCH_HALO + 1)]
    slab = jnp.concatenate([f[:, q:q + 1] for q in rows], axis=1)
    if qinv is not None:
        slab = slab[jnp.asarray(qinv)]
    if pad_yx[0] or pad_yx[1]:
        slab = slab[:, :, :Y, :X]
    if mixed is not None:
        # mixed storage: the thin slab is int16 codes (standard order
        # after qinv); all window math runs on dequantized fp32
        slab = mixed.dequant(slab)
    box = (slice(PATCH_HALO, PATCH_HALO + 1), slice(0, Y), slice(0, X))

    def axes_shift(vec):
        return (int(vec[2]), int(vec[1]), int(vec[0]))

    f_box = slab[(slice(None),) + box].reshape(g.Q, -1)
    fs_box = jnp.stack([
        window_shifted(slab[i], box, axes_shift(g.basis[i]))
        .reshape(-1) for i in range(g.Q)])

    def sampler(vec, _slab=slab, _box=box):
        sh = axes_shift(-np.asarray(vec))
        return jnp.stack([window_shifted(_slab[i], _box, sh)
                          .reshape(-1) for i in range(g.Q)])

    fpost = sub.phases(fs_box, f_box, it, sampler)
    return fpost.reshape(g.Q, Y, X)


def compute_patch_yrow(g, sub, f, r, Z, Y, X, it=0, qinv=None,
                       pad_x=0, mixed=None):
    """Row analog of compute_patch_plane: run the window sub-builder's
    full phase sequence for global y-row ``r`` over ALL z-planes and
    return the (Q, Z, X) post-collision slab (standard Q order).

    Used when a scene's complex-BC nodes live on a few y-rows (walls
    normal to y -- the turbulence channel layout): plane patching would
    overlay every z-plane and push the scene off the fused path. Reads
    go through a compact (Q, Z, 2*PATCH_HALO+1, X) slab of y-rows; z
    and x shifts wrap periodically over the full window extents,
    matching the XLA engine's jnp.roll gathers (the BC chain replaces
    any cross-wall samples)."""
    rows = [((r + o) % Y) for o in range(-PATCH_HALO, PATCH_HALO + 1)]
    slab = jnp.concatenate([f[:, :, q:q + 1] for q in rows], axis=2)
    if qinv is not None:
        slab = slab[jnp.asarray(qinv)]
    if pad_x:
        slab = slab[..., :X]
    if mixed is not None:
        slab = mixed.dequant(slab)
    box = (slice(0, Z), slice(PATCH_HALO, PATCH_HALO + 1), slice(0, X))

    def axes_shift(vec):
        return (int(vec[2]), int(vec[1]), int(vec[0]))

    f_box = slab[(slice(None),) + box].reshape(g.Q, -1)
    fs_box = jnp.stack([
        window_shifted(slab[i], box, axes_shift(g.basis[i]))
        .reshape(-1) for i in range(g.Q)])

    def sampler(vec, _slab=slab, _box=box):
        sh = axes_shift(-np.asarray(vec))
        return jnp.stack([window_shifted(_slab[i], _box, sh)
                          .reshape(-1) for i in range(g.Q)])

    fpost = sub.phases(fs_box, f_box, it, sampler)
    return fpost.reshape(g.Q, Z, X)


def check_plane_tiling(Y, X, interpret=False, dim=3):
    """Mosaic DMAs slice whole (Y, X) planes out of (sublane, lane)-tiled
    (8, 128) buffers; partial-tile plane shapes are rejected by the
    compiler ("slice shape must be aligned to tiling"). Refuse early so
    the auto engine falls back to XLA instead of failing a remote
    compile. Interpret mode (CPU tests) has no tiling. The 2D kernels
    (dim=2) block the sublane dim themselves, so only the lane (X)
    constraint applies there."""
    if interpret:
        return
    if X % 128 != 0 or (dim == 3 and Y % 8 != 0):
        need = 'X % 128 == 0 and Y % 8 == 0' if dim == 3 \
            else 'X % 128 == 0'
        raise NotImplementedError(
            f'the fused {dim}D kernel needs {need} '
            f'(got Y={Y}, X={X}); use the XLA engine for this domain')


def make_rho_kernel_3d(builder, Z, Y, X, interpret=False):
    """Post-stream density pre-pass: rho(x) = sum_i f_i(x - c_i), the
    input the Shan-Chen force needs at every node's neighbors. Same
    plane-DMA gather pipeline as the main kernel, but the only output
    is one rho plane per program (~76 B read + 4 B written per node; an
    XLA roll-sum costs ~3x that in practice)."""
    g = builder.grid
    Q = g.Q
    dtype = builder.dtype
    basis = g.basis
    # same cz-grouped permuted layout as the main kernel
    perm, ipos, groups = cz_groups(g)

    def kernel(f_hbm, glo_hbm, ghi_hbm, out_hbm, fs_buf, out_buf,
               in_sems, out_sems):
        z0 = pl.program_id(0)
        slot = jax.lax.rem(z0, 2)
        nslot = jax.lax.rem(z0 + 1, 2)

        def start_gathers(plane_z, s):
            for gi, (cz, st, cnt) in enumerate(groups):
                dst = fs_buf.at[s, pl.ds(st, cnt)]
                sem = in_sems.at[s, gi]
                if cz == 0:
                    pltpu.make_async_copy(
                        f_hbm.at[pl.ds(st, cnt), plane_z], dst,
                        sem).start()
                elif cz == 1:
                    @pl.when(plane_z == 0)
                    def _(st=st, cnt=cnt, dst=dst, sem=sem):
                        pltpu.make_async_copy(
                            glo_hbm.at[pl.ds(st, cnt)], dst,
                            sem).start()

                    @pl.when(plane_z > 0)
                    def _(st=st, cnt=cnt, dst=dst, sem=sem,
                          plane_z=plane_z):
                        pltpu.make_async_copy(
                            f_hbm.at[pl.ds(st, cnt), plane_z - 1],
                            dst, sem).start()
                else:
                    @pl.when(plane_z == Z - 1)
                    def _(st=st, cnt=cnt, dst=dst, sem=sem):
                        pltpu.make_async_copy(
                            ghi_hbm.at[pl.ds(st, cnt)], dst,
                            sem).start()

                    @pl.when(plane_z < Z - 1)
                    def _(st=st, cnt=cnt, dst=dst, sem=sem,
                          plane_z=plane_z):
                        pltpu.make_async_copy(
                            f_hbm.at[pl.ds(st, cnt), plane_z + 1],
                            dst, sem).start()

        def wait_gathers(s):
            for gi, (cz, st, cnt) in enumerate(groups):
                pltpu.make_async_copy(f_hbm.at[pl.ds(st, cnt), 0],
                                      fs_buf.at[s, pl.ds(st, cnt)],
                                      in_sems.at[s, gi]).wait()

        def wait_out(s):
            pltpu.make_async_copy(out_buf.at[s], out_hbm.at[0],
                                  out_sems.at[s]).wait()

        @pl.when(z0 == 0)
        def _():
            start_gathers(z0, slot)

        @pl.when(z0 + 1 < Z)
        def _():
            @pl.when(z0 >= 1)
            def _():
                wait_out(nslot)
            start_gathers(z0 + 1, nslot)

        wait_gathers(slot)
        acc = None
        for i in range(Q):
            cx, cy = int(basis[i][0]), int(basis[i][1])
            plane = fs_buf[slot, ipos[i]]
            if cy:
                plane = pltpu.roll(plane, cy % Y, axis=0)
            if cx:
                plane = pltpu.roll(plane, cx % X, axis=1)
            acc = plane if acc is None else acc + plane
        out_buf[slot] = acc
        pltpu.make_async_copy(out_buf.at[slot], out_hbm.at[z0],
                              out_sems.at[slot]).start()

        @pl.when(z0 == Z - 1)
        def _():
            wait_out(slot)
            if Z >= 2:
                wait_out(nslot)

    return pl.pallas_call(
        kernel,
        grid=(Z,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Z, Y, X), dtype),
        scratch_shapes=[pltpu.VMEM((2, Q, Y, X), dtype),
                        pltpu.VMEM((2, Y, X), dtype),
                        pltpu.SemaphoreType.DMA((2, Q)),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


# -- full fused step ---------------------------------------------------------

#: perf/debug escape hatch: disable the in-kernel native-BC rows (fall
#: back to the XLA patch-plane prologue for every complex-BC plane)
NATIVE_BC_ENABLED = True


def kbc_instance_spec(builder, idx, tid, ko, sel):
    """In-kernel native-BC raw spec for classify instance ``idx``
    (mask code 3+idx): ``(code, tid, ko, rho, (vx, vy, vz), zrows,
    (ymin, ymax+1), (xmin, xmax+1))`` with GLOBAL unrounded bounds --
    or None when the instance cannot run in-kernel (spatially varying
    prescribed parameters, which would need per-node parameter planes,
    or a bounding window so large the windowed re-evaluation would
    rival the whole slab's collide)."""
    m = builder.maps
    cls = nt.get_node_type(tid)
    rho_s, vel_s = 1.0, (0.0, 0.0, 0.0)
    if 'velocity' in cls.param_names:
        vs = []
        for a in range(m.param_vel.shape[0]):
            u = np.unique(m.param_vel[a][sel])
            if u.size > 1:
                return None
            vs.append(float(u[0]) if u.size else 0.0)
        vel_s = tuple(vs) + (0.0,) * (3 - len(vs))
    else:
        u = np.unique(m.param_rho[sel])
        if u.size > 1:
            return None
        rho_s = float(u[0]) if u.size else 1.0
    zs, ys, xs = (np.unique(ix) for ix in np.nonzero(sel))
    vol = (len(zs) * 8 * (int(ys[-1]) + 1 - int(ys[0]))
           * (int(xs[-1]) + 1 - int(xs[0])))
    if vol > 0.5 * sel.size:
        return None
    return (3 + idx, tid, ko, rho_s, vel_s,
            tuple(int(z) for z in zs),
            (int(ys[0]), int(ys[-1]) + 1),
            (int(xs[0]), int(xs[-1]) + 1))


def kbc_round_windows(raw, slab_k, Ys, Xs, z_local=None):
    """Finish raw kbc specs into kernel specs: slab sets in units of
    ``slab_k`` (mapped into local coordinates when ``z_local`` is the
    per-shard extent -- the UNION over shards, each shard's mask gating
    actual application) and tile-rounded (sublane 8 / lane 128) y/x
    windows clamped to the (padded) plane extents."""
    out = []
    for code, tid, ko, rho_s, vel_s, zrows, ybox, xbox in raw:
        if z_local is not None:
            slabs = sorted({(z % z_local) // slab_k for z in zrows})
        else:
            slabs = sorted({z // slab_k for z in zrows})
        out.append((code, tid, ko, rho_s, vel_s, tuple(slabs),
                    (ybox[0] // 8 * 8, min(-(-ybox[1] // 8) * 8, Ys)),
                    (xbox[0] // 128 * 128,
                     min(-(-xbox[1] // 128) * 128, Xs))))
    return tuple(out)


class PallasStep3D:
    """Drop-in replacement for StepBuilder.build() (3D, single device or
    one shard of a z-sharded mesh)."""

    # refuse the fused path when too much of the domain needs plane patches
    MAX_PATCH_FRACTION = 0.25
    # y-row patch mode: cap the unrolled per-direction row selects
    MAX_PATCH_YROWS = 8

    def __init__(self, builder, domain_shape, interpret=False,
                 require_no_patches=False, slab_k=None):
        self.builder = builder
        Zs, Ys, Xs = domain_shape
        self.shape = domain_shape
        # native in-kernel BC rows: local BC families only, and only
        # with static parameters (DynamicValue needs per-step evaluation
        # -- those scenes keep the exact patch-plane path)
        # (elbm excluded: the alpha-gate amplifies the prologue's
        # summation-tree ulps into ~1e-4 field drift vs the XLA engine;
        # those scenes keep the exact XLA patch prologue)
        # (dynamic BC params AND dynamic forces need per-step values --
        # such rows keep the exact XLA patch-plane path)
        native_ok = (NATIVE_BC_ENABLED
                     and builder.sc_coupling == 0.0
                     and builder.model != 'elbm'
                     and not builder.maps.dynamic
                     and builder.force_expr is None
                     and not require_no_patches)
        self.rt_force = builder.force_expr is not None
        if self.rt_force and not rt_force_eligible(builder):
            raise NotImplementedError(
                'space-dependent DynamicValue body forces need the '
                'whole-domain coordinate machinery; use the XLA engine')
        self.bc_instances = ()
        bc_inst = []
        if native_ok:
            mask_np, patch_rows, bc_inst, pmask_np = classify_nodes(
                builder.maps, native_bc=True, return_patch_mask=True)
        else:
            mask_np, patch_rows, pmask_np = classify_nodes(
                builder.maps, return_patch_mask=True)
        # Split the native instances: spatially UNIFORM parameters run
        # IN-KERNEL (mask-code windows -- _bc_row_values evaluated on a
        # static tile-rounded window inside the fused kernel, scalars
        # baked into the trace), which works for BC faces of ANY
        # orientation (x/y/z-normal alike) at the cost of the window's
        # extra compute. Spatially-varying parameters keep the Pallas
        # patch-plane prologue (z-plane overlays, so z-normal only).
        proto_inst = []
        kbc_cand = []
        if bc_inst:
            for idx, (tid, ko, sel) in enumerate(bc_inst):
                ent = kbc_instance_spec(builder, idx, tid, ko, sel)
                if ent is not None:
                    kbc_cand.append(ent)
                else:
                    zs = np.unique(np.nonzero(sel)[0])
                    proto_inst.append(
                        (3 + idx, tid, ko, None, None,
                         tuple(int(z) for z in zs), None, None))
            # an in-kernel instance sharing a z-plane with a prologue
            # instance would be clobbered by the plane overlay (which
            # rewrites whole planes AFTER the slab store): demote it
            prows = set()
            for ent in proto_inst:
                prows |= set(ent[5])
            moved = True
            while moved:
                moved = False
                for ent in list(kbc_cand):
                    if set(ent[5]) & prows:
                        kbc_cand.remove(ent)
                        proto_inst.append(ent)
                        prows |= set(ent[5])
                        moved = True
            self.bc_instances = tuple(
                (ent[1], ent[2]) for ent in proto_inst)
        self._kbc_raw = kbc_cand
        self.bc_rows = tuple(sorted(
            {int(z) for ent in proto_inst for z in ent[5]}))
        # Mosaic rejects partial-tile plane DMAs (Y%8 / X%128). Pad the
        # in-kernel state instead of falling back, when it is safe: the
        # outermost original layers along a padded axis must hold no wet
        # nodes (dry reflections only return fluid-side values, so pad
        # garbage flows outward into kept pad nodes and never re-enters
        # the flow). Padding happens once per chunk (pad_state /
        # crop_state), not per step.
        self.pad_y = self.pad_x = 0
        self.mixed = builder.mixed
        if not interpret:
            # int16 tiles are (16, 128): mixed storage needs Y % 16
            pad_y = (-Ys) % (16 if self.mixed is not None else 8)
            pad_x = (-Xs) % 128
            if (pad_y or pad_x) and builder.sc_coupling != 0.0:
                # the padding-safety argument covers streaming/bounce-back
                # only: the Shan-Chen psi stencil rolls over the PADDED
                # extent, so edge wall nodes would sample pad columns
                # instead of the periodic wrap the XLA engine uses
                raise NotImplementedError(
                    f'domain (Y={Ys}, X={Xs}) needs tile padding, which '
                    'the Shan-Chen psi stencil does not support; use '
                    'the XLA engine')
            if pad_y or pad_x:
                wet = np.isin(
                    builder.maps.type_map,
                    [t for t in builder.maps.present_types
                     if nt.get_node_type(t).wet_node])
                safe = True
                if pad_y and (wet[:, 0, :].any() or wet[:, -1, :].any()):
                    safe = False
                if pad_x and (wet[:, :, 0].any() or wet[:, :, -1].any()):
                    safe = False
                if not safe:
                    raise NotImplementedError(
                        f'domain (Y={Ys}, X={Xs}) needs tile padding '
                        'but has wet nodes on the padded edges; use '
                        'the XLA engine')
                self.pad_y, self.pad_x = pad_y, pad_x
                # lane-padding advisor: padded lanes/sublanes are
                # dead work every step (the 96^3/192^3 valleys in
                # benchmark/results/single_chip_v5e_d3q19.dat lose
                # ~25%); tell the user what a well-tiled size buys
                waste = 1.0 - (Ys * Xs) / float(
                    (Ys + pad_y) * (Xs + pad_x))
                import logging
                logging.getLogger('sailfish_tpu').warning(
                    'domain Y=%d X=%d is tile-padded to %dx%d: %.0f%% '
                    'of each plane is dead work. Sizes with X a '
                    'multiple of 128 and Y a multiple of 8 (e.g. '
                    'X=%d, Y=%d) run proportionally faster.',
                    Ys, Xs, Ys + pad_y, Xs + pad_x, 100 * waste,
                    Xs + pad_x, Ys + pad_y)
                Ys += pad_y
                Xs += pad_x
                mask_np = np.pad(
                    mask_np, ((0, 0), (0, pad_y), (0, pad_x)),
                    constant_values=2)
        self.kshape = (Zs, Ys, Xs)
        # the main kernel overlays BOTH kinds of rows through the same
        # patch path; the native rows' planes come from the Pallas
        # prologue (make_bc_patch_kernel_3d), the rest from the XLA
        # machinery. The refusal threshold bounds the TOTAL overlaid
        # fraction: a BC face normal to x or y puts a node on every
        # z-row, and overlaying (and prologue-recomputing) the whole
        # domain per step defeats the slab pipeline -- such scenes run
        # on the XLA engine, as before.
        self.xla_patch_rows = patch_rows
        self.patch_rows = sorted(set(patch_rows) | set(self.bc_rows))
        self.patch_yrows = ()
        if len(self.patch_rows) > self.MAX_PATCH_FRACTION * Zs:
            # BC faces normal to x or y put a node on every z-plane.
            # If the complex-BC nodes project onto a FEW y-rows (walls
            # normal to y: the turbulence-channel layout,
            # examples/turbulence/channel_flow.py), patch those rows
            # instead: an XLA prologue recomputes them over all z
            # (compute_patch_yrow) and the kernel selects them into
            # each output slab (make_kernel_3d patch_yrows).
            yrows = sorted(int(y) for y in np.unique(
                np.nonzero(pmask_np)[1]))
            blockers = []
            if builder.model == 'elbm':
                blockers.append('ELBM (overlaid rows would join the '
                                'Newton convergence vote)')
            if builder.sc_coupling != 0.0:
                blockers.append('Shan-Chen (global psi sampling)')
            if self.bc_rows:
                blockers.append('native-BC z-rows present')
            if self.pad_y or self.pad_x:
                blockers.append('tile padding (pad garbage would feed '
                                'the row prologue)')
            if len(yrows) > min(self.MAX_PATCH_YROWS,
                                self.MAX_PATCH_FRACTION * Ys):
                blockers.append(
                    f'{len(yrows)} distinct complex-BC y-rows (max '
                    f'{self.MAX_PATCH_YROWS})')
            if blockers:
                raise NotImplementedError(
                    f'{len(self.patch_rows)}/{Zs} z-planes need '
                    'complex-BC overlays and the y-row patch mode does '
                    f'not apply ({"; ".join(blockers)}); use the XLA '
                    'engine for this scene')
            self.patch_yrows = tuple(yrows)
            self.patch_rows = []
            self.xla_patch_rows = []
        if require_no_patches and (self.patch_rows or self.patch_yrows):
            raise NotImplementedError(
                'the sharded fused kernel currently requires all boundary '
                'handling to be in-kernel (walls/obstacles only); planes '
                f'{self.patch_rows or list(self.patch_yrows)} need '
                'complex-BC patches')
        self.has_mask = bool((mask_np != 0).any())
        self.mask = jnp.asarray(mask_np) if self.has_mask else None
        self.sc = builder.sc_coupling != 0.0
        if self.sc and self.patch_rows:
            raise NotImplementedError(
                'Shan-Chen with complex-BC planes needs global psi '
                'sampling in the patch windows; use the XLA engine')
        if slab_k is None:
            heavy = (builder.model in ('mrt', 'trt')
                     or builder.smagorinsky > 0.0)
            slab_k = pick_slab_k(builder.grid.Q, Zs, Ys, Xs, sc=self.sc,
                                 has_mask=self.has_mask,
                                 k_max=4 if heavy else 8)
        assert Zs % slab_k == 0, (Zs, slab_k)
        self.slab_k = slab_k
        self.kbc = kbc_round_windows(self._kbc_raw, slab_k, Ys, Xs)
        # Shan-Chen: emit next step's post-stream rho from the kernel
        # itself (carrying (f, rho) between steps) instead of paying
        # the ~80 B/node rho pre-pass every step; needs >= 3 pipeline
        # programs for the ring/stash carries
        self.emit_rho = self.sc and Zs // slab_k >= 3
        self.kernel = make_kernel_3d(builder, Zs, Ys, Xs,
                                     patch_rows=self.patch_rows,
                                     has_mask=self.has_mask,
                                     interpret=interpret, sc=self.sc,
                                     emit_rho=self.emit_rho,
                                     k=slab_k, mixed=self.mixed,
                                     patch_yrows=self.patch_yrows,
                                     rt_force=self.rt_force,
                                     kbc=self.kbc)
        # Pallas patch prologue for the native-BC rows: parameter
        # planes ([rho_bc, vel_*], padded with safe values -- pad nodes
        # are masked out), the rows' mask planes, the tiny per-row
        # kernel
        self.bcp = None
        self.bc_kernel = None
        if self.bc_rows:
            m = builder.maps
            rows = list(self.bc_rows)
            bcp = np.stack(
                [m.param_rho[rows]] +
                [m.param_vel[a][rows] for a in range(3)]).astype(
                    builder.dtype)
            if self.pad_y or self.pad_x:
                bcp = np.pad(
                    bcp, ((0, 0), (0, 0), (0, self.pad_y),
                          (0, self.pad_x)),
                    constant_values=1.0)
            self.bcp = jnp.asarray(bcp)
            # the prologue addresses instances positionally (mask code
            # 3 + index into self.bc_instances); the global mask holds
            # classify's codes, so remap the prologue rows' copy.
            # In-kernel instances never share these planes (demotion
            # fixpoint above), so only prologue codes appear.
            marr = mask_np[rows]
            remap = marr.copy()
            for j, ent in enumerate(proto_inst):
                remap[marr == ent[0]] = 3 + j
            self._bc_mask_rows = jnp.asarray(remap)
            self._bc_rows_dev = jnp.asarray(rows, dtype=jnp.int32)
            self.bc_kernel = make_bc_patch_kernel_3d(
                builder, Zs, len(rows), Ys, Xs, self.bc_instances,
                interpret=interpret, mixed=self.mixed)
        self.rho_kernel = None
        if self.sc:
            self.rho_kernel = make_rho_kernel_3d(builder, Zs, Ys, Xs,
                                                 interpret=interpret)
        # cz-grouped Q layout (see cz_groups): the state lives PERMUTED
        # between steps; pad_state/crop_state convert once per chunk
        qperm, qinv, _ = cz_groups(builder.grid)
        self._qperm = jnp.asarray(np.asarray(qperm, np.int32))
        self._qinv = jnp.asarray(np.asarray(qinv, np.int32))
        self._qinv_np = np.asarray(qinv, np.int32)
        self._make_patch_builders()

    def _post_stream_rho(self, f):
        """Pre-pass: rho of the post-stream state (what the XLA
        engine's shan_chen_force samples)."""
        return self.rho_kernel(f, f[:, -1], f[:, 0])

    def _make_patch_builders(self):
        # XLA window sub-builders only for the rows the Pallas patch
        # prologue does not cover
        self.patch_subs = []
        for r in self.xla_patch_rows:
            box = (slice(r, r + 1), slice(0, self.shape[1]),
                   slice(0, self.shape[2]))
            self.patch_subs.append(
                (box, self.builder.for_window(box, flatten=True)))
        # y-row mode: one all-z window per complex-BC y-row
        self.ypatch_subs = []
        for r in self.patch_yrows:
            box = (slice(0, self.shape[0]), slice(r, r + 1),
                   slice(0, self.shape[2]))
            self.ypatch_subs.append(
                self.builder.for_window(box, flatten=True))

    def _compute_ypatches(self, f, it=0):
        """Complex-BC y-rows as a (Z, Q, R, X) array in kernel layout
        (z leading for per-slab window DMAs), ordered like
        self.patch_yrows, recomputed exactly by the XLA window
        machinery (compute_patch_yrow)."""
        Z, Y, X = self.shape
        planes = [compute_patch_yrow(
            self.builder.grid, sub, f, r, Z, Y, X, it,
            qinv=self._qinv_np, pad_x=self.pad_x, mixed=self.mixed)
            for sub, r in zip(self.ypatch_subs, self.patch_yrows)]
        p = jnp.stack(planes, axis=2)           # (Q, Z, R, X)
        if self.mixed is not None:
            p = self.mixed.quant(p)
        p = p[self._qperm]
        return jnp.moveaxis(p, 0, 1)            # (Z, Q, R, X)

    def _compute_patches(self, f, it=0):
        """Patch planes (Q, P, Y, X) in kernel layout, ordered like
        self.patch_rows: native-BC rows from the Pallas prologue
        kernel, everything else recomputed exactly by the XLA window
        machinery."""
        Z, Y, X = self.shape
        xla_planes = {}
        for (box, sub), r in zip(self.patch_subs, self.xla_patch_rows):
            p = compute_patch_plane(self.builder.grid, sub, f, r, Z, Y,
                                    X, it, qinv=self._qinv_np,
                                    pad_yx=(self.pad_y, self.pad_x),
                                    mixed=self.mixed)
            if self.mixed is not None:
                p = self.mixed.quant(p)
            p = p[self._qperm]
            if self.pad_y or self.pad_x:
                p = jnp.pad(p, ((0, 0), (0, self.pad_y),
                                (0, self.pad_x)))
            xla_planes[r] = p
        bc_planes = {}
        if self.bc_rows:
            pv_bc = self.bc_kernel(f, self._bc_mask_rows, self.bcp,
                                   self._bc_rows_dev)
            for i, r in enumerate(self.bc_rows):
                bc_planes[r] = pv_bc[:, i]
        return jnp.stack(
            [bc_planes[r] if r in bc_planes else xla_planes[r]
             for r in self.patch_rows], axis=1)

    def step(self, carry, it=0, ghost_lo=None, ghost_hi=None):
        """One fused step on KERNEL-LAYOUT state (padded, cz-grouped;
        see pad_state). Ghost planes default to the periodic wrap of
        ``f`` itself; a sharded caller passes ppermute'd neighbor
        faces instead. In emit-rho mode (Shan-Chen) the carry is
        (f, rho) and the step returns the updated pair."""
        if self.emit_rho:
            f, rho = carry
        else:
            f = carry
        if ghost_lo is None:
            ghost_lo = f[:, -1]
        if ghost_hi is None:
            ghost_hi = f[:, 0]
        args = [f, ghost_lo, ghost_hi]
        if self.sc:
            if not self.emit_rho:
                rho = self._post_stream_rho(f)
            args += [rho, rho[-1], rho[0]]
        if self.has_mask:
            args.append(self.mask)
        if self.patch_rows:
            args.append(self._compute_patches(f, it))
        if self.patch_yrows:
            args.append(self._compute_ypatches(f, it))
        if self.rt_force:
            args.append(force_now(self.builder, it))
        out = self.kernel(*args)
        if self.emit_rho:
            return tuple(out)
        return out

    @property
    def padded(self):
        """True: the kernel layout differs from the public state
        layout (cz-grouped Q order, plus optional tile padding), so
        callers must pad_state/crop_state around step loops."""
        return True

    def pad_state(self, f):
        """Standard state -> kernel layout: cz-grouped Q order +
        tile-aligned Y/X (pad nodes are mask=2 'keep'); applied once
        per chunk. In emit-rho mode the returned carry is (f, rho)
        with rho seeded by the pre-pass kernel."""
        f = f[self._qperm]
        if self.pad_y or self.pad_x:
            f = jnp.pad(f, ((0, 0), (0, 0), (0, self.pad_y),
                            (0, self.pad_x)))
        if self.mixed is not None:
            # int16 codes inside the chunk loop; quant o dequant is the
            # identity, so chunk boundaries cost no extra rounding
            f = self.mixed.quant(f, qorder=self._qperm)
        if self.emit_rho:
            return (f, self._post_stream_rho(f))
        return f

    def crop_state(self, carry):
        """Kernel layout -> standard state."""
        f = carry[0] if self.emit_rho else carry
        if self.mixed is not None:
            f = self.mixed.dequant(f, qorder=self._qperm)
        if self.pad_y or self.pad_x:
            f = f[:, :, :self.shape[1], :self.shape[2]]
        return f[self._qinv]

    def run_steps(self, f, n, it0=0):
        """(Q, Z, Y, X) unpadded in/out; jit-friendly."""
        f = self.pad_state(f)
        f = jax.lax.fori_loop(
            0, n, lambda i, fc: self.step(fc, it0 + i), f)
        return self.crop_state(f)
