"""Fused 2D kernel for K-component Shan-Chen mixtures.

Extends the single-fluid 2D block-cache kernel (ops/pallas_step2d.py)
to the multi-distribution SC models (binary/ternary;
ops/multigrid.ShanChenMultiStepBuilder): all K distribution sets are
cached per y-block, the common velocity u' = (sum mom_k/tau_k) /
(sum rho_k/tau_k) and the pseudopotential cross-forces are evaluated
in-VMEM from per-component post-stream density fields (each produced by
the single-fluid rho pre-pass kernel), and every component collides
with its shifted equilibrium velocity -- the reference's
binary_shan_chen.mako / ternary_shan_chen.mako two-phase step as one
fused pass.

Covers: periodic/full-bounce-back scenes (mask in-kernel), uniform Guo
body forces per component, fp32, single device. Anything else falls
back to the XLA engine, which remains the semantics reference
(equivalence to fp32 roundoff, tests/test_multi_pallas.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sailfish_tpu import node_type as nt
from sailfish_tpu.equilibrium import signed_sum
from sailfish_tpu.ops.pallas_step import classify_nodes
from sailfish_tpu.ops.pallas_step import check_plane_tiling
from sailfish_tpu.ops.pallas_step2d import make_rho_kernel_2d, \
    pick_block_size


def fe_mrt_relax(g, z, inv_tau0, dtype):
    """FE-MRT relaxation terms for the fused kernels (reference
    relaxation.mako:15-54 / sym.free_energy_mrt_matrix), reformulated
    moment-wise: with per-moment rates s (0 for conserved, 1/tau0 for
    shear, exactly 1 for the rest) and P_x = M^-1 diag(e_x) M,

        f - M^-1 diag(s) M fneq
          == feq + P_cons fneq + (1 - 1/tau0) P_shear fneq

    because P_cons + P_shear + P_rest == I. Only the conserved +
    shear moments of z are formed (integer Gram-Schmidt rows), so the
    cost is ~(n_cons + n_shear) plane accumulations instead of two
    dense Q x Q matmuls -- exact-math equal to the XLA engine's
    projections (ops/multigrid._fe_mrt_project), fp32-roundoff apart.

    ``z``: list of Q planes, fneq_i (plus 0.5*Fi_i under forcing: the
    moment-space Guo term Fi - 0.5 M^-1 diag(s) M Fi rewrites the same
    way). Returns per-direction correction planes (entries may be
    None when every inverse coefficient vanishes)."""
    M = np.asarray(g.mrt_matrix, np.float64)
    Minv = np.asarray(g.mrt_inv, np.float64)
    ks = [int(k) for k in g.mrt_conserved] + \
        [int(k) for k in g.mrt_shear]
    shear = {int(k) for k in g.mrt_shear}
    one_m_it = 1.0 - inv_tau0
    moms = {}
    for kk in ks:
        acc = None
        for j in range(g.Q):
            c = float(M[kk, j])
            if c == 0.0:
                continue
            term = z[j] if c == 1.0 else \
                (-z[j] if c == -1.0 else jnp.asarray(c, dtype) * z[j])
            acc = term if acc is None else acc + term
        if kk in shear and acc is not None:
            acc = one_m_it * acc
        moms[kk] = acc
    out = []
    for i in range(g.Q):
        acc = None
        for kk in ks:
            mk = moms[kk]
            if mk is None:
                continue
            c = float(Minv[i, kk])
            if c == 0.0:
                continue
            term = mk if c == 1.0 else \
                (-mk if c == -1.0 else jnp.asarray(c, dtype) * mk)
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def make_kernel_2d_sc_multi(mbuilder, Y, X, by=16, has_mask=False,
                            interpret=False, emit_rho=False,
                            edge_io=False, x_ghosts=False,
                            col_io=False):
    """fused(f_0..f_{K-1}, glo_0..glo_{K-1}, ghi_0..ghi_{K-1},
    rho_0..rho_{K-1}[, mask]) -> (f'_0..f'_{K-1}).

    The outputs alias the f inputs (in-place HBM update; see
    pallas_step.make_kernel_3d for the bandwidth measurement), so the
    y-wrap blocks of each component must arrive as materialized ghost
    copies (glo = block NB-1, ghi = block 0 of the pre-step state);
    the rho wraps read the separate pre-pass buffers and stay safe.

    ``emit_rho``: additionally emit next step's post-stream densities
    (one per component, aliased onto the rho inputs) so the step can
    carry (fs, rhos) between iterations instead of paying K rho
    pre-passes per step -- the multi-component version of the
    single-fluid 2D emit-rho mode (pallas_step2d.make_kernel_2d):
    program p emits rho block p-1 of every component from the
    post-collision blocks still in VMEM, with a 1-row ring carry and
    stashed block 0 / first row of block 1 for the two wrap blocks in
    the epilogue. Emitted values are bit-identical to the pre-pass.

    ``edge_io`` (requires ``emit_rho``; the y-sharded mode): a shard
    cannot emit the two global edge ROWS of its densities (they need
    the neighbors' post-collision rows), so (a) the wrap-block rho
    gathers read ghost inputs ``rglo``/``rghi`` (only their boundary
    row is consumed), (b) the stale local edge rows 0 / Y-1 of the rho
    arrays are patched at assembly time from fresh (1, X) inputs
    ``rlo``/``rhi`` that the sharded caller streams in XLA from
    ppermuted post-collision faces (identical summation order -- see
    parallel.halo_multi.stream_rho_edge_rows_2d), and (c) the wrap
    epilogue's emissions stay as-is: the values they write into rows
    0 / Y-1 are wrong on a shard but never read (stale-by-contract).
    Signature becomes fused(f.., glo.., ghi.., rho.., rglo.., rghi..,
    rlo.., rhi..[, mask]) -> (f'.., rho_next..).

    ``x_ghosts`` (x-sharded meshes, requires ``emit_rho``): the
    K-component port of the single-fluid mode
    (pallas_step2d.make_kernel_2d): per component, a (Y, 128) fp32
    input of post-roll f wrap columns (lane j = direction xdirs[j])
    and a (Y, 128) input of RAW-rho neighbor columns for the psi wrap
    lanes (lane 3*side + (dy+1); psi applied in-kernel so the
    substituted lane is bitwise the single-device value). The carried
    rho arrays arrive with their edge COLUMNS already re-streamed
    fresh by the caller (halo_multi.stream_rho_edge_cols_2d).

    ``col_io`` (requires ``x_ghosts``): per component, RETURN the
    post-collision boundary + inner columns as one extra (Y, 128)
    fp32 output -- lane g*Q + i = column (0, X-1, 1, X-2)[g] of
    direction i, exact stored bits (read back from the out buffer).
    The sharded caller builds the next step's xcol inputs and the rho
    edge-column re-stream from these instead of column-slicing the
    in-place-aliased states, which forces XLA to defensively copy
    the whole arrays every step (see pallas_step2d.make_kernel_2d
    col_io and benchmark/x_ghost_overhead.py)."""
    b0 = mbuilder.b0
    g = mbuilder.grid
    Q = g.Q
    K = len(mbuilder.components)
    dtype = b0.dtype
    basis = g.basis
    opp = [int(o) for o in g.opposite]
    taus = [float(t) for t in mbuilder.taus]
    couplings = {k: float(v) for k, v in mbuilder.couplings.items()
                 if v != 0.0}
    forces = [None if f is None else
              np.asarray(f, dtype=np.float64).reshape(-1)
              for f in mbuilder.body_forces]
    classic = mbuilder.potential == 'classic'

    def psi(x):
        # the mixture's pseudopotential (ops/collide.SHAN_CHEN_POTENTIALS)
        return 1.0 - jnp.exp(-x) if classic else x
    assert Y % by == 0
    assert not (edge_io and not emit_rho)
    assert not (x_ghosts and not emit_rho)
    assert not (col_io and not x_ghosts)
    assert not col_io or 4 * Q <= 128
    xdirs = [i for i in range(Q) if int(basis[i][0]) != 0]
    NB = Y // by
    if NB < 4:
        raise NotImplementedError(
            f'2D fused kernel needs >= 4 y-blocks (Y={Y}, by={by})')

    def kernel(*refs):
        idx = 0
        f_hbm = [refs[idx + c] for c in range(K)]; idx += K
        glo_hbm = [refs[idx + c] for c in range(K)]; idx += K
        ghi_hbm = [refs[idx + c] for c in range(K)]; idx += K
        rho_hbm = [refs[idx + c] for c in range(K)]; idx += K
        rglo_hbm = rghi_hbm = rlo_hbm = rhi_hbm = None
        if edge_io:
            rglo_hbm = [refs[idx + c] for c in range(K)]; idx += K
            rghi_hbm = [refs[idx + c] for c in range(K)]; idx += K
            rlo_hbm = [refs[idx + c] for c in range(K)]; idx += K
            rhi_hbm = [refs[idx + c] for c in range(K)]; idx += K
        xcol_hbm = rxcol_hbm = None
        if x_ghosts:
            xcol_hbm = [refs[idx + c] for c in range(K)]; idx += K
            rxcol_hbm = [refs[idx + c] for c in range(K)]; idx += K
        mask_hbm = None
        if has_mask:
            mask_hbm = refs[idx]; idx += 1
        out_hbm = [refs[idx + c] for c in range(K)]; idx += K
        rho_out_hbm = None
        if emit_rho:
            rho_out_hbm = [refs[idx + c] for c in range(K)]; idx += K
        colx_out_hbm = None
        if col_io:
            colx_out_hbm = [refs[idx + c] for c in range(K)]; idx += K
        blk_buf = refs[idx]; idx += 1     # (4, K*Q, by, X)
        out_buf = refs[idx]; idx += 1     # (2, K*Q, by, X)
        rho_buf = refs[idx]; idx += 1     # (4, K, by, X)
        mask_buf = None
        if has_mask:
            mask_buf = refs[idx]; idx += 1  # (4, 1, by, X)
        ring_row = stash_blk = stash_row1 = remit_buf = None
        if emit_rho:
            ring_row = refs[idx]; idx += 1    # (K*Q, 1, X)
            stash_blk = refs[idx]; idx += 1   # (K*Q, by, X)
            stash_row1 = refs[idx]; idx += 1  # (K*Q, 1, X)
            remit_buf = refs[idx]; idx += 1   # (2, K, by, X)
        redge_buf = None
        if edge_io:
            redge_buf = refs[idx]; idx += 1   # (2, K, 1, X) rlo/rhi
        xcol_buf = rxcol_buf = None
        if x_ghosts:
            xcol_buf = refs[idx]; idx += 1    # (2, K, by, 128)
            rxcol_buf = refs[idx]; idx += 1   # (2, K, by, 128)
        colx_st = None
        if col_io:
            colx_st = refs[idx]; idx += 1     # (2, K, by, 128)
        in_sems = refs[idx]; idx += 1      # DMA (4, 2*K+1)
        out_sems = refs[idx]; idx += 1     # DMA (2, K)
        remit_sems = None
        if emit_rho:
            remit_sems = refs[idx]; idx += 1  # DMA (2, K)
        redge_sems = None
        if edge_io:
            redge_sems = refs[idx]; idx += 1  # DMA (2, K)
        xcol_sems = rxcol_sems = None
        if x_ghosts:
            xcol_sems = refs[idx]; idx += 1   # DMA (2, K)
            rxcol_sems = refs[idx]; idx += 1  # DMA (2, K)
        colx_sems = None
        if col_io:
            colx_sems = refs[idx]; idx += 1   # DMA (2, K)

        k = pl.program_id(0)

        def start_block(b, slot, fsrc=None, rsrc=None):
            # one strided DMA per component set (all Q dists read the
            # same y-range; per-dist copies are DMA-issue-bound).
            # ``fsrc``/``rsrc``: ghost inputs for the wrap blocks --
            # reading the wrap from f_hbm would race the in-place
            # write of block 0 (and under edge_io the rho wrap blocks
            # belong to the y-neighbors)
            bm = jax.lax.rem(b + NB, NB)
            for c in range(K):
                if fsrc is not None:
                    src = fsrc[c]
                else:
                    src = f_hbm[c].at[:, pl.ds(bm * by, by)]
                pltpu.make_async_copy(
                    src, blk_buf.at[slot, pl.ds(c * Q, Q)],
                    in_sems.at[slot, c]).start()
                if rsrc is not None:
                    rs = rsrc[c]
                else:
                    rs = rho_hbm[c].at[pl.ds(bm * by, by)]
                pltpu.make_async_copy(
                    rs, rho_buf.at[slot, c],
                    in_sems.at[slot, K + c]).start()
            if has_mask:
                pltpu.make_async_copy(
                    mask_hbm.at[pl.ds(bm * by, by)],
                    mask_buf.at[slot, 0],
                    in_sems.at[slot, 2 * K]).start()

        def wait_block(slot):
            for c in range(K):
                pltpu.make_async_copy(
                    f_hbm[0].at[:, pl.ds(0, by)],
                    blk_buf.at[slot, pl.ds(c * Q, Q)],
                    in_sems.at[slot, c]).wait()
                pltpu.make_async_copy(rho_hbm[0].at[pl.ds(0, by)],
                                      rho_buf.at[slot, c],
                                      in_sems.at[slot, K + c]).wait()
            if has_mask:
                pltpu.make_async_copy(mask_hbm.at[pl.ds(0, by)],
                                      mask_buf.at[slot, 0],
                                      in_sems.at[slot, 2 * K]).wait()

        def wait_out(oslot):
            for c in range(K):
                pltpu.make_async_copy(
                    out_buf.at[oslot, pl.ds(c * Q, Q)],
                    out_hbm[c].at[:, pl.ds(0, by)],
                    out_sems.at[oslot, c]).wait()

        def start_xcol(b, slot):
            for c in range(K):
                pltpu.make_async_copy(
                    xcol_hbm[c].at[pl.ds(b * by, by)],
                    xcol_buf.at[slot, c], xcol_sems.at[slot, c]).start()
                pltpu.make_async_copy(
                    rxcol_hbm[c].at[pl.ds(b * by, by)],
                    rxcol_buf.at[slot, c],
                    rxcol_sems.at[slot, c]).start()

        def wait_xcol(slot):
            for c in range(K):
                pltpu.make_async_copy(
                    xcol_hbm[c].at[pl.ds(0, by)],
                    xcol_buf.at[slot, c], xcol_sems.at[slot, c]).wait()
                pltpu.make_async_copy(
                    rxcol_hbm[c].at[pl.ds(0, by)],
                    rxcol_buf.at[slot, c],
                    rxcol_sems.at[slot, c]).wait()

        s_prev = jax.lax.rem(k - 1 + 4 * NB, 4)
        s_cur = jax.lax.rem(k, 4)
        s_next = jax.lax.rem(k + 1, 4)
        s_pref = jax.lax.rem(k + 2, 4)
        oslot = jax.lax.rem(k, 2)

        @pl.when(k == 0)
        def _():
            start_block(-1, jnp.int32(3), fsrc=glo_hbm,
                        rsrc=rglo_hbm if edge_io else None)
            start_block(0, jnp.int32(0))
            start_block(1, jnp.int32(1))
            if x_ghosts:
                start_xcol(0, jnp.int32(0))
            if edge_io:
                # fresh local edge rows, persistent for the whole grid
                copies = []
                for c in range(K):
                    c0 = pltpu.make_async_copy(
                        rlo_hbm[c], redge_buf.at[0, c],
                        redge_sems.at[0, c])
                    c1 = pltpu.make_async_copy(
                        rhi_hbm[c], redge_buf.at[1, c],
                        redge_sems.at[1, c])
                    c0.start()
                    c1.start()
                    copies += [c0, c1]
                for cp in copies:
                    cp.wait()
            wait_block(jnp.int32(3))
            wait_block(jnp.int32(0))

        @pl.when(k + 2 < NB)
        def _():
            start_block(k + 2, s_pref)

        @pl.when(k + 2 == NB)
        def _():
            start_block(k + 2, s_pref, fsrc=ghi_hbm,
                        rsrc=rghi_hbm if edge_io else None)

        if x_ghosts:
            # ghost-column blocks ride a 2-slot pipeline of their own
            # (see pallas_step2d.make_kernel_2d)
            @pl.when(k + 1 < NB)
            def _():
                start_xcol(k + 1, jax.lax.rem(k + 1, 2))

        wait_block(s_next)

        def rows_shifted(ch, cy):
            """(by, X) rows of cache channel ``ch`` shifted so the pull
            source is y - cy."""
            cur = blk_buf[s_cur, ch]
            if cy == 0:
                return cur
            if cy == 1:
                prev = blk_buf[s_prev, ch]
                return jnp.concatenate([prev[by - 1:by], cur[:by - 1]],
                                       axis=0)
            nxt = blk_buf[s_next, ch]
            return jnp.concatenate([cur[1:], nxt[0:1]], axis=0)

        def rho_cur(c):
            cur = rho_buf[s_cur, c]
            if not edge_io:
                return cur
            # the stale local edge rows (the emission cannot produce
            # them on a shard) read the fresh rlo/rhi inputs instead
            row0 = jnp.where(k == 0, redge_buf[0, c], cur[0:1])
            rowT = jnp.where(k == NB - 1, redge_buf[1, c],
                             cur[by - 1:by])
            return jnp.concatenate([row0, cur[1:by - 1], rowT],
                                   axis=0)

        def rho_rows(c, dy):
            """rho of component c at row offset +dy. Neighbor-block
            boundary rows are either interior-fresh or ghost inputs,
            so only the CURRENT block needs the edge_io patch."""
            cur = rho_cur(c)
            if dy == 0:
                return cur
            if dy == 1:
                nxt = rho_buf[s_next, c]
                return jnp.concatenate([cur[1:], nxt[0:1]], axis=0)
            prev = rho_buf[s_prev, c]
            return jnp.concatenate([prev[by - 1:by], cur[:by - 1]],
                                   axis=0)

        @pl.when(k >= 2)
        def _():
            wait_out(oslot)

        # -- gather + roll all components -----------------------------------
        xslot = jax.lax.rem(k, 2)
        if x_ghosts:
            wait_xcol(xslot)
        fs = []
        for c in range(K):
            comp = []
            for i in range(Q):
                cx, cy = int(basis[i][0]), int(basis[i][1])
                plane = rows_shifted(c * Q + i, cy)
                if cx:
                    if x_ghosts:
                        # static lane concat with the neighbor column
                        # standing in for the wrapped lane (see
                        # pallas_step2d.make_kernel_2d)
                        j = xdirs.index(i)
                        col = xcol_buf[xslot, c][:, j:j + 1]
                        if cx == 1:
                            plane = jnp.concatenate(
                                [col, plane[:, :X - 1]], axis=1)
                        else:
                            plane = jnp.concatenate(
                                [plane[:, 1:], col], axis=1)
                    else:
                        plane = pltpu.roll(plane, cx % X, axis=1)
                comp.append(plane)
            fs.append(comp)

        # -- common velocity (reference binary_shan_chen.mako:60-90) --------
        rhos = []
        moms = []
        for c in range(K):
            r = fs[c][0]
            for i in range(1, Q):
                r = r + fs[c][i]
            rhos.append(r)
            moms.append([signed_sum(basis[:, a], fs[c])
                         for a in range(2)])
        den = rhos[0] * jnp.asarray(1.0 / taus[0], dtype)
        num = [moms[0][a] * jnp.asarray(1.0 / taus[0], dtype)
               for a in range(2)]
        for c in range(1, K):
            inv_t = jnp.asarray(1.0 / taus[c], dtype)
            den = den + rhos[c] * inv_t
            for a in range(2):
                num[a] = num[a] + moms[c][a] * inv_t
        inv_den = 1.0 / den
        u_common = [num[a] * inv_den for a in range(2)]

        # -- pseudopotential cross-forces ------------------------------------
        # psi evaluated once per (component, row-offset) block: the exp
        # of the classic potential dominates the VPU cost otherwise
        psi_rows_c = [{dy: psi(rho_rows(c, dy)) for dy in (-1, 0, 1)}
                      for c in range(K)]
        psi_self = [psi_rows_c[c][0] for c in range(K)]

        def neighbor_sum(c):
            """sum_i w_i psi_c(x + c_i) c_i for both axes."""
            acc = [None, None]
            for i in range(1, Q):
                cx, cy = int(basis[i][0]), int(basis[i][1])
                p = psi_rows_c[c][cy]
                if cx:
                    if x_ghosts:
                        # shift for a sample at x + cx with the wrap
                        # lane from the neighbor's raw-rho column,
                        # psi applied in-kernel (bitwise the
                        # single-device value)
                        lane = (0 if cx == 1 else 1) * 3 + (cy + 1)
                        col = psi(
                            rxcol_buf[xslot, c][:, lane:lane + 1])
                        if cx == 1:
                            p = jnp.concatenate(
                                [p[:, 1:], col], axis=1)
                        else:
                            p = jnp.concatenate(
                                [col, p[:, :X - 1]], axis=1)
                    else:
                        p = pltpu.roll(p, (-cx) % X, axis=1)
                w = float(g.weights[i])
                for a in range(2):
                    cc = int(basis[i][a])
                    if cc:
                        t = (w * cc) * p
                        acc[a] = t if acc[a] is None else acc[a] + t
            return acc

        nsum = [neighbor_sum(c) for c in range(K)]
        F = [[None, None] for _ in range(K)]
        for (j, kk), G in couplings.items():
            for a in range(2):
                tj = jnp.asarray(-G, dtype) * psi_self[j] * nsum[kk][a]
                F[j][a] = tj if F[j][a] is None else F[j][a] + tj
                if j != kk:
                    tk = jnp.asarray(-G, dtype) * psi_self[kk] * \
                        nsum[j][a]
                    F[kk][a] = tk if F[kk][a] is None else \
                        F[kk][a] + tk

        if has_mask:
            m = mask_buf[s_cur, 0]
            is_dry = m == 1
            is_keep = m == 2

        # -- per-component collide -------------------------------------------
        w_np = np.asarray(g.weights, np.float64)
        for c in range(K):
            tau = taus[c]
            tau_inv = 1.0 / tau
            inv_rho = 1.0 / rhos[c]
            u_eq = list(u_common)
            if F[c][0] is not None or F[c][1] is not None:
                for a in range(2):
                    if F[c][a] is not None:
                        u_eq[a] = u_eq[a] + jnp.asarray(tau, dtype) * \
                            F[c][a] * inv_rho
            fvec = forces[c]
            uF = None
            if fvec is not None:
                # acceleration semantics: u* = u + a/2
                u_eq = [u_eq[a] + jnp.asarray(0.5 * fvec[a], dtype)
                        for a in range(2)]
                uF = u_eq[0] * jnp.asarray(fvec[0], dtype) + \
                    u_eq[1] * jnp.asarray(fvec[1], dtype)
            usq = u_eq[0] * u_eq[0] + u_eq[1] * u_eq[1]
            for i, o in [(i, opp[i]) for i in range(Q) if i <= opp[i]]:
                for d in ((i,) if o == i else (i, o)):
                    fi = fs[c][d]
                    cu = signed_sum(basis[d], u_eq)
                    poly = 3.0 * cu + 4.5 * cu * cu - 1.5 * usq
                    feq = jnp.asarray(w_np[d], dtype) * \
                        (rhos[c] + rhos[c] * poly)
                    vi = fi + jnp.asarray(tau_inv, dtype) * (feq - fi)
                    if fvec is not None:
                        cF = float(np.dot(basis[d][:2], fvec))
                        pref = (1.0 - 0.5 * tau_inv) * w_np[d]
                        vi = vi + jnp.asarray(pref, dtype) * rhos[c] * (
                            3.0 * (jnp.asarray(cF, dtype) - uF)
                            + 9.0 * cu * cF)
                    if has_mask:
                        refl = fs[c][opp[d]]
                        vi = jnp.where(is_dry, refl,
                                       jnp.where(is_keep, fi, vi))
                    out_buf[oslot, c * Q + d] = vi

        for c in range(K):
            pltpu.make_async_copy(
                out_buf.at[oslot, pl.ds(c * Q, Q)],
                out_hbm[c].at[:, pl.ds(k * by, by)],
                out_sems.at[oslot, c]).start()

        # -- col_io: per-component boundary/inner column emission
        # (exact stored bits, read back from the out buffer) ------------
        if col_io:
            def col_copy(s_, c, blk_expr):
                return pltpu.make_async_copy(
                    colx_st.at[s_, c],
                    colx_out_hbm[c].at[pl.ds(blk_expr * by, by)],
                    colx_sems.at[s_, c])

            # recycle: the DMA that read this staging slot two blocks
            # ago must have drained before this block's store
            @pl.when(k >= 2)
            def _():
                for c in range(K):
                    col_copy(oslot, c, k - 2).wait()

            col_lane_iota = jax.lax.broadcasted_iota(
                jnp.int32, (by, 128), 1)
            for c in range(K):
                acc = jnp.zeros((by, 128), dtype)
                for grp, cc in ((0, 0), (1, X - 1), (2, 1),
                                (3, X - 2)):
                    for i in range(Q):
                        v = out_buf[oslot, c * Q + i, :, cc:cc + 1]
                        acc = jnp.where(
                            col_lane_iota == grp * Q + i,
                            jnp.broadcast_to(v, (by, 128)), acc)
                colx_st[oslot, c] = acc
                col_copy(oslot, c, k).start()

            @pl.when(k == NB - 1)
            def _():
                # drain the outstanding column emissions
                for c in range(K):
                    col_copy(oslot, c, NB - 1).wait()
                    col_copy(jax.lax.rem(k + 1, 2), c, NB - 2).wait()

        # -- emit-rho: next step's post-stream densities from the
        # post-collision blocks in VMEM (see docstring) ----------------
        if emit_rho:
            o_prev = jax.lax.rem(k + 1, 2)

            def emitted_rho_block(c, prev_row, blk, next_row):
                """Streamed density of component c over one y-block;
                row assembly, roll and summation order identical to
                make_rho_kernel_2d for bit-equality. prev_row/blk/
                next_row: fn(ch) -> the pc rows of cache channel ch."""
                acc = None
                for i in range(Q):
                    cx, cy = int(basis[i][0]), int(basis[i][1])
                    ch = c * Q + i
                    cur = blk(ch)
                    if cy == 0:
                        plane = cur
                    elif cy == 1:
                        plane = jnp.concatenate(
                            [prev_row(ch), cur[:by - 1]], axis=0)
                    else:
                        plane = jnp.concatenate(
                            [cur[1:], next_row(ch)], axis=0)
                    if cx:
                        plane = pltpu.roll(plane, cx % X, axis=1)
                    acc = plane if acc is None else acc + plane
                return acc

            def remit_copy(s, c, blk_expr):
                return pltpu.make_async_copy(
                    remit_buf.at[s, c],
                    rho_out_hbm[c].at[pl.ds(blk_expr * by, by)],
                    remit_sems.at[s, c])

            # regular emission: block k-1 whole (k >= 2; block 0 needs
            # the wrap row Y-1 and waits for the epilogue)
            @pl.when(k >= 2)
            def _():
                for c in range(K):
                    @pl.when(k >= 4)
                    def _(c=c):
                        # drain this staging slot's previous emission
                        remit_copy(oslot, c, k - 3).wait()
                    remit_buf[oslot, c] = emitted_rho_block(
                        c,
                        lambda ch: ring_row[ch],
                        lambda ch: out_buf[o_prev, ch],
                        lambda ch: out_buf[oslot, ch, 0:1])
                    remit_copy(oslot, c, k - 1).start()

            # stashes for the wrap-block emissions in the epilogue
            @pl.when(k == 0)
            def _():
                stash_blk[...] = out_buf[oslot]

            @pl.when(k == 1)
            def _():
                stash_row1[...] = out_buf[oslot, :, 0:1]

            # ring: carry the last pc row of block k-1 for program k+1
            # (the emission above read the old value = block k-2's)
            @pl.when(k >= 1)
            def _():
                ring_row[...] = out_buf[o_prev, :, by - 1:by]

            @pl.when(k == NB - 1)
            def _():
                for c in range(K):
                    # drain the outstanding regular emissions
                    remit_copy(oslot, c, k - 1).wait()
                    remit_copy(o_prev, c, k - 2).wait()
                    # block NB-1: its top row wraps to pc row 0
                    remit_buf[oslot, c] = emitted_rho_block(
                        c,
                        lambda ch: out_buf[o_prev, ch, by - 1:by],
                        lambda ch: out_buf[oslot, ch],
                        lambda ch: stash_blk[ch, 0:1])
                    cpy = remit_copy(oslot, c, NB - 1)
                    cpy.start()
                    cpy.wait()
                    # block 0: its bottom row wraps to pc row Y-1
                    remit_buf[oslot, c] = emitted_rho_block(
                        c,
                        lambda ch: out_buf[oslot, ch, by - 1:by],
                        lambda ch: stash_blk[ch],
                        lambda ch: stash_row1[ch])
                    cpy = remit_copy(oslot, c, 0)
                    cpy.start()
                    cpy.wait()

        @pl.when(k == NB - 1)
        def _():
            wait_out(oslot)
            wait_out(jax.lax.rem(k + 1, 2))

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * (
        ((8 if edge_io else 4) + (2 if x_ghosts else 0)) * K)
    scratch = [
        pltpu.VMEM((4, K * Q, by, X), dtype),
        pltpu.VMEM((2, K * Q, by, X), dtype),
        pltpu.VMEM((4, K, by, X), dtype),
    ]
    if has_mask:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((4, 1, by, X), jnp.int32))
    if emit_rho:
        scratch.append(pltpu.VMEM((K * Q, 1, X), dtype))   # ring_row
        scratch.append(pltpu.VMEM((K * Q, by, X), dtype))  # stash_blk
        scratch.append(pltpu.VMEM((K * Q, 1, X), dtype))   # stash_row1
        scratch.append(pltpu.VMEM((2, K, by, X), dtype))   # remit
    if edge_io:
        scratch.append(pltpu.VMEM((2, K, 1, X), dtype))    # redge
    if x_ghosts:
        scratch.append(pltpu.VMEM((2, K, by, 128), dtype))  # xcol
        scratch.append(pltpu.VMEM((2, K, by, 128), dtype))  # rxcol
    if col_io:
        scratch.append(pltpu.VMEM((2, K, by, 128), dtype))  # colx_st
    scratch.append(pltpu.SemaphoreType.DMA((4, 2 * K + 1)))
    scratch.append(pltpu.SemaphoreType.DMA((2, K)))
    if emit_rho:
        scratch.append(pltpu.SemaphoreType.DMA((2, K)))    # remit
    if edge_io:
        scratch.append(pltpu.SemaphoreType.DMA((2, K)))    # redge
    if x_ghosts:
        scratch.append(pltpu.SemaphoreType.DMA((2, K)))    # xcol
        scratch.append(pltpu.SemaphoreType.DMA((2, K)))    # rxcol
    if col_io:
        scratch.append(pltpu.SemaphoreType.DMA((2, K)))    # colx

    n_out = 2 * K if emit_rho else K
    if col_io:
        n_out += K
    out_shape = tuple(jax.ShapeDtypeStruct((Q, Y, X), dtype)
                      for _ in range(K))
    # in-place component updates (wrap blocks come from the ghost
    # inputs; each interior block's single HBM read completes a full
    # program before its write); in emit-rho mode the emitted
    # densities alias the rho inputs the same way (rho block p-1's
    # last prefetch read lands at program p-3; its write starts at p)
    io_aliases = {c: c for c in range(K)}
    if emit_rho:
        out_shape = out_shape + tuple(
            jax.ShapeDtypeStruct((Y, X), dtype) for _ in range(K))
        for c in range(K):
            io_aliases[3 * K + c] = K + c
    if col_io:
        out_shape = out_shape + tuple(
            jax.ShapeDtypeStruct((Y, 128), dtype) for _ in range(K))
    fused = pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                        for _ in range(n_out)),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases=io_aliases,
        interpret=interpret,
    )
    return fused


def make_kernel_2d_fe(mbuilder, Y, X, by=16, has_mask=False,
                      wetting=False, interpret=False, emit_rho=False,
                      edge_io=False, x_ghosts=False, col_io=False):
    """Fused binary free-energy step (reference lb_binary_fluid.mako):
    fused(f0, f1, glo0, glo1, ghi0, ghi1, phi_field[, mask][, orient])
    -> (f0', f1').

    ``emit_rho``: additionally emit next step's post-stream order
    parameter (the streamed sum of f1, aliased onto the phi input) so
    the step carries (state, phi) between iterations instead of paying
    the phi pre-pass every step -- same ring/stash scheme as
    make_kernel_2d_sc_multi but for the single f1 channel set.

    ``phi_field`` is the post-stream order parameter (rho pre-pass on
    f1); the Landau chemical potential, isotropic laplacian/gradient
    stencils (with the wall-wetting phi mirror when ``wetting``), the
    phi-interpolated relaxation time, and both equilibria are evaluated
    in-VMEM per y-block. Outputs alias (f0, f1) -- in-place HBM update
    (see pallas_step.make_kernel_3d) -- so the y-wrap blocks arrive as
    the materialized ghost inputs.

    ``edge_io`` (requires ``emit_rho``; the y-sharded mode): the phi
    wrap blocks come from ghost inputs ``pglo``/``pghi`` whose
    boundary rows the caller replaces with the neighbors' FRESH edge
    rows (a shard's own emitted rows 0/Y-1 are garbage), the stale
    local edge rows are patched at assembly time from fresh (1, X)
    inputs ``pelo``/``pehi``, and with ``wetting`` the orientation
    wrap blocks come from static ghost inputs ``oglo``/``oghi``.
    Signature: fused(f0, f1, glo0, glo1, ghi0, ghi1, phi, pglo, pghi,
    pelo, pehi[, mask][, orient, oglo, oghi]) -> (f0', f1', phi').

    ``x_ghosts`` (x-sharded meshes, requires ``emit_rho``, excludes
    ``wetting`` -- the wall mirror's x-reach is two columns): per
    component a (Y, 128) fp32 input of post-roll f wrap columns (lane
    j = direction xdirs[j]) and ONE (Y, 128) input of raw-phi
    neighbor columns for the stencil wrap lanes (lane 3*side +
    (dy+1)), exactly the SC kernel's scheme; the emitted phi's edge
    columns are stale-by-contract (the caller re-streams them). The
    carried phi arrives with fresh edge columns.

    ``col_io`` (requires ``x_ghosts``): per component, RETURN the
    post-collision boundary + inner columns as one extra (Y, 128)
    fp32 output (lane g*Q + i = column (0, X-1, 1, X-2)[g] of
    direction i, exact stored bits) -- see
    make_kernel_2d_sc_multi."""
    from sailfish_tpu.ops.multigrid import _fe_weights
    g = mbuilder.grid
    Q = g.Q
    dtype = mbuilder.dtype
    basis = g.basis
    opp = [int(o) for o in g.opposite]
    tau_a, tau_b = mbuilder.tau_a, mbuilder.tau_b
    tau_phi = mbuilder.tau_phi
    fe_mrt = getattr(mbuilder, 'fe_model', 'bgk') == 'mrt'
    A_c, kappa, Gamma = mbuilder.A, mbuilder.kappa, mbuilder.Gamma
    wall_grad = mbuilder.wall_grad_phase
    few = {k: np.asarray(v, np.float64)
           for k, v in _fe_weights(g).items()}
    fvec = None
    if mbuilder.body_force is not None:
        fvec = np.asarray(mbuilder.body_force, np.float64).reshape(-1)
    eq_force_map = dict(getattr(mbuilder, 'eq_force_map', {}))
    body_forces = [None if f is None else
                   np.asarray(f, np.float64).reshape(-1)
                   for f in mbuilder.body_forces]
    assert Y % by == 0
    assert not (edge_io and not emit_rho)
    assert not (x_ghosts and not emit_rho)
    assert not (x_ghosts and wetting)
    assert not (col_io and not x_ghosts)
    assert not col_io or 4 * Q <= 128
    xdirs = [i for i in range(Q) if int(basis[i][0]) != 0]
    NB = Y // by
    if NB < 4:
        raise NotImplementedError(
            f'2D fused kernel needs >= 4 y-blocks (Y={Y}, by={by})')

    def kernel(*refs):
        idx = 0
        f_hbm = [refs[idx], refs[idx + 1]]; idx += 2
        glo_hbm = [refs[idx], refs[idx + 1]]; idx += 2
        ghi_hbm = [refs[idx], refs[idx + 1]]; idx += 2
        phi_hbm = refs[idx]; idx += 1
        pglo_hbm = pghi_hbm = pelo_hbm = pehi_hbm = None
        if edge_io:
            pglo_hbm = refs[idx]; idx += 1
            pghi_hbm = refs[idx]; idx += 1
            pelo_hbm = refs[idx]; idx += 1
            pehi_hbm = refs[idx]; idx += 1
        xcol_hbm = pxcol_hbm = None
        if x_ghosts:
            xcol_hbm = [refs[idx], refs[idx + 1]]; idx += 2
            pxcol_hbm = refs[idx]; idx += 1
        mask_hbm = orient_hbm = None
        oglo_hbm = oghi_hbm = None
        if has_mask:
            mask_hbm = refs[idx]; idx += 1
        if wetting:
            orient_hbm = refs[idx]; idx += 1
            if edge_io:
                oglo_hbm = refs[idx]; idx += 1
                oghi_hbm = refs[idx]; idx += 1
        out_hbm = [refs[idx], refs[idx + 1]]; idx += 2
        phi_out_hbm = None
        if emit_rho:
            phi_out_hbm = refs[idx]; idx += 1
        colx_out_hbm = None
        if col_io:
            colx_out_hbm = [refs[idx], refs[idx + 1]]; idx += 2
        blk_buf = refs[idx]; idx += 1     # (4, 2Q, by, X)
        out_buf = refs[idx]; idx += 1     # (2, 2Q, by, X)
        phi_buf = refs[idx]; idx += 1     # (4, 1, by, X)
        mask_buf = orient_buf = None
        if has_mask:
            mask_buf = refs[idx]; idx += 1
        if wetting:
            orient_buf = refs[idx]; idx += 1
        ring_row = stash_blk = stash_row1 = remit_buf = None
        if emit_rho:
            ring_row = refs[idx]; idx += 1    # (Q, 1, X)
            stash_blk = refs[idx]; idx += 1   # (Q, by, X)
            stash_row1 = refs[idx]; idx += 1  # (Q, 1, X)
            remit_buf = refs[idx]; idx += 1   # (2, by, X)
        pedge_buf = None
        if edge_io:
            pedge_buf = refs[idx]; idx += 1   # (2, 1, X) pelo/pehi
        xcol_buf = pxcol_buf = None
        if x_ghosts:
            xcol_buf = refs[idx]; idx += 1    # (2, 2, by, 128)
            pxcol_buf = refs[idx]; idx += 1   # (2, by, 128)
        colx_st = None
        if col_io:
            colx_st = refs[idx]; idx += 1     # (2, 2, by, 128)
        in_sems = refs[idx]; idx += 1      # DMA (4, 5)
        out_sems = refs[idx]; idx += 1     # DMA (2, 2)
        remit_sems = None
        if emit_rho:
            remit_sems = refs[idx]; idx += 1  # DMA (2,)
        pedge_sems = None
        if edge_io:
            pedge_sems = refs[idx]; idx += 1  # DMA (2,)
        xcol_sems = pxcol_sems = None
        if x_ghosts:
            xcol_sems = refs[idx]; idx += 1   # DMA (2, 2)
            pxcol_sems = refs[idx]; idx += 1  # DMA (2,)
        colx_sems = None
        if col_io:
            colx_sems = refs[idx]; idx += 1   # DMA (2, 2)

        k = pl.program_id(0)

        def start_block(b, slot, fsrc=None, psrc=None, osrc=None):
            # one strided DMA per component set (see the SC kernel);
            # fsrc/psrc/osrc = ghost inputs for the wrap blocks
            # (in-place safety; under edge_io the phi/orient wraps
            # belong to the y-neighbors)
            bm = jax.lax.rem(b + NB, NB)
            for c in range(2):
                if fsrc is not None:
                    src = fsrc[c]
                else:
                    src = f_hbm[c].at[:, pl.ds(bm * by, by)]
                pltpu.make_async_copy(
                    src, blk_buf.at[slot, pl.ds(c * Q, Q)],
                    in_sems.at[slot, c]).start()
            ps = psrc if psrc is not None else \
                phi_hbm.at[pl.ds(bm * by, by)]
            pltpu.make_async_copy(ps, phi_buf.at[slot, 0],
                                  in_sems.at[slot, 2]).start()
            if has_mask:
                pltpu.make_async_copy(
                    mask_hbm.at[pl.ds(bm * by, by)],
                    mask_buf.at[slot, 0], in_sems.at[slot, 3]).start()
            if wetting:
                os = osrc if osrc is not None else \
                    orient_hbm.at[pl.ds(bm * by, by)]
                pltpu.make_async_copy(
                    os, orient_buf.at[slot, 0],
                    in_sems.at[slot, 4]).start()

        def wait_block(slot):
            for c in range(2):
                pltpu.make_async_copy(
                    f_hbm[0].at[:, pl.ds(0, by)],
                    blk_buf.at[slot, pl.ds(c * Q, Q)],
                    in_sems.at[slot, c]).wait()
            pltpu.make_async_copy(phi_hbm.at[pl.ds(0, by)],
                                  phi_buf.at[slot, 0],
                                  in_sems.at[slot, 2]).wait()
            if has_mask:
                pltpu.make_async_copy(mask_hbm.at[pl.ds(0, by)],
                                      mask_buf.at[slot, 0],
                                      in_sems.at[slot, 3]).wait()
            if wetting:
                pltpu.make_async_copy(orient_hbm.at[pl.ds(0, by)],
                                      orient_buf.at[slot, 0],
                                      in_sems.at[slot, 4]).wait()

        def wait_out(oslot):
            for c in range(2):
                pltpu.make_async_copy(
                    out_buf.at[oslot, pl.ds(c * Q, Q)],
                    out_hbm[c].at[:, pl.ds(0, by)],
                    out_sems.at[oslot, c]).wait()

        def start_xcol(b, slot):
            for c in range(2):
                pltpu.make_async_copy(
                    xcol_hbm[c].at[pl.ds(b * by, by)],
                    xcol_buf.at[slot, c], xcol_sems.at[slot, c]).start()
            pltpu.make_async_copy(
                pxcol_hbm.at[pl.ds(b * by, by)],
                pxcol_buf.at[slot], pxcol_sems.at[slot]).start()

        def wait_xcol(slot):
            for c in range(2):
                pltpu.make_async_copy(
                    xcol_hbm[c].at[pl.ds(0, by)],
                    xcol_buf.at[slot, c], xcol_sems.at[slot, c]).wait()
            pltpu.make_async_copy(
                pxcol_hbm.at[pl.ds(0, by)],
                pxcol_buf.at[slot], pxcol_sems.at[slot]).wait()

        s_prev = jax.lax.rem(k - 1 + 4 * NB, 4)
        s_cur = jax.lax.rem(k, 4)
        s_next = jax.lax.rem(k + 1, 4)
        s_pref = jax.lax.rem(k + 2, 4)
        oslot = jax.lax.rem(k, 2)

        @pl.when(k == 0)
        def _():
            start_block(-1, jnp.int32(3), fsrc=glo_hbm,
                        psrc=pglo_hbm if edge_io else None,
                        osrc=oglo_hbm if edge_io and wetting else None)
            start_block(0, jnp.int32(0))
            start_block(1, jnp.int32(1))
            if x_ghosts:
                start_xcol(0, jnp.int32(0))
            if edge_io:
                # fresh local phi edge rows, persistent for the grid
                c0 = pltpu.make_async_copy(pelo_hbm, pedge_buf.at[0],
                                           pedge_sems.at[0])
                c1 = pltpu.make_async_copy(pehi_hbm, pedge_buf.at[1],
                                           pedge_sems.at[1])
                c0.start()
                c1.start()
                c0.wait()
                c1.wait()
            wait_block(jnp.int32(3))
            wait_block(jnp.int32(0))

        @pl.when(k + 2 < NB)
        def _():
            start_block(k + 2, s_pref)

        @pl.when(k + 2 == NB)
        def _():
            start_block(k + 2, s_pref, fsrc=ghi_hbm,
                        psrc=pghi_hbm if edge_io else None,
                        osrc=oghi_hbm if edge_io and wetting else None)

        if x_ghosts:
            # ghost-column blocks ride a 2-slot pipeline of their own
            # (see pallas_step2d.make_kernel_2d)
            @pl.when(k + 1 < NB)
            def _():
                start_xcol(k + 1, jax.lax.rem(k + 1, 2))

        wait_block(s_next)

        def rows_shifted(ch, cy):
            cur = blk_buf[s_cur, ch]
            if cy == 0:
                return cur
            if cy == 1:
                prev = blk_buf[s_prev, ch]
                return jnp.concatenate([prev[by - 1:by], cur[:by - 1]],
                                       axis=0)
            nxt = blk_buf[s_next, ch]
            return jnp.concatenate([cur[1:], nxt[0:1]], axis=0)

        def cache_rows(buf, dy, patch_edges=False):
            """Rows of a 1-channel cache at offset +dy, |dy| <= 2.
            ``patch_edges`` (edge_io, phi only): the stale local edge
            rows 0 / Y-1 read the fresh pelo/pehi inputs instead;
            neighbor-block boundary rows are interior-fresh or come
            from the caller-assembled ghost blocks."""
            cur = buf[s_cur, 0]
            if patch_edges and edge_io:
                row0 = jnp.where(k == 0, pedge_buf[0], cur[0:1])
                rowT = jnp.where(k == NB - 1, pedge_buf[1],
                                 cur[by - 1:by])
                cur = jnp.concatenate([row0, cur[1:by - 1], rowT],
                                      axis=0)
            if dy == 0:
                return cur
            if dy > 0:
                nxt = buf[s_next, 0]
                return jnp.concatenate([cur[dy:], nxt[0:dy]], axis=0)
            prev = buf[s_prev, 0]
            return jnp.concatenate([prev[by + dy:by], cur[:by + dy]],
                                   axis=0)

        @pl.when(k >= 2)
        def _():
            wait_out(oslot)

        xslot = jax.lax.rem(k, 2)
        if x_ghosts:
            wait_xcol(xslot)
        fs = []
        for c in range(2):
            comp = []
            for i in range(Q):
                cx, cy = int(basis[i][0]), int(basis[i][1])
                plane = rows_shifted(c * Q + i, cy)
                if cx:
                    if x_ghosts:
                        # static lane concat with the neighbor column
                        # standing in for the wrapped lane (see
                        # pallas_step2d.make_kernel_2d)
                        j = xdirs.index(i)
                        col = xcol_buf[xslot, c][:, j:j + 1]
                        if cx == 1:
                            plane = jnp.concatenate(
                                [col, plane[:, :X - 1]], axis=1)
                        else:
                            plane = jnp.concatenate(
                                [plane[:, 1:], col], axis=1)
                    else:
                        plane = pltpu.roll(plane, cx % X, axis=1)
                comp.append(plane)
            fs.append(comp)

        rho = fs[0][0]
        phi = fs[1][0]
        for i in range(1, Q):
            rho = rho + fs[0][i]
            phi = phi + fs[1][i]
        mom = [signed_sum(basis[:, a], fs[0]) for a in range(2)]
        inv_rho = 1.0 / rho
        u = [mom[a] * inv_rho for a in range(2)]
        if fvec is not None:
            u = [u[a] + jnp.asarray(0.5 * fvec[a], dtype)
                 for a in range(2)]

        # phi_w rows at +dy with wall wetting applied
        def phi_w_rows(dy):
            raw = cache_rows(phi_buf, dy, patch_edges=True)
            if not wetting:
                return raw
            orient = cache_rows(orient_buf, dy)
            out = raw
            for kk, vec in enumerate(g.orientation_vectors):
                ex, ey = int(vec[0]), int(vec[1])
                neigh = cache_rows(phi_buf, dy + ey, patch_edges=True)
                if ex:
                    neigh = pltpu.roll(neigh, (-ex) % X, axis=1)
                out = jnp.where(orient == kk + 1,
                                neigh - jnp.asarray(wall_grad, dtype),
                                out)
            return out

        pw = {dy: phi_w_rows(dy) for dy in (-1, 0, 1)}

        def at(cx, cy):
            p = pw[cy]
            if cx:
                if x_ghosts:
                    # shift for a sample at x + cx with the wrap lane
                    # from the neighbor's raw-phi column (x_ghosts
                    # excludes wetting, so raw phi IS phi_w)
                    lane = (0 if cx == 1 else 1) * 3 + (cy + 1)
                    col = pxcol_buf[xslot][:, lane:lane + 1]
                    if cx == 1:
                        return jnp.concatenate(
                            [p[:, 1:], col], axis=1)
                    return jnp.concatenate(
                        [col, p[:, :X - 1]], axis=1)
                p = pltpu.roll(p, (-cx) % X, axis=1)
            return p

        # isotropic stencils (ops/multigrid.laplacian_and_grad, 2D)
        fe_, fw_ = at(1, 0), at(-1, 0)
        fn_, fs_ = at(0, 1), at(0, -1)
        fne, fnw = at(1, 1), at(-1, 1)
        fse, fsw = at(1, -1), at(-1, -1)
        grad_x = (-fnw - fsw + fse + fne) / 12.0 + (fe_ - fw_) / 3.0
        grad_y = (-fse - fsw + fne + fnw) / 12.0 + (fn_ - fs_) / 3.0
        lap = (fnw + fne + fsw + fse + 4.0 * (fe_ + fw_ + fn_ + fs_)
               - 20.0 * pw[0]) / 6.0

        # per-target equilibrium velocities (use_force_for_equilibrium)
        def u_for(target):
            if target not in eq_force_map:
                return u
            u_base = u
            if fvec is not None:
                u_base = [u[a] - jnp.asarray(0.5 * fvec[a], dtype)
                          for a in range(2)]
            src = eq_force_map[target]
            if src is None or body_forces[src] is None:
                return u_base
            fs_src = body_forces[src]
            return [u_base[a] + jnp.asarray(0.5 * fs_src[a], dtype)
                    for a in range(2)]

        u0 = u_for(0)
        u1 = u_for(1)
        usq0 = u0[0] * u0[0] + u0[1] * u0[1]
        usq1 = u1[0] * u1[0] + u1[1] * u1[1] if u1 is not u0 else usq0

        pb = rho / 3.0 + jnp.asarray(A_c, dtype) * (
            -(phi * phi) / 2.0 + 0.75 * phi ** 4)
        kphl = jnp.asarray(kappa, dtype) * phi * lap
        mu = jnp.asarray(A_c, dtype) * (-phi + phi ** 3) - \
            jnp.asarray(kappa, dtype) * lap
        tau0 = jnp.asarray(tau_b, dtype) + \
            (jnp.clip(phi, -1.0, 1.0) + 1.0) * \
            jnp.asarray((tau_a - tau_b) * 0.5, dtype)
        inv_tau0 = 1.0 / tau0

        if has_mask:
            m = mask_buf[s_cur, 0]
            is_dry = m == 1
            is_keep = m == 2

        uF = None
        if fvec is not None:
            uF = u[0] * jnp.asarray(fvec[0], dtype) + \
                u[1] * jnp.asarray(fvec[1], dtype)

        feq_parts = []
        geq_parts = []
        for i in range(1, Q):
            cu0 = signed_sum(basis[i], u0)
            cu1 = cu0 if u1 is u0 else signed_sum(basis[i], u1)
            t = jnp.asarray(few['wi'][i], dtype) * (
                pb - kphl + rho * cu0
                + 1.5 * (cu0 * cu0 * rho - rho * usq0 / 3.0))
            t = t + jnp.asarray(kappa, dtype) * (
                jnp.asarray(few['wxx'][i], dtype) * grad_x * grad_x
                + jnp.asarray(few['wyy'][i], dtype) * grad_y * grad_y
                + jnp.asarray(few['wxy'][i], dtype) * grad_x * grad_y)
            feq_parts.append(t)
            geq_parts.append(jnp.asarray(few['wi'][i], dtype) * (
                jnp.asarray(Gamma, dtype) * mu + cu1 * phi
                + 1.5 * phi * (cu1 * cu1 - usq1 / 3.0)))
        feq0 = rho - sum(feq_parts)
        geq0 = phi - sum(geq_parts)
        feq = [feq0] + feq_parts
        geq = [geq0] + geq_parts

        mrt_corr = half_Fi = None
        if fe_mrt:
            # FE-MRT fluid relaxation (order parameter stays BGK at
            # tau_phi): see fe_mrt_relax for the moment-wise form
            z = []
            half_Fi = []
            for i in range(Q):
                zi = fs[0][i] - feq[i]
                if fvec is not None:
                    cu = signed_sum(basis[i], u)
                    cF = float(np.dot(basis[i][:2], fvec))
                    hf = 0.5 * jnp.asarray(g.weights[i], dtype) * \
                        rho * (3.0 * (jnp.asarray(cF, dtype) - uF)
                               + 9.0 * cu * cF)
                    half_Fi.append(hf)
                    zi = zi + hf
                z.append(zi)
            mrt_corr = fe_mrt_relax(g, z, inv_tau0, dtype)
        for i in range(Q):
            if fe_mrt:
                v0 = feq[i]
                if mrt_corr[i] is not None:
                    v0 = v0 + mrt_corr[i]
                if fvec is not None:
                    v0 = v0 + half_Fi[i]
            else:
                v0 = fs[0][i] + (feq[i] - fs[0][i]) * inv_tau0
                if fvec is not None:
                    cu = signed_sum(basis[i], u)
                    cF = float(np.dot(basis[i][:2], fvec))
                    pref = jnp.asarray(g.weights[i], dtype) * \
                        (1.0 - 0.5 * inv_tau0)
                    v0 = v0 + pref * rho * (
                        3.0 * (jnp.asarray(cF, dtype) - uF)
                        + 9.0 * cu * cF)
            v1 = fs[1][i] + (geq[i] - fs[1][i]) * \
                jnp.asarray(1.0 / tau_phi, dtype)
            if has_mask:
                v0 = jnp.where(is_dry, fs[0][opp[i]],
                               jnp.where(is_keep, fs[0][i], v0))
                v1 = jnp.where(is_dry, fs[1][opp[i]],
                               jnp.where(is_keep, fs[1][i], v1))
            out_buf[oslot, i] = v0
            out_buf[oslot, Q + i] = v1

        for c in range(2):
            pltpu.make_async_copy(
                out_buf.at[oslot, pl.ds(c * Q, Q)],
                out_hbm[c].at[:, pl.ds(k * by, by)],
                out_sems.at[oslot, c]).start()

        # -- col_io: per-component boundary/inner column emission
        # (exact stored bits; see make_kernel_2d_sc_multi) -------------
        if col_io:
            def col_copy(s_, c, blk_expr):
                return pltpu.make_async_copy(
                    colx_st.at[s_, c],
                    colx_out_hbm[c].at[pl.ds(blk_expr * by, by)],
                    colx_sems.at[s_, c])

            @pl.when(k >= 2)
            def _():
                for c in range(2):
                    col_copy(oslot, c, k - 2).wait()

            col_lane_iota = jax.lax.broadcasted_iota(
                jnp.int32, (by, 128), 1)
            for c in range(2):
                acc = jnp.zeros((by, 128), dtype)
                for grp, cc in ((0, 0), (1, X - 1), (2, 1),
                                (3, X - 2)):
                    for i in range(Q):
                        v = out_buf[oslot, c * Q + i, :, cc:cc + 1]
                        acc = jnp.where(
                            col_lane_iota == grp * Q + i,
                            jnp.broadcast_to(v, (by, 128)), acc)
                colx_st[oslot, c] = acc
                col_copy(oslot, c, k).start()

            @pl.when(k == NB - 1)
            def _():
                for c in range(2):
                    col_copy(oslot, c, NB - 1).wait()
                    col_copy(jax.lax.rem(k + 1, 2), c, NB - 2).wait()

        # -- emit-rho: next step's post-stream order parameter from the
        # post-collision f1 blocks in VMEM (see docstring; same scheme
        # as make_kernel_2d_sc_multi with the single Q..2Q channel set)
        if emit_rho:
            o_prev = jax.lax.rem(k + 1, 2)

            def emitted_phi_block(prev_row, blk, next_row):
                """Streamed order parameter over one y-block; row
                assembly, roll and summation order identical to
                make_rho_kernel_2d for bit-equality. prev_row/blk/
                next_row: fn(i) -> pc rows of f1 dist i."""
                acc = None
                for i in range(Q):
                    cx, cy = int(basis[i][0]), int(basis[i][1])
                    cur = blk(i)
                    if cy == 0:
                        plane = cur
                    elif cy == 1:
                        plane = jnp.concatenate(
                            [prev_row(i), cur[:by - 1]], axis=0)
                    else:
                        plane = jnp.concatenate(
                            [cur[1:], next_row(i)], axis=0)
                    if cx:
                        plane = pltpu.roll(plane, cx % X, axis=1)
                    acc = plane if acc is None else acc + plane
                return acc

            def remit_copy(s, blk_expr):
                return pltpu.make_async_copy(
                    remit_buf.at[s],
                    phi_out_hbm.at[pl.ds(blk_expr * by, by)],
                    remit_sems.at[s])

            # regular emission: block k-1 whole (k >= 2; block 0 needs
            # the wrap row Y-1 and waits for the epilogue)
            @pl.when(k >= 2)
            def _():
                @pl.when(k >= 4)
                def _():
                    # drain this staging slot's previous emission
                    remit_copy(oslot, k - 3).wait()
                remit_buf[oslot] = emitted_phi_block(
                    lambda i: ring_row[i],
                    lambda i: out_buf[o_prev, Q + i],
                    lambda i: out_buf[oslot, Q + i, 0:1])
                remit_copy(oslot, k - 1).start()

            # stashes for the wrap-block emissions in the epilogue
            @pl.when(k == 0)
            def _():
                stash_blk[...] = out_buf[oslot, pl.ds(Q, Q)]

            @pl.when(k == 1)
            def _():
                stash_row1[...] = out_buf[oslot, pl.ds(Q, Q), 0:1]

            # ring: carry the last pc row of block k-1 for program k+1
            # (the emission above read the old value = block k-2's)
            @pl.when(k >= 1)
            def _():
                ring_row[...] = out_buf[o_prev, pl.ds(Q, Q), by - 1:by]

            @pl.when(k == NB - 1)
            def _():
                # drain the outstanding regular emissions
                remit_copy(oslot, k - 1).wait()
                remit_copy(o_prev, k - 2).wait()
                # block NB-1: its top row wraps to pc row 0
                remit_buf[oslot] = emitted_phi_block(
                    lambda i: out_buf[o_prev, Q + i, by - 1:by],
                    lambda i: out_buf[oslot, Q + i],
                    lambda i: stash_blk[i, 0:1])
                cpy = remit_copy(oslot, NB - 1)
                cpy.start()
                cpy.wait()
                # block 0: its bottom row wraps to pc row Y-1
                remit_buf[oslot] = emitted_phi_block(
                    lambda i: out_buf[oslot, Q + i, by - 1:by],
                    lambda i: stash_blk[i],
                    lambda i: stash_row1[i])
                cpy = remit_copy(oslot, 0)
                cpy.start()
                cpy.wait()

        @pl.when(k == NB - 1)
        def _():
            wait_out(oslot)
            wait_out(jax.lax.rem(k + 1, 2))

    n_in = (7 + (4 if edge_io else 0) + (3 if x_ghosts else 0)
            + (1 if has_mask else 0)
            + ((3 if edge_io else 1) if wetting else 0))
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_in
    scratch = [
        pltpu.VMEM((4, 2 * Q, by, X), dtype),
        pltpu.VMEM((2, 2 * Q, by, X), dtype),
        pltpu.VMEM((4, 1, by, X), dtype),
    ]
    if has_mask:
        scratch.append(pltpu.VMEM((4, 1, by, X), jnp.int32))
    if wetting:
        scratch.append(pltpu.VMEM((4, 1, by, X), jnp.int32))
    if emit_rho:
        scratch.append(pltpu.VMEM((Q, 1, X), dtype))   # ring_row
        scratch.append(pltpu.VMEM((Q, by, X), dtype))  # stash_blk
        scratch.append(pltpu.VMEM((Q, 1, X), dtype))   # stash_row1
        scratch.append(pltpu.VMEM((2, by, X), dtype))  # remit
    if edge_io:
        scratch.append(pltpu.VMEM((2, 1, X), dtype))   # pedge
    if x_ghosts:
        scratch.append(pltpu.VMEM((2, 2, by, 128), dtype))  # xcol
        scratch.append(pltpu.VMEM((2, by, 128), dtype))     # pxcol
    if col_io:
        scratch.append(pltpu.VMEM((2, 2, by, 128), dtype))  # colx_st
    scratch.append(pltpu.SemaphoreType.DMA((4, 5)))
    scratch.append(pltpu.SemaphoreType.DMA((2, 2)))
    if emit_rho:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))  # remit
    if edge_io:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))  # pedge
    if x_ghosts:
        scratch.append(pltpu.SemaphoreType.DMA((2, 2)))  # xcol
        scratch.append(pltpu.SemaphoreType.DMA((2,)))    # pxcol
    if col_io:
        scratch.append(pltpu.SemaphoreType.DMA((2, 2)))  # colx

    n_out = 3 if emit_rho else 2
    if col_io:
        n_out += 2
    out_shape = [jax.ShapeDtypeStruct((Q, Y, X), dtype),
                 jax.ShapeDtypeStruct((Q, Y, X), dtype)]
    # in-place component updates (see the SC kernel note); the emitted
    # phi aliases the phi input the same way (phi block p-1's last
    # prefetch read lands at program p-3; its write starts at p)
    io_aliases = {0: 0, 1: 1}
    if emit_rho:
        out_shape.append(jax.ShapeDtypeStruct((Y, X), dtype))
        io_aliases[6] = 2
    if col_io:
        out_shape.append(jax.ShapeDtypeStruct((Y, 128), dtype))
        out_shape.append(jax.ShapeDtypeStruct((Y, 128), dtype))

    return pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                        for _ in range(n_out)),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        input_output_aliases=io_aliases,
        interpret=interpret,
    )


class PallasStepFE2D:
    """Fused stepping for binary free-energy scenes (2D, single device,
    periodic/bounce-back boundaries)."""

    def __init__(self, mbuilder, domain_shape, interpret=False):
        Ys, Xs = domain_shape
        self.shape = domain_shape
        b0 = mbuilder.b0
        mask_np, patch_rows = classify_nodes(b0.maps)
        if patch_rows:
            raise NotImplementedError(
                'the fused FE kernel covers walls/obstacles only; '
                'complex-BC scenes use the XLA engine')
        check_plane_tiling(Ys, Xs, interpret, dim=2)
        by = pick_block_size(mbuilder.grid.Q * 2, Ys, Xs)
        self.by = by
        self.has_mask = bool((mask_np != 0).any())
        self.mask = jnp.asarray(mask_np) if self.has_mask else None
        self.wetting = bool(mbuilder._has_dry_nodes)
        self.orient = None
        if self.wetting:
            self.orient = mbuilder._dry_orient
        self.kernel = make_kernel_2d_fe(
            mbuilder, Ys, Xs, by=by, has_mask=self.has_mask,
            wetting=self.wetting, interpret=interpret, emit_rho=True)
        self.rho_kernel = make_rho_kernel_2d(b0, Ys, Xs, by=by,
                                             interpret=interpret)

    def step(self, carry, it=0):
        """One fused step on the ((f0, f1), phi) carry (emit-rho mode;
        see make_kernel_2d_fe -- the kernel emits next step's order
        parameter itself instead of paying the phi pre-pass per step)."""
        (f0, f1), phi = carry
        # wrap blocks as materialized ghosts (the kernel writes the f
        # buffers in place)
        by = self.by
        args = [f0, f1, f0[:, -by:], f1[:, -by:], f0[:, :by],
                f1[:, :by], phi]
        if self.has_mask:
            args.append(self.mask)
        if self.wetting:
            args.append(self.orient)
        out = self.kernel(*args)
        return (out[0], out[1]), out[2]

    @property
    def padded(self):
        """The between-steps carry is (state, phi); pad_state/crop_state
        convert once per chunk."""
        return True

    def pad_state(self, state):
        f0, f1 = state
        return (f0, f1), self.rho_kernel(f1)

    def crop_state(self, carry):
        return tuple(carry[0])

    def run_steps(self, state, n, it0=0):
        carry = self.pad_state(state)
        carry = jax.lax.fori_loop(
            0, n, lambda i, sc: self.step(sc, it0 + i), carry)
        return self.crop_state(carry)


class PallasStepSCMulti2D:
    """Fused stepping for ShanChenMultiStepBuilder scenes (2D, single
    device, periodic/bounce-back boundaries)."""

    def __init__(self, mbuilder, domain_shape, interpret=False):
        from sailfish_tpu.ops.multigrid import ShanChenMultiStepBuilder
        if not isinstance(mbuilder, ShanChenMultiStepBuilder):
            raise NotImplementedError(
                'fused multi-component stepping covers Shan-Chen '
                'mixtures only (free energy uses the XLA engine)')
        self.mbuilder = mbuilder
        Ys, Xs = domain_shape
        self.shape = domain_shape
        b0 = mbuilder.b0
        mask_np, patch_rows = classify_nodes(b0.maps)
        if patch_rows:
            raise NotImplementedError(
                'multi-component fused kernel covers walls/obstacles '
                'only; complex-BC scenes use the XLA engine')
        for c in mbuilder.components:
            if c.model != 'bgk' or c.smagorinsky or c.sc_coupling:
                raise NotImplementedError(
                    'multi-component fused kernel is BGK-only')
        # a smaller block keeps K cached component sets within VMEM
        check_plane_tiling(Ys, Xs, interpret, dim=2)
        by = pick_block_size(mbuilder.grid.Q * len(mbuilder.components),
                             Ys, Xs)
        self.by = by
        self.has_mask = bool((mask_np != 0).any())
        self.mask = jnp.asarray(mask_np) if self.has_mask else None
        self.K = len(mbuilder.components)
        self.kernel = make_kernel_2d_sc_multi(
            mbuilder, Ys, Xs, by=by, has_mask=self.has_mask,
            interpret=interpret, emit_rho=True)
        self.rho_kernel = make_rho_kernel_2d(b0, Ys, Xs, by=by,
                                             interpret=interpret)

    def step(self, carry, it=0):
        """One fused step on the (fs, rhos) carry (emit-rho mode; see
        make_kernel_2d_sc_multi -- the kernel emits next step's
        densities itself instead of paying K pre-passes per step)."""
        state, rhos = carry
        by = self.by
        args = list(state)
        args += [f[:, -by:] for f in state]    # glo wrap ghosts
        args += [f[:, :by] for f in state]     # ghi wrap ghosts
        args += list(rhos)
        if self.has_mask:
            args.append(self.mask)
        out = self.kernel(*args)
        return tuple(out[:self.K]), tuple(out[self.K:])

    @property
    def padded(self):
        """The between-steps carry is (fs, rhos); pad_state/crop_state
        convert once per chunk."""
        return True

    def pad_state(self, state):
        state = tuple(state)
        return state, tuple(self.rho_kernel(f) for f in state)

    def crop_state(self, carry):
        return carry[0]

    def run_steps(self, state, n, it0=0):
        carry = self.pad_state(state)
        carry = jax.lax.fori_loop(
            0, n, lambda i, sc: self.step(sc, it0 + i), carry)
        return self.crop_state(carry)
