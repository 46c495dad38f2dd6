"""Fused stream+collide Pallas TPU kernel (2D, D2Q9-class lattices).

Same architecture as the 3D kernel (ops/pallas_step.py) adapted to 2D
tiling rules: the (Y, X) array's last two dims are both (sublane, lane)
tiled, so DMA offsets of +-1 row are not allowed. Instead the grid runs
over aligned y-blocks with a FOUR-SLOT rotating cache: the grid is
sequential, so each program DMAs only the (k+2)-nd block while computing
block k from the cached blocks (prev, cur, next); y-shifted rows
are assembled with static sublane concats across block boundaries, and
x-shifts are in-VMEM periodic rolls. HBM traffic stays at the LBM
speed-of-light ~2*Q*4 B/node/step.

Boundary handling mirrors 3D: int32 mask (0 collide / 1 reflect / 2
keep) in-kernel; y-blocks containing complex BCs are recomputed by the
XLA machinery and overlaid as block DMAs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sailfish_tpu import equilibrium as eq
from sailfish_tpu import node_type as nt
from sailfish_tpu.ops.pallas_step import check_plane_tiling, \
    classify_nodes, window_shifted, \
    _bc_patch_compute, _bc_row_values, _collide_elbm, _collide_pair, \
    _collide_prepass, \
    _ForceProxy, _moments, _sc_psi, _sc_shift_moments, force_now, \
    rt_force_eligible


def make_kernel_2d(builder, Y, X, by=32, patch_blocks=(), has_mask=False,
                   interpret=False, dyn_patches=False,
                   max_patches=0, sc=False, emit_rho=False,
                   edge_io=False, mixed=None, x_ghosts=False,
                   col_io=False, rt_force=False, kbc=()):
    """fused(f, ghost_lo, ghost_hi, mask?, patch...?) -> out,
    f of shape (Q, Y, X).

    ``x_ghosts`` (the x-sharded mode, 2D ('y','x') / ('x',) meshes):
    the x-streaming lane roll wraps within the local shard; an extra
    (Y, 128) fp32 input supplies, for each direction with c_x != 0
    (lane j = direction ``xdirs[j]``), the correct post-roll wrap
    column -- f_i of the x-neighbor at row y - c_y, with the wrapped
    y entry resolved from the diagonal neighbor by the caller
    (parallel.halo.ShardedPallasStep2D builds it with two ppermute
    hops; the reference's corner/edge partial transfers,
    subdomain_connection.py:238-449). The kernel overwrites the one
    wrapped lane (0 for c_x = +1, X-1 for c_x = -1) after each roll.
    Columns arrive pre-dequantized, so the mode composes with
    ``mixed``; excludes ``sc`` and patches (those scenes fall back).

    ``patch_blocks``: y-block indices overlaid from the XLA prologue.
    The y-wrap blocks ALWAYS come from the two (Q, by, X) ghost inputs:
    the local periodic wrap of ``f`` (single device) or the neighbor
    shards' boundary blocks, ppermute'd by the caller (sharded). They
    must be materialized copies -- the kernel updates ``f`` IN PLACE
    (out aliases input 0; in-place HBM streams ~1.8x faster than
    fresh-buffer writes on TPU), so by the time the last programs need
    the wrap rows, block 0 already holds post-collision values.
    ``dyn_patches`` selects patch blocks at run time from an int32
    (NB,) SMEM map plus a (Q, max_patches, by, X) plane input (one
    traced program serves every shard; see the 3D kernel's dynamic
    mode).

    ``emit_rho`` (requires ``sc``, excludes patches): emit next step's
    post-stream density as a second output aliased onto the rho input,
    making the per-step rho pre-pass (make_rho_kernel_2d) unnecessary
    -- the 2D counterpart of the 3D kernel's emit-rho mode (see
    pallas_step.make_kernel_3d). rho block p needs post-collision rows
    of blocks p-1..p+1, and y-block DMA offsets must stay by-aligned,
    so program p emits block p-1 whole (both out_buf slots + a 1-row
    ring carry) and the epilogue emits blocks NB-1 and 0 from a
    stashed pc block 0 / first row of block 1. The step carries
    (f, rho); emitted values are bit-identical to the pre-pass.

    ``edge_io`` (requires ``emit_rho``; the y-sharded mode): the
    wrap-block rho gathers read ghost inputs ``rglo``/``rghi`` from
    the y-neighbors, the stale local edge rows 0 / Y-1 of the rho
    array are patched at assembly time from fresh (1, X) inputs
    ``rlo``/``rhi`` (streamed in XLA by the sharded caller with the
    pre-pass kernel's exact summation order), and the wrap epilogue's
    emissions into those rows stay garbage-but-unread. Signature:
    fused(f, glo, ghi, rho, rglo, rghi, rlo, rhi[, mask]) ->
    (out, rho_next).

    ``col_io`` (requires ``x_ghosts``): the kernel RETURNS its
    post-collision boundary COLUMNS as one extra (Y, 128) fp32 output
    -- lane g*Q + q = column (0, X-1)[g] of direction q; under ``sc``
    two more groups add the inner columns (1, X-2), the cross-x
    sources of the caller's rho edge-column re-stream. Values are the
    exact stored bits (read back from the out buffer; dequantized
    under mixed). The x-sharded caller builds the next step's xcol
    input from this instead of ppermuting strided column slices of the
    state: a strided slice FEEDING A COLLECTIVE forces XLA to
    defensively copy the whole in-place-aliased array every step
    (measured 8181 -> 3624 MLUPS at 4096^2,
    benchmark/x_ghost_overhead.py layer c3; the slice alone without a
    collective consumer stays fast (c1), and an optimization_barrier
    between slice and collective does NOT break the pattern (c3b);
    with col_io the full sharded path runs at 8096 (c_sharded_1x1)).
    dyn_patches: patched blocks' column rows are DMA'd as zeros; the
    caller overwrites them from the patch planes it computed.

    ``kbc`` (in-kernel native BCs; the 2D analog of
    pallas_step.make_kernel_3d's kbc): each entry is a static spec
    ``(code, tid, orient, rho, (vx, vy), blocks, (x0, x1))``
    describing one native-BC instance (NATIVE_BC_TYPES) with spatially
    UNIFORM prescribed parameters. The full local phase chain
    (_bc_row_values) is evaluated inside the kernel on the instance's
    lane-rounded static x-window of each listed y-block and merged
    into the out buffer wherever ``mask == code`` -- BEFORE the col_io
    emission, so emitted boundary columns carry the corrected values.
    No prologue kernel, no overlay DMA, and NO orientation
    restriction: a BC column normal to x (which puts a node in every
    y-block and previously forced a full-domain prologue) costs only
    one 128-lane window of extra compute per block. Requires
    ``has_mask``; excluded for sc/ELBM/rt_force (scalars are
    trace-time constants; same reasons as the 3D mode).
    """
    g = builder.grid
    Q = g.Q
    dtype = builder.dtype
    # mixed storage (ops/mixed.py): int16 codes through the DMAs and
    # block cache, fp32 math; dequant before the x-roll (Mosaic has no
    # 16-bit rotate), requant at the out-buffer store
    sdtype = jnp.int16 if mixed is not None else dtype
    assert not (mixed is not None and sc)
    basis = g.basis  # (Q, 2) as (cx, cy)
    opp = [int(o) for o in g.opposite]
    pairs = [(i, opp[i]) for i in range(Q) if i <= opp[i]]
    assert Y % by == 0
    NB = Y // by
    patch_blocks = tuple(int(b) for b in patch_blocks)
    assert not (patch_blocks and dyn_patches)
    if emit_rho:
        assert sc and not patch_blocks and not dyn_patches
    assert not (edge_io and not emit_rho)
    # x_ghosts composes with sc (x-sharded Shan-Chen: the psi wrap
    # lanes read raw-rho neighbor columns, see rxcol below) and with
    # dyn_patches (the patch planes are computed globally by the
    # sharded caller, so cross-seam samples are already resolved);
    # static patch_blocks is the single-device path and never x-shards
    assert not (x_ghosts and patch_blocks)
    assert not (x_ghosts and sc and not emit_rho)
    assert not (x_ghosts and sc and dyn_patches)
    assert not (col_io and not x_ghosts)
    # col_io + sc emits the f boundary AND inner columns (lane groups
    # 2/3 = x=1/X-2: the rho edge-column re-stream's cross-x sources);
    # the rho boundary columns themselves need no emission -- the
    # sharded caller carries the fresh c0/cX edge-column streams it
    # already computes every step
    assert not col_io or (4 if sc else 2) * Q <= 128
    kbc = tuple(kbc)
    if kbc:
        assert has_mask, 'in-kernel BCs are addressed via mask codes'
        assert not sc and builder.model != 'elbm'
        assert not rt_force
    xdirs = [i for i in range(Q) if int(basis[i][0]) != 0]

    if NB < 4:
        raise NotImplementedError(
            f'2D fused kernel needs >= 4 y-blocks (Y={Y}, by={by})')

    def kernel(*refs):
        idx = 0
        f_hbm = refs[idx]; idx += 1
        glo_hbm = refs[idx]; idx += 1
        ghi_hbm = refs[idx]; idx += 1
        xcol_hbm = None
        if x_ghosts:
            xcol_hbm = refs[idx]; idx += 1   # (Y, 128) fp32 columns
        rho_hbm = None
        rglo_hbm = rghi_hbm = rlo_hbm = rhi_hbm = None
        rxcol_hbm = None
        if sc:
            rho_hbm = refs[idx]; idx += 1
            if edge_io:
                rglo_hbm = refs[idx]; idx += 1
                rghi_hbm = refs[idx]; idx += 1
                rlo_hbm = refs[idx]; idx += 1
                rhi_hbm = refs[idx]; idx += 1
            if x_ghosts:
                # (Y, 128) fp32 raw-rho neighbor columns for the psi
                # wrap lanes: lane 3*side + (dy+1), side 0 = the
                # right-neighbor's column 0 (samples at x + 1), side 1
                # = the left-neighbor's column X-1 (x - 1); the value
                # at row y is the neighbor column at global row y + dy
                # (the caller resolves cross-shard rows). RAW rho, psi
                # applied in-kernel, so the substituted lane is
                # bitwise the single-device psi value.
                rxcol_hbm = refs[idx]; idx += 1
        mask_hbm = None
        patch_hbm = None
        pmap_ref = None
        if has_mask:
            mask_hbm = refs[idx]; idx += 1
        if patch_blocks:
            patch_hbm = refs[idx]; idx += 1
        if dyn_patches:
            pmap_ref = refs[idx]; idx += 1
            patch_hbm = refs[idx]; idx += 1
        cb = builder
        if rt_force:
            force_ref = refs[idx]; idx += 1   # SMEM (2,) force(t)
            cb = _ForceProxy(builder, (force_ref[0], force_ref[1]))
        out_hbm = refs[idx]; idx += 1
        rho_out_hbm = None
        if emit_rho:
            rho_out_hbm = refs[idx]; idx += 1
        colx_out = None
        if col_io:
            colx_out = refs[idx]; idx += 1  # (Y, 128) fp32
        blk_buf = refs[idx]; idx += 1     # (4, Q, by, X) rotating cache
        out_buf = refs[idx]; idx += 1     # (2, Q, by, X)
        xcol_buf = None
        rxcol_buf = None
        colx_st = None
        if x_ghosts:
            xcol_buf = refs[idx]; idx += 1  # (2, by, 128)
            if sc:
                rxcol_buf = refs[idx]; idx += 1  # (2, by, 128)
        if col_io:
            colx_st = refs[idx]; idx += 1   # (2, by, 128)
        mask_buf = None
        if has_mask:
            mask_buf = refs[idx]; idx += 1  # (4, 1, by, X)
        rho_buf = None
        if sc:
            rho_buf = refs[idx]; idx += 1   # (4, 1, by, X)
        ring_row = stash_blk = stash_row1 = remit_buf = None
        if emit_rho:
            ring_row = refs[idx]; idx += 1    # (Q, 1, X) pc last row b-2
            stash_blk = refs[idx]; idx += 1   # (Q, by, X) pc block 0
            stash_row1 = refs[idx]; idx += 1  # (Q, 1, X) pc row of blk 1
            remit_buf = refs[idx]; idx += 1   # (2, by, X)
        redge_buf = None
        if edge_io:
            redge_buf = refs[idx]; idx += 1   # (2, 1, X) rlo/rhi
        in_sems = refs[idx]; idx += 1      # DMA (4, Q+2)
        out_sems = refs[idx]; idx += 1     # DMA (2,)
        remit_sems = None
        if emit_rho:
            remit_sems = refs[idx]; idx += 1  # DMA (2,)
        redge_sems = None
        if edge_io:
            redge_sems = refs[idx]; idx += 1  # DMA (2,)
        xcol_sems = None
        rxcol_sems = None
        colx_sems = None
        if x_ghosts:
            xcol_sems = refs[idx]; idx += 1   # DMA (2,)
            if sc:
                rxcol_sems = refs[idx]; idx += 1  # DMA (2,)
        if col_io:
            colx_sems = refs[idx]; idx += 1   # DMA (2,)

        k = pl.program_id(0)

        def start_block(b, slot, src=None, rsrc=None):
            """DMA block (b mod NB) into cache slot ``slot``; b may be -1
            (the wrap-below block) or NB (the wrap-above block). With
            ``src`` set, the (Q, by, X) ghost input is loaded instead
            (sharded wrap). All Q dists read the SAME y-range (shifts
            are assembled in VMEM), so the whole set moves as ONE
            strided DMA -- per-dist copies are DMA-issue-bound, not
            bandwidth-bound."""
            bm = jax.lax.rem(b + NB, NB)
            if src is not None:
                pltpu.make_async_copy(
                    src, blk_buf.at[slot], in_sems.at[slot, 0]).start()
            else:
                pltpu.make_async_copy(
                    f_hbm.at[:, pl.ds(bm * by, by)],
                    blk_buf.at[slot], in_sems.at[slot, 0]).start()
            if has_mask:
                pltpu.make_async_copy(
                    mask_hbm.at[pl.ds(bm * by, by)],
                    mask_buf.at[slot, 0], in_sems.at[slot, 1]).start()
            if sc:
                if rsrc is not None:
                    rs = rsrc
                else:
                    rs = rho_hbm.at[pl.ds(bm * by, by)]
                pltpu.make_async_copy(
                    rs, rho_buf.at[slot, 0],
                    in_sems.at[slot, 2]).start()

        def wait_block(slot):
            pltpu.make_async_copy(f_hbm.at[:, pl.ds(0, by)],
                                  blk_buf.at[slot],
                                  in_sems.at[slot, 0]).wait()
            if has_mask:
                pltpu.make_async_copy(mask_hbm.at[pl.ds(0, by)],
                                      mask_buf.at[slot, 0],
                                      in_sems.at[slot, 1]).wait()
            if sc:
                pltpu.make_async_copy(rho_hbm.at[pl.ds(0, by)],
                                      rho_buf.at[slot, 0],
                                      in_sems.at[slot, 2]).wait()

        def wait_out(oslot):
            pltpu.make_async_copy(out_buf.at[oslot],
                                  out_hbm.at[:, pl.ds(0, by)],
                                  out_sems.at[oslot]).wait()

        def start_xcol(b, slot):
            pltpu.make_async_copy(
                xcol_hbm.at[pl.ds(b * by, by)],
                xcol_buf.at[slot], xcol_sems.at[slot]).start()
            if sc:
                pltpu.make_async_copy(
                    rxcol_hbm.at[pl.ds(b * by, by)],
                    rxcol_buf.at[slot], rxcol_sems.at[slot]).start()

        def wait_xcol(slot):
            pltpu.make_async_copy(
                xcol_hbm.at[pl.ds(0, by)],
                xcol_buf.at[slot], xcol_sems.at[slot]).wait()
            if sc:
                pltpu.make_async_copy(
                    rxcol_hbm.at[pl.ds(0, by)],
                    rxcol_buf.at[slot], rxcol_sems.at[slot]).wait()

        # slot(b) = (b + 4) % 4 in program-relative block coordinates;
        # program k consumes blocks k-1, k, k+1 and prefetches k+2 into
        # slot (k+2) % 4 = (k-2) % 4, whose block was consumed at k-1.
        s_prev = jax.lax.rem(k - 1 + 4 * NB, 4)
        s_cur = jax.lax.rem(k, 4)
        s_next = jax.lax.rem(k + 1, 4)
        s_pref = jax.lax.rem(k + 2, 4)
        oslot = jax.lax.rem(k, 2)

        # warmup: program 0 loads blocks -1 (the ghost-below input),
        # 0, 1
        @pl.when(k == 0)
        def _():
            start_block(-1, jnp.int32(3), src=glo_hbm,
                        rsrc=rglo_hbm if edge_io else None)
            start_block(0, jnp.int32(0))
            start_block(1, jnp.int32(1))
            if x_ghosts:
                start_xcol(0, jnp.int32(0))
            if edge_io:
                # fresh local edge rows, persistent for the whole grid
                c0 = pltpu.make_async_copy(rlo_hbm, redge_buf.at[0],
                                           redge_sems.at[0])
                c1 = pltpu.make_async_copy(rhi_hbm, redge_buf.at[1],
                                           redge_sems.at[1])
                c0.start()
                c1.start()
                c0.wait()
                c1.wait()
            wait_block(jnp.int32(3))
            wait_block(jnp.int32(0))

        # steady prefetch of block k+2 (b == NB means the ghost-above
        # input -- reading the wrap from f_hbm would race the in-place
        # write of block 0 by program 0)
        @pl.when(k + 2 < NB)
        def _():
            start_block(k + 2, s_pref)

        @pl.when(k + 2 == NB)
        def _():
            start_block(k + 2, s_pref, src=ghi_hbm,
                        rsrc=rghi_hbm if edge_io else None)

        if x_ghosts:
            # ghost-column blocks ride a 2-slot pipeline of their own:
            # program k prefetches block k+1 into the slot program k-1
            # finished reading (the grid is sequential), and waits on
            # its own slot before assembling planes
            @pl.when(k + 1 < NB)
            def _():
                start_xcol(k + 1, jax.lax.rem(k + 1, 2))

        # block k+1 was started by program k-1 (or warmup)
        wait_block(s_next)

        def row_shifted(i, cy):
            """(by, X) rows of dist i shifted so the pull source is
            y - cy, assembled from the cached blocks."""
            cur = blk_buf[s_cur, i]
            if cy == 0:
                return cur
            if cy == 1:
                prev = blk_buf[s_prev, i]
                return jnp.concatenate([prev[by - 1:by], cur[:by - 1]],
                                       axis=0)
            nxt = blk_buf[s_next, i]
            return jnp.concatenate([cur[1:], nxt[0:1]], axis=0)

        # drain this out slot's previous write (program k-2)
        drains = k >= 2
        if patch_blocks:
            prev2_patch = None
            for b in patch_blocks:
                cond = k - 2 == b
                prev2_patch = cond if prev2_patch is None else \
                    (prev2_patch | cond)
            drains = drains & jnp.logical_not(prev2_patch)
        if dyn_patches:
            drains = drains & (pmap_ref[jnp.maximum(k - 2, 0)] < 0)

        @pl.when(drains)
        def _():
            wait_out(oslot)

        # wait the ghost-column slot OUTSIDE the patch branch: patch
        # programs consume no columns but must keep the start/wait
        # pairing of the 2-slot pipeline aligned
        xblk = None
        if x_ghosts:
            wait_xcol(jax.lax.rem(k, 2))
            xblk = xcol_buf[jax.lax.rem(k, 2)]       # (by, 128) fp32

        if col_io:
            def col_copy(s, blk_expr):
                return pltpu.make_async_copy(
                    colx_st.at[s],
                    colx_out.at[pl.ds(blk_expr * by, by)],
                    colx_sems.at[s])

            # recycle: the DMA that read this staging slot two blocks
            # ago must have drained before this block's store
            @pl.when(k >= 2)
            def _():
                col_copy(oslot, k - 2).wait()

            col_lane_iota = jax.lax.broadcasted_iota(
                jnp.int32, (by, 128), 1)

            # sc consumers re-stream the emitted rho's edge columns
            # in XLA and need the INNER columns (x = 1, X-2) of the
            # post-collision state too (the cross-x stream sources);
            # emit them as extra lane groups so nothing ever
            # column-slices the aliased output
            col_xs = ((0, 0), (1, X - 1))
            if sc:
                col_xs += ((2, 1), (3, X - 2))

            def emit_cols(out_ref):
                """Stage the post-collision boundary columns of this
                block: lane g*Q + i = column col_xs[g][1] of direction
                i. Values are READ BACK from the stored out-buffer
                slot (not the live collide expressions): XLA/Mosaic
                may recompute a sliced expression with different FMA
                contraction (measured 1-ulp drift on CPU interpret),
                and the consumer must see the exact stored bits
                (dequantized under mixed)."""
                acc = jnp.zeros((by, 128), dtype)
                for grp, c in col_xs:
                    for i in range(Q):
                        v = out_ref[i, :, c:c + 1]
                        if mixed is not None:
                            v = mixed.dequant_i(i, v)
                        acc = jnp.where(col_lane_iota == grp * Q + i,
                                        jnp.broadcast_to(v, (by, 128)),
                                        acc)
                colx_st[oslot] = acc
                col_copy(oslot, k).start()

        def normal_body():
            fs = []
            for i in range(Q):
                cx, cy = int(basis[i][0]), int(basis[i][1])
                plane = row_shifted(i, cy)
                if mixed is not None:
                    plane = mixed.dequant_i(i, plane)
                if cx:
                    if x_ghosts:
                        # static lane concat with the neighbor column
                        # standing in for the wrapped lane (replaces
                        # roll + select; same shift cost, no masking)
                        col = xblk[:, xdirs.index(i):xdirs.index(i) + 1]
                        if cx == 1:
                            plane = jnp.concatenate(
                                [col, plane[:, :X - 1]], axis=1)
                        else:
                            plane = jnp.concatenate(
                                [plane[:, 1:], col], axis=1)
                    else:
                        plane = pltpu.roll(plane, cx % X, axis=1)
                fs.append(plane)
            mom_u = _moments(cb, fs)
            if sc:
                def rho_cur():
                    cur = rho_buf[s_cur, 0]
                    if not edge_io:
                        return cur
                    # the stale local edge rows (the emission cannot
                    # produce them on a shard) read the fresh rlo/rhi
                    # inputs instead
                    row0 = jnp.where(k == 0, redge_buf[0], cur[0:1])
                    rowT = jnp.where(k == NB - 1, redge_buf[1],
                                     cur[by - 1:by])
                    return jnp.concatenate(
                        [row0, cur[1:by - 1], rowT], axis=0)

                def psi_of(dy):
                    cur = rho_cur()
                    if dy == 0:
                        r = cur
                    elif dy == 1:
                        nxt = rho_buf[s_next, 0]
                        r = jnp.concatenate([cur[1:], nxt[0:1]], axis=0)
                    else:
                        prev = rho_buf[s_prev, 0]
                        r = jnp.concatenate([prev[by - 1:by],
                                             cur[:by - 1]], axis=0)
                    return _sc_psi(builder, r)

                x_fix = None
                if x_ghosts:
                    rxblk = rxcol_buf[jax.lax.rem(k, 2)]  # (by, 128)

                    def x_fix(p, cxx, cyy):
                        """Shift psi lanes for a sample at x + cxx,
                        the wrap lane standing in from the neighbor's
                        raw-rho column (static lane concat, like the
                        f path above)."""
                        lane = (0 if cxx == 1 else 1) * 3 + (cyy + 1)
                        col = _sc_psi(builder,
                                      rxblk[:, lane:lane + 1])
                        if cxx == 1:
                            return jnp.concatenate(
                                [p[:, 1:], col], axis=1)
                        return jnp.concatenate(
                            [col, p[:, :X - 1]], axis=1)

                mom_u = _sc_shift_moments(cb, mom_u, psi_of,
                                          (by, X), x_fix=x_fix)
            if has_mask:
                m = mask_buf[s_cur, 0]
                is_dry = m == 1
                is_keep = m == 2

            if builder.model == 'elbm':
                # overlaid blocks' collide results are discarded, but a
                # garbage lane there can 2-cycle in the Newton solve
                # and hold the whole block's loop at the iteration cap
                patched = None
                for b in patch_blocks:
                    c = k == b
                    patched = c if patched is None else patched | c
                if dyn_patches:
                    patched = pmap_ref[k] >= 0
                skip = (m != 0) if has_mask else None
                if patched is not None:
                    skip = patched if skip is None else (skip | patched)
                fpost = _collide_elbm(cb, fs, mom_u, skip=skip)
                for i in range(Q):
                    vi = fpost[i]
                    if has_mask:
                        vi = jnp.where(is_dry, fs[opp[i]],
                                       jnp.where(is_keep, fs[i], vi))
                    if mixed is not None:
                        vi = mixed.quant_i(i, vi)
                    out_buf[oslot, i] = vi
                if col_io:
                    emit_cols(out_buf.at[oslot])
                pltpu.make_async_copy(out_buf.at[oslot],
                                      out_hbm.at[:, pl.ds(k * by, by)],
                                      out_sems.at[oslot]).start()
                return

            extra = _collide_prepass(cb, fs, mom_u)
            for i, o in pairs:
                fo = fs[o] if o != i else None
                vi, vo = _collide_pair(cb, fs[i], fo, mom_u, i, o,
                                       extra)
                if o == i:
                    if has_mask:
                        vi = jnp.where(is_dry | is_keep, fs[i], vi)
                    if mixed is not None:
                        vi = mixed.quant_i(i, vi)
                    out_buf[oslot, i] = vi
                    continue
                if has_mask:
                    vi2 = jnp.where(is_dry, fs[o],
                                    jnp.where(is_keep, fs[i], vi))
                    vo = jnp.where(is_dry, fs[i],
                                   jnp.where(is_keep, fs[o], vo))
                    vi = vi2
                if mixed is not None:
                    vi = mixed.quant_i(i, vi)
                    vo = mixed.quant_i(o, vo)
                out_buf[oslot, i] = vi
                out_buf[oslot, o] = vo
            if kbc:
                # in-kernel native BCs: evaluate the full local phase
                # chain on each instance's static lane window (the
                # post-stream values fs were captured above) for the
                # blocks in its static set, merging by mask code into
                # the stored block BEFORE the col_io emission
                for code, tid, ko, rho_s, vel_s, blocks, (wx0, wx1) \
                        in kbc:
                    pred = None
                    if len(blocks) < NB:
                        for bb in blocks:
                            c = k == bb
                            pred = c if pred is None else pred | c

                    def apply_inst(code=code, tid=tid, ko=ko,
                                   rho_s=rho_s, vel_s=vel_s,
                                   wx0=wx0, wx1=wx1):
                        mw = m[:, wx0:wx1]
                        sel = mw == code
                        mrow = jnp.where(sel, 3, 0)
                        fsw = [fs[i][:, wx0:wx1] for i in range(Q)]
                        vals = _bc_row_values(cb, [(tid, ko)], fsw,
                                              mrow,
                                              [rho_s] + list(vel_s))
                        for i in range(Q):
                            vi = vals[i]
                            if mixed is not None:
                                vi = mixed.quant_i(i, vi)
                            cur = out_buf[oslot, i, :, wx0:wx1]
                            out_buf[oslot, i, :, wx0:wx1] = \
                                jnp.where(sel, vi, cur)

                    if pred is None:
                        apply_inst()
                    else:
                        pl.when(pred)(apply_inst)
            if col_io:
                emit_cols(out_buf.at[oslot])
            pltpu.make_async_copy(out_buf.at[oslot],
                                  out_hbm.at[:, pl.ds(k * by, by)],
                                  out_sems.at[oslot]).start()

        def patch_body():
            if col_io:
                # deterministic filler; the sharded caller overwrites
                # patched blocks' column rows from the patch planes
                colx_st[oslot] = jnp.zeros((by, 128), dtype)
                col_copy(oslot, k).start()
            if dyn_patches:
                j = jnp.maximum(pmap_ref[k], 0)
                c = pltpu.make_async_copy(
                    patch_hbm.at[:, j],
                    out_hbm.at[:, pl.ds(k * by, by)],
                    out_sems.at[oslot])
                c.start()
                c.wait()
                return
            for j, b in enumerate(patch_blocks):
                @pl.when(k == b)
                def _(j=j):
                    c = pltpu.make_async_copy(
                        patch_hbm.at[:, j],
                        out_hbm.at[:, pl.ds(k * by, by)],
                        out_sems.at[oslot])
                    c.start()
                    c.wait()

        is_patch = None
        for b in patch_blocks:
            cond = k == b
            is_patch = cond if is_patch is None else (is_patch | cond)
        if dyn_patches:
            is_patch = pmap_ref[k] >= 0

        if patch_blocks or dyn_patches:
            @pl.when(is_patch)
            def _():
                patch_body()

            @pl.when(jnp.logical_not(is_patch))
            def _():
                normal_body()
        else:
            normal_body()

        # -- emit-rho: next step's post-stream density from the
        # post-collision blocks in VMEM (see docstring) ----------------
        if emit_rho:
            o_prev = jax.lax.rem(k + 1, 2)

            def emitted_rho_block(prev_row, blk, next_row):
                """Streamed density over one y-block; row assembly,
                roll and summation order identical to
                make_rho_kernel_2d for bit-equality. prev_row/next_row:
                fn(i) -> the pc row below/above the block."""
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
                    rho_out_hbm.at[pl.ds(blk_expr * by, by)],
                    remit_sems.at[s])

            # regular emission: block k-1 whole (k >= 2; block 0 needs
            # the wrap row Y-1 and waits for the epilogue)
            @pl.when(k >= 2)
            def _():
                @pl.when(k >= 4)
                def _():
                    # drain this staging slot's previous emission
                    remit_copy(oslot, k - 3).wait()
                remit_buf[oslot] = emitted_rho_block(
                    lambda i: ring_row[i],
                    lambda i: out_buf[o_prev, i],
                    lambda i: out_buf[oslot, i, 0:1])
                remit_copy(oslot, k - 1).start()

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
                # drain the outstanding regular emissions
                remit_copy(oslot, k - 1).wait()
                remit_copy(o_prev, k - 2).wait()
                # block NB-1: its top row wraps to pc row 0
                remit_buf[oslot] = emitted_rho_block(
                    lambda i: out_buf[o_prev, i, by - 1:by],
                    lambda i: out_buf[oslot, i],
                    lambda i: stash_blk[i, 0:1])
                c = remit_copy(oslot, NB - 1)
                c.start()
                c.wait()
                # block 0: its bottom row wraps to pc row Y-1
                remit_buf[oslot] = emitted_rho_block(
                    lambda i: out_buf[oslot, i, by - 1:by],
                    lambda i: stash_blk[i],
                    lambda i: stash_row1[i])
                c = remit_copy(oslot, 0)
                c.start()
                c.wait()

        # epilogue: drain the last two writes
        if dyn_patches:
            @pl.when(k == NB - 1)
            def _():
                @pl.when(pmap_ref[NB - 1] < 0)
                def _():
                    wait_out(oslot)

                @pl.when(pmap_ref[NB - 2] < 0)
                def _():
                    wait_out(jax.lax.rem(k + 1, 2))
        else:
            @pl.when(k == NB - 1)
            def _():
                if (NB - 1) not in patch_blocks:
                    wait_out(oslot)
                if (NB - 2) not in patch_blocks:
                    wait_out(jax.lax.rem(k + 1, 2))
        if col_io:
            @pl.when(k == NB - 1)
            def _():
                # drain the outstanding column emissions (every block
                # DMAs one, patched or not)
                col_copy(oslot, NB - 1).wait()
                col_copy(jax.lax.rem(k + 1, 2), NB - 2).wait()

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    if x_ghosts:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if sc:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * (
            5 if edge_io else 1)
        if x_ghosts:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    scratch = [
        pltpu.VMEM((4, Q, by, X), sdtype),
        pltpu.VMEM((2, Q, by, X), sdtype),
    ]
    if x_ghosts:
        scratch.append(pltpu.VMEM((2, by, 128), dtype))
        if sc:
            scratch.append(pltpu.VMEM((2, by, 128), dtype))
    if col_io:
        scratch.append(pltpu.VMEM((2, by, 128), dtype))     # colx_st
    if has_mask:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((4, 1, by, X), jnp.int32))
    if sc:
        scratch.append(pltpu.VMEM((4, 1, by, X), dtype))
    if emit_rho:
        scratch.append(pltpu.VMEM((Q, 1, X), dtype))    # ring_row
        scratch.append(pltpu.VMEM((Q, by, X), dtype))   # stash_blk
        scratch.append(pltpu.VMEM((Q, 1, X), dtype))    # stash_row1
        scratch.append(pltpu.VMEM((2, by, X), dtype))   # remit
    if edge_io:
        scratch.append(pltpu.VMEM((2, 1, X), dtype))    # redge
    if patch_blocks:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if dyn_patches:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    if rt_force:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    scratch.append(pltpu.SemaphoreType.DMA((4, 3)))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    if emit_rho:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))   # remit
    if edge_io:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))   # redge
    if x_ghosts:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))   # xcol
        if sc:
            scratch.append(pltpu.SemaphoreType.DMA((2,)))  # rxcol
    if col_io:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))   # colx

    out_shape = jax.ShapeDtypeStruct((Q, Y, X), sdtype)
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    # in-place update (see the 3D kernel for the measurement); the
    # kernel never reads out_hbm and each block's single HBM read
    # (its prefetch) completes a full program before its write, so
    # aliasing needs no extra in-kernel ordering
    io_aliases = {0: 0}
    if emit_rho:
        out_shape = [out_shape, jax.ShapeDtypeStruct((Y, X), dtype)]
        out_specs = [out_specs, pl.BlockSpec(memory_space=pl.ANY)]
        # rho updates in place too: program p writes block p-1, whose
        # last gather (as some program's "prev" block) landed at p-1
        # (the rho input sits after f/glo/ghi and, when x-sharded,
        # the xcol input)
        io_aliases[4 if x_ghosts else 3] = 1
    if col_io:
        col_out = jax.ShapeDtypeStruct((Y, 128), dtype)
        if isinstance(out_shape, list):
            out_shape = out_shape + [col_out]
            out_specs = out_specs + [pl.BlockSpec(memory_space=pl.ANY)]
        else:
            out_shape = [out_shape, col_out]
            out_specs = [out_specs, pl.BlockSpec(memory_space=pl.ANY)]
    # scoped-VMEM request (the 3D kernel's pattern): the limit is only
    # a gate, so size it from the buffers plus a generous compute
    # margin. This keeps explicit by > 16 compilable at wide X; the
    # DEFAULT pick_block_size choices measure fastest as-is (by sweep
    # at 4096^2: by=8 8564, by=16 8511, by=32 8361, by=64 8384 MLUPS),
    # so the deeper pipeline beats bigger blocks and defaults stand.
    sbytes = 2 if mixed is not None else 4
    vmem_need = 6 * Q * by * X * sbytes          # blk_buf(4) + out(2)
    if has_mask:
        vmem_need += 4 * by * X * 4
    if sc:
        vmem_need += 4 * by * X * 4
    if emit_rho:
        vmem_need += (2 * Q + 2) * X * 4 + Q * by * X * 4 \
            + 2 * by * X * 4
    for _c, _t, _o, _r, _v, _b, (_x0, _x1) in kbc:
        # in-kernel BC temporaries: the window's Q-direction phase
        # chain lives alongside the block during the merge
        vmem_need += 2 * Q * by * (_x1 - _x0) * 4
    margin = 8 * 2 ** 20 + 2 * Q * by * X * 4
    vmem_limit = min(max(16 * 2 ** 20, vmem_need + margin),
                     100 * 2 ** 20)
    fused = pl.pallas_call(
        kernel,
        grid=(NB,),
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


def make_bc_patch_kernel_2d(builder, Y, X, by, blocks, bc_instances,
                            interpret=False, mixed=None):
    """Pallas patch-block prologue for native-BC blocks (the 2D
    counterpart of pallas_step.make_bc_patch_kernel_3d): one program
    per block gathers the block plus its two periodic wrap rows from
    the PRE-step state, runs the full phase chain -- fluid pairwise
    collide, local-BC solves, dry/keep handling -- and emits the
    (Q, R, by, X) post-collision patch blocks for the main kernel's
    existing overlay path.

    The wrap rows sit at arbitrary y offsets, but sublane-dim DMA
    offsets must be 8-aligned (Mosaic tiling): each wrap row is
    fetched as its aligned 8-row sliver and the row is selected with a
    STATIC in-sliver index -- the block list is trace-time static, so
    the whole body is specialized per block under pl.when(r == t).
    Requires Y %% 8 == 0 (the caller gates).

    Signature: bc(f, mask_blocks, bcp) -> patches (Q, R, by, X)."""
    g = builder.grid
    Q = g.Q
    dtype = builder.dtype
    sdtype = jnp.int16 if mixed is not None else dtype
    # int16 tiles are (16, 128): the aligned wrap-row slivers must be
    # 16-row under mixed storage
    sub_t = 16 if mixed is not None else 8
    basis = g.basis
    blocks = tuple(int(b) for b in blocks)
    R = len(blocks)
    assert Y % sub_t == 0, Y

    def kernel(f_hbm, mask_hbm, bcp_hbm, out_hbm,
               src_buf, lo_buf, hi_buf, mask_buf, bcp_buf, sems):
        r = pl.program_id(0)

        def do_block(t, blk):
            y0 = blk * by
            ylo = (y0 - 1) % Y
            yhi = (y0 + by) % Y
            lo_base, lo_off = (ylo // sub_t) * sub_t, ylo % sub_t
            hi_base, hi_off = (yhi // sub_t) * sub_t, yhi % sub_t
            c0 = pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(lo_base, sub_t)], lo_buf, sems.at[0])
            c1 = pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(y0, by)], src_buf, sems.at[0])
            c2 = pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(hi_base, sub_t)], hi_buf, sems.at[0])
            cm = pltpu.make_async_copy(mask_hbm.at[t], mask_buf,
                                       sems.at[1])
            cp = pltpu.make_async_copy(bcp_hbm.at[:, t], bcp_buf,
                                       sems.at[2])
            c0.start(); c1.start(); c2.start(); cm.start(); cp.start()
            c0.wait(); c1.wait(); c2.wait(); cm.wait(); cp.wait()

            # post-stream rows: pull source y - cy, then the x roll
            fsl = []
            for i in range(Q):
                cx, cy = int(basis[i][0]), int(basis[i][1])
                if cy == 1:
                    p = jnp.concatenate(
                        [lo_buf[i, lo_off:lo_off + 1],
                         src_buf[i, :by - 1]], axis=0)
                elif cy == -1:
                    p = jnp.concatenate(
                        [src_buf[i, 1:],
                         hi_buf[i, hi_off:hi_off + 1]], axis=0)
                else:
                    p = src_buf[i]
                if mixed is not None:
                    # dequant BEFORE the roll (no 16-bit rotate)
                    p = mixed.dequant_i(i, p)
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
                src_buf[i] = vi
            co = pltpu.make_async_copy(src_buf, out_hbm.at[:, t],
                                       sems.at[0])
            co.start()
            co.wait()

        for t, blk in enumerate(blocks):
            @pl.when(r == t)
            def _(t=t, blk=blk):
                do_block(t, blk)

    vmem_need = (3 * Q + 5) * (by + 16) * X * 4
    return pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, R, by, X), sdtype),
        scratch_shapes=[pltpu.VMEM((Q, by, X), sdtype),
                        pltpu.VMEM((Q, sub_t, X), sdtype),
                        pltpu.VMEM((Q, sub_t, X), sdtype),
                        pltpu.VMEM((by, X), jnp.int32),
                        pltpu.VMEM((3, by, X), dtype),
                        pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(max(16 * 2 ** 20,
                                     vmem_need + 8 * 2 ** 20),
                                 100 * 2 ** 20)),
        interpret=interpret,
    )



def kbc_instance_spec_2d(builder, idx, tid, ko, sel, by):
    """In-kernel native-BC raw spec for classify instance ``idx``
    (mask code 3+idx) on a 2D domain: ``(code, tid, ko, rho,
    (vx, vy), yrows, (xmin, xmax+1))`` with GLOBAL unrounded x bounds
    -- or None when the instance cannot run in-kernel (spatially
    varying prescribed parameters, which would need per-node parameter
    planes, or a bounding window so large the windowed re-evaluation
    would rival the whole domain's collide). The 2D counterpart of
    pallas_step.kbc_instance_spec."""
    m = builder.maps
    cls = nt.get_node_type(tid)
    rho_s, vel_s = 1.0, (0.0, 0.0)
    if 'velocity' in cls.param_names:
        vs = []
        for a in range(m.param_vel.shape[0]):
            u = np.unique(m.param_vel[a][sel])
            if u.size > 1:
                return None
            vs.append(float(u[0]) if u.size else 0.0)
        vel_s = tuple(vs) + (0.0,) * (2 - len(vs))
    else:
        u = np.unique(m.param_rho[sel])
        if u.size > 1:
            return None
        rho_s = float(u[0]) if u.size else 1.0
    ys, xs = (np.unique(ix) for ix in np.nonzero(sel))
    # evaluation cost ~ blocks-touched x by x lane-rounded x-extent
    vol = (len({int(y) // by for y in ys}) * by
           * min(-(-(int(xs[-1]) + 1 - int(xs[0])) // 128) * 128,
                 sel.shape[1]))
    if vol > 0.5 * sel.size:
        return None
    return (3 + idx, tid, ko, rho_s, vel_s,
            tuple(int(y) for y in ys),
            (int(xs[0]), int(xs[-1]) + 1))


def kbc_round_blocks_2d(raw, by, Xs, y_local=None):
    """Finish raw 2D kbc specs into kernel specs: y-block sets in units
    of ``by`` (mapped into local coordinates when ``y_local`` is the
    per-shard extent -- the UNION over shards, each shard's mask gating
    actual application) and lane-rounded x windows clamped to the
    (padded) row extent."""
    out = []
    for code, tid, ko, rho_s, vel_s, yrows, xbox in raw:
        if y_local is not None:
            blocks = sorted({(y % y_local) // by for y in yrows})
        else:
            blocks = sorted({y // by for y in yrows})
        out.append((code, tid, ko, rho_s, vel_s, tuple(blocks),
                    (xbox[0] // 128 * 128,
                     min(-(-xbox[1] // 128) * 128, Xs))))
    return tuple(out)


def make_rho_kernel_2d(builder, Y, X, by=32, interpret=False):
    """Post-stream density pre-pass (2D): rho(x) = sum_i f_i(x - c_i),
    via the same rotating y-block cache as the main kernel but with a
    single rho block as output (the 2D counterpart of
    pallas_step.make_rho_kernel_3d)."""
    g = builder.grid
    Q = g.Q
    dtype = builder.dtype
    basis = g.basis
    assert Y % by == 0
    NB = Y // by

    def kernel(f_hbm, out_hbm, blk_buf, out_buf, in_sems, out_sems):
        k = pl.program_id(0)

        def start_block(b, slot):
            bm = jax.lax.rem(b + NB, NB)
            pltpu.make_async_copy(
                f_hbm.at[:, pl.ds(bm * by, by)],
                blk_buf.at[slot], in_sems.at[slot, 0]).start()

        def wait_block(slot):
            pltpu.make_async_copy(f_hbm.at[:, pl.ds(0, by)],
                                  blk_buf.at[slot],
                                  in_sems.at[slot, 0]).wait()

        def wait_out(oslot):
            pltpu.make_async_copy(out_buf.at[oslot],
                                  out_hbm.at[pl.ds(0, by)],
                                  out_sems.at[oslot]).wait()

        s_prev = jax.lax.rem(k - 1 + 4 * NB, 4)
        s_cur = jax.lax.rem(k, 4)
        s_next = jax.lax.rem(k + 1, 4)
        s_pref = jax.lax.rem(k + 2, 4)
        oslot = jax.lax.rem(k, 2)

        @pl.when(k == 0)
        def _():
            start_block(-1, jnp.int32(3))
            start_block(0, jnp.int32(0))
            start_block(1, jnp.int32(1))
            wait_block(jnp.int32(3))
            wait_block(jnp.int32(0))

        @pl.when(k + 2 <= NB)
        def _():
            start_block(k + 2, s_pref)

        wait_block(s_next)

        @pl.when(k >= 2)
        def _():
            wait_out(oslot)

        acc = None
        for i in range(Q):
            cx, cy = int(basis[i][0]), int(basis[i][1])
            cur = blk_buf[s_cur, i]
            if cy == 0:
                plane = cur
            elif cy == 1:
                prev = blk_buf[s_prev, i]
                plane = jnp.concatenate([prev[by - 1:by], cur[:by - 1]],
                                        axis=0)
            else:
                nxt = blk_buf[s_next, i]
                plane = jnp.concatenate([cur[1:], nxt[0:1]], axis=0)
            if cx:
                plane = pltpu.roll(plane, cx % X, axis=1)
            acc = plane if acc is None else acc + plane
        out_buf[oslot] = acc
        pltpu.make_async_copy(out_buf.at[oslot],
                              out_hbm.at[pl.ds(k * by, by)],
                              out_sems.at[oslot]).start()

        @pl.when(k == NB - 1)
        def _():
            wait_out(oslot)
            wait_out(jax.lax.rem(k + 1, 2))

    return pl.pallas_call(
        kernel,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Y, X), dtype),
        scratch_shapes=[pltpu.VMEM((4, Q, by, X), dtype),
                        pltpu.VMEM((2, by, X), dtype),
                        pltpu.SemaphoreType.DMA((4, 1)),
                        pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )


def pick_block_size(Q, Y, X, min_blocks=4):
    """y-block size fitting the VMEM budget: 4 cache slots + 2 out
    slots of (Q, by, X) fp32 plus compute temporaries must stay under
    ~9 MB of the ~16 MB VMEM. Raises when Y cannot be blocked."""
    budget = 9 * 2 ** 20
    per_row = 6 * Q * X * 4
    by = 32
    while by > 8 and by * per_row > budget:
        by //= 2
    while Y % by and by >= 8:
        by //= 2
    while by > 8 and Y // by < min_blocks:
        by //= 2
    if by < 8 or Y % by or Y // by < min_blocks:
        raise NotImplementedError(
            f'Y={Y} does not give >= {min_blocks} usable y-blocks')
    return by


def compute_patch_block_2d(g, sub, f, box, by, X, it=0, mixed=None):
    """Exact XLA recompute of one patched y-block -> (Q, by, X).
    ``mixed``: the state holds int16 codes; windows are dequantized
    (the caller requantizes the returned block)."""
    def axes_shift(vec):
        return (int(vec[1]), int(vec[0]))

    def dq(x):
        return x if mixed is None else mixed.dequant(x)

    f_box = dq(f[(slice(None),) + box].reshape(g.Q, -1))
    fs_box = dq(jnp.stack([
        window_shifted(f[i], box, axes_shift(g.basis[i]))
        .reshape(-1) for i in range(g.Q)]))

    def sampler(vec, _f=f, _box=box):
        sh = axes_shift(-np.asarray(vec))
        return dq(jnp.stack([window_shifted(_f[i], _box, sh)
                             .reshape(-1) for i in range(g.Q)]))

    fpost = sub.phases(fs_box, f_box, it, sampler)
    return fpost.reshape(g.Q, by, X)


class PallasStep2D:
    """Drop-in replacement for StepBuilder.build() (2D, single device)."""

    MAX_PATCH_FRACTION = 0.3

    def __init__(self, builder, domain_shape, by=None, interpret=False):
        self.builder = builder
        self.mixed = builder.mixed
        Ys, Xs = domain_shape
        self.shape = domain_shape
        check_plane_tiling(Ys, Xs, interpret, dim=2)
        if by is None:
            by = pick_block_size(builder.grid.Q, Ys, Xs)
        if self.mixed is not None and not interpret:
            # int16 tiles are (16, 128): block size and Y must be
            # 16-row aligned for the block/sliver DMAs
            if by % 16:
                by *= 2
            if by % 16 or Ys % by:
                raise NotImplementedError(
                    f'mixed 16-bit storage needs 16-aligned y-blocks '
                    f'(Y={Ys}, by={by}); use the XLA engine')
        self.by = by
        # native-BC blocks (see pallas_step.NATIVE_BC_TYPES): their
        # patch planes come from the Pallas prologue kernel instead of
        # the per-step XLA window machinery; static parameters only.
        # The aligned-sliver wrap fetch needs Y % 8 == 0.
        import sailfish_tpu.ops.pallas_step as _ps
        # (Y % 8 == 0 is implied: pick_block_size only returns by
        # values that are multiples of 8 dividing Y, so the prologue's
        # aligned-sliver wrap fetch is always legal here)
        native_ok = (_ps.NATIVE_BC_ENABLED
                     and builder.sc_coupling == 0.0
                     and builder.model != 'elbm'
                     and not builder.maps.dynamic
                     and builder.force_expr is None)
        self.rt_force = builder.force_expr is not None
        if self.rt_force and not rt_force_eligible(builder):
            raise NotImplementedError(
                'space-dependent DynamicValue body forces need the '
                'whole-domain coordinate machinery; use the XLA engine')
        self.bc_instances = ()
        bc_inst = []
        if native_ok:
            mask_np, patch_rows, bc_inst = classify_nodes(
                builder.maps, native_bc=True)
        else:
            mask_np, patch_rows = classify_nodes(builder.maps)
        xla_patch_blocks = sorted({r // by for r in patch_rows})
        # Split the native instances (the 2D analog of PallasStep3D):
        # spatially UNIFORM parameters run IN-KERNEL on static
        # lane-rounded x-windows (any orientation -- an x-normal BC
        # column, which previously forced a prologue plane for EVERY
        # y-block, costs one 128-lane window per block); spatially
        # varying parameters keep the Pallas patch-block prologue.
        proto_inst = []
        kbc_cand = []
        if bc_inst:
            for idx, (tid, ko, sel) in enumerate(bc_inst):
                ent = kbc_instance_spec_2d(builder, idx, tid, ko, sel,
                                           by)
                if ent is not None:
                    kbc_cand.append(ent)
                else:
                    ys = np.unique(np.nonzero(sel)[0])
                    proto_inst.append(
                        (3 + idx, tid, ko, None, None,
                         tuple(int(y) for y in ys), None))
            # an in-kernel instance sharing a y-BLOCK with a prologue
            # instance would be clobbered by the block overlay (which
            # knows only the prologue instances' codes): demote it.
            # XLA-patched blocks need no demotion -- their window
            # machinery recomputes every node type from builder.maps,
            # and the in-kernel merge never runs there (patch_body).
            prows = set()
            for ent in proto_inst:
                prows |= {y // by for y in ent[5]}
            moved = True
            while moved:
                moved = False
                for ent in list(kbc_cand):
                    if {y // by for y in ent[5]} & prows:
                        kbc_cand.remove(ent)
                        proto_inst.append(ent)
                        prows |= {y // by for y in ent[5]}
                        moved = True
            self.bc_instances = tuple(
                (ent[1], ent[2]) for ent in proto_inst)
        self._kbc_raw = kbc_cand
        self.kbc = kbc_round_blocks_2d(kbc_cand, by, Xs)
        # native rows whose BLOCK already needs an XLA overlay are
        # covered by it (the window machinery recomputes every type)
        self.bc_blocks = tuple(sorted(
            {int(y) // by for ent in proto_inst for y in ent[5]}
            - set(xla_patch_blocks)))
        if len(xla_patch_blocks) > self.MAX_PATCH_FRACTION * (Ys // by):
            raise NotImplementedError(
                f'{len(xla_patch_blocks)}/{Ys // by} y-blocks need '
                'complex-BC patches; use the XLA engine for this scene')
        self.xla_patch_blocks = xla_patch_blocks
        self.patch_blocks = sorted(set(xla_patch_blocks)
                                   | set(self.bc_blocks))
        self.has_mask = bool((mask_np != 0).any())
        self.mask = jnp.asarray(mask_np) if self.has_mask else None
        self.sc = builder.sc_coupling != 0.0
        if self.sc and self.patch_blocks:
            raise NotImplementedError(
                'Shan-Chen with complex-BC blocks needs global psi '
                'sampling in the patch windows; use the XLA engine')
        self.bcp = None
        self.bc_kernel = None
        if self.bc_blocks:
            m = builder.maps
            planes = []
            for b in self.bc_blocks:
                sl = slice(b * by, (b + 1) * by)
                planes.append(np.stack(
                    [m.param_rho[sl]] +
                    [m.param_vel[a][sl] for a in range(2)]))
            self.bcp = jnp.asarray(
                np.stack(planes, axis=1).astype(builder.dtype))
            # the prologue addresses instances positionally (mask code
            # 3 + index into self.bc_instances); the global mask holds
            # classify's codes, so remap the prologue blocks' copy.
            # In-kernel instances never share these blocks (demotion
            # fixpoint above), so only prologue codes appear.
            marr = np.stack(
                [mask_np[b * by:(b + 1) * by] for b in self.bc_blocks])
            remap = marr.copy()
            for j, ent in enumerate(proto_inst):
                remap[marr == ent[0]] = 3 + j
            self._bc_mask_blocks = jnp.asarray(remap)
            self.bc_kernel = make_bc_patch_kernel_2d(
                builder, Ys, Xs, by, self.bc_blocks, self.bc_instances,
                interpret=interpret, mixed=self.mixed)
        # Shan-Chen: emit next step's post-stream rho from the kernel
        # itself (carrying (f, rho) between steps) instead of paying
        # the ~40 B/node rho pre-pass every step; the regular-emission
        # pipeline needs >= 4 y-blocks (guaranteed above)
        self.emit_rho = self.sc and not self.patch_blocks
        self.kernel = make_kernel_2d(builder, Ys, Xs, by=by,
                                     patch_blocks=self.patch_blocks,
                                     has_mask=self.has_mask,
                                     interpret=interpret, sc=self.sc,
                                     emit_rho=self.emit_rho,
                                     mixed=self.mixed,
                                     rt_force=self.rt_force,
                                     kbc=self.kbc)
        self.rho_kernel = None
        if self.sc:
            self.rho_kernel = make_rho_kernel_2d(builder, Ys, Xs, by=by,
                                                 interpret=interpret)
        self._make_patch_builders()

    def _post_stream_rho(self, f):
        return self.rho_kernel(f)

    def _make_patch_builders(self):
        # XLA window sub-builders only for the blocks the Pallas patch
        # prologue does not cover
        self.patch_subs = []
        for b in self.xla_patch_blocks:
            box = (slice(b * self.by, (b + 1) * self.by),
                   slice(0, self.shape[1]))
            self.patch_subs.append(
                (box, self.builder.for_window(box, flatten=True)))

    def _compute_patches(self, f, it=0):
        """(Q, P, by, X) patch blocks ordered like self.patch_blocks:
        native-BC blocks from the Pallas prologue, the rest recomputed
        exactly by the XLA window machinery."""
        xla = {}
        for (box, sub), b in zip(self.patch_subs, self.xla_patch_blocks):
            p = compute_patch_block_2d(
                self.builder.grid, sub, f, box, self.by,
                self.shape[1], it, mixed=self.mixed)
            if self.mixed is not None:
                p = self.mixed.quant(p)
            xla[b] = p
        bc = {}
        if self.bc_blocks:
            pv = self.bc_kernel(f, self._bc_mask_blocks, self.bcp)
            for i, b in enumerate(self.bc_blocks):
                bc[b] = pv[:, i]
        return jnp.stack(
            [bc[b] if b in bc else xla[b] for b in self.patch_blocks],
            axis=1)

    def step(self, carry, it=0):
        """One fused step. In emit-rho mode (Shan-Chen) the carry is
        (f, rho) and the step returns the updated pair; otherwise the
        carry is just f."""
        if self.emit_rho:
            f, rho = carry
        else:
            f = carry
        # periodic wrap blocks as materialized ghost copies (the kernel
        # writes f in place; see make_kernel_2d)
        args = [f, f[:, -self.by:], f[:, :self.by]]
        if self.sc:
            if not self.emit_rho:
                rho = self._post_stream_rho(f)
            args.append(rho)
        if self.has_mask:
            args.append(self.mask)
        if self.patch_blocks:
            args.append(self._compute_patches(f, it))
        if self.rt_force:
            args.append(force_now(self.builder, it))
        out = self.kernel(*args)
        if self.emit_rho:
            return tuple(out)
        return out

    @property
    def padded(self):
        """True when the between-steps carry differs from the public
        fp32 layout: (f, rho) in emit-rho mode, int16 codes in mixed
        mode; pad_state/crop_state convert once per chunk."""
        return self.emit_rho or self.mixed is not None

    def pad_state(self, f):
        if self.mixed is not None:
            return self.mixed.quant(f)
        if self.emit_rho:
            return (f, self._post_stream_rho(f))
        return f

    def crop_state(self, carry):
        if self.mixed is not None:
            return self.mixed.dequant(carry)
        return carry[0] if self.emit_rho else carry

    def run_steps(self, f, n, it0=0):
        f = self.pad_state(f)
        f = jax.lax.fori_loop(
            0, n, lambda i, fc: self.step(fc, it0 + i), f)
        return self.crop_state(f)
