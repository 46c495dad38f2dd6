"""Fused 3D kernels for K-component mixtures (Shan-Chen + binary FE).

Marries the single-fluid 3D plane pipeline (ops/pallas_step.make_kernel_3d:
double-buffered z-grid, plane DMAs, in-place pairwise collide) with the
multi-component coupling math of the 2D block kernels
(ops/pallas_multi2d): all K distribution sets stream plane-by-plane, the
common velocity / pseudopotential cross-forces / free-energy chemical
potential are evaluated in VMEM from per-component post-stream density
planes (rho pre-pass kernels), and each component collides with its own
shifted equilibrium velocity. This replaces the reference's
binary_shan_chen.mako / ternary_shan_chen.mako / lb_binary_fluid.mako
two-phase NN-runner step (subdomain_runner.py:1840) as a single pass.

Covers: periodic / full-bounce-back scenes (in-kernel mask), uniform
per-component Guo body forces, the FE wetting mirror, fp32, single
device, tile-aligned planes (Y % 8 == 0, X % 128 == 0). Everything else
falls back to the XLA engine (ops/multigrid.py), which remains the
semantics reference (equivalence in tests/test_multi_pallas.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sailfish_tpu.equilibrium import signed_sum
from sailfish_tpu.ops.pallas_multi2d import fe_mrt_relax
from sailfish_tpu.ops.pallas_step import (check_plane_tiling,
                                          classify_nodes, cz_groups,
                                          gy_pad_channels,
                                          make_rho_kernel_3d)

#: scratch gate: the kernels request an explicit vmem_limit (up to
#: 100 MB -- v5e headroom, see pallas_step.make_kernel_3d), so the
#: fallback threshold only needs to leave room for Mosaic temporaries.
#: 64 MB admits binary mixtures at 256x256 planes (42 MB declared,
#: compiles and runs on v5e -- benchmark/results/model_zoo_v5e.dat
#: bin_d3q19_sc_256 rows); ternary D3Q19 at 256x256 (~60 MB) is the
#: practical ceiling before Mosaic temporaries overflow.
VMEM_BUDGET = 64 * 2 ** 20


def _check_vmem(*plane_counts_dtypes, Y, X):
    """plane_counts_dtypes: (n_planes, itemsize) pairs for every VMEM
    scratch buffer; raise when the per-core budget would overflow."""
    total = sum(n * Y * X * isz for n, isz in plane_counts_dtypes)
    if total > VMEM_BUDGET:
        raise NotImplementedError(
            f'fused multi-component 3D kernel needs {total / 2**20:.1f} '
            f'MB of VMEM at plane size {Y}x{X} (budget '
            f'{VMEM_BUDGET / 2**20:.0f} MB); use the XLA engine')


def make_kernel_3d_sc_multi(mbuilder, Z, Y, X, has_mask=False,
                            emit_rho=False, edge_io=False,
                            y_ghosts=False, face_io=False,
                            interpret=False):
    """fused(f_0.., glo_0.., ghi_0.., rho_0.., rglo_0.., rghi_0..
    [, mask]) -> (out_0..): one z-plane per program, K components.

    With ``emit_rho=True`` the kernel additionally RETURNS next step's
    post-stream densities (one (Z, Y, X) output per component), making
    the K per-step rho pre-passes unnecessary -- the K-component port
    of the single-fluid 3D emission (pallas_step.make_kernel_3d
    emit_rho): plane z's emission needs post-collision planes z-1..z+1,
    so program z emits plane z-1 using a 2-deep per-component ring of
    the previous programs' post-collision tails; the periodic wrap
    planes 0 and Z-1 come from a stash of planes 0/1 in the Z-1
    epilogue. Emitted values are bit-identical to make_rho_kernel_3d
    (same source values, same roll/summation order). Signature gains K
    outputs; the caller carries (fs, rhos) between steps. Requires
    Z >= 3.

    With ``edge_io=True`` (requires ``emit_rho``; the z-sharded mode)
    the wrap epilogue is dropped -- a shard cannot emit its edge planes
    (they need the neighbor's post-collision faces) -- and the two
    local edge planes of each rho INPUT are read from separate
    (Y, X) inputs ``rlo_c``/``rhi_c`` instead of the rho array (whose
    edge planes are stale under aliasing). The sharded caller computes
    the edge planes in XLA from the ppermuted post-collision faces
    (parallel.halo.stream_rho_edges) with the identical summation
    order. Signature: fused(f.., glo.., ghi.., rho.., rglo.., rghi..,
    rlo.., rhi..[, mask]) -> (out.., rho_next..).

    With ``y_ghosts=True`` (a ('z','y')-sharded mesh; requires
    edge_io) six more K-lists of inputs follow ``rhi``, the
    K-component port of the single-fluid kernel's sc+y_ghosts mode
    (pallas_step.make_kernel_3d):
      * ``gylo``/``gyhi`` (Z+2, Q, X): the y-neighbors' post-collision
        boundary rows per SOURCE plane (entry j+1 <-> plane j; the
        +-1 entries carry the z+y corners) -- fix the wrapped edge row
        of every y-rolled pull plane;
      * ``rylo``/``ryhi`` (Z+2, 1, X): the y-neighbors' post-stream
        rho boundary rows -- fix the wrapped edge row of every
        y-rolled psi plane;
      * ``rrlo``/``rrhi`` (Z+2, 1, X): the CORRECT local edge rows of
        every rho plane (the emission cannot produce them on a
        y-shard); each plane's edge rows are overwritten from these at
        psi time.

    With ``face_io=True`` (requires ``y_ghosts``) the kernel RETURNS,
    per component, its post-collision boundary ROWS as one extra
    (Z, 4*Qp, X) output: channel block r*Qp+q holds row (0, 1, Y-2,
    Y-1)[r] of direction q's output plane. The sharded caller builds
    the gy faces and the XLA rho edge-row streaming from these instead
    of row-slicing the state -- a strided row slice of the in-place-
    aliased state forces XLA to copy the whole array every step
    (pallas_step.make_kernel_3d face_io has the measurement). Values
    are the exact stored codes, so everything downstream stays
    bitwise identical.
    """
    g = mbuilder.grid
    Q = g.Q
    K = len(mbuilder.components)
    dtype = mbuilder.b0.dtype
    basis = g.basis
    opp = [int(o) for o in g.opposite]
    pairs = [(i, opp[i]) for i in range(Q) if i <= opp[i]]
    # cz-grouped Q layout (pallas_step.cz_groups): state arrives
    # permuted; math runs in standard direction order via ipos
    perm, ipos, groups = cz_groups(g)
    assert not (edge_io and not emit_rho)
    assert not (y_ghosts and not edge_io)
    assert not (face_io and not y_ghosts)
    Qp_f = gy_pad_channels(Q)
    if emit_rho:
        assert Z >= 3, (Z, 'emit_rho needs >= 3 pipeline programs')
    # permuted-space extents of the c_z groups (emit-rho ring/stash
    # buffers carry only the channels emission reads; layout is
    # [-1 group][0 group][+1 group])
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
    NG1 = Q - s_0   # ring1 channels per component (cz 0 and +1)
    taus = [float(t) for t in mbuilder.taus]
    couplings = {k: float(v) for k, v in mbuilder.couplings.items()
                 if v != 0.0}
    forces = [None if f is None else
              np.asarray(f, dtype=np.float64).reshape(-1)
              for f in mbuilder.body_forces]
    classic = mbuilder.potential == 'classic'
    w_np = np.asarray(g.weights, np.float64)

    def psi(x):
        return 1.0 - jnp.exp(-x) if classic else x

    def kernel(*refs):
        idx = 0
        f_hbm = refs[idx:idx + K]; idx += K
        glo_hbm = refs[idx:idx + K]; idx += K
        ghi_hbm = refs[idx:idx + K]; idx += K
        rho_hbm = refs[idx:idx + K]; idx += K
        rglo_hbm = refs[idx:idx + K]; idx += K
        rghi_hbm = refs[idx:idx + K]; idx += K
        rlo_hbm = rhi_hbm = None
        gylo_hbm = gyhi_hbm = None
        rylo_hbm = ryhi_hbm = rrlo_hbm = rrhi_hbm = None
        if edge_io:
            rlo_hbm = refs[idx:idx + K]; idx += K
            rhi_hbm = refs[idx:idx + K]; idx += K
        if y_ghosts:
            gylo_hbm = refs[idx:idx + K]; idx += K  # (Z+2, Q, X)
            gyhi_hbm = refs[idx:idx + K]; idx += K
            rylo_hbm = refs[idx:idx + K]; idx += K  # (Z+2, 1, X)
            ryhi_hbm = refs[idx:idx + K]; idx += K
            rrlo_hbm = refs[idx:idx + K]; idx += K
            rrhi_hbm = refs[idx:idx + K]; idx += K
        mask_hbm = None
        if has_mask:
            mask_hbm = refs[idx]; idx += 1
        out_hbm = refs[idx:idx + K]; idx += K
        rho_out_hbm = None
        if emit_rho:
            rho_out_hbm = refs[idx:idx + K]; idx += K
        rows_out_hbm = None
        if face_io:
            rows_out_hbm = refs[idx:idx + K]; idx += K  # (Z, 4Qp, X)
        fs_buf = refs[idx]; idx += 1        # (2, K*Q, Y, X)
        rho_buf = refs[idx]; idx += 1       # (2, 3*K, Y, X)
        gylo_buf = gyhi_buf = None
        rylo_buf = ryhi_buf = rrlo_buf = rrhi_buf = None
        if y_ghosts:
            gylo_buf = refs[idx]; idx += 1  # (2, K, 3, Q, X)
            gyhi_buf = refs[idx]; idx += 1
            rylo_buf = refs[idx]; idx += 1  # (2, K, 3, 1, X)
            ryhi_buf = refs[idx]; idx += 1
            rrlo_buf = refs[idx]; idx += 1
            rrhi_buf = refs[idx]; idx += 1
        rows_st = None
        if face_io:
            rows_st = refs[idx]; idx += 1   # (2, K, 4*Qp, X)
        mask_buf = None
        if has_mask:
            mask_buf = refs[idx]; idx += 1  # (2, 1, Y, X)
        ring0 = ring1 = stash0 = stash1 = remit_buf = redge_buf = None
        if emit_rho:
            ring0 = refs[idx]; idx += 1     # (2, K*n_p1, Y, X) pc z0-2
            ring1 = refs[idx]; idx += 1     # (2, K*NG1, Y, X) pc z0-1
            if not edge_io:
                stash0 = refs[idx]; idx += 1  # (K, s_p1, Y, X) pc 0
                stash1 = refs[idx]; idx += 1  # (K, n_m1, Y, X) pc 1
            remit_buf = refs[idx]; idx += 1   # (2, K, Y, X)
            if not edge_io:
                redge_buf = refs[idx]; idx += 1  # (2, K, Y, X)
        in_sems = refs[idx]; idx += 1       # DMA (2, K*Q + 3*K + 1)
        out_sems = refs[idx]; idx += 1      # DMA (2, K)
        remit_sems = redge_sems = None
        if emit_rho:
            remit_sems = refs[idx]; idx += 1  # DMA (2, K)
            if not edge_io:
                redge_sems = refs[idx]; idx += 1  # DMA (2, K)
        face_sems = None
        if face_io:
            face_sems = refs[idx]; idx += 1   # DMA (2, K)

        z0 = pl.program_id(0)
        slot = jax.lax.rem(z0, 2)
        nslot = jax.lax.rem(z0 + 1, 2)

        def start_gathers(plane_z, s):
            for c in range(K):
                for gi, (cz, st, cnt) in enumerate(groups):
                    dst = fs_buf.at[s, pl.ds(c * Q + st, cnt)]
                    sem = in_sems.at[s, c * len(groups) + gi]
                    if cz == 0:
                        pltpu.make_async_copy(
                            f_hbm[c].at[pl.ds(st, cnt), plane_z], dst,
                            sem).start()
                    elif cz == 1:
                        @pl.when(plane_z == 0)
                        def _(c=c, st=st, cnt=cnt, dst=dst, sem=sem):
                            pltpu.make_async_copy(
                                glo_hbm[c].at[pl.ds(st, cnt)], dst,
                                sem).start()

                        @pl.when(plane_z > 0)
                        def _(c=c, st=st, cnt=cnt, dst=dst, sem=sem,
                              plane_z=plane_z):
                            pltpu.make_async_copy(
                                f_hbm[c].at[pl.ds(st, cnt),
                                            plane_z - 1],
                                dst, sem).start()
                    else:
                        @pl.when(plane_z == Z - 1)
                        def _(c=c, st=st, cnt=cnt, dst=dst, sem=sem):
                            pltpu.make_async_copy(
                                ghi_hbm[c].at[pl.ds(st, cnt)], dst,
                                sem).start()

                        @pl.when(plane_z < Z - 1)
                        def _(c=c, st=st, cnt=cnt, dst=dst, sem=sem,
                              plane_z=plane_z):
                            pltpu.make_async_copy(
                                f_hbm[c].at[pl.ds(st, cnt),
                                            plane_z + 1],
                                dst, sem).start()
                for j, dz in enumerate((-1, 0, 1)):
                    sem = in_sems.at[s, K * len(groups) + c * 3 + j]
                    dst = rho_buf.at[s, c * 3 + j]
                    pz = plane_z + dz
                    # pz routed to: rglo (-1), rghi (Z), and under
                    # edge_io also rlo (0) / rhi (Z-1) -- the rho
                    # array's edge planes are stale there (the sharded
                    # caller passes fresh ones as separate inputs)
                    specials = []
                    if dz < 0:
                        specials.append((pz == -1, rglo_hbm[c]))
                    if dz > 0:
                        specials.append((pz == Z, rghi_hbm[c]))
                    if edge_io:
                        if dz <= 0:
                            specials.append((pz == 0, rlo_hbm[c]))
                        if dz >= 0:
                            specials.append((pz == Z - 1, rhi_hbm[c]))
                    done = None
                    for cond, src in specials:
                        @pl.when(cond)
                        def _(src=src, dst=dst, sem=sem):
                            pltpu.make_async_copy(src, dst, sem).start()
                        done = cond if done is None else done | cond
                    if done is None:
                        pltpu.make_async_copy(
                            rho_hbm[c].at[pz], dst, sem).start()
                    else:
                        @pl.when(jnp.logical_not(done))
                        def _(c=c, dst=dst, sem=sem, pz=pz):
                            pzc = jnp.clip(pz, 0, Z - 1)
                            pltpu.make_async_copy(
                                rho_hbm[c].at[pzc], dst, sem).start()
            if has_mask:
                pltpu.make_async_copy(
                    mask_hbm.at[plane_z], mask_buf.at[s, 0],
                    in_sems.at[s, K * (len(groups) + 3)]).start()
            if y_ghosts:
                # 3-entry windows (source planes plane_z-1..plane_z+1;
                # the (Z+2)-indexed arrays' leading dim is untiled)
                base = K * (len(groups) + 3) + 1
                for c in range(K):
                    for j, (arr, buf) in enumerate((
                            (gylo_hbm, gylo_buf), (gyhi_hbm, gyhi_buf),
                            (rylo_hbm, rylo_buf), (ryhi_hbm, ryhi_buf),
                            (rrlo_hbm, rrlo_buf),
                            (rrhi_hbm, rrhi_buf))):
                        pltpu.make_async_copy(
                            arr[c].at[pl.ds(plane_z, 3)],
                            buf.at[s, c],
                            in_sems.at[s, base + c * 6 + j]).start()

        def wait_gather_plus(s):
            """Wait only the cz=+1 groups (reading source plane z-1)."""
            NG = len(groups)
            for c in range(K):
                for gi, (cz, st, cnt) in enumerate(groups):
                    if cz != 1:
                        continue
                    pltpu.make_async_copy(
                        f_hbm[0].at[pl.ds(st, cnt), 0],
                        fs_buf.at[s, pl.ds(c * Q + st, cnt)],
                        in_sems.at[s, c * NG + gi]).wait()

        def wait_gathers(s):
            # the cz=+1 groups were drained by the predecessor before
            # its in-place write (see pre_write_waits), except plane 0
            NG = len(groups)
            for c in range(K):
                for gi, (cz, st, cnt) in enumerate(groups):
                    if cz == 1:
                        continue
                    pltpu.make_async_copy(
                        f_hbm[0].at[pl.ds(st, cnt), 0],
                        fs_buf.at[s, pl.ds(c * Q + st, cnt)],
                        in_sems.at[s, c * NG + gi]).wait()

            @pl.when(z0 == 0)
            def _():
                wait_gather_plus(s)
            for j in range(3 * K):
                pltpu.make_async_copy(rho_hbm[0].at[0],
                                      rho_buf.at[s, j],
                                      in_sems.at[s, K * NG + j]).wait()
            if has_mask:
                pltpu.make_async_copy(
                    mask_hbm.at[0], mask_buf.at[s, 0],
                    in_sems.at[s, K * (NG + 3)]).wait()
            if y_ghosts:
                base = K * (NG + 3) + 1
                for c in range(K):
                    for j, (arr, buf) in enumerate((
                            (gylo_hbm, gylo_buf), (gyhi_hbm, gyhi_buf),
                            (rylo_hbm, rylo_buf), (ryhi_hbm, ryhi_buf),
                            (rrlo_hbm, rrlo_buf),
                            (rrhi_hbm, rrhi_buf))):
                        pltpu.make_async_copy(
                            arr[c].at[pl.ds(0, 3)], buf.at[s, c],
                            in_sems.at[s, base + c * 6 + j]).wait()

        def wait_out(s):
            for c in range(K):
                pltpu.make_async_copy(
                    fs_buf.at[s, pl.ds(c * Q, Q)], out_hbm[c].at[:, 0],
                    out_sems.at[s, c]).wait()

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

        # in-plane periodic shifts of the pull; channel c*Q+ipos[i]
        # holds standard direction i of component c. y-sharded: the
        # wrapped edge row's post-shift position is STATIC, so the
        # y-roll and the y-neighbor-row substitution fold into ONE
        # static sublane concat (see pallas_step.yg_shift_rows; the
        # later x-roll rotates plane and ghost row together)
        if y_ghosts:
            yg_iota = jax.lax.broadcasted_iota(jnp.int32, (Y, 1), 0)
        for c in range(K):
            for i in range(Q):
                cx, cy = int(basis[i][0]), int(basis[i][1])
                if cy or cx:
                    ch = c * Q + ipos[i]
                    plane = fs_buf[slot, ch]
                    if y_ghosts and cy:
                        cz_i = int(basis[i][2])
                        gbuf = gylo_buf if cy == 1 else gyhi_buf
                        row = gbuf[slot, c, pl.ds(1 - cz_i, 1),
                                   ipos[i]]                 # (1, X)
                        if cy == 1:
                            plane = jnp.concatenate(
                                [row, plane[:Y - 1]], axis=0)
                        else:
                            plane = jnp.concatenate(
                                [plane[1:], row], axis=0)
                    elif cy:
                        plane = pltpu.roll(plane, cy % Y, axis=0)
                    if cx:
                        plane = pltpu.roll(plane, cx % X, axis=1)
                    fs_buf[slot, ch] = plane

        fsl = [[fs_buf[slot, c * Q + ipos[i]] for i in range(Q)]
               for c in range(K)]

        # common velocity u' = (sum mom_k/tau_k) / (sum rho_k/tau_k)
        # (reference binary_shan_chen.mako:60-90)
        rhos = []
        moms = []
        for c in range(K):
            r = fsl[c][0]
            for i in range(1, Q):
                r = r + fsl[c][i]
            rhos.append(r)
            moms.append([signed_sum(basis[:, a], fsl[c])
                         for a in range(3)])
        den = rhos[0] * jnp.asarray(1.0 / taus[0], dtype)
        num = [moms[0][a] * jnp.asarray(1.0 / taus[0], dtype)
               for a in range(3)]
        for c in range(1, K):
            inv_t = jnp.asarray(1.0 / taus[c], dtype)
            den = den + rhos[c] * inv_t
            for a in range(3):
                num[a] = num[a] + moms[c][a] * inv_t
        inv_den = 1.0 / den
        u_common = [num[a] * inv_den for a in range(3)]

        # pseudopotential cross-forces from the 3 neighboring rho
        # planes; psi evaluated once per (component, z-offset) plane
        # (the exp of the classic potential is the dominant VPU cost).
        # y-sharded: each plane's stale edge rows read the fresh rr
        # inputs (a by-value no-op for the z-edge/ghost planes)
        def rho_plane(c, j):
            r = rho_buf[slot, c * 3 + j]
            if y_ghosts:
                lo = rrlo_buf[slot, c, j]     # (1, X)
                hi = rrhi_buf[slot, c, j]
                r = jnp.where(yg_iota == 0, lo, r)
                r = jnp.where(yg_iota == Y - 1, hi, r)
            return r

        psi_pl = [[psi(rho_plane(c, j)) for j in range(3)]
                  for c in range(K)]
        psi_self = [psi_pl[c][1] for c in range(K)]
        psi_row_cache = {}

        def psi_row(c, side, j):
            """psi of the y-neighbor's rho row of source plane j-1+z0
            (side +1 = above-neighbor row 0, -1 = below row Y-1)."""
            if (c, side, j) not in psi_row_cache:
                buf = ryhi_buf if side == 1 else rylo_buf
                psi_row_cache[(c, side, j)] = psi(buf[slot, c, j])
            return psi_row_cache[(c, side, j)]

        def neighbor_sum(c):
            acc = [None, None, None]
            for i in range(1, Q):
                cx, cy, cz = (int(basis[i][0]), int(basis[i][1]),
                              int(basis[i][2]))
                p = psi_pl[c][1 + cz]
                if cy:
                    p = pltpu.roll(p, (-cy) % Y, axis=0)
                    if y_ghosts:
                        # the wrapped edge row reads the y-neighbor's
                        # psi row (x-rolled below with the plane)
                        edge = Y - 1 if cy == 1 else 0
                        p = jnp.where(yg_iota == edge,
                                      psi_row(c, cy, 1 + cz), p)
                if cx:
                    p = pltpu.roll(p, (-cx) % X, axis=1)
                w = float(g.weights[i])
                for a in range(3):
                    cc = int(basis[i][a])
                    if cc:
                        t = (w * cc) * p
                        acc[a] = t if acc[a] is None else acc[a] + t
            return acc

        nsum = [neighbor_sum(c) for c in range(K)]
        F = [[None] * 3 for _ in range(K)]
        for (j, kk), G in couplings.items():
            for a in range(3):
                tj = jnp.asarray(-G, dtype) * psi_self[j] * nsum[kk][a]
                F[j][a] = tj if F[j][a] is None else F[j][a] + tj
                if j != kk:
                    tk = jnp.asarray(-G, dtype) * psi_self[kk] * \
                        nsum[j][a]
                    F[kk][a] = tk if F[kk][a] is None else \
                        F[kk][a] + tk

        if has_mask:
            m = mask_buf[slot, 0]
            is_dry = m == 1
            is_keep = m == 2

        if face_io:
            def face_copy(s, c, plane_expr):
                return pltpu.make_async_copy(
                    rows_st.at[s, c], rows_out_hbm[c].at[plane_expr],
                    face_sems.at[s, c])

            # recycle the staging slot: the DMA that read it two
            # planes ago must have drained before this plane's stores
            @pl.when(z0 >= 2)
            def _():
                for c in range(K):
                    face_copy(slot, c, z0 - 2).wait()
            if Qp_f != Q:
                zpad = jnp.zeros((Qp_f - Q, X), dtype)
                for c in range(K):
                    for r in range(4):
                        rows_st[slot, c,
                                pl.ds(r * Qp_f + Q, Qp_f - Q)] = zpad

            def emit_rows(c, d, vd):
                """Stage the post-collision boundary rows (the exact
                stored codes) of component c, direction d."""
                ch = ipos[d]
                for r, row in enumerate((0, 1, Y - 2, Y - 1)):
                    rows_st[slot, c, pl.ds(r * Qp_f + ch, 1)] = \
                        vd[row:row + 1]

        # per-component collide (math mirrors the 2D multi kernel,
        # which is equivalence-tested against ops/multigrid)
        for c in range(K):
            tau = taus[c]
            tau_inv = 1.0 / tau
            inv_rho = 1.0 / rhos[c]
            u_eq = list(u_common)
            for a in range(3):
                if F[c][a] is not None:
                    u_eq[a] = u_eq[a] + jnp.asarray(tau, dtype) * \
                        F[c][a] * inv_rho
            fvec = forces[c]
            uF = None
            if fvec is not None:
                u_eq = [u_eq[a] + jnp.asarray(0.5 * fvec[a], dtype)
                        for a in range(3)]
                uF = u_eq[0] * jnp.asarray(fvec[0], dtype)
                for a in range(1, 3):
                    uF = uF + u_eq[a] * jnp.asarray(fvec[a], dtype)
            usq = u_eq[0] * u_eq[0]
            for a in range(1, 3):
                usq = usq + u_eq[a] * u_eq[a]
            for i, o in pairs:
                fi = fsl[c][i]
                fo = fsl[c][o] if o != i else None
                outs = []
                for d, fd, frefl in (((i, fi, fo),) if o == i else
                                     ((i, fi, fo), (o, fo, fi))):
                    cu = signed_sum(basis[d], u_eq)
                    poly = 3.0 * cu + 4.5 * cu * cu - 1.5 * usq
                    feq = jnp.asarray(w_np[d], dtype) * \
                        (rhos[c] + rhos[c] * poly)
                    vd = fd + jnp.asarray(tau_inv, dtype) * (feq - fd)
                    if fvec is not None:
                        cF = float(np.dot(basis[d], fvec))
                        pref = (1.0 - 0.5 * tau_inv) * w_np[d]
                        vd = vd + jnp.asarray(pref, dtype) * rhos[c] * (
                            3.0 * (jnp.asarray(cF, dtype) - uF)
                            + 9.0 * cu * cF)
                    if has_mask:
                        refl = fd if frefl is None else frefl
                        vd = jnp.where(is_dry, refl,
                                       jnp.where(is_keep, fd, vd))
                    outs.append((d, vd))
                for d, vd in outs:
                    fs_buf[slot, c * Q + ipos[d]] = vd
                    if face_io:
                        emit_rows(c, d, vd)

        # in-place safety: the successor plane's cz=+1 gathers read the
        # OLD plane z0 -- drain them before overwriting it
        @pl.when(z0 + 1 < Z)
        def _():
            wait_gather_plus(nslot)

        for c in range(K):
            pltpu.make_async_copy(
                fs_buf.at[slot, pl.ds(c * Q, Q)], out_hbm[c].at[:, z0],
                out_sems.at[slot, c]).start()
        if face_io:
            for c in range(K):
                face_copy(slot, c, z0).start()

            @pl.when(z0 == Z - 1)
            def _():
                # drain the outstanding row emissions (no successor
                # exists to recycle these staging slots)
                for c in range(K):
                    face_copy(slot, c, Z - 1).wait()
                    if Z >= 2:
                        face_copy(nslot, c, Z - 2).wait()

        # -- emit-rho: next step's post-stream densities from the
        # post-collision planes now in VMEM (see docstring). Aliasing
        # rho_out onto rho is safe: program z writes plane z-1, whose
        # last gather read (this program's own, planes z-1..z+1) was
        # drained in wait_gathers above.
        if emit_rho:
            def pc_src(c, i, rel):
                """Post-collision plane z0+rel of direction i, comp c
                (rel in {-2, -1, 0}; negative planes from the rings)."""
                ch = ipos[i]
                if rel == 0:
                    return fs_buf[slot, c * Q + ch]
                if rel == -1:
                    return ring1[nslot, c * NG1 + ch - s_0]
                return ring0[nslot, c * n_p1 + ch - s_p1]

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

            def remit_copy(s, c, plane_expr):
                return pltpu.make_async_copy(
                    remit_buf.at[s, c], rho_out_hbm[c].at[plane_expr],
                    remit_sems.at[s, c])

            @pl.when(z0 >= 2)
            def _():
                # drain the emission that last used this staging slot
                @pl.when(z0 >= 4)
                def _():
                    for c in range(K):
                        remit_copy(slot, c, z0 - 3).wait()
                for c in range(K):
                    remit_buf[slot, c] = emitted_rho(
                        lambda i, c=c: pc_src(
                            c, i, -1 - int(basis[i][2])))
                for c in range(K):
                    remit_copy(slot, c, z0 - 1).start()

            # stash pc planes 0/1 for the periodic wrap emission
            if not edge_io:
                @pl.when(z0 == 0)
                def _():
                    for c in range(K):
                        stash0[c] = fs_buf[slot, pl.ds(c * Q, s_p1)]

                @pl.when(z0 == 1)
                def _():
                    for c in range(K):
                        stash1[c] = fs_buf[slot, pl.ds(c * Q, n_m1)]

            # ring carry: this program's pc tail for the successors
            # (emission above read the PREVIOUS planes' rings via nslot)
            for c in range(K):
                ring0[slot, pl.ds(c * n_p1, n_p1)] = \
                    ring1[nslot, pl.ds(c * NG1 + s_p1 - s_0, n_p1)]
                ring1[slot, pl.ds(c * NG1, NG1)] = \
                    fs_buf[slot, pl.ds(c * Q + s_0, NG1)]

            if not edge_io:
                @pl.when(z0 == Z - 1)
                def _():
                    # periodic wrap planes: Z-1 (needs pc Z-2, Z-1, 0)
                    # and 0 (needs pc Z-1, 0, 1)
                    for c in range(K):
                        def src_last(i, c=c):
                            cz_i = int(basis[i][2])
                            ch = ipos[i]
                            if cz_i == 1:    # source plane Z-2
                                return ring0[slot,
                                             c * n_p1 + ch - s_p1]
                            if cz_i == 0:    # source plane Z-1
                                return fs_buf[slot, c * Q + ch]
                            return stash0[c, ch]   # plane Z -> 0

                        def src_first(i, c=c):
                            cz_i = int(basis[i][2])
                            ch = ipos[i]
                            if cz_i == 1:    # source plane -1 -> Z-1
                                return fs_buf[slot, c * Q + ch]
                            if cz_i == 0:    # source plane 0
                                return stash0[c, ch]
                            return stash1[c, ch]   # plane 1

                        redge_buf[0, c] = emitted_rho(src_last)
                        redge_buf[1, c] = emitted_rho(src_first)
                    copies = []
                    for c in range(K):
                        c0 = pltpu.make_async_copy(
                            redge_buf.at[0, c],
                            rho_out_hbm[c].at[Z - 1],
                            redge_sems.at[0, c])
                        c1 = pltpu.make_async_copy(
                            redge_buf.at[1, c], rho_out_hbm[c].at[0],
                            redge_sems.at[1, c])
                        c0.start()
                        c1.start()
                        copies += [c0, c1]
                    for cp in copies:
                        cp.wait()

            @pl.when(z0 == Z - 1)
            def _():
                # drain the outstanding plane emissions (no successor
                # exists to recycle these staging slots)
                for c in range(K):
                    remit_copy(slot, c, Z - 2).wait()
                    if Z >= 4:
                        remit_copy(nslot, c, Z - 3).wait()

        @pl.when(z0 == Z - 1)
        def _():
            wait_out(slot)
            if Z >= 2:
                wait_out(nslot)

    n_in = (8 * K if edge_io else 6 * K) + (1 if has_mask else 0)
    if y_ghosts:
        n_in += 6 * K
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_in
    scratch = [
        pltpu.VMEM((2, K * Q, Y, X), dtype),
        pltpu.VMEM((2, 3 * K, Y, X), dtype),
    ]
    if y_ghosts:
        Qp = gy_pad_channels(Q)
        scratch.append(pltpu.VMEM((2, K, 3, Qp, X), dtype))  # gylo
        scratch.append(pltpu.VMEM((2, K, 3, Qp, X), dtype))  # gyhi
        for _ in range(4):                                   # ry/rr
            scratch.append(pltpu.VMEM((2, K, 3, 1, X), dtype))
    if face_io:
        scratch.append(pltpu.VMEM((2, K, 4 * Qp_f, X), dtype))
    if has_mask:
        scratch.append(pltpu.VMEM((2, 1, Y, X), jnp.int32))
    if emit_rho:
        scratch.append(pltpu.VMEM((2, K * n_p1, Y, X), dtype))  # ring0
        scratch.append(pltpu.VMEM((2, K * NG1, Y, X), dtype))   # ring1
        if not edge_io:
            scratch.append(pltpu.VMEM((K, s_p1, Y, X), dtype))  # stash0
            scratch.append(pltpu.VMEM((K, n_m1, Y, X), dtype))  # stash1
        scratch.append(pltpu.VMEM((2, K, Y, X), dtype))         # remit
        if not edge_io:
            scratch.append(pltpu.VMEM((2, K, Y, X), dtype))     # redge
    scratch.append(pltpu.SemaphoreType.DMA(
        (2, K * (len(groups) + 3) + 1 + (6 * K if y_ghosts else 0))))
    scratch.append(pltpu.SemaphoreType.DMA((2, K)))
    if emit_rho:
        scratch.append(pltpu.SemaphoreType.DMA((2, K)))         # remit
        if not edge_io:
            scratch.append(pltpu.SemaphoreType.DMA((2, K)))     # redge
    if face_io:
        scratch.append(pltpu.SemaphoreType.DMA((2, K)))         # faces

    # in-place component updates (pallas_step.make_kernel_3d has the
    # bandwidth measurement); correct un-aliased too -- the kernel
    # never reads out_hbm. Emitted rho aliases the rho input the same
    # way (write-after-last-read ordering argued in the kernel).
    io_aliases = {c: c for c in range(K)}
    out_shape = [jax.ShapeDtypeStruct((Q, Z, Y, X), dtype)
                 for _ in range(K)]
    if emit_rho:
        out_shape += [jax.ShapeDtypeStruct((Z, Y, X), dtype)
                      for _ in range(K)]
        for c in range(K):
            io_aliases[3 * K + c] = K + c
    if face_io:
        out_shape += [jax.ShapeDtypeStruct((Z, 4 * Qp_f, X), dtype)
                      for _ in range(K)]

    # scratch exceeds the default 16 MB scoped-vmem gate at larger
    # planes; v5e has headroom (pallas_step.make_kernel_3d note)
    plane_b = Y * X * np.dtype(np.float32).itemsize
    vmem_need = (2 * K * Q + 2 * 3 * K) * plane_b
    if has_mask:
        vmem_need += 2 * plane_b
    if emit_rho:
        vmem_need += (2 * K * (n_p1 + NG1) + 4 * K) * plane_b
        if not edge_io:
            vmem_need += K * (s_p1 + n_m1) * plane_b
    if face_io:
        vmem_need += 2 * K * 4 * Qp_f * X * 4
    vmem_limit = int(min(max(16 * 2 ** 20,
                             vmem_need + 8 * 2 ** 20 + K * Q * plane_b),
                         100 * 2 ** 20))

    return pl.pallas_call(
        kernel,
        grid=(Z,),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                        for _ in range(len(out_shape))),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=vmem_limit),
        input_output_aliases=io_aliases,
        interpret=interpret,
    )


def make_kernel_3d_fe(mbuilder, Z, Y, X, has_mask=False, wetting=False,
                      emit_phi=False, edge_io=False, y_ghosts=False,
                      face_io=False, interpret=False):
    """Fused binary free-energy 3D step:
    fused(f0, f1, glo0, glo1, ghi0, ghi1, phi, phi_lo2, phi_lo1,
    phi_hi1, phi_hi2[, pedge_lo, pedge_hi][, mask]
    [, orient, orient_lo, orient_hi]) -> (f0', f1'[, phi_next]).

    ``phi`` is the post-stream order parameter (rho pre-pass on f1) with
    TWO periodic ghost planes per side: the wetting mirror shifts the
    stencil's phi samples by up to one more plane. Landau chemical
    potential, 3D isotropic laplacian/gradient (ops/multigrid.
    laplacian_and_grad dim==3), phi-interpolated tau, and both
    equilibria are evaluated per plane in VMEM.

    With ``emit_phi=True`` the kernel additionally RETURNS next step's
    post-stream order parameter (the single-component emission of
    make_kernel_3d_sc_multi applied to component 1), replacing the
    per-step phi pre-pass; the caller carries ((f0, f1), phi). Unlike
    the SC kernels the emitted phi is NOT aliased in place: the phi
    stencil reaches two planes, so the successor's prefetch of plane
    z-1 is still in flight when program z would overwrite it; the
    4 B/node phi write is too small for in-place streaming to matter.
    Requires Z >= 3.

    With ``edge_io=True`` (requires ``emit_phi``; the z-sharded mode)
    the wrap epilogue is dropped and the two stale local edge planes of
    the phi INPUT are read from separate (Y, X) inputs
    ``pedge_lo``/``pedge_hi`` (the sharded caller computes them in XLA
    from ppermuted post-collision faces, identical summation order).

    With ``y_ghosts=True`` (a ('z','y')-sharded mesh; requires
    edge_io, excludes wetting -- the wall mirror widens the phi
    stencil's y-reach to 2 rows) eight more inputs follow
    ``pedge_hi``, the FE port of the SC kernels' zy machinery:
    ``gylo0/gylo1/gyhi0/gyhi1`` (Z+2, Q, X) f boundary rows per source
    plane; ``pylo/pyhi`` (Z+2, 1, X) the y-neighbors' phi boundary
    rows (fix the wrapped edge row of each y-rolled phi sample);
    ``prlo/prhi`` (Z+2, 1, X) the CORRECT local edge rows of every phi
    plane, overwritten at sample time.

    With ``face_io=True`` (requires ``y_ghosts``) the kernel RETURNS
    each component's post-collision boundary rows as a (Z, 4*Qp, X)
    output (channel block r*Qp+q = row (0, 1, Y-2, Y-1)[r] of
    direction q) -- see make_kernel_3d_sc_multi; the sharded caller
    must not row-slice the in-place-aliased state."""
    from sailfish_tpu.ops.multigrid import _fe_weights
    g = mbuilder.grid
    Q = g.Q
    dtype = mbuilder.dtype
    basis = g.basis
    opp = [int(o) for o in g.opposite]
    # cz-grouped Q layout (pallas_step.cz_groups)
    perm, ipos, groups = cz_groups(g)
    assert not (edge_io and not emit_phi)
    assert not (y_ghosts and not edge_io)
    assert not (y_ghosts and wetting)
    assert not (face_io and not y_ghosts)
    Qp_f = gy_pad_channels(Q)
    if emit_phi:
        assert Z >= 3, (Z, 'emit_phi needs >= 3 pipeline programs')
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
    NG1 = Q - s_0
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
    w_np = np.asarray(g.weights, np.float64)

    def kernel(*refs):
        idx = 0
        f_hbm = refs[idx:idx + 2]; idx += 2
        glo_hbm = refs[idx:idx + 2]; idx += 2
        ghi_hbm = refs[idx:idx + 2]; idx += 2
        phi_hbm = refs[idx]; idx += 1
        phi_ghosts = refs[idx:idx + 4]; idx += 4   # lo2, lo1, hi1, hi2
        pedge_lo = pedge_hi = None
        gylo_hbm = gyhi_hbm = None
        pylo_hbm = pyhi_hbm = prlo_hbm = prhi_hbm = None
        if edge_io:
            pedge_lo = refs[idx]; idx += 1
            pedge_hi = refs[idx]; idx += 1
        if y_ghosts:
            gylo_hbm = refs[idx:idx + 2]; idx += 2  # (Z+2, Q, X)
            gyhi_hbm = refs[idx:idx + 2]; idx += 2
            pylo_hbm = refs[idx]; idx += 1          # (Z+2, 1, X)
            pyhi_hbm = refs[idx]; idx += 1
            prlo_hbm = refs[idx]; idx += 1
            prhi_hbm = refs[idx]; idx += 1
        mask_hbm = None
        if has_mask:
            mask_hbm = refs[idx]; idx += 1
        orient_hbm = None
        if wetting:
            orient_hbm = refs[idx]; idx += 1
            orient_lo = refs[idx]; idx += 1
            orient_hi = refs[idx]; idx += 1
        out_hbm = refs[idx:idx + 2]; idx += 2
        phi_out_hbm = None
        if emit_phi:
            phi_out_hbm = refs[idx]; idx += 1
        rows_out_hbm = None
        if face_io:
            rows_out_hbm = refs[idx:idx + 2]; idx += 2  # (Z, 4Qp, X)
        fs_buf = refs[idx]; idx += 1        # (2, 2Q, Y, X)
        phi_buf = refs[idx]; idx += 1       # (2, 5, Y, X): z0-2..z0+2
        gylo_buf = gyhi_buf = None
        pylo_buf = pyhi_buf = prlo_buf = prhi_buf = None
        if y_ghosts:
            gylo_buf = refs[idx]; idx += 1  # (2, 2, 3, Q, X)
            gyhi_buf = refs[idx]; idx += 1
            pylo_buf = refs[idx]; idx += 1  # (2, 3, 1, X)
            pyhi_buf = refs[idx]; idx += 1
            prlo_buf = refs[idx]; idx += 1
            prhi_buf = refs[idx]; idx += 1
        rows_st = None
        if face_io:
            rows_st = refs[idx]; idx += 1   # (2, 2, 4*Qp, X)
        mask_buf = None
        if has_mask:
            mask_buf = refs[idx]; idx += 1
        orient_buf = None
        if wetting:
            orient_buf = refs[idx]; idx += 1  # (2, 3, Y, X)
        ring0 = ring1 = stash0 = stash1 = remit_buf = redge_buf = None
        if emit_phi:
            ring0 = refs[idx]; idx += 1     # (2, n_p1, Y, X) pc1 z0-2
            ring1 = refs[idx]; idx += 1     # (2, NG1, Y, X) pc1 z0-1
            if not edge_io:
                stash0 = refs[idx]; idx += 1  # (s_p1, Y, X) pc1 0
                stash1 = refs[idx]; idx += 1  # (n_m1, Y, X) pc1 1
            remit_buf = refs[idx]; idx += 1   # (2, Y, X)
            if not edge_io:
                redge_buf = refs[idx]; idx += 1  # (2, Y, X)
        in_sems = refs[idx]; idx += 1       # DMA (2, 2Q + 5 + 1 + 3)
        out_sems = refs[idx]; idx += 1      # DMA (2, 2)
        remit_sems = redge_sems = None
        if emit_phi:
            remit_sems = refs[idx]; idx += 1  # DMA (2,)
            if not edge_io:
                redge_sems = refs[idx]; idx += 1  # DMA (2,)
        face_sems = None
        if face_io:
            face_sems = refs[idx]; idx += 1   # DMA (2, 2)

        z0 = pl.program_id(0)
        slot = jax.lax.rem(z0, 2)
        nslot = jax.lax.rem(z0 + 1, 2)

        def copy_z_periodic(src, ghosts, dst, sem, pz, lo_reach,
                            hi_reach, edges=None):
            """DMA plane ``pz`` of (Z,..) array ``src`` into ``dst``,
            reading ghost inputs past either end. ghosts = (lo planes
            ordered -lo_reach..-1, hi planes ordered Z..Z-1+hi_reach).
            ``edges`` (edge_io): (lo, hi) planes replacing the stale
            array planes 0 and Z-1."""
            done = None
            for off in range(1, lo_reach + 1):
                cond = pz == -off

                @pl.when(cond)
                def _(gh=ghosts[lo_reach - off]):
                    pltpu.make_async_copy(gh, dst, sem).start()
                done = cond if done is None else done | cond
            for off in range(hi_reach):
                cond = pz == Z + off

                @pl.when(cond)
                def _(gh=ghosts[lo_reach + off]):
                    pltpu.make_async_copy(gh, dst, sem).start()
                done = cond if done is None else done | cond
            if edges is not None:
                for cond, gh in ((pz == 0, edges[0]),
                                 (pz == Z - 1, edges[1])):
                    @pl.when(cond)
                    def _(gh=gh):
                        pltpu.make_async_copy(gh, dst, sem).start()
                    done = cond if done is None else done | cond

            @pl.when(jnp.logical_not(done) if done is not None
                     else pz == pz)
            def _():
                pzc = jnp.clip(pz, 0, Z - 1)
                pltpu.make_async_copy(src.at[pzc], dst, sem).start()

        NG = len(groups)

        def start_gathers(plane_z, s):
            for c in range(2):
                for gi, (cz, st, cnt) in enumerate(groups):
                    dst = fs_buf.at[s, pl.ds(c * Q + st, cnt)]
                    sem = in_sems.at[s, c * NG + gi]
                    if cz == 0:
                        pltpu.make_async_copy(
                            f_hbm[c].at[pl.ds(st, cnt), plane_z], dst,
                            sem).start()
                    elif cz == 1:
                        @pl.when(plane_z == 0)
                        def _(c=c, st=st, cnt=cnt, dst=dst, sem=sem):
                            pltpu.make_async_copy(
                                glo_hbm[c].at[pl.ds(st, cnt)], dst,
                                sem).start()

                        @pl.when(plane_z > 0)
                        def _(c=c, st=st, cnt=cnt, dst=dst, sem=sem,
                              plane_z=plane_z):
                            pltpu.make_async_copy(
                                f_hbm[c].at[pl.ds(st, cnt),
                                            plane_z - 1],
                                dst, sem).start()
                    else:
                        @pl.when(plane_z == Z - 1)
                        def _(c=c, st=st, cnt=cnt, dst=dst, sem=sem):
                            pltpu.make_async_copy(
                                ghi_hbm[c].at[pl.ds(st, cnt)], dst,
                                sem).start()

                        @pl.when(plane_z < Z - 1)
                        def _(c=c, st=st, cnt=cnt, dst=dst, sem=sem,
                              plane_z=plane_z):
                            pltpu.make_async_copy(
                                f_hbm[c].at[pl.ds(st, cnt),
                                            plane_z + 1],
                                dst, sem).start()
            for j, dz in enumerate(range(-2, 3)):
                copy_z_periodic(phi_hbm, phi_ghosts,
                                phi_buf.at[s, j],
                                in_sems.at[s, 2 * NG + j],
                                plane_z + dz, 2, 2,
                                edges=((pedge_lo, pedge_hi)
                                       if edge_io else None))
            if has_mask:
                pltpu.make_async_copy(
                    mask_hbm.at[plane_z], mask_buf.at[s, 0],
                    in_sems.at[s, 2 * NG + 5]).start()
            if wetting:
                for j, dz in enumerate((-1, 0, 1)):
                    copy_z_periodic(orient_hbm, (orient_lo, orient_hi),
                                    orient_buf.at[s, j],
                                    in_sems.at[s, 2 * NG + 6 + j],
                                    plane_z + dz, 1, 1)
            if y_ghosts:
                # 3-entry windows over the (Z+2)-indexed row arrays
                # (source planes plane_z-1..plane_z+1; wetting is
                # excluded, so its sem slots are free)
                pairs_yg = [(gylo_hbm[0], gylo_buf.at[s, 0]),
                            (gylo_hbm[1], gylo_buf.at[s, 1]),
                            (gyhi_hbm[0], gyhi_buf.at[s, 0]),
                            (gyhi_hbm[1], gyhi_buf.at[s, 1]),
                            (pylo_hbm, pylo_buf.at[s]),
                            (pyhi_hbm, pyhi_buf.at[s]),
                            (prlo_hbm, prlo_buf.at[s]),
                            (prhi_hbm, prhi_buf.at[s])]
                for j, (arr, buf) in enumerate(pairs_yg):
                    pltpu.make_async_copy(
                        arr.at[pl.ds(plane_z, 3)], buf,
                        in_sems.at[s, 2 * NG + 6 + j]).start()

        def wait_gather_plus(s):
            """Wait only the cz=+1 groups (reading source plane z-1)."""
            for c in range(2):
                for gi, (cz, st, cnt) in enumerate(groups):
                    if cz != 1:
                        continue
                    pltpu.make_async_copy(
                        f_hbm[0].at[pl.ds(st, cnt), 0],
                        fs_buf.at[s, pl.ds(c * Q + st, cnt)],
                        in_sems.at[s, c * NG + gi]).wait()

        def wait_gathers(s):
            # cz=+1 groups drained by the predecessor before its
            # in-place write, except plane 0 (see pallas_step)
            for c in range(2):
                for gi, (cz, st, cnt) in enumerate(groups):
                    if cz == 1:
                        continue
                    pltpu.make_async_copy(
                        f_hbm[0].at[pl.ds(st, cnt), 0],
                        fs_buf.at[s, pl.ds(c * Q + st, cnt)],
                        in_sems.at[s, c * NG + gi]).wait()

            @pl.when(z0 == 0)
            def _():
                wait_gather_plus(s)
            for j in range(5):
                pltpu.make_async_copy(phi_hbm.at[0], phi_buf.at[s, j],
                                      in_sems.at[s, 2 * NG + j]).wait()
            if has_mask:
                pltpu.make_async_copy(
                    mask_hbm.at[0], mask_buf.at[s, 0],
                    in_sems.at[s, 2 * NG + 5]).wait()
            if wetting:
                for j in range(3):
                    pltpu.make_async_copy(
                        orient_hbm.at[0], orient_buf.at[s, j],
                        in_sems.at[s, 2 * NG + 6 + j]).wait()
            if y_ghosts:
                pairs_yg = [(gylo_hbm[0], gylo_buf.at[s, 0]),
                            (gylo_hbm[1], gylo_buf.at[s, 1]),
                            (gyhi_hbm[0], gyhi_buf.at[s, 0]),
                            (gyhi_hbm[1], gyhi_buf.at[s, 1]),
                            (pylo_hbm, pylo_buf.at[s]),
                            (pyhi_hbm, pyhi_buf.at[s]),
                            (prlo_hbm, prlo_buf.at[s]),
                            (prhi_hbm, prhi_buf.at[s])]
                for j, (arr, buf) in enumerate(pairs_yg):
                    pltpu.make_async_copy(
                        arr.at[pl.ds(0, 3)], buf,
                        in_sems.at[s, 2 * NG + 6 + j]).wait()

        def wait_out(s):
            for c in range(2):
                pltpu.make_async_copy(
                    fs_buf.at[s, pl.ds(c * Q, Q)], out_hbm[c].at[:, 0],
                    out_sems.at[s, c]).wait()

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

        if y_ghosts:
            yg_iota = jax.lax.broadcasted_iota(jnp.int32, (Y, 1), 0)
        for c in range(2):
            for i in range(Q):
                cx, cy = int(basis[i][0]), int(basis[i][1])
                if cy or cx:
                    ch = c * Q + ipos[i]
                    plane = fs_buf[slot, ch]
                    if y_ghosts and cy:
                        # wrapped edge row <- y-neighbor's row, folded
                        # into the y-shift as one static sublane
                        # concat (see pallas_step.yg_shift_rows)
                        cz_i = int(basis[i][2])
                        gbuf = gylo_buf if cy == 1 else gyhi_buf
                        row = gbuf[slot, c, pl.ds(1 - cz_i, 1),
                                   ipos[i]]
                        if cy == 1:
                            plane = jnp.concatenate(
                                [row, plane[:Y - 1]], axis=0)
                        else:
                            plane = jnp.concatenate(
                                [plane[1:], row], axis=0)
                    elif cy:
                        plane = pltpu.roll(plane, cy % Y, axis=0)
                    if cx:
                        plane = pltpu.roll(plane, cx % X, axis=1)
                    fs_buf[slot, ch] = plane

        fsl = [[fs_buf[slot, c * Q + ipos[i]] for i in range(Q)]
               for c in range(2)]

        rho = fsl[0][0]
        phi = fsl[1][0]
        for i in range(1, Q):
            rho = rho + fsl[0][i]
            phi = phi + fsl[1][i]
        mom = [signed_sum(basis[:, a], fsl[0]) for a in range(3)]
        inv_rho = 1.0 / rho
        u = [mom[a] * inv_rho for a in range(3)]
        if fvec is not None:
            u = [u[a] + jnp.asarray(0.5 * fvec[a], dtype)
                 for a in range(3)]

        # phi_w planes at z offset dz with the wall-wetting mirror.
        # y-sharded (wetting excluded): each plane's stale edge rows
        # read the fresh pr inputs (a by-value no-op for the fresh
        # z-edge/ghost planes)
        def phi_w_plane(dz):
            raw = phi_buf[slot, 2 + dz]
            if y_ghosts:
                lo = prlo_buf[slot, 1 + dz]     # (1, X)
                hi = prhi_buf[slot, 1 + dz]
                raw = jnp.where(yg_iota == 0, lo, raw)
                raw = jnp.where(yg_iota == Y - 1, hi, raw)
            if not wetting:
                return raw
            orient = orient_buf[slot, 1 + dz]
            out = raw
            for kk, vec in enumerate(g.orientation_vectors):
                ex, ey, ez = int(vec[0]), int(vec[1]), int(vec[2])
                neigh = phi_buf[slot, 2 + dz + ez]
                if ey:
                    neigh = pltpu.roll(neigh, (-ey) % Y, axis=0)
                if ex:
                    neigh = pltpu.roll(neigh, (-ex) % X, axis=1)
                out = jnp.where(orient == kk + 1,
                                neigh - jnp.asarray(wall_grad, dtype),
                                out)
            return out

        pw = {dz: phi_w_plane(dz) for dz in (-1, 0, 1)}

        def at(cx, cy, cz):
            p = pw[cz]
            if cy:
                p = pltpu.roll(p, (-cy) % Y, axis=0)
                if y_ghosts:
                    # the wrapped edge row reads the y-neighbor's phi
                    # row of the same source plane (x-rolled with the
                    # plane below)
                    buf = pyhi_buf if cy == 1 else pylo_buf
                    edge = Y - 1 if cy == 1 else 0
                    p = jnp.where(yg_iota == edge,
                                  buf[slot, 1 + cz], p)
            if cx:
                p = pltpu.roll(p, (-cx) % X, axis=1)
            return p

        # isotropic 3D stencils (ops/multigrid.laplacian_and_grad)
        fe_, fw_ = at(1, 0, 0), at(-1, 0, 0)
        fn_, fs_ = at(0, 1, 0), at(0, -1, 0)
        ft_, fb_ = at(0, 0, 1), at(0, 0, -1)
        fne, fnw = at(1, 1, 0), at(-1, 1, 0)
        fse, fsw = at(1, -1, 0), at(-1, -1, 0)
        fte, ftw = at(1, 0, 1), at(-1, 0, 1)
        fbe, fbw = at(1, 0, -1), at(-1, 0, -1)
        ftn, fts = at(0, 1, 1), at(0, -1, 1)
        fbn, fbs = at(0, 1, -1), at(0, -1, -1)
        grad_x = (-fnw - fsw - ftw - fbw + fse + fne + fte + fbe) \
            / 12.0 + (fe_ - fw_) / 6.0
        grad_y = (-fse - fsw - fts - fbs + fne + fnw + ftn + fbn) \
            / 12.0 + (fn_ - fs_) / 6.0
        grad_z = (-fbe - fbw - fbn - fbs + fte + ftw + ftn + fts) \
            / 12.0 + (ft_ - fb_) / 6.0
        lap = ((fnw + fne + fse + fsw + fte + ftw + ftn + fts
                + fbe + fbw + fbn + fbs) / 6.0
               + (ft_ + fb_ + fe_ + fw_ + fn_ + fs_) / 3.0
               - 4.0 * pw[0])

        def u_for(target):
            if target not in eq_force_map:
                return u
            u_base = u
            if fvec is not None:
                u_base = [u[a] - jnp.asarray(0.5 * fvec[a], dtype)
                          for a in range(3)]
            src = eq_force_map[target]
            if src is None or body_forces[src] is None:
                return u_base
            fs_src = body_forces[src]
            return [u_base[a] + jnp.asarray(0.5 * fs_src[a], dtype)
                    for a in range(3)]

        u0 = u_for(0)
        u1 = u_for(1)
        usq0 = u0[0] * u0[0] + u0[1] * u0[1] + u0[2] * u0[2]
        usq1 = usq0 if u1 is u0 else \
            u1[0] * u1[0] + u1[1] * u1[1] + u1[2] * u1[2]

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
            m = mask_buf[slot, 0]
            is_dry = m == 1
            is_keep = m == 2

        uF = None
        if fvec is not None:
            uF = u[0] * jnp.asarray(fvec[0], dtype) + \
                u[1] * jnp.asarray(fvec[1], dtype) + \
                u[2] * jnp.asarray(fvec[2], dtype)

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
                + jnp.asarray(few['wxy'][i], dtype) * grad_x * grad_y
                + jnp.asarray(few['wzz'][i], dtype) * grad_z * grad_z
                + jnp.asarray(few['wyz'][i], dtype) * grad_y * grad_z
                + jnp.asarray(few['wxz'][i], dtype) * grad_x * grad_z)
            feq_parts.append(t)
            geq_parts.append(jnp.asarray(few['wi'][i], dtype) * (
                jnp.asarray(Gamma, dtype) * mu + cu1 * phi
                + 1.5 * phi * (cu1 * cu1 - usq1 / 3.0)))
        feq0 = rho - sum(feq_parts)
        geq0 = phi - sum(geq_parts)
        feq = [feq0] + feq_parts
        geq = [geq0] + geq_parts

        v0s = []
        v1s = []
        mrt_corr = half_Fi = None
        if fe_mrt:
            # FE-MRT fluid relaxation (order parameter stays BGK at
            # tau_phi): moment-wise form, see
            # pallas_multi2d.fe_mrt_relax
            z = []
            half_Fi = []
            for i in range(Q):
                zi = fsl[0][i] - feq[i]
                if fvec is not None:
                    cu = signed_sum(basis[i], u)
                    cF = float(np.dot(basis[i], fvec))
                    hf = 0.5 * jnp.asarray(w_np[i], dtype) * rho * (
                        3.0 * (jnp.asarray(cF, dtype) - uF)
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
                v0 = fsl[0][i] + (feq[i] - fsl[0][i]) * inv_tau0
                if fvec is not None:
                    cu = signed_sum(basis[i], u)
                    cF = float(np.dot(basis[i], fvec))
                    pref = jnp.asarray(w_np[i], dtype) * \
                        (1.0 - 0.5 * inv_tau0)
                    v0 = v0 + pref * rho * (
                        3.0 * (jnp.asarray(cF, dtype) - uF)
                        + 9.0 * cu * cF)
            v1 = fsl[1][i] + (geq[i] - fsl[1][i]) * \
                jnp.asarray(1.0 / tau_phi, dtype)
            if has_mask:
                v0 = jnp.where(is_dry, fsl[0][opp[i]],
                               jnp.where(is_keep, fsl[0][i], v0))
                v1 = jnp.where(is_dry, fsl[1][opp[i]],
                               jnp.where(is_keep, fsl[1][i], v1))
            v0s.append(v0)
            v1s.append(v1)
        if face_io:
            def face_copy(s, c, plane_expr):
                return pltpu.make_async_copy(
                    rows_st.at[s, c], rows_out_hbm[c].at[plane_expr],
                    face_sems.at[s, c])

            # recycle the staging slot: the DMA that read it two
            # planes ago must have drained first
            @pl.when(z0 >= 2)
            def _():
                for c in range(2):
                    face_copy(slot, c, z0 - 2).wait()
            if Qp_f != Q:
                zpad = jnp.zeros((Qp_f - Q, X), dtype)
                for c in range(2):
                    for r in range(4):
                        rows_st[slot, c,
                                pl.ds(r * Qp_f + Q, Qp_f - Q)] = zpad

        # all reads above are from materialized values; safe to
        # overwrite the cache in place now
        for i in range(Q):
            fs_buf[slot, ipos[i]] = v0s[i]
            fs_buf[slot, Q + ipos[i]] = v1s[i]
            if face_io:
                for r, row in enumerate((0, 1, Y - 2, Y - 1)):
                    rows_st[slot, 0,
                            pl.ds(r * Qp_f + ipos[i], 1)] = \
                        v0s[i][row:row + 1]
                    rows_st[slot, 1,
                            pl.ds(r * Qp_f + ipos[i], 1)] = \
                        v1s[i][row:row + 1]

        # in-place safety: drain the successor's cz=+1 gathers (they
        # read the OLD plane z0) before overwriting it
        @pl.when(z0 + 1 < Z)
        def _():
            wait_gather_plus(nslot)

        for c in range(2):
            pltpu.make_async_copy(
                fs_buf.at[slot, pl.ds(c * Q, Q)], out_hbm[c].at[:, z0],
                out_sems.at[slot, c]).start()
        if face_io:
            for c in range(2):
                face_copy(slot, c, z0).start()

            @pl.when(z0 == Z - 1)
            def _():
                # drain the outstanding row emissions (no successor
                # exists to recycle these staging slots)
                for c in range(2):
                    face_copy(slot, c, Z - 1).wait()
                    if Z >= 2:
                        face_copy(nslot, c, Z - 2).wait()

        # -- emit-phi: next step's post-stream order parameter from
        # component 1's post-collision planes (see docstring; phi_out
        # is NOT aliased, so the only ordering needed is the staging
        # buffer reuse drain)
        if emit_phi:
            def pc_src(i, rel):
                ch = ipos[i]
                if rel == 0:
                    return fs_buf[slot, Q + ch]
                if rel == -1:
                    return ring1[nslot, ch - s_0]
                return ring0[nslot, ch - s_p1]

            def emitted_phi(src):
                """Same source/roll/summation order as
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

            def remit_copy(s, plane_expr):
                return pltpu.make_async_copy(
                    remit_buf.at[s], phi_out_hbm.at[plane_expr],
                    remit_sems.at[s])

            @pl.when(z0 >= 2)
            def _():
                @pl.when(z0 >= 4)
                def _():
                    remit_copy(slot, z0 - 3).wait()
                remit_buf[slot] = emitted_phi(
                    lambda i: pc_src(i, -1 - int(basis[i][2])))
                remit_copy(slot, z0 - 1).start()

            if not edge_io:
                @pl.when(z0 == 0)
                def _():
                    stash0[...] = fs_buf[slot, pl.ds(Q, s_p1)]

                @pl.when(z0 == 1)
                def _():
                    stash1[...] = fs_buf[slot, pl.ds(Q, n_m1)]

            ring0[slot] = ring1[nslot, pl.ds(s_p1 - s_0, n_p1)]
            ring1[slot] = fs_buf[slot, pl.ds(Q + s_0, NG1)]

            if not edge_io:
                @pl.when(z0 == Z - 1)
                def _():
                    def src_last(i):
                        cz_i = int(basis[i][2])
                        ch = ipos[i]
                        if cz_i == 1:      # source plane Z-2
                            return ring0[slot, ch - s_p1]
                        if cz_i == 0:      # source plane Z-1
                            return fs_buf[slot, Q + ch]
                        return stash0[ch]  # plane Z -> 0

                    def src_first(i):
                        cz_i = int(basis[i][2])
                        ch = ipos[i]
                        if cz_i == 1:      # source plane -1 -> Z-1
                            return fs_buf[slot, Q + ch]
                        if cz_i == 0:      # source plane 0
                            return stash0[ch]
                        return stash1[ch]  # plane 1

                    redge_buf[0] = emitted_phi(src_last)
                    redge_buf[1] = emitted_phi(src_first)
                    c0 = pltpu.make_async_copy(redge_buf.at[0],
                                               phi_out_hbm.at[Z - 1],
                                               redge_sems.at[0])
                    c1 = pltpu.make_async_copy(redge_buf.at[1],
                                               phi_out_hbm.at[0],
                                               redge_sems.at[1])
                    c0.start()
                    c1.start()
                    c0.wait()
                    c1.wait()

            @pl.when(z0 == Z - 1)
            def _():
                remit_copy(slot, Z - 2).wait()
                if Z >= 4:
                    remit_copy(nslot, Z - 3).wait()

        @pl.when(z0 == Z - 1)
        def _():
            wait_out(slot)
            if Z >= 2:
                wait_out(nslot)

    n_in = (11 + (2 if edge_io else 0) + (1 if has_mask else 0)
            + (3 if wetting else 0) + (8 if y_ghosts else 0))
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_in
    scratch = [
        pltpu.VMEM((2, 2 * Q, Y, X), dtype),
        pltpu.VMEM((2, 5, Y, X), dtype),
    ]
    if y_ghosts:
        Qp = gy_pad_channels(Q)
        scratch.append(pltpu.VMEM((2, 2, 3, Qp, X), dtype))  # gylo
        scratch.append(pltpu.VMEM((2, 2, 3, Qp, X), dtype))  # gyhi
        for _ in range(4):                                   # py/pr
            scratch.append(pltpu.VMEM((2, 3, 1, X), dtype))
    if face_io:
        scratch.append(pltpu.VMEM((2, 2, 4 * Qp_f, X), dtype))
    if has_mask:
        scratch.append(pltpu.VMEM((2, 1, Y, X), jnp.int32))
    if wetting:
        scratch.append(pltpu.VMEM((2, 3, Y, X), jnp.int32))
    if emit_phi:
        scratch.append(pltpu.VMEM((2, n_p1, Y, X), dtype))      # ring0
        scratch.append(pltpu.VMEM((2, NG1, Y, X), dtype))       # ring1
        if not edge_io:
            scratch.append(pltpu.VMEM((s_p1, Y, X), dtype))     # stash0
            scratch.append(pltpu.VMEM((n_m1, Y, X), dtype))     # stash1
        scratch.append(pltpu.VMEM((2, Y, X), dtype))            # remit
        if not edge_io:
            scratch.append(pltpu.VMEM((2, Y, X), dtype))        # redge
    scratch.append(pltpu.SemaphoreType.DMA(
        (2, 2 * len(groups) + 9 + (8 if y_ghosts else 0))))
    scratch.append(pltpu.SemaphoreType.DMA((2, 2)))
    if emit_phi:
        scratch.append(pltpu.SemaphoreType.DMA((2,)))           # remit
        if not edge_io:
            scratch.append(pltpu.SemaphoreType.DMA((2,)))       # redge
    if face_io:
        scratch.append(pltpu.SemaphoreType.DMA((2, 2)))         # faces

    out_shape = [jax.ShapeDtypeStruct((Q, Z, Y, X), dtype),
                 jax.ShapeDtypeStruct((Q, Z, Y, X), dtype)]
    if emit_phi:
        # NOT aliased (see docstring)
        out_shape.append(jax.ShapeDtypeStruct((Z, Y, X), dtype))
    if face_io:
        out_shape += [jax.ShapeDtypeStruct((Z, 4 * Qp_f, X), dtype)
                      for _ in range(2)]

    plane_b = Y * X * np.dtype(np.float32).itemsize
    vmem_need = (4 * Q + 10) * plane_b
    if has_mask:
        vmem_need += 2 * plane_b
    if wetting:
        vmem_need += 6 * plane_b
    if emit_phi:
        vmem_need += (2 * (n_p1 + NG1) + 4) * plane_b
        if not edge_io:
            vmem_need += (s_p1 + n_m1) * plane_b
    if face_io:
        vmem_need += 2 * 2 * 4 * Qp_f * X * 4
    vmem_limit = int(min(max(16 * 2 ** 20,
                             vmem_need + 8 * 2 ** 20 + 2 * Q * plane_b),
                         100 * 2 ** 20))

    return pl.pallas_call(
        kernel,
        grid=(Z,),
        in_specs=in_specs,
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                        for _ in range(len(out_shape))),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=vmem_limit),
        # in-place component updates (see the SC-multi kernel note)
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )


class PallasStepSCMulti3D:
    """Fused stepping for 3D ShanChenMultiStepBuilder scenes (single
    device, periodic/bounce-back boundaries, tile-aligned planes)."""

    def __init__(self, mbuilder, domain_shape, interpret=False):
        from sailfish_tpu.ops.multigrid import ShanChenMultiStepBuilder
        if not isinstance(mbuilder, ShanChenMultiStepBuilder):
            raise NotImplementedError(
                'fused multi-component stepping covers Shan-Chen '
                'mixtures and binary free energy only')
        self.mbuilder = mbuilder
        Zs, Ys, Xs = domain_shape
        self.shape = domain_shape
        b0 = mbuilder.b0
        K = len(mbuilder.components)
        mask_np, patch_rows = classify_nodes(b0.maps)
        if patch_rows:
            raise NotImplementedError(
                'the fused multi-component 3D kernel covers walls/'
                'obstacles only; complex-BC scenes use the XLA engine')
        check_plane_tiling(Ys, Xs, interpret)
        self.has_mask = bool((mask_np != 0).any())
        self.K = K
        # in-kernel rho emission replaces the K per-step pre-passes
        # (carrying (fs, rhos) between steps); needs >= 3 pipeline
        # programs for the ring/stash carries
        self.emit_rho = Zs >= 3
        Q = mbuilder.grid.Q
        _, _, groups = cz_groups(mbuilder.grid)
        n_m1 = sum(c for cz, _, c in groups if cz == -1)
        n_p1 = sum(c for cz, _, c in groups if cz == 1)
        s_0 = next(st for cz, st, c in groups if cz == 0)
        s_p1 = next(st for cz, st, c in groups if cz == 1)
        isz = np.dtype(np.float32).itemsize
        emit_planes = (2 * K * (n_p1 + (Q - s_0)) + 4 * K
                       + K * (s_p1 + n_m1)) if self.emit_rho else 0
        _check_vmem((2 * K * Q, isz), (2 * 3 * K, isz),
                    (emit_planes, isz),
                    (2 if self.has_mask else 0, 4), Y=Ys, X=Xs)
        self.mask = jnp.asarray(mask_np) if self.has_mask else None
        self.kernel = make_kernel_3d_sc_multi(
            mbuilder, Zs, Ys, Xs, has_mask=self.has_mask,
            emit_rho=self.emit_rho, interpret=interpret)
        self.rho_kernel = make_rho_kernel_3d(b0, Zs, Ys, Xs,
                                             interpret=interpret)
        qperm, qinv, _ = cz_groups(mbuilder.grid)
        self._qperm = jnp.asarray(np.asarray(qperm, np.int32))
        self._qinv = jnp.asarray(np.asarray(qinv, np.int32))

    @property
    def padded(self):
        """Kernel layout (cz-grouped Q order) differs from the public
        layout; the runner wraps step loops in pad_state/crop_state.
        In emit-rho mode the between-steps carry is (fs, rhos)."""
        return True

    def _post_stream_rhos(self, fs):
        return tuple(self.rho_kernel(f, f[:, -1], f[:, 0]) for f in fs)

    def pad_state(self, state):
        fs = tuple(f[self._qperm] for f in state)
        if self.emit_rho:
            return fs, self._post_stream_rhos(fs)
        return fs

    def crop_state(self, carry):
        fs = carry[0] if self.emit_rho else carry
        return tuple(f[self._qinv] for f in fs)

    def step(self, carry, it=0):
        if self.emit_rho:
            fs, rhos = carry
            fs, rhos = list(fs), list(rhos)
        else:
            fs = list(carry)
            rhos = list(self._post_stream_rhos(fs))
        args = (fs + [f[:, -1] for f in fs] + [f[:, 0] for f in fs]
                + rhos + [r[-1] for r in rhos] + [r[0] for r in rhos])
        if self.has_mask:
            args.append(self.mask)
        out = self.kernel(*args)
        if self.emit_rho:
            return tuple(out[:self.K]), tuple(out[self.K:])
        return tuple(out)

    def run_steps(self, state, n, it0=0):
        carry = self.pad_state(state)
        carry = jax.lax.fori_loop(
            0, n, lambda i, sc: self.step(sc, it0 + i), carry)
        return self.crop_state(carry)


class PallasStepFE3D:
    """Fused stepping for 3D binary free-energy scenes (single device,
    periodic/bounce-back boundaries incl. wetting walls)."""

    def __init__(self, mbuilder, domain_shape, interpret=False):
        Zs, Ys, Xs = domain_shape
        self.shape = domain_shape
        b0 = mbuilder.b0
        mask_np, patch_rows = classify_nodes(b0.maps)
        if patch_rows:
            raise NotImplementedError(
                'the fused FE 3D kernel covers walls/obstacles only; '
                'complex-BC scenes use the XLA engine')
        check_plane_tiling(Ys, Xs, interpret)
        self.has_mask = bool((mask_np != 0).any())
        self.wetting = bool(mbuilder._has_dry_nodes)
        # in-kernel phi emission replaces the per-step pre-pass
        # (carrying ((f0, f1), phi) between steps)
        self.emit_phi = Zs >= 3
        Q = mbuilder.grid.Q
        _, _, groups = cz_groups(mbuilder.grid)
        n_m1 = sum(c for cz, _, c in groups if cz == -1)
        n_p1 = sum(c for cz, _, c in groups if cz == 1)
        s_0 = next(st for cz, st, c in groups if cz == 0)
        s_p1 = next(st for cz, st, c in groups if cz == 1)
        isz = np.dtype(np.float32).itemsize
        emit_planes = (2 * (n_p1 + (Q - s_0)) + 4
                       + s_p1 + n_m1) if self.emit_phi else 0
        _check_vmem((4 * Q, isz), (10, isz), (emit_planes, isz),
                    (2 if self.has_mask else 0, 4),
                    (6 if self.wetting else 0, 4), Y=Ys, X=Xs)
        self.mask = jnp.asarray(mask_np) if self.has_mask else None
        self.orient = mbuilder._dry_orient if self.wetting else None
        self.kernel = make_kernel_3d_fe(
            mbuilder, Zs, Ys, Xs, has_mask=self.has_mask,
            wetting=self.wetting, emit_phi=self.emit_phi,
            interpret=interpret)
        self.rho_kernel = make_rho_kernel_3d(b0, Zs, Ys, Xs,
                                             interpret=interpret)
        qperm, qinv, _ = cz_groups(mbuilder.grid)
        self._qperm = jnp.asarray(np.asarray(qperm, np.int32))
        self._qinv = jnp.asarray(np.asarray(qinv, np.int32))

    @property
    def padded(self):
        """Kernel layout (cz-grouped Q order) differs from the public
        layout; the runner wraps step loops in pad_state/crop_state.
        In emit-phi mode the between-steps carry is ((f0, f1), phi)."""
        return True

    def _post_stream_phi(self, f1):
        return self.rho_kernel(f1, f1[:, -1], f1[:, 0])

    def pad_state(self, state):
        fs = tuple(f[self._qperm] for f in state)
        if self.emit_phi:
            return fs, self._post_stream_phi(fs[1])
        return fs

    def crop_state(self, carry):
        fs = carry[0] if self.emit_phi else carry
        return tuple(f[self._qinv] for f in fs)

    def step(self, carry, it=0):
        if self.emit_phi:
            (f0, f1), phi = carry
        else:
            f0, f1 = carry
            phi = self._post_stream_phi(f1)
        args = [f0, f1, f0[:, -1], f1[:, -1], f0[:, 0], f1[:, 0],
                phi, phi[-2], phi[-1], phi[0], phi[1]]
        if self.has_mask:
            args.append(self.mask)
        if self.wetting:
            args += [self.orient, self.orient[-1], self.orient[0]]
        out = self.kernel(*args)
        if self.emit_phi:
            return (out[0], out[1]), out[2]
        return tuple(out)

    def run_steps(self, state, n, it0=0):
        carry = self.pad_state(state)
        carry = jax.lax.fori_loop(
            0, n, lambda i, sc: self.step(sc, it0 + i), carry)
        return self.crop_state(carry)
