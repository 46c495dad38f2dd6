"""Multi-chip fused-kernel stepping: shard_map + ppermute halo exchange.

The TPU-native replacement for the reference's entire distributed stack
(per-GPU processes + collect/distribute kernels + ZeroMQ halo exchange,
subdomain_runner.py:740-811,1064-1139): the domain is z-sharded over a
1D device mesh; each step ppermutes the two boundary faces between ring
neighbors over ICI and runs the fused Pallas kernel on the local block
with those faces as ghost-plane inputs. The ring wraps, matching the
global jnp.roll periodicity (non-periodic physics comes from BC nodes,
exactly as on one device).

Complex-BC z-planes (velocity/density/outflow/half-way walls...) are
supported through the kernel's DYNAMIC patch mode: their post-collision
values are recomputed exactly by the XLA StepBuilder machinery on global
thin slabs (GSPMD inserts whatever neighbor exchange the samplers need),
packed into a per-shard padded plane array, and overlaid in-kernel via a
run-time row->slot map. One traced program serves every shard, whichever
global planes carry complex BCs -- the counterpart of the reference
running arbitrary scenes on any decomposition
(subdomain_connection.py:415-449).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from sailfish_tpu.ops.pallas_step import (
    NATIVE_BC_ENABLED, PallasStep3D, check_plane_tiling, classify_nodes,
    compute_patch_plane, compute_patch_yrow, cz_groups,
    kbc_instance_spec, kbc_round_windows, make_kernel_3d,
    make_rho_kernel_3d)


def pad_gy(a, mixed=None):
    """Pad a (Z+2, Q, X) gy ghost-row array's channel dim to the 3D
    kernels' tile-aligned extent (pallas_step.gy_pad_channels); Mosaic
    rejects dynamically offset slices with unaligned trailing
    extents."""
    from sailfish_tpu.ops.pallas_step import gy_pad_channels
    Qp = gy_pad_channels(a.shape[1], mixed)
    if Qp == a.shape[1]:
        return a
    return jnp.pad(a, ((0, 0), (0, Qp - a.shape[1]), (0, 0)))


def stream_rho_edges(grid, ipos, f, glo, ghi, gylo=None, gyhi=None):
    """Post-stream density of the two local edge z-planes from the
    post-collision state ``f`` (kernel layout) and the ppermuted
    neighbor faces ``glo``/``ghi`` -- the plane the in-kernel emission
    cannot produce on a shard. Source selection, roll and summation
    order are identical to make_rho_kernel_3d (and hence to the
    in-kernel emission), so sharded results stay BITWISE equal to the
    single-device fused engine. Returns (rho_plane_0, rho_plane_Zm1).

    ``gylo``/``gyhi`` ((Z+2, Q, X); ('z','y') meshes): the y-neighbors'
    post-collision boundary rows per SOURCE plane; the y-roll's wrapped
    edge row is overwritten from them BEFORE the x-roll, so the edge
    planes' own edge rows (the z+y corners) are correct too."""
    Z = f.shape[1]
    Y = f.shape[2]
    lo = hi = None
    for i in range(grid.Q):
        cx = int(grid.basis[i][0])
        cy = int(grid.basis[i][1])
        cz = int(grid.basis[i][2])
        ch = ipos[i]
        if cz == 1:
            p_lo, p_hi = glo[ch], f[ch, -2]
        elif cz == 0:
            p_lo, p_hi = f[ch, 0], f[ch, -1]
        else:
            p_lo, p_hi = f[ch, 1], ghi[ch]
        src_lo = 0 - cz
        src_hi = Z - 1 - cz
        if cy:
            p_lo = jnp.roll(p_lo, cy, axis=0)
            p_hi = jnp.roll(p_hi, cy, axis=0)
            if gylo is not None:
                # rolled[y] = p[y-cy]: cy=+1 wraps row 0 (true source
                # y=-1, below-neighbor row Y-1); cy=-1 wraps row Y-1
                # (true source y=Y, above-neighbor row 0)
                if cy == 1:
                    row_lo = gylo[src_lo + 1, ch]
                    row_hi = gylo[src_hi + 1, ch]
                    edge = 0
                else:
                    row_lo = gyhi[src_lo + 1, ch]
                    row_hi = gyhi[src_hi + 1, ch]
                    edge = Y - 1
                yi = jnp.arange(Y)[:, None]
                p_lo = jnp.where(yi == edge, row_lo[None, :], p_lo)
                p_hi = jnp.where(yi == edge, row_hi[None, :], p_hi)
        if cx:
            p_lo = jnp.roll(p_lo, cx, axis=1)
            p_hi = jnp.roll(p_hi, cx, axis=1)
        lo = p_lo if lo is None else lo + p_lo
        hi = p_hi if hi is None else hi + p_hi
    return lo, hi


def stream_rho_edge_rows_3d(grid, ipos, f, glo, ghi, gylo, gyhi,
                            rows=None):
    """Post-stream density of the two local edge ROWS (y=0 and y=Y-1)
    of EVERY local plane, for ('z','y')-sharded Shan-Chen stepping --
    the rows the in-kernel emission cannot produce on a y-shard.
    Source/roll/summation order matches the emission, so on a 1-y-shard
    mesh the values are bitwise identical to the in-kernel rows (and to
    stream_rho_edges' edge-plane rows at z = 0 / Z-1).
    Returns (rows_y0, rows_yYm1), each (Z, X).

    ``rows`` (optional): KERNEL-EMITTED post-collision rows
    (r0, r1, rm2, rm1) of y = 0, 1, Y-2, Y-1, each (Z, Qp, X) -- when
    given, the function never slices ``f`` (a strided row slice of the
    in-place-aliased state forces XLA to copy the whole array every
    step; benchmark/zy_overhead.py). Values are the exact stored codes,
    so results stay bitwise identical to the slicing path."""
    Z = f.shape[1]
    Y = f.shape[2]
    row_arr = None
    if rows is not None:
        r0, r1, rm2, rm1 = rows
        row_arr = {0: r0, 1: r1, Y - 2: rm2, Y - 1: rm1}
    lo = hi = None
    for i in range(grid.Q):
        cx = int(grid.basis[i][0])
        cy = int(grid.basis[i][1])
        cz = int(grid.basis[i][2])
        ch = ipos[i]

        def src_planes(row):
            """(Z, X): row ``row`` of source plane z - cz for every z
            (plane -1 from glo, plane Z from ghi)."""
            if row_arr is not None:
                core = row_arr[row][:, ch]             # (Z, X)
            else:
                core = f[ch, :, row]                   # (Z, X)
            if cz == 1:
                return jnp.concatenate(
                    [glo[ch, row][None], core[:Z - 1]], axis=0)
            if cz == -1:
                return jnp.concatenate(
                    [core[1:], ghi[ch, row][None]], axis=0)
            return core

        if cy == 1:
            # row 0 pulls y=-1 (below-neighbor row Y-1, per source
            # plane); row Y-1 pulls y=Y-2
            r_lo = gylo[1 - cz:Z + 1 - cz, ch]
            r_hi = src_planes(Y - 2)
        elif cy == -1:
            # row 0 pulls y=1; row Y-1 pulls y=Y (above-neighbor row 0)
            r_lo = src_planes(1)
            r_hi = gyhi[1 - cz:Z + 1 - cz, ch]
        else:
            r_lo = src_planes(0)
            r_hi = src_planes(Y - 1)
        if cx:
            r_lo = jnp.roll(r_lo, cx, axis=1)
            r_hi = jnp.roll(r_hi, cx, axis=1)
        lo = r_lo if lo is None else lo + r_lo
        hi = r_hi if hi is None else hi + r_hi
    return lo, hi


class ShardedPallasStep3D:
    """z-sharded fused stepping over a 1-axis mesh."""

    def __init__(self, builder, domain_shape, mesh, interpret=False):
        if list(mesh.axis_names) not in (['z'], ['z', 'y']):
            raise NotImplementedError(
                "the sharded fused kernel shards z or ('z','y'); got "
                f'mesh axes {mesh.axis_names}')
        self.builder = builder
        self.mixed = builder.mixed
        self.mesh = mesh
        self.two_axis = 'y' in mesh.axis_names
        self.nshards = mesh.shape['z']
        self.ny_shards = mesh.shape['y'] if self.two_axis else 1
        Z, Y, X = domain_shape
        assert Z % self.nshards == 0
        assert Y % self.ny_shards == 0
        Z_loc = Z // self.nshards
        Y_loc = Y // self.ny_shards
        check_plane_tiling(Y_loc, X, interpret)
        if self.mixed is not None and not interpret and Y_loc % 16:
            raise NotImplementedError(
                'mixed 16-bit storage tiles (16, 128): local Y '
                f'{Y_loc} must be a multiple of 16')
        self.shape = domain_shape
        self.local_shape = (Z_loc, Y_loc, X)

        # in-kernel native BCs on sharded meshes: uniform-parameter
        # local BC families evaluate inside the kernel on static
        # windows gated by the SHARDED mask, so the slab set is the
        # union over shards of local slab indices (shards without
        # instance nodes pay the window's compute, never its values).
        # All-or-nothing: if ANY native instance is ineligible
        # (spatially varying parameters), reclassify without native
        # instances so every complex node rides the exact dyn-patch
        # plane path, as before. Two-axis meshes stay on that path too
        # (face_io emits rows before the in-kernel BC merge).
        kbc_raw = []
        native_ok = (NATIVE_BC_ENABLED
                     and builder.sc_coupling == 0.0
                     and builder.model != 'elbm'
                     and not builder.maps.dynamic
                     and builder.force_expr is None
                     and not self.two_axis)
        if native_ok:
            mask_np, patch_rows, bc_inst, pmask_np = classify_nodes(
                builder.maps, native_bc=True, return_patch_mask=True)
            for idx, (tid, ko, sel) in enumerate(bc_inst):
                ent = kbc_instance_spec(builder, idx, tid, ko, sel)
                if ent is None:
                    native_ok = False
                    break
                kbc_raw.append(ent)
        if not native_ok:
            kbc_raw = []
            mask_np, patch_rows, pmask_np = classify_nodes(
                builder.maps, return_patch_mask=True)
        self.patch_yrows = ()
        if len(patch_rows) > PallasStep3D.MAX_PATCH_FRACTION * Z:
            # y-row patch mode (turbulence-channel layout, walls normal
            # to y): BC faces normal to x or y put a node on every
            # z-plane. If the complex-BC nodes project onto a FEW
            # y-rows, patch those instead -- on a z-mesh the wall rows
            # are LOCAL to every shard, so the global y-row recompute
            # (compute_patch_yrow, run in GSPMD-land where XLA inserts
            # the z-neighbor exchange its rolls need) slices per-shard
            # into the kernel's static patch_yrows selects. The TPU
            # counterpart of the reference running wall-bounded scenes
            # at full speed in any decomposition
            # (subdomain_runner.py:1011-1058, boundary.mako:391-416).
            yrows = sorted(int(y) for y in np.unique(
                np.nonzero(pmask_np)[1]))
            blockers = []
            if self.two_axis:
                blockers.append(
                    "y-row patches need shard-local wall rows "
                    "(1-axis z meshes only; got ('z','y'))")
            if builder.model == 'elbm':
                blockers.append('ELBM (overlaid rows would join the '
                                'Newton convergence vote)')
            if builder.sc_coupling != 0.0:
                blockers.append('Shan-Chen (global psi sampling)')
            if len(yrows) > min(PallasStep3D.MAX_PATCH_YROWS,
                                PallasStep3D.MAX_PATCH_FRACTION * Y):
                blockers.append(
                    f'{len(yrows)} distinct complex-BC y-rows (max '
                    f'{PallasStep3D.MAX_PATCH_YROWS})')
            if blockers:
                raise NotImplementedError(
                    f'{len(patch_rows)}/{Z} z-planes need complex-BC '
                    'overlays and the sharded y-row patch mode does '
                    f'not apply ({"; ".join(blockers)}); use the XLA '
                    'engine for this scene')
            self.patch_yrows = tuple(yrows)
            patch_rows = []
        self.patch_rows = patch_rows
        self.has_patches = bool(patch_rows)
        self.has_mask = bool((mask_np != 0).any())
        self.mask_global = None
        self._mask_spec = P('z', 'y', None) if self.two_axis \
            else P('z', None, None)
        if self.has_mask:
            self.mask_global = jax.device_put(
                jnp.asarray(mask_np), NamedSharding(mesh, self._mask_spec))

        self.P = 0
        if self.has_patches:
            per_shard = [[] for _ in range(self.nshards)]
            for r in patch_rows:
                per_shard[r // Z_loc].append(r % Z_loc)
            self.P = max(1, max(len(v) for v in per_shard))
            pmap = -np.ones((self.nshards, Z_loc), np.int32)
            self._slot_of_row = {}
            for s, rows in enumerate(per_shard):
                for j, rl in enumerate(rows):
                    pmap[s, rl] = j
                    self._slot_of_row[s * Z_loc + rl] = (s, j)
            self.pmap_global = jax.device_put(
                jnp.asarray(pmap), NamedSharding(mesh, P('z', None)))
            # exact-BC sub-builders over GLOBAL one-plane boxes
            self.patch_subs = []
            for r in patch_rows:
                box = (slice(r, r + 1), slice(0, Y), slice(0, X))
                self.patch_subs.append(
                    (r, box, builder.for_window(box, flatten=True)))

        self.sc = builder.sc_coupling != 0.0
        if self.sc and self.has_patches:
            raise NotImplementedError(
                'Shan-Chen with complex-BC planes needs global psi '
                'sampling in the patch windows; use the XLA engine')
        from sailfish_tpu.ops.pallas_step import pick_slab_k
        heavy = (builder.model in ('mrt', 'trt')
                 or builder.smagorinsky > 0.0)
        self.slab_k = pick_slab_k(builder.grid.Q, Z_loc, Y_loc, X,
                                  sc=self.sc, has_mask=self.has_mask,
                                  k_max=4 if heavy else 8)
        if self.sc:
            # in-kernel interior rho emission + XLA edge fixup (the
            # edge_io mode); needs >= 3 pipeline programs per shard
            while self.slab_k > 1 and Z_loc // self.slab_k < 3:
                self.slab_k //= 2
            if Z_loc // self.slab_k < 3:
                raise NotImplementedError(
                    'sharded Shan-Chen stepping needs >= 3 z-planes '
                    f'per shard (got {Z_loc}); use the XLA engine')
        # two-axis: the kernel emits its own boundary faces so nothing
        # in XLA row-slices the state (see local_step_faces; sc scenes
        # consume the emitted rows inside _sc_zy_exchange instead)
        self.face_io = self.two_axis
        self.kbc = kbc_round_windows(kbc_raw, self.slab_k, Y_loc, X,
                                     z_local=Z_loc)
        self.kernel = make_kernel_3d(
            builder, Z_loc, Y_loc, X, has_mask=self.has_mask,
            interpret=interpret, dyn_patches=self.has_patches,
            max_patches=self.P, k=self.slab_k, sc=self.sc,
            emit_rho=self.sc, edge_io=self.sc,
            y_ghosts=self.two_axis, mixed=self.mixed,
            face_io=self.face_io, patch_yrows=self.patch_yrows,
            kbc=self.kbc)
        # y-row mode: one all-z GLOBAL window per complex-BC y-row
        # (the same sub-builders the single-device engine uses, so
        # sharded == single-device bitwise)
        self.ypatch_subs = [
            builder.for_window(
                (slice(0, Z), slice(r, r + 1), slice(0, X)),
                flatten=True)
            for r in self.patch_yrows]
        self.rho_kernel = None
        if self.sc:
            self.rho_kernel = make_rho_kernel_3d(
                builder, Z_loc, Y_loc, X, interpret=interpret)
        # the kernel expects the cz-grouped Q layout (pallas_step.
        # cz_groups); the sharded state lives permuted between steps
        qperm, qinv, _ = cz_groups(builder.grid)
        self._qperm = jnp.asarray(np.asarray(qperm, np.int32))
        self._qinv = jnp.asarray(np.asarray(qinv, np.int32))
        self._qinv_np = np.asarray(qinv, np.int32)

        up = [(i, (i + 1) % self.nshards) for i in range(self.nshards)]
        down = [(i, (i - 1) % self.nshards) for i in range(self.nshards)]
        ny = self.ny_shards
        up_y = [(i, (i + 1) % ny) for i in range(ny)]
        down_y = [(i, (i - 1) % ny) for i in range(ny)]
        g = builder.grid

        ipos_np = cz_groups(builder.grid)[1]

        def local_step(f_local, *rest):
            # faces travel around the ring: my top plane becomes the
            # lower ghost of the shard above me, and vice versa
            ghost_lo = jax.lax.ppermute(f_local[:, -1], 'z', up)
            ghost_hi = jax.lax.ppermute(f_local[:, 0], 'z', down)
            args = [f_local, ghost_lo, ghost_hi]
            if self.two_axis:
                # y-boundary rows for every SOURCE plane -1..Z_loc,
                # including the z+y corner rows: extending the faces
                # with the already-ppermuted z-ghost rows BEFORE the
                # y-permute routes the corner data through the
                # intermediate neighbor (two-hop exchange)
                face_hi = jnp.concatenate(
                    [ghost_lo[:, None, -1], f_local[:, :, -1],
                     ghost_hi[:, None, -1]], axis=1)   # rows y=Y_loc-1
                face_lo = jnp.concatenate(
                    [ghost_lo[:, None, 0], f_local[:, :, 0],
                     ghost_hi[:, None, 0]], axis=1)    # rows y=0
                gylo = jax.lax.ppermute(face_hi, 'y', up_y)
                gyhi = jax.lax.ppermute(face_lo, 'y', down_y)
                # kernel expects (Z+2, Qp, X), channels tile-padded
                args += [pad_gy(jnp.swapaxes(gylo, 0, 1), self.mixed),
                         pad_gy(jnp.swapaxes(gyhi, 0, 1), self.mixed)]
            k = 0
            if self.has_mask:
                args.append(rest[k]); k += 1
            if self.has_patches:
                args.append(rest[k].reshape(-1)); k += 1
                args.append(rest[k].reshape(g.Q, self.P,
                                            Y_loc, X)); k += 1
            if self.patch_yrows:
                args.append(rest[k]); k += 1   # (Z_loc, Q, R, X)
            return self.kernel(*args)

        def local_step_faces(f, zlo, zhi, ylo, yhi, *rest):
            """('z','y') step on the (f, zlo, zhi, ylo, yhi) carry:
            the kernel's face_io outputs (its own boundary planes and
            rows, pallas_step.make_kernel_3d) are CARRIED so the state
            array is consumed by the in-place-aliased kernel alone --
            XLA-side slicing of f broke the alias and copied the whole
            state every step (measured 3567 -> 1245 MLUPS at 256^3;
            benchmark/zy_overhead.py)."""
            zlo_, zhi_ = zlo[0, 0], zhi[0, 0]      # (Q, Y, X)
            ylo_, yhi_ = ylo[0, 0], yhi[0, 0]      # (Z, Qp, X)
            ghost_lo = jax.lax.ppermute(zhi_, 'z', up)
            ghost_hi = jax.lax.ppermute(zlo_, 'z', down)
            qpad = ylo_.shape[1] - g.Q

            def crow(a, y):
                """z-ghost corner row y of a ppermuted z-face, padded
                to the (1, Qp, X) gy channel layout."""
                r = a[:, y][None]
                if qpad:
                    r = jnp.pad(r, ((0, 0), (0, qpad), (0, 0)))
                return r

            face_hi = jnp.concatenate(
                [crow(ghost_lo, -1), yhi_, crow(ghost_hi, -1)], axis=0)
            face_lo = jnp.concatenate(
                [crow(ghost_lo, 0), ylo_, crow(ghost_hi, 0)], axis=0)
            gylo = jax.lax.ppermute(face_hi, 'y', up_y)
            gyhi = jax.lax.ppermute(face_lo, 'y', down_y)
            args = [f, ghost_lo, ghost_hi, gylo, gyhi]
            j = 0
            if self.has_mask:
                args.append(rest[j]); j += 1
            pmap_l = patches = None
            if self.has_patches:
                pmap_l = rest[j].reshape(-1); j += 1
                patches = rest[j].reshape(g.Q, self.P, Y_loc, X); j += 1
                args.append(pmap_l)
                args.append(patches)
            f2, zlo2, zhi2, ylo2, yhi2 = self.kernel(*args)
            if self.has_patches:
                # the in-kernel patch overlay lands AFTER the face
                # emission; re-point the patched planes'/rows' face
                # entries at the patch values (tiny: P planes)
                has = pmap_l >= 0
                sl = jnp.maximum(pmap_l, 0)
                zlo2 = jnp.where(has[0], patches[:, sl[0]], zlo2)
                zhi2 = jnp.where(has[-1], patches[:, sl[-1]], zhi2)
                prow_lo = jnp.moveaxis(patches[:, :, 0, :], 0, 1)
                prow_hi = jnp.moveaxis(patches[:, :, -1, :], 0, 1)
                if qpad:
                    padc = ((0, 0), (0, qpad), (0, 0))
                    prow_lo = jnp.pad(prow_lo, padc)
                    prow_hi = jnp.pad(prow_hi, padc)
                sel = has[:, None, None]
                ylo2 = jnp.where(sel, prow_lo[sl], ylo2)
                yhi2 = jnp.where(sel, prow_hi[sl], yhi2)
            return (f2, zlo2[None, None], zhi2[None, None],
                    ylo2[None, None], yhi2[None, None])

        def local_init_faces(f):
            """Initial face carry: one-time XLA slices of the state
            (outside the step loop, so the defensive copy never
            recurs)."""
            zlo = f[:, 0]
            zhi = f[:, -1]
            ylo = pad_gy(jnp.swapaxes(f[:, :, 0], 0, 1), self.mixed)
            yhi = pad_gy(jnp.swapaxes(f[:, :, -1], 0, 1), self.mixed)
            return (f, zlo[None, None], zhi[None, None],
                    ylo[None, None], yhi[None, None])

        def local_step_sc(f, rho, rlo, rhi, glo, ghi, *rest):
            """Shan-Chen sharded step on the (f, rho, rlo, rhi, glo,
            ghi) carry: ghosts are CARRIED (the post-collision faces
            ppermuted at the end of the previous step), the kernel
            emits the interior rho planes, and the two edge planes the
            shard cannot emit are streamed in XLA from the fresh
            ppermuted faces (stream_rho_edges; the TPU analog of the
            reference NN-runner's macro pre-exchange,
            subdomain_runner.py:2102-2197)."""
            rglo = jax.lax.ppermute(rhi[0], 'z', up)
            rghi = jax.lax.ppermute(rlo[0], 'z', down)
            args = [f, glo[0], ghi[0], rho, rglo, rghi, rlo[0], rhi[0]]
            if self.has_mask:
                args.append(rest[0])
            f2, rho2 = self.kernel(*args)
            glo2 = jax.lax.ppermute(f2[:, -1], 'z', up)
            ghi2 = jax.lax.ppermute(f2[:, 0], 'z', down)
            lo, hi = stream_rho_edges(g, ipos_np, f2, glo2, ghi2)
            return (f2, rho2, lo[None], hi[None], glo2[None],
                    ghi2[None])

        def local_init_sc(f):
            """Initial (f, rho, rlo, rhi, glo, ghi) carry: one full
            local rho pre-pass with ppermuted ghosts."""
            glo = jax.lax.ppermute(f[:, -1], 'z', up)
            ghi = jax.lax.ppermute(f[:, 0], 'z', down)
            rho = self.rho_kernel(f, glo, ghi)
            return (f, rho, rho[0][None], rho[-1][None], glo[None],
                    ghi[None])

        def _sc_zy_exchange(f2, glo2, ghi2, rows=None):
            """Everything the ('z','y') Shan-Chen carry needs from the
            post-collision state: the f boundary rows per source plane
            (two-hop corners via the z-ghost extension), the fresh rho
            edge planes and edge rows, and the (Z+2)-indexed rr arrays
            whose ghost entries carry the z-neighbors' rows.

            ``rows`` (per-step path): the KERNEL-EMITTED post-collision
            rows (r0, r1, rm2, rm1), each (Z, Qp, X) -- row-slicing the
            in-place-aliased state in XLA forces a whole-array copy
            every step (see local_step_faces). The init path (rows
            None) slices the un-aliased initial state once."""
            if rows is None:
                face_hi = pad_gy(jnp.swapaxes(jnp.concatenate(
                    [glo2[:, None, -1], f2[:, :, -1],
                     ghi2[:, None, -1]], axis=1), 0, 1))
                face_lo = pad_gy(jnp.swapaxes(jnp.concatenate(
                    [glo2[:, None, 0], f2[:, :, 0],
                     ghi2[:, None, 0]], axis=1), 0, 1))
            else:
                r0, r1, rm2, rm1 = rows
                qpad = r0.shape[1] - g.Q

                def crow(a, y):
                    r = a[:, y][None]
                    if qpad:
                        r = jnp.pad(r, ((0, 0), (0, qpad), (0, 0)))
                    return r

                face_hi = jnp.concatenate(
                    [crow(glo2, -1), rm1, crow(ghi2, -1)], axis=0)
                face_lo = jnp.concatenate(
                    [crow(glo2, 0), r0, crow(ghi2, 0)], axis=0)
            gylo = jax.lax.ppermute(face_hi, 'y', up_y)
            gyhi = jax.lax.ppermute(face_lo, 'y', down_y)
            lo, hi = stream_rho_edges(g, ipos_np, f2, glo2, ghi2,
                                      gylo=gylo, gyhi=gyhi)
            rows_lo, rows_hi = stream_rho_edge_rows_3d(
                g, ipos_np, f2, glo2, ghi2, gylo, gyhi, rows=rows)
            rrlo = jnp.concatenate(
                [jax.lax.ppermute(rows_lo[-1:], 'z', up), rows_lo,
                 jax.lax.ppermute(rows_lo[:1], 'z', down)],
                axis=0)[:, None, :]
            rrhi = jnp.concatenate(
                [jax.lax.ppermute(rows_hi[-1:], 'z', up), rows_hi,
                 jax.lax.ppermute(rows_hi[:1], 'z', down)],
                axis=0)[:, None, :]
            return gylo, gyhi, lo, hi, rrlo, rrhi

        def local_step_sc_zy(f, rho, rlo, rhi, glo, ghi, gylo, gyhi,
                             rrlo, rrhi, *rest):
            """('z','y')-sharded Shan-Chen step. The carry holds, per
            shard: the fresh rho edge planes/rows (the planes/rows the
            in-kernel emission cannot produce), the post-collision
            z-faces and y-rows, and the (Z+2)-indexed rr row arrays.
            psi ghost rows derive from the NEIGHBORS' rr arrays by one
            y-ppermute (their z-ghost entries already carry the
            diagonal corners -- the standard two-hop exchange)."""
            rlo_, rhi_ = rlo[0, 0], rhi[0, 0]
            glo_, ghi_ = glo[0, 0], ghi[0, 0]
            gylo_, gyhi_ = gylo[0, 0], gyhi[0, 0]
            rrlo_, rrhi_ = rrlo[0, 0], rrhi[0, 0]
            rylo_ = jax.lax.ppermute(rrhi_, 'y', up_y)
            ryhi_ = jax.lax.ppermute(rrlo_, 'y', down_y)
            rglo_ = jax.lax.ppermute(rhi_, 'z', up)
            rghi_ = jax.lax.ppermute(rlo_, 'z', down)
            args = [f, glo_, ghi_, gylo_, gyhi_,
                    rho, rglo_, rghi_,
                    rlo_, rhi_, rylo_, ryhi_, rrlo_, rrhi_]
            if self.has_mask:
                args.append(rest[0])
            (f2, rho2, zlo2, zhi2, ylo2, yhi2, yl12,
             yh22) = self.kernel(*args)
            # z-faces and y-rows come from the kernel's face outputs:
            # nothing here slices the in-place-aliased state (see
            # local_step_faces for the measurement)
            glo2 = jax.lax.ppermute(zhi2, 'z', up)
            ghi2 = jax.lax.ppermute(zlo2, 'z', down)
            gylo2, gyhi2, lo, hi, rrlo2, rrhi2 = _sc_zy_exchange(
                f2, glo2, ghi2, rows=(ylo2, yl12, yh22, yhi2))
            return (f2, rho2, lo[None, None], hi[None, None],
                    glo2[None, None], ghi2[None, None],
                    gylo2[None, None], gyhi2[None, None],
                    rrlo2[None, None], rrhi2[None, None])

        def local_init_sc_zy(f):
            glo = jax.lax.ppermute(f[:, -1], 'z', up)
            ghi = jax.lax.ppermute(f[:, 0], 'z', down)
            # interior rho from the pre-pass kernel (its edge ROWS use
            # the local y-wrap and stay garbage-but-unread: every read
            # patches them from the rr arrays)
            rho = self.rho_kernel(f, glo, ghi)
            gylo, gyhi, lo, hi, rrlo, rrhi = _sc_zy_exchange(
                f, glo, ghi)
            return (f, rho, lo[None, None], hi[None, None],
                    glo[None, None], ghi[None, None],
                    gylo[None, None], gyhi[None, None],
                    rrlo[None, None], rrhi[None, None])

        in_specs = [P(None, 'z', 'y', None) if self.two_axis
                    else P(None, 'z', None, None)]
        if self.sc and self.two_axis:
            P4 = P('z', 'y', None, None)
            P5 = P('z', 'y', None, None, None)
            SPECS = (P(None, 'z', 'y', None),     # f
                     P('z', 'y', None),           # rho
                     P4, P4,                      # rlo, rhi
                     P5, P5,                      # glo, ghi
                     P5, P5,                      # gylo, gyhi
                     P5, P5)                      # rrlo, rrhi
            in_specs = list(SPECS)
        elif self.sc:
            SPECS = (P(None, 'z', None, None),    # f
                     P('z', None, None),          # rho
                     P('z', None, None),          # rlo
                     P('z', None, None),          # rhi
                     P('z', None, None, None),    # glo
                     P('z', None, None, None))    # ghi
            in_specs = list(SPECS)
        elif self.face_io:
            P5 = P('z', 'y', None, None, None)
            SPECS = (P(None, 'z', 'y', None),     # f
                     P5, P5,                      # zlo, zhi
                     P5, P5)                      # ylo, yhi
            in_specs = list(SPECS)
        if self.has_mask:
            in_specs.append(self._mask_spec)
        if self.has_patches:
            in_specs.append(P('z', None))
            in_specs.append(P(None, 'z', None, 'y', None)
                            if self.two_axis
                            else P(None, 'z', None, None, None))
        if self.patch_yrows:
            in_specs.append(P('z', None, None, None))
        if self.sc:
            step_fn = local_step_sc_zy if self.two_axis \
                else local_step_sc
            init_fn = local_init_sc_zy if self.two_axis \
                else local_init_sc
            self._sharded_step = shard_map(
                step_fn, mesh=mesh, in_specs=tuple(in_specs),
                out_specs=SPECS, check_vma=False)
            self._sharded_init = shard_map(
                init_fn, mesh=mesh,
                in_specs=(SPECS[0],),
                out_specs=SPECS, check_vma=False)
        elif self.face_io:
            self._sharded_step = shard_map(
                local_step_faces, mesh=mesh, in_specs=tuple(in_specs),
                out_specs=SPECS, check_vma=False)
            self._sharded_init = shard_map(
                local_init_faces, mesh=mesh,
                in_specs=(SPECS[0],),
                out_specs=SPECS, check_vma=False)
        else:
            out_spec = P(None, 'z', 'y', None) if self.two_axis \
                else P(None, 'z', None, None)
            self._sharded_step = shard_map(
                local_step, mesh=mesh, in_specs=tuple(in_specs),
                out_specs=out_spec, check_vma=False)

    def _compute_patches_padded(self, f, it=0):
        """Exact XLA recompute of every patched GLOBAL plane, packed as
        (Q, nshards, P, Y, X) so each shard receives its own slots."""
        g = self.builder.grid
        Z, Y, X = self.shape

        planes = {}
        for r, box, sub in self.patch_subs:
            p = compute_patch_plane(
                g, sub, f, r, Z, Y, X, it, qinv=self._qinv_np,
                mixed=self.mixed)
            if self.mixed is not None:
                p = self.mixed.quant(p)
            planes[self._slot_of_row[r]] = p

        zero = jnp.zeros((g.Q, Y, X), f.dtype)
        cols = []
        for s in range(self.nshards):
            slots = [planes.get((s, j), zero) for j in range(self.P)]
            cols.append(jnp.stack(slots, axis=1))     # (Q, P, Y, X)
        # kernel layout on the Q axis (patch DMAs copy raw channels)
        out = jnp.stack(cols, axis=1)[self._qperm]    # (Q, S, P, Y, X)
        spec = P(None, 'z', None, 'y', None) if self.two_axis \
            else P(None, 'z', None, None, None)
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(self.mesh, spec))

    def _compute_ypatches_global(self, f, it=0):
        """Complex-BC y-rows as a z-sharded (Z, Q, R, X) array in
        kernel layout, ordered like self.patch_yrows -- the exact
        global recompute the single-device engine runs
        (PallasStep3D._compute_ypatches): the window machinery's
        z-rolls wrap over the GLOBAL extent, and GSPMD inserts the
        boundary-plane exchange those rolls need on a z-mesh."""
        Z, Y, X = self.shape
        planes = [compute_patch_yrow(
            self.builder.grid, sub, f, r, Z, Y, X, it,
            qinv=self._qinv_np, mixed=self.mixed)
            for sub, r in zip(self.ypatch_subs, self.patch_yrows)]
        p = jnp.stack(planes, axis=2)           # (Q, Z, R, X)
        if self.mixed is not None:
            p = self.mixed.quant(p)
        p = p[self._qperm]
        p = jnp.moveaxis(p, 0, 1)               # (Z, Q, R, X)
        return jax.lax.with_sharding_constraint(
            p, NamedSharding(self.mesh, P('z', None, None, None)))

    @property
    def padded(self):
        """The kernel layout (cz-grouped Q order) differs from the
        public state layout; callers wrap step loops in
        pad_state/crop_state (the runner does this once per chunk)."""
        return True

    def pad_state(self, f):
        f = f[self._qperm]
        if self.mixed is not None:
            f = self.mixed.quant(f, qorder=self._qperm)
        if self.sc or self.face_io:
            return self._sharded_init(f)
        return f

    def crop_state(self, carry):
        f = carry[0] if (self.sc or self.face_io) else carry
        if self.mixed is not None:
            f = self.mixed.dequant(f, qorder=self._qperm)
        return f[self._qinv]

    def step(self, carry, it=0):
        """One sharded step on kernel-layout state (see pad_state).
        Shan-Chen scenes carry (f, rho, rlo, rhi, glo, ghi); face_io
        meshes carry (f, zlo, zhi, ylo, yhi)."""
        tup = self.sc or self.face_io
        args = list(carry) if tup else [carry]
        if self.has_mask:
            args.append(self.mask_global)
        if self.has_patches:
            f = carry[0] if tup else carry
            args.append(self.pmap_global)
            args.append(self._compute_patches_padded(f, it))
        if self.patch_yrows:
            args.append(self._compute_ypatches_global(carry, it))
        return self._sharded_step(*args)

    def run_steps(self, f, n, it0=0):
        f = self.pad_state(f)
        f = jax.lax.fori_loop(
            0, n, lambda i, fc: self.step(fc, it0 + i), f)
        return self.crop_state(f)


def _local_xwindow(xbox, X_loc, nx):
    """Lane-rounded LOCAL x-window covering a global x-interval on an
    nx-way x-sharded row: the union over shards of the interval's
    local intersections (one static window serves every shard; the
    sharded mask gates actual application)."""
    x0g, x1g = xbox
    lo = hi = None
    for s in range(nx):
        a, b = max(x0g, s * X_loc), min(x1g, (s + 1) * X_loc)
        if a < b:
            la, lb = a - s * X_loc, b - s * X_loc
            lo = la if lo is None else min(lo, la)
            hi = lb if hi is None else max(hi, lb)
    return (lo // 128 * 128, min(-(-hi // 128) * 128, X_loc))


class ShardedPallasStep2D:
    """Sharded 2D fused stepping over ('y',), ('x',) or ('y', 'x')
    meshes: each shard runs the block-cached 2D kernel with its y-wrap
    blocks replaced by ppermute'd neighbor boundary blocks and (when x
    is sharded) its x-roll wrap lanes overwritten from ppermute'd
    neighbor ghost columns; complex-BC y-blocks go through the same
    dynamic patch mode as 3D (the patch planes are computed on the
    GLOBAL pre-step array outside shard_map, so GSPMD resolves their
    cross-seam window samples, and arrive x-sharded). The 2-axis
    corner values flow by a second
    ppermute hop of the ghost columns' edge entries, the TPU analog of
    the reference's corner/edge partial transfers
    (subdomain_connection.py:238-449)."""

    def __init__(self, builder, domain_shape, mesh, interpret=False):
        axes = list(mesh.axis_names)
        if axes not in (['y'], ['x'], ['y', 'x']):
            raise NotImplementedError(
                "the sharded 2D fused kernel shards ('y',), ('x',) or "
                f"('y', 'x') meshes; got mesh axes {mesh.axis_names}")
        from sailfish_tpu.ops.pallas_step2d import (
            PallasStep2D, compute_patch_block_2d, kbc_instance_spec_2d,
            make_kernel_2d, pick_block_size)
        self.builder = builder
        self.mixed = builder.mixed
        self.mesh = mesh
        self.y_sharded = 'y' in axes
        self.x_sharded = 'x' in axes
        ny = mesh.shape['y'] if self.y_sharded else 1
        nx = mesh.shape['x'] if self.x_sharded else 1
        self.nshards = ny
        Y, X = domain_shape
        assert Y % ny == 0 and X % nx == 0
        Y_loc = Y // ny
        X_loc = X // nx
        self.shape = domain_shape

        # same block-size policy as the single-device path
        check_plane_tiling(Y_loc, X_loc, interpret, dim=2)
        by = pick_block_size(builder.grid.Q, Y_loc, X_loc)
        if self.mixed is not None and not interpret:
            # int16 tiles are (16, 128); see PallasStep2D
            if by % 16:
                by *= 2
            if by % 16 or Y_loc % by:
                raise NotImplementedError(
                    'mixed 16-bit storage needs 16-aligned y-blocks '
                    f'(local Y={Y_loc}, by={by})')
        self.by = by
        NB_loc = Y_loc // by

        # in-kernel native BCs on sharded 2D meshes (the 2D analog of
        # the 3D path above): uniform-parameter local BC families
        # evaluate inside the kernel on static windows gated by the
        # SHARDED mask -- block sets are the union over y-shards of
        # local block indices, x windows the union over x-shards of
        # each instance's local intersection (shards without instance
        # nodes pay the window's compute, never its values). The merge
        # runs BEFORE the col_io emission, so emitted boundary columns
        # carry corrected values and the mode composes with x-sharding.
        # All-or-nothing: if ANY native instance is ineligible
        # (spatially varying parameters), reclassify without native
        # instances so every complex node rides the exact global
        # dyn-patch path, as before.
        kbc_raw = []
        native_ok = (NATIVE_BC_ENABLED
                     and builder.sc_coupling == 0.0
                     and builder.model != 'elbm'
                     and not builder.maps.dynamic
                     and builder.force_expr is None)
        if native_ok:
            mask_np, patch_rows, bc_inst = classify_nodes(
                builder.maps, native_bc=True)
            for idx, (tid, ko, sel) in enumerate(bc_inst):
                ent = kbc_instance_spec_2d(builder, idx, tid, ko, sel,
                                           by)
                if ent is None:
                    native_ok = False
                    break
                kbc_raw.append(ent)
        if not native_ok:
            kbc_raw = []
            mask_np, patch_rows = classify_nodes(builder.maps)
        self.kbc = tuple(
            (code, tid, ko, rho_s, vel_s,
             tuple(sorted({(y % Y_loc) // by for y in yrows})),
             _local_xwindow(xbox, X_loc, nx))
            for code, tid, ko, rho_s, vel_s, yrows, xbox in kbc_raw)
        patch_blocks = sorted({r // by for r in patch_rows})
        if len(patch_blocks) > PallasStep2D.MAX_PATCH_FRACTION * (Y // by):
            raise NotImplementedError(
                f'{len(patch_blocks)}/{Y // by} y-blocks need complex-BC '
                'patches; use the XLA engine for this scene')
        if patch_blocks and self.x_sharded and \
                builder.sc_coupling != 0.0:
            raise NotImplementedError(
                'x-sharded Shan-Chen with complex-BC blocks would '
                'need psi sampling inside the patch windows; use the '
                'XLA engine')
        self.has_patches = bool(patch_blocks)
        self.has_mask = bool((mask_np != 0).any())
        self.mask_global = None
        self._fspec = P(None, 'y' if self.y_sharded else None,
                        'x' if self.x_sharded else None)
        mspec = P('y' if self.y_sharded else None,
                  'x' if self.x_sharded else None)
        if self.has_mask:
            self.mask_global = jax.device_put(
                jnp.asarray(mask_np), NamedSharding(mesh, mspec))

        self.P = 0
        self._patch_fn = compute_patch_block_2d
        if self.has_patches:
            per_shard = [[] for _ in range(self.nshards)]
            for b in patch_blocks:
                per_shard[b // NB_loc].append(b % NB_loc)
            self.P = max(1, max(len(v) for v in per_shard))
            pmap = -np.ones((self.nshards, NB_loc), np.int32)
            self._slot_of_block = {}
            for s, blocks in enumerate(per_shard):
                for j, bl in enumerate(blocks):
                    pmap[s, bl] = j
                    self._slot_of_block[s * NB_loc + bl] = (s, j)
            self.pmap_global = jax.device_put(
                jnp.asarray(pmap),
                NamedSharding(mesh, P('y' if self.y_sharded else None,
                                      None)))
            self.patch_subs = []
            for b in patch_blocks:
                box = (slice(b * by, (b + 1) * by), slice(0, X))
                self.patch_subs.append(
                    (b, box, builder.for_window(box, flatten=True)))

        self.sc = builder.sc_coupling != 0.0
        if self.sc and self.has_patches:
            raise NotImplementedError(
                'Shan-Chen with complex-BC blocks needs global psi '
                'sampling in the patch windows; use the XLA engine')
        if self.sc and NB_loc < 4:
            raise NotImplementedError(
                'sharded 2D Shan-Chen stepping needs >= 4 y-blocks '
                f'per shard (Y_loc={Y_loc}, by={by})')
        # Shan-Chen x-sharding: the psi wrap lanes read raw-rho
        # neighbor columns (kernel rxcol input) and the carried rho's
        # stale edge columns are re-streamed in XLA each step
        # (stream_rho_edge_cols_2d); the in-kernel edge-ROW fix
        # (edge_io) is a y-sharding concern only
        self.kernel = make_kernel_2d(
            builder, Y_loc, X_loc, by=by, has_mask=self.has_mask,
            interpret=interpret, sc=self.sc, emit_rho=self.sc,
            edge_io=self.sc and self.y_sharded,
            dyn_patches=self.has_patches, max_patches=self.P,
            mixed=self.mixed, x_ghosts=self.x_sharded,
            col_io=self.x_sharded, kbc=self.kbc)
        # x-sharded non-SC: the kernel emits its boundary columns and
        # the step carries (f, colx) -- ppermuting a strided column
        # slice of the in-place-aliased state forces XLA to copy the
        # whole array every step (benchmark/x_ghost_overhead.py:
        # 8160 -> 3650 MLUPS at 4096^2 from the two xcol ppermutes)
        self.col_io = self.x_sharded and not self.sc
        self.rho_kernel = None
        if self.sc:
            from sailfish_tpu.ops.pallas_step2d import make_rho_kernel_2d
            self.rho_kernel = make_rho_kernel_2d(
                builder, Y_loc, X_loc, by=by, interpret=interpret)

        up = [(i, (i + 1) % ny) for i in range(ny)]
        down = [(i, (i - 1) % ny) for i in range(ny)]
        upx = [(i, (i + 1) % nx) for i in range(nx)]
        downx = [(i, (i - 1) % nx) for i in range(nx)]
        g = builder.grid
        basis = g.basis
        xdirs = [i for i in range(g.Q) if int(basis[i][0]) != 0]
        mx = self.mixed

        def build_xcols(f_local):
            """(Y_loc, 128) fp32, lane j = the post-roll wrap column
            for direction xdirs[j]: f_i of the x-neighbor at row
            y - c_y, the wrapped y entry resolved from the DIAGONAL
            neighbor by a second ppermute hop (corner transfer). The
            kernel overwrites the one lane its local roll wrapped."""
            # from the x-1 neighbor: its last column (for c_x = +1
            # pulls); from the x+1 neighbor: its first column
            recv_last = jax.lax.ppermute(
                f_local[:, :, X_loc - 1], 'x', upx)
            recv_first = jax.lax.ppermute(f_local[:, :, 0], 'x', downx)
            cols = []
            for i in xdirs:
                cx, cy = int(basis[i][0]), int(basis[i][1])
                src = recv_last[i] if cx == 1 else recv_first[i]
                if mx is not None:
                    src = mx.dequant_i(i, src)
                if cy:
                    shifted = jnp.roll(src, cy)
                    if self.y_sharded:
                        if cy == 1:
                            e = jax.lax.ppermute(
                                src[Y_loc - 1:], 'y', up)
                            shifted = jnp.concatenate(
                                [e, shifted[1:]], axis=0)
                        else:
                            e = jax.lax.ppermute(src[:1], 'y', down)
                            shifted = jnp.concatenate(
                                [shifted[:-1], e], axis=0)
                    src = shifted
                cols.append(src)
            xc = jnp.stack(cols, axis=1).astype(jnp.float32)
            return jnp.pad(xc, ((0, 0), (0, 128 - len(xdirs))))

        def local_step(f_local, *rest):
            if self.y_sharded:
                ghost_lo = jax.lax.ppermute(f_local[:, -by:], 'y', up)
                ghost_hi = jax.lax.ppermute(f_local[:, :by], 'y', down)
            else:
                # local periodic wrap; materialized copies (the kernel
                # writes f in place)
                ghost_lo = f_local[:, -by:]
                ghost_hi = f_local[:, :by]
            args = [f_local, ghost_lo, ghost_hi]
            if self.x_sharded:
                args.append(build_xcols(f_local))
            r = 0
            if self.has_mask:
                args.append(rest[r]); r += 1
            if self.has_patches:
                args.append(rest[r].reshape(-1)); r += 1
                args.append(
                    rest[r].reshape(g.Q, self.P, by, X_loc)); r += 1
            return self.kernel(*args)

        Qn = g.Q

        def build_xcols_emitted(colx):
            """xcol input from the KERNEL-EMITTED boundary columns of
            the previous step ((Y_loc, 128) fp32, lane i = x=0 column
            of direction i, lane Q+i = x=X-1): same two-hop corner
            exchange as build_xcols, but nothing slices the in-place-
            aliased state (the emitted array has no aliased
            consumer)."""
            recv_last = jax.lax.ppermute(colx[:, Qn:2 * Qn], 'x', upx)
            recv_first = jax.lax.ppermute(colx[:, :Qn], 'x', downx)
            cols = []
            for i in xdirs:
                cx, cy = int(basis[i][0]), int(basis[i][1])
                src = recv_last[:, i] if cx == 1 else recv_first[:, i]
                if cy:
                    shifted = jnp.roll(src, cy)
                    if self.y_sharded:
                        if cy == 1:
                            e = jax.lax.ppermute(
                                src[Y_loc - 1:], 'y', up)
                            shifted = jnp.concatenate(
                                [e, shifted[1:]], axis=0)
                        else:
                            e = jax.lax.ppermute(src[:1], 'y', down)
                            shifted = jnp.concatenate(
                                [shifted[:-1], e], axis=0)
                    src = shifted
                cols.append(src)
            xc = jnp.stack(cols, axis=1)
            return jnp.pad(xc, ((0, 0), (0, 128 - len(xdirs))))

        def _patch_col_fix(colx2, pmap_l, patches):
            """Overwrite patched blocks' rows of the emitted column
            array from the (fresh, un-aliased) patch planes -- the
            kernel DMAs zeros there (pallas_step2d col_io)."""
            slot_rows = jnp.repeat(pmap_l, by)          # (Y_loc,)
            has = slot_rows >= 0
            sl = jnp.maximum(slot_rows, 0)
            j = sl * by + (jnp.arange(Y_loc) % by)
            plo = patches[:, :, :, 0].reshape(Qn, -1)[:, j]
            phi_ = patches[:, :, :, X_loc - 1].reshape(Qn, -1)[:, j]
            if mx is not None:
                plo = jnp.stack([mx.dequant_i(i, plo[i])
                                 for i in range(Qn)])
                phi_ = jnp.stack([mx.dequant_i(i, phi_[i])
                                  for i in range(Qn)])
            fix = jnp.concatenate([plo.T, phi_.T], axis=1)
            fix = jnp.pad(fix, ((0, 0), (0, 128 - 2 * Qn)))
            return jnp.where(has[:, None], fix, colx2)

        def local_step_cols(f_local, colx, *rest):
            """x-sharded non-SC step on the (f, colx) carry."""
            if self.y_sharded:
                ghost_lo = jax.lax.ppermute(f_local[:, -by:], 'y', up)
                ghost_hi = jax.lax.ppermute(f_local[:, :by], 'y', down)
            else:
                ghost_lo = f_local[:, -by:]
                ghost_hi = f_local[:, :by]
            args = [f_local, ghost_lo, ghost_hi,
                    build_xcols_emitted(colx)]
            r = 0
            pmap_l = patches = None
            if self.has_mask:
                args.append(rest[r]); r += 1
            if self.has_patches:
                pmap_l = rest[r].reshape(-1); r += 1
                patches = rest[r].reshape(g.Q, self.P, by, X_loc)
                r += 1
                args.append(pmap_l)
                args.append(patches)
            f2, colx2 = self.kernel(*args)
            if self.has_patches:
                colx2 = _patch_col_fix(colx2, pmap_l, patches)
            return f2, colx2

        def slice_cols_init(f_local, groups):
            """Initial (Y_loc, 128) colx: one-time column slices of
            the un-aliased initial state, lane semantics identical to
            the kernel emission (lane g*Q + i = column groups[g] of
            direction i, dequantized under mixed) -- the two boundary
            columns; sc adds the inner pair (the rho edge-column
            re-stream's cross-x sources)."""
            cols = []
            for c in groups:
                for i in range(Qn):
                    col = f_local[i, :, c]
                    if mx is not None:
                        col = mx.dequant_i(i, col)
                    cols.append(col)
            colx = jnp.stack(cols, axis=1).astype(jnp.float32)
            return jnp.pad(colx, ((0, 0), (0, 128 - len(cols))))

        def local_init_cols(f_local):
            """Initial (f, colx) carry (x-sharded non-SC)."""
            return f_local, slice_cols_init(f_local, (0, X_loc - 1))

        def _f_col_ext(f2, c, glo_blk, ghi_blk):
            """(Q, Y+2) column c of the post-collision state extended
            with the y-ghost entries (rows -1 and Y) from the boundary
            blocks (ppermuted neighbors, or local wrap copies when y
            is unsharded) -- so ONE x-hop carries the corners too."""
            return jnp.concatenate(
                [glo_blk[:, -1:, c], f2[:, :, c], ghi_blk[:, :1, c]],
                axis=1)

        def _fx_cols(f2, glo_blk, ghi_blk):
            """The x-neighbors' boundary f columns (Q, Y+2); INIT-ONLY
            (slices the un-aliased initial state)."""
            fxlo = jax.lax.ppermute(
                _f_col_ext(f2, X_loc - 1, glo_blk, ghi_blk), 'x', upx)
            fxhi = jax.lax.ppermute(
                _f_col_ext(f2, 0, glo_blk, ghi_blk), 'x', downx)
            return fxlo, fxhi

        def _fx_cols_emitted(colx2, glo_blk, ghi_blk):
            """_fx_cols from the KERNEL-EMITTED boundary columns of
            this step's output (per-step path: column-slicing the
            in-place-aliased state into a collective forces a
            whole-array copy, see build_xcols_emitted). Ghost entries
            come from the ppermuted boundary blocks (y-sharded;
            fresh buffers) or the emitted columns' own wrap rows."""
            exts = []
            for side, c in ((1, X_loc - 1), (0, 0)):
                core = colx2[:, side * Qn:side * Qn + Qn].T  # (Q, Y)
                if self.y_sharded:
                    ext = jnp.concatenate(
                        [glo_blk[:, -1:, c], core, ghi_blk[:, :1, c]],
                        axis=1)
                else:
                    ext = jnp.concatenate(
                        [core[:, Y_loc - 1:], core, core[:, :1]],
                        axis=1)
                exts.append(ext)
            fxlo = jax.lax.ppermute(exts[0], 'x', upx)
            fxhi = jax.lax.ppermute(exts[1], 'x', downx)
            return fxlo, fxhi

        def build_rxcols(rho_f):
            """(Y, 128) raw-rho psi ghost columns for the kernel's
            rxcol input (lane 3*side + (dy+1)); the carried rho's
            edge columns are fresh at every row (the carry
            invariant), so one y-extension + one x-hop covers the
            dy = +-1 corner entries. INIT-ONLY: per-step calls use
            build_rxcols_from on the carried edge-column pair
            (column-slicing the in-place-aliased rho into a
            collective forces a whole-array copy)."""
            return build_rxcols_from(
                jnp.stack([rho_f[:, 0], rho_f[:, X_loc - 1]], axis=1))

        def build_rxcols_from(recols):
            """build_rxcols from the carried (Y_loc, 2) fresh edge
            columns (col x=0, col x=X-1) streamed by the previous
            step -- an un-aliased array, safe to feed collectives."""
            def ext(col):
                if self.y_sharded:
                    e_lo = jax.lax.ppermute(col[-1:], 'y', up)
                    e_hi = jax.lax.ppermute(col[:1], 'y', down)
                else:
                    e_lo, e_hi = col[-1:], col[:1]
                return jnp.concatenate([e_lo, col, e_hi])
            rxR = jax.lax.ppermute(ext(recols[:, 0]), 'x', downx)
            rxL = jax.lax.ppermute(ext(recols[:, 1]), 'x', upx)
            lanes = [se[1 + dy:Y_loc + 1 + dy]
                     for se in (rxR, rxL) for dy in (-1, 0, 1)]
            rx = jnp.stack(lanes, axis=1)
            return jnp.pad(rx, ((0, 0), (0, 128 - 6)))

        def _patch_cols(rho2, c0, cX):
            xi = jnp.arange(X_loc)[None, :]
            rho2 = jnp.where(xi == 0, c0[:, None], rho2)
            return jnp.where(xi == X_loc - 1, cX[:, None], rho2)

        def local_step_sc(f, rho, rlo, rhi, glo, ghi, *rest):
            """Shan-Chen sharded 2D step on the (f, rho, rlo, rhi,
            glo, ghi) carry; the 2D counterpart of the 3D sc path
            (interior rows emitted in-kernel, the two global edge rows
            streamed in XLA from the ppermuted faces). x-sharded
            meshes carry (colx, recols) too: the kernel-emitted f
            boundary columns and the fresh rho edge-column pair feed
            the next step's x-exchange, so nothing column-slices the
            in-place-aliased arrays (see build_xcols_emitted)."""
            from sailfish_tpu.parallel.halo_multi import (
                stream_rho_edge_cols_2d, stream_rho_edge_rows_2d)
            r = 0
            colx = recols = None
            if self.x_sharded:
                colx = rest[r]; r += 1
                recols = rest[r]; r += 1
            zpad = jnp.zeros((by - 1, X_loc), f.dtype)
            rglo = jnp.concatenate(
                [zpad, jax.lax.ppermute(rhi[0], 'y', up)], axis=0)
            rghi = jnp.concatenate(
                [jax.lax.ppermute(rlo[0], 'y', down), zpad], axis=0)
            args = [f, glo[0], ghi[0]]
            if self.x_sharded:
                args.append(build_xcols_emitted(colx))
            args += [rho, rglo, rghi, rlo[0], rhi[0]]
            if self.x_sharded:
                args.append(build_rxcols_from(recols))
            if self.has_mask:
                args.append(rest[r])
            out = self.kernel(*args)
            if self.x_sharded:
                f2, rho2, colx2 = out
            else:
                f2, rho2 = out
            glo2 = jax.lax.ppermute(f2[:, -by:], 'y', up)
            ghi2 = jax.lax.ppermute(f2[:, :by], 'y', down)
            if self.x_sharded:
                fxlo, fxhi = _fx_cols_emitted(colx2, glo2, ghi2)
                lo, hi = stream_rho_edge_rows_2d(g, f2, glo2, ghi2,
                                                 fxlo, fxhi)
                c0, cX = stream_rho_edge_cols_2d(
                    g, f2, glo2, ghi2, fxlo, fxhi,
                    cols=(colx2, Qn))
                rho2 = _patch_cols(rho2, c0, cX)
                return (f2, rho2, lo[None], hi[None], glo2[None],
                        ghi2[None], colx2,
                        jnp.stack([c0, cX], axis=1))
            lo, hi = stream_rho_edge_rows_2d(g, f2, glo2, ghi2)
            return (f2, rho2, lo[None], hi[None], glo2[None],
                    ghi2[None])

        def local_init_sc(f):
            glo = jax.lax.ppermute(f[:, -by:], 'y', up)
            ghi = jax.lax.ppermute(f[:, :by], 'y', down)
            from sailfish_tpu.parallel.halo_multi import (
                stream_rho_edge_cols_2d, stream_rho_edge_rows_2d)
            rho = self.rho_kernel(f)   # edge rows stale (local wrap)
            if self.x_sharded:
                fxlo, fxhi = _fx_cols(f, glo, ghi)
                lo, hi = stream_rho_edge_rows_2d(g, f, glo, ghi,
                                                 fxlo, fxhi)
                c0, cX = stream_rho_edge_cols_2d(g, f, glo, ghi,
                                                 fxlo, fxhi)
                rho = _patch_cols(rho, c0, cX)
                colx = slice_cols_init(
                    f, (0, X_loc - 1, 1, X_loc - 2))
                return (f, rho, lo[None], hi[None], glo[None],
                        ghi[None], colx,
                        jnp.stack([c0, cX], axis=1))
            lo, hi = stream_rho_edge_rows_2d(g, f, glo, ghi)
            return (f, rho, lo[None], hi[None], glo[None], ghi[None])

        def local_step_sc_x(f, rho, colx, recols, *rest):
            """Shan-Chen on an ('x',)-only mesh: y wraps locally, so
            the carry is (f, rho, colx, recols) with rho fully fresh
            (edge columns re-streamed each step from the kernel-
            emitted columns -- nothing column-slices the aliased
            arrays, see build_xcols_emitted)."""
            from sailfish_tpu.parallel.halo_multi import \
                stream_rho_edge_cols_2d
            args = [f, f[:, -by:], f[:, :by],
                    build_xcols_emitted(colx), rho,
                    build_rxcols_from(recols)]
            if self.has_mask:
                args.append(rest[0])
            f2, rho2, colx2 = self.kernel(*args)
            fxlo, fxhi = _fx_cols_emitted(colx2, None, None)
            c0, cX = stream_rho_edge_cols_2d(g, f2, None, None,
                                             fxlo, fxhi,
                                             cols=(colx2, Qn))
            return (f2, _patch_cols(rho2, c0, cX), colx2,
                    jnp.stack([c0, cX], axis=1))

        def local_init_sc_x(f):
            from sailfish_tpu.parallel.halo_multi import \
                stream_rho_edge_cols_2d
            rho = self.rho_kernel(f)   # edge lanes stale (local wrap)
            glo = f[:, -by:]
            ghi = f[:, :by]
            fxlo, fxhi = _fx_cols(f, glo, ghi)
            c0, cX = stream_rho_edge_cols_2d(g, f, glo, ghi,
                                             fxlo, fxhi)
            colx = slice_cols_init(f, (0, X_loc - 1, 1, X_loc - 2))
            return (f, _patch_cols(rho, c0, cX), colx,
                    jnp.stack([c0, cX], axis=1))

        in_specs = [self._fspec]
        yax = 'y' if self.y_sharded else None
        xax = 'x' if self.x_sharded else None
        if self.sc:
            if self.y_sharded:
                SPECS = (P(None, yax, xax),        # f
                         P(yax, xax),              # rho
                         P(yax, None, xax),        # rlo
                         P(yax, None, xax),        # rhi
                         P(yax, None, None, xax),  # glo
                         P(yax, None, None, xax))  # ghi
                sc_step_fn, sc_init_fn = local_step_sc, local_init_sc
            else:
                SPECS = (P(None, None, xax), P(None, xax))
                sc_step_fn, sc_init_fn = local_step_sc_x, \
                    local_init_sc_x
            if self.x_sharded:
                # kernel-emitted colx (Y_loc, 128) + the fresh rho
                # edge-column pair (Y_loc, 2); both per-x-shard
                SPECS = SPECS + (P(yax, xax), P(yax, xax))
            in_specs = list(SPECS)
        if self.has_mask:
            in_specs.append(mspec)
        if self.has_patches:
            in_specs.append(P(yax, None))
            in_specs.append(P(None, yax, None, None, xax))
        if self.sc:
            self._sharded_step = shard_map(
                sc_step_fn, mesh=mesh, in_specs=tuple(in_specs),
                out_specs=SPECS, check_vma=False)
            self._sharded_init = shard_map(
                sc_init_fn, mesh=mesh, in_specs=(SPECS[0],),
                out_specs=SPECS, check_vma=False)
        elif self.col_io:
            CSPECS = (self._fspec, P(yax, xax))
            in_specs = list(CSPECS) + in_specs[1:]
            self._sharded_step = shard_map(
                local_step_cols, mesh=mesh, in_specs=tuple(in_specs),
                out_specs=CSPECS, check_vma=False)
            self._sharded_init = shard_map(
                local_init_cols, mesh=mesh, in_specs=(CSPECS[0],),
                out_specs=CSPECS, check_vma=False)
        else:
            self._sharded_step = shard_map(
                local_step, mesh=mesh, in_specs=tuple(in_specs),
                out_specs=self._fspec, check_vma=False)

    def _compute_patches_padded(self, f, it=0):
        g = self.builder.grid
        _, X = self.shape
        planes = {}
        for b, box, sub in self.patch_subs:
            p = self._patch_fn(
                g, sub, f, box, self.by, X, it, mixed=self.mixed)
            if self.mixed is not None:
                p = self.mixed.quant(p)
            planes[self._slot_of_block[b]] = p
        zero = jnp.zeros((g.Q, self.by, X), f.dtype)
        cols = []
        for s in range(self.nshards):
            slots = [planes.get((s, j), zero) for j in range(self.P)]
            cols.append(jnp.stack(slots, axis=1))
        out = jnp.stack(cols, axis=1)       # (Q, S, P, by, X)
        return jax.lax.with_sharding_constraint(
            out, NamedSharding(
                self.mesh,
                P(None, 'y' if self.y_sharded else None, None, None,
                  'x' if self.x_sharded else None)))

    @property
    def padded(self):
        """Shan-Chen scenes carry (f, rho, rlo, rhi, glo, ghi);
        x-sharded non-SC scenes carry (f, colx); mixed scenes carry
        int16 codes; the runner wraps step loops in
        pad_state/crop_state."""
        return self.sc or self.col_io or self.mixed is not None

    def pad_state(self, f):
        if self.mixed is not None:
            f = self.mixed.quant(f)
        if self.sc or self.col_io:
            return self._sharded_init(f)
        return f

    def crop_state(self, carry):
        f = carry[0] if (self.sc or self.col_io) else carry
        if self.mixed is not None:
            return self.mixed.dequant(f)
        return f

    def step(self, carry, it=0):
        tup = self.sc or self.col_io
        args = list(carry) if tup else [carry]
        if self.has_mask:
            args.append(self.mask_global)
        if self.has_patches:
            args.append(self.pmap_global)
            args.append(self._compute_patches_padded(
                carry[0] if tup else carry, it))
        return self._sharded_step(*args)

    def run_steps(self, f, n, it0=0):
        carry = self.pad_state(f)
        carry = jax.lax.fori_loop(
            0, n, lambda i, fc: self.step(fc, it0 + i), carry)
        return self.crop_state(carry)
