"""Multi-chip fused stepping for K-component models (Shan-Chen
mixtures + binary free energy), 3D z-sharded and 2D y-sharded:
shard_map + ppermute halo exchange.

The reference runs multiphase models multi-GPU through the NN runner's
two-phase step -- a macro-field (density/order-parameter) exchange
between the distribution exchanges (subdomain_runner.py:1840-2197, step
at :2102). The TPU design folds both exchanges into the carry: each
step ppermutes (a) the post-collision distribution faces (the ghost
planes of the next step's pull streaming) and (b) the post-stream
density edge planes the in-kernel emission cannot produce on a shard
(they need the neighbor's post-collision faces). Those edge planes are
streamed in XLA from the already-ppermuted faces with the exact
summation order of the rho pre-pass kernel (parallel.halo.
stream_rho_edges), so N-shard results stay BITWISE equal to the
single-device fused engine (tests/test_multi_pallas.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from sailfish_tpu.ops.pallas_step import (check_plane_tiling,
                                          classify_nodes, cz_groups,
                                          make_rho_kernel_3d)
from sailfish_tpu.parallel.halo import (pad_gy, stream_rho_edges,
                                         stream_rho_edge_rows_3d)


def _ring(nshards):
    up = [(i, (i + 1) % nshards) for i in range(nshards)]
    down = [(i, (i - 1) % nshards) for i in range(nshards)]
    return up, down


def _check_z_mesh(mesh, Z, allow_zy=False):
    axes = list(mesh.axis_names)
    if axes != ['z'] and not (allow_zy and axes == ['z', 'y']):
        raise NotImplementedError(
            'the sharded fused multi-component kernel shards '
            + ("z or ('z','y')" if allow_zy else 'the z axis only')
            + f'; got mesh axes {mesh.axis_names}')
    nshards = mesh.shape['z']
    assert Z % nshards == 0
    Z_loc = Z // nshards
    if Z_loc < 3:
        raise NotImplementedError(
            'sharded multi-component stepping needs >= 3 z-planes per '
            f'shard (got {Z_loc}); use the XLA engine')
    return nshards, Z_loc


class ShardedPallasSCMulti3D:
    """z-sharded fused stepping for 3D Shan-Chen mixtures (K
    components; walls/obstacles only, like the single-device kernel).

    Carry: (fs, rhos, rlos, rhis, glos, ghis) -- K distribution sets,
    K interior-emitted densities, K fresh edge-plane pairs, K
    ppermuted post-collision neighbor faces."""

    def __init__(self, mbuilder, domain_shape, mesh, interpret=False):
        from sailfish_tpu.ops.multigrid import ShanChenMultiStepBuilder
        from sailfish_tpu.ops.pallas_multi3d import (
            _check_vmem, make_kernel_3d_sc_multi)
        if not isinstance(mbuilder, ShanChenMultiStepBuilder):
            raise NotImplementedError(
                'fused multi-component stepping covers Shan-Chen '
                'mixtures and binary free energy only')
        Z, Y, X = domain_shape
        self.shape = domain_shape
        self.mesh = mesh
        self.nshards, Z_loc = _check_z_mesh(mesh, Z, allow_zy=True)
        self.two_axis = 'y' in mesh.axis_names
        self.ny_shards = mesh.shape['y'] if self.two_axis else 1
        assert Y % self.ny_shards == 0
        Y_loc = Y // self.ny_shards
        check_plane_tiling(Y_loc, X, interpret)
        b0 = mbuilder.b0
        K = self.K = len(mbuilder.components)
        mask_np, patch_rows = classify_nodes(b0.maps)
        if patch_rows:
            raise NotImplementedError(
                'the fused multi-component 3D kernel covers walls/'
                'obstacles only; complex-BC scenes use the XLA engine')
        self.has_mask = bool((mask_np != 0).any())
        Q = mbuilder.grid.Q
        _, ipos_np, groups = cz_groups(mbuilder.grid)
        n_m1 = sum(c for cz, _, c in groups if cz == -1)
        n_p1 = sum(c for cz, _, c in groups if cz == 1)
        s_0 = next(st for cz, st, c in groups if cz == 0)
        isz = np.dtype(np.float32).itemsize
        _check_vmem((2 * K * Q, isz), (2 * 3 * K, isz),
                    (2 * K * (n_p1 + (Q - s_0)) + 2 * K, isz),
                    (2 if self.has_mask else 0, 4), Y=Y_loc, X=X)
        self.mask_global = None
        self._mask_spec = P('z', 'y', None) if self.two_axis \
            else P('z', None, None)
        if self.has_mask:
            self.mask_global = jax.device_put(
                jnp.asarray(mask_np),
                NamedSharding(mesh, self._mask_spec))
        self.kernel = make_kernel_3d_sc_multi(
            mbuilder, Z_loc, Y_loc, X, has_mask=self.has_mask,
            emit_rho=True, edge_io=True, y_ghosts=self.two_axis,
            face_io=self.two_axis, interpret=interpret)
        self.rho_kernel = make_rho_kernel_3d(b0, Z_loc, Y_loc, X,
                                             interpret=interpret)
        qperm, qinv, _ = cz_groups(mbuilder.grid)
        self._qperm = jnp.asarray(np.asarray(qperm, np.int32))
        self._qinv = jnp.asarray(np.asarray(qinv, np.int32))
        up, down = _ring(self.nshards)
        up_y, down_y = _ring(self.ny_shards)
        g = mbuilder.grid

        from sailfish_tpu.ops.pallas_step import gy_pad_channels
        Qp_f = gy_pad_channels(g.Q)

        def _zy_exchange(f2, glo2, ghi2, rows=None):
            """Per-component ('z','y') carry pieces from the
            post-collision state (the K-component twin of
            parallel.halo's _sc_zy_exchange).

            ``rows`` (per-step path): the kernel's (Z, 4*Qp, X) face
            output -- nothing here may row-slice the in-place-aliased
            state (see pallas_step.make_kernel_3d face_io). The init
            path (rows None) slices the un-aliased initial state
            once."""
            if rows is None:
                face_hi = pad_gy(jnp.swapaxes(jnp.concatenate(
                    [glo2[:, None, -1], f2[:, :, -1],
                     ghi2[:, None, -1]], axis=1), 0, 1))
                face_lo = pad_gy(jnp.swapaxes(jnp.concatenate(
                    [glo2[:, None, 0], f2[:, :, 0],
                     ghi2[:, None, 0]], axis=1), 0, 1))
                row_t = None
            else:
                row_t = tuple(rows[:, r * Qp_f:(r + 1) * Qp_f]
                              for r in range(4))
                qpad = Qp_f - g.Q

                def crow(a, y):
                    r = a[:, y][None]
                    if qpad:
                        r = jnp.pad(r, ((0, 0), (0, qpad), (0, 0)))
                    return r

                face_hi = jnp.concatenate(
                    [crow(glo2, -1), row_t[3], crow(ghi2, -1)], axis=0)
                face_lo = jnp.concatenate(
                    [crow(glo2, 0), row_t[0], crow(ghi2, 0)], axis=0)
            gylo = jax.lax.ppermute(face_hi, 'y', up_y)
            gyhi = jax.lax.ppermute(face_lo, 'y', down_y)
            lo, hi = stream_rho_edges(g, ipos_np, f2, glo2, ghi2,
                                      gylo=gylo, gyhi=gyhi)
            rows_lo, rows_hi = stream_rho_edge_rows_3d(
                g, ipos_np, f2, glo2, ghi2, gylo, gyhi, rows=row_t)
            rrlo = jnp.concatenate(
                [jax.lax.ppermute(rows_lo[-1:], 'z', up), rows_lo,
                 jax.lax.ppermute(rows_lo[:1], 'z', down)],
                axis=0)[:, None, :]
            rrhi = jnp.concatenate(
                [jax.lax.ppermute(rows_hi[-1:], 'z', up), rows_hi,
                 jax.lax.ppermute(rows_hi[:1], 'z', down)],
                axis=0)[:, None, :]
            return gylo, gyhi, lo, hi, rrlo, rrhi

        def local_step_zy(*args):
            i = 0
            fs = list(args[i:i + K]); i += K
            rhos = list(args[i:i + K]); i += K
            rlos = [a[0, 0] for a in args[i:i + K]]; i += K
            rhis = [a[0, 0] for a in args[i:i + K]]; i += K
            glos = [a[0, 0] for a in args[i:i + K]]; i += K
            ghis = [a[0, 0] for a in args[i:i + K]]; i += K
            gylos = [a[0, 0] for a in args[i:i + K]]; i += K
            gyhis = [a[0, 0] for a in args[i:i + K]]; i += K
            rrlos = [a[0, 0] for a in args[i:i + K]]; i += K
            rrhis = [a[0, 0] for a in args[i:i + K]]; i += K
            mask = args[i] if self.has_mask else None
            rglos = [jax.lax.ppermute(r, 'z', up) for r in rhis]
            rghis = [jax.lax.ppermute(r, 'z', down) for r in rlos]
            rylos = [jax.lax.ppermute(r, 'y', up_y) for r in rrhis]
            ryhis = [jax.lax.ppermute(r, 'y', down_y) for r in rrlos]
            kargs = (fs + glos + ghis + rhos + rglos + rghis
                     + rlos + rhis + gylos + gyhis
                     + rylos + ryhis + rrlos + rrhis)
            if self.has_mask:
                kargs.append(mask)
            out = self.kernel(*kargs)
            fs2 = out[:K]
            rhos2 = out[K:2 * K]
            rows2 = out[2 * K:]
            glos2 = [jax.lax.ppermute(f[:, -1], 'z', up) for f in fs2]
            ghis2 = [jax.lax.ppermute(f[:, 0], 'z', down) for f in fs2]
            gy_lo, gy_hi, los, his, rr_lo, rr_hi = [], [], [], [], \
                [], []
            for c in range(K):
                gylo, gyhi, lo, hi, rrlo, rrhi = _zy_exchange(
                    fs2[c], glos2[c], ghis2[c], rows=rows2[c])
                gy_lo.append(gylo[None, None])
                gy_hi.append(gyhi[None, None])
                los.append(lo[None, None])
                his.append(hi[None, None])
                rr_lo.append(rrlo[None, None])
                rr_hi.append(rrhi[None, None])
            return (tuple(fs2) + tuple(rhos2) + tuple(los)
                    + tuple(his)
                    + tuple(f[None, None] for f in glos2)
                    + tuple(f[None, None] for f in ghis2)
                    + tuple(gy_lo) + tuple(gy_hi)
                    + tuple(rr_lo) + tuple(rr_hi))

        def local_init_zy(*fs):
            glos = [jax.lax.ppermute(f[:, -1], 'z', up) for f in fs]
            ghis = [jax.lax.ppermute(f[:, 0], 'z', down) for f in fs]
            # pre-pass rho (edge rows stale-but-unread: reads patch
            # them from the rr arrays)
            rhos = [self.rho_kernel(f, gl, gh)
                    for f, gl, gh in zip(fs, glos, ghis)]
            gy_lo, gy_hi, los, his, rr_lo, rr_hi = [], [], [], [], \
                [], []
            for c, f in enumerate(fs):
                gylo, gyhi, lo, hi, rrlo, rrhi = _zy_exchange(
                    f, glos[c], ghis[c])
                gy_lo.append(gylo[None, None])
                gy_hi.append(gyhi[None, None])
                los.append(lo[None, None])
                his.append(hi[None, None])
                rr_lo.append(rrlo[None, None])
                rr_hi.append(rrhi[None, None])
            return (tuple(fs) + tuple(rhos) + tuple(los) + tuple(his)
                    + tuple(f[None, None] for f in glos)
                    + tuple(f[None, None] for f in ghis)
                    + tuple(gy_lo) + tuple(gy_hi)
                    + tuple(rr_lo) + tuple(rr_hi))

        def local_step(*args):
            i = 0
            fs = list(args[i:i + K]); i += K
            rhos = list(args[i:i + K]); i += K
            rlos = list(args[i:i + K]); i += K
            rhis = list(args[i:i + K]); i += K
            glos = list(args[i:i + K]); i += K
            ghis = list(args[i:i + K]); i += K
            mask = args[i] if self.has_mask else None
            rglos = [jax.lax.ppermute(r[0], 'z', up) for r in rhis]
            rghis = [jax.lax.ppermute(r[0], 'z', down) for r in rlos]
            kargs = (fs + [gl[0] for gl in glos]
                     + [gh[0] for gh in ghis] + rhos + rglos + rghis
                     + [r[0] for r in rlos] + [r[0] for r in rhis])
            if self.has_mask:
                kargs.append(mask)
            out = self.kernel(*kargs)
            fs2 = out[:K]
            rhos2 = out[K:]
            glos2 = [jax.lax.ppermute(f[:, -1], 'z', up) for f in fs2]
            ghis2 = [jax.lax.ppermute(f[:, 0], 'z', down) for f in fs2]
            los, his = [], []
            for c in range(K):
                lo, hi = stream_rho_edges(g, ipos_np, fs2[c], glos2[c],
                                          ghis2[c])
                los.append(lo[None])
                his.append(hi[None])
            return (tuple(fs2) + tuple(rhos2) + tuple(los)
                    + tuple(his) + tuple(f[None] for f in glos2)
                    + tuple(f[None] for f in ghis2))

        def local_init(*fs):
            glos = [jax.lax.ppermute(f[:, -1], 'z', up) for f in fs]
            ghis = [jax.lax.ppermute(f[:, 0], 'z', down) for f in fs]
            rhos = [self.rho_kernel(f, gl, gh)
                    for f, gl, gh in zip(fs, glos, ghis)]
            return (tuple(fs) + tuple(rhos)
                    + tuple(r[0][None] for r in rhos)
                    + tuple(r[-1][None] for r in rhos)
                    + tuple(f[None] for f in glos)
                    + tuple(f[None] for f in ghis))

        if self.two_axis:
            FSPEC = P(None, 'z', 'y', None)
            RSPEC = P('z', 'y', None)
            P4 = P('z', 'y', None, None)
            P5 = P('z', 'y', None, None, None)
            carry_specs = ((FSPEC,) * K + (RSPEC,) * K
                           + (P4,) * 2 * K      # rlo, rhi
                           + (P5,) * 2 * K      # glo, ghi
                           + (P5,) * 2 * K      # gylo, gyhi
                           + (P5,) * 2 * K)     # rrlo, rrhi
            step_fn, init_fn = local_step_zy, local_init_zy
        else:
            FSPEC = P(None, 'z', None, None)
            RSPEC = P('z', None, None)
            ESPEC = P('z', None, None)
            GSPEC = P('z', None, None, None)
            carry_specs = ((FSPEC,) * K + (RSPEC,) * K
                           + (ESPEC,) * 2 * K + (GSPEC,) * 2 * K)
            step_fn, init_fn = local_step, local_init
        in_specs = carry_specs
        if self.has_mask:
            in_specs = in_specs + (self._mask_spec,)
        self._sharded_step = shard_map(
            step_fn, mesh=mesh, in_specs=in_specs,
            out_specs=carry_specs, check_vma=False)
        self._sharded_init = shard_map(
            init_fn, mesh=mesh, in_specs=(FSPEC,) * K,
            out_specs=carry_specs, check_vma=False)

    @property
    def padded(self):
        """Kernel layout (cz-grouped Q order) + the sharded emission
        carry; the runner wraps step loops in pad_state/crop_state."""
        return True

    def pad_state(self, state):
        fs = tuple(f[self._qperm] for f in state)
        return self._sharded_init(*fs)

    def crop_state(self, carry):
        return tuple(f[self._qinv] for f in carry[:self.K])

    def step(self, carry, it=0):
        args = list(carry)
        if self.has_mask:
            args.append(self.mask_global)
        return self._sharded_step(*args)

    def run_steps(self, state, n, it0=0):
        carry = self.pad_state(state)
        carry = jax.lax.fori_loop(
            0, n, lambda i, sc: self.step(sc, it0 + i), carry)
        return self.crop_state(carry)


class ShardedPallasFE3D:
    """z-sharded fused stepping for 3D binary free-energy scenes
    (walls/obstacles + wetting, like the single-device kernel).

    Carry: (f0, f1, phi, pelo, pehi, glo0, glo1, ghi0, ghi1). The phi
    stencil reaches TWO planes, so each step ppermutes two phi planes
    per side: the neighbor's fresh edge plane (their pelo/pehi) and
    their adjacent interior plane."""

    def __init__(self, mbuilder, domain_shape, mesh, interpret=False):
        from sailfish_tpu.ops.pallas_multi3d import (_check_vmem,
                                                     make_kernel_3d_fe)
        Z, Y, X = domain_shape
        self.shape = domain_shape
        self.mesh = mesh
        self.nshards, Z_loc = _check_z_mesh(mesh, Z, allow_zy=True)
        self.two_axis = 'y' in mesh.axis_names
        self.ny_shards = mesh.shape['y'] if self.two_axis else 1
        assert Y % self.ny_shards == 0
        Y_loc = Y // self.ny_shards
        check_plane_tiling(Y_loc, X, interpret)
        b0 = mbuilder.b0
        mask_np, patch_rows = classify_nodes(b0.maps)
        if patch_rows:
            raise NotImplementedError(
                'the fused FE 3D kernel covers walls/obstacles only; '
                'complex-BC scenes use the XLA engine')
        self.has_mask = bool((mask_np != 0).any())
        self.wetting = bool(mbuilder._has_dry_nodes)
        # ('z','y') + wetting: the wall mirror widens the phi
        # stencil's y-reach to two rows, beyond the kernel's 1-row
        # ghost machinery -- so the mirror moves OUT of the kernel:
        # the step computes the wetting-adjusted phi_w (planes -1..Z,
        # fresh rows) in XLA from the carried raw-phi materials and
        # calls the kernel in its non-wetting y_ghosts mode. The
        # mirror is selects + one subtract, so results stay bitwise
        # equal to the in-kernel mirror of the 1-axis path.
        self.wetting_zy = self.two_axis and self.wetting
        Q = mbuilder.grid.Q
        _, ipos_np, groups = cz_groups(mbuilder.grid)
        n_m1 = sum(c for cz, _, c in groups if cz == -1)
        n_p1 = sum(c for cz, _, c in groups if cz == 1)
        s_0 = next(st for cz, st, c in groups if cz == 0)
        isz = np.dtype(np.float32).itemsize
        _check_vmem((4 * Q, isz), (10, isz),
                    (2 * (n_p1 + (Q - s_0)) + 2, isz),
                    (2 if self.has_mask else 0, 4),
                    (6 if self.wetting and not self.two_axis else 0, 4),
                    Y=Y_loc, X=X)
        self.mask_global = None
        self._mask_spec = P('z', 'y', None) if self.two_axis \
            else P('z', None, None)
        if self.has_mask:
            self.mask_global = jax.device_put(
                jnp.asarray(mask_np),
                NamedSharding(mesh, self._mask_spec))
        self.orient_global = None
        self._orient_spec = P('z', 'y', None) if self.two_axis \
            else P('z', None, None)
        if self.wetting:
            orient_np = np.asarray(mbuilder._dry_orient)
            self.orient_global = jax.device_put(
                jnp.asarray(orient_np),
                NamedSharding(mesh, self._orient_spec))
            # static neighbor faces of the orientation map, per shard
            S = self.nshards
            olo = np.stack([orient_np[(s * Z_loc - 1) % Z]
                            for s in range(S)])
            ohi = np.stack([orient_np[((s + 1) * Z_loc) % Z]
                            for s in range(S)])
            self.orient_lo = jax.device_put(
                jnp.asarray(olo), NamedSharding(mesh, self._orient_spec))
            self.orient_hi = jax.device_put(
                jnp.asarray(ohi), NamedSharding(mesh, self._orient_spec))
        self.kernel = make_kernel_3d_fe(
            mbuilder, Z_loc, Y_loc, X, has_mask=self.has_mask,
            wetting=self.wetting and not self.two_axis, emit_phi=True,
            edge_io=True, y_ghosts=self.two_axis,
            face_io=self.two_axis, interpret=interpret)
        self.rho_kernel = make_rho_kernel_3d(b0, Z_loc, Y_loc, X,
                                             interpret=interpret)
        qperm, qinv, _ = cz_groups(mbuilder.grid)
        self._qperm = jnp.asarray(np.asarray(qperm, np.int32))
        self._qinv = jnp.asarray(np.asarray(qinv, np.int32))
        up, down = _ring(self.nshards)
        up_y, down_y = _ring(self.ny_shards)
        g = mbuilder.grid

        from sailfish_tpu.ops.pallas_step import gy_pad_channels
        Qp_f = gy_pad_channels(g.Q)

        def _fe_zy_exchange(f0_2, f1_2, glo0_2, glo1_2, ghi0_2,
                            ghi1_2, rows=None):
            """('z','y') carry pieces from the post-collision state:
            f boundary rows per source plane for BOTH components, the
            fresh phi edge planes/rows, and the (Z+2)-indexed pr
            arrays (two-hop corners via the z-ghost entries).

            ``rows`` (per-step path): the kernel's (rows0, rows1)
            face outputs, each (Z, 4*Qp, X) -- nothing here may
            row-slice the in-place-aliased state (see
            pallas_step.make_kernel_3d face_io). The init path (rows
            None) slices the un-aliased initial state once."""
            gys = []
            row_ts = [None, None]
            if rows is not None:
                row_ts = [tuple(r[:, j * Qp_f:(j + 1) * Qp_f]
                                for j in range(4)) for r in rows]
                qpad = Qp_f - g.Q

                def crow(a, y):
                    r = a[:, y][None]
                    if qpad:
                        r = jnp.pad(r, ((0, 0), (0, qpad), (0, 0)))
                    return r

            for c, (f2, glo2, ghi2) in enumerate((
                    (f0_2, glo0_2, ghi0_2), (f1_2, glo1_2, ghi1_2))):
                if rows is None:
                    face_hi = pad_gy(jnp.swapaxes(jnp.concatenate(
                        [glo2[:, None, -1], f2[:, :, -1],
                         ghi2[:, None, -1]], axis=1), 0, 1))
                    face_lo = pad_gy(jnp.swapaxes(jnp.concatenate(
                        [glo2[:, None, 0], f2[:, :, 0],
                         ghi2[:, None, 0]], axis=1), 0, 1))
                else:
                    face_hi = jnp.concatenate(
                        [crow(glo2, -1), row_ts[c][3], crow(ghi2, -1)],
                        axis=0)
                    face_lo = jnp.concatenate(
                        [crow(glo2, 0), row_ts[c][0], crow(ghi2, 0)],
                        axis=0)
                gys.append((jax.lax.ppermute(face_hi, 'y', up_y),
                            jax.lax.ppermute(face_lo, 'y', down_y)))
            (gylo0, gyhi0), (gylo1, gyhi1) = gys
            lo, hi = stream_rho_edges(g, ipos_np, f1_2, glo1_2,
                                      ghi1_2, gylo=gylo1, gyhi=gyhi1)
            rows_lo, rows_hi = stream_rho_edge_rows_3d(
                g, ipos_np, f1_2, glo1_2, ghi1_2, gylo1, gyhi1,
                rows=row_ts[1])
            prlo = jnp.concatenate(
                [jax.lax.ppermute(rows_lo[-1:], 'z', up), rows_lo,
                 jax.lax.ppermute(rows_lo[:1], 'z', down)],
                axis=0)[:, None, :]
            prhi = jnp.concatenate(
                [jax.lax.ppermute(rows_hi[-1:], 'z', up), rows_hi,
                 jax.lax.ppermute(rows_hi[:1], 'z', down)],
                axis=0)[:, None, :]
            return gylo0, gylo1, gyhi0, gyhi1, lo, hi, prlo, prhi

        wall_grad = mbuilder.wall_grad_phase
        orient_vecs = [tuple(int(c) for c in v)
                       for v in g.orientation_vectors]

        def _phi_w_ext(phi, pelo_, pehi_, prlo_, prhi_, pylo_, pyhi_,
                       lo1, lo2, hi1, hi2, orient, olo, ohi, dtype):
            """Wetting-adjusted phi for planes -1..Z with fresh edge
            rows, computed in XLA (the ('z','y') + wetting mode; the
            1-axis path mirrors in-kernel, pallas_multi3d.py
            phi_w_plane). Same select + subtract math bitwise; the
            orientation vectors are axis-aligned units, so a mirror
            read crosses at most ONE shard face and every source is
            already in the carry."""
            Z_l, Y_l = phi.shape[0], phi.shape[1]
            yi = jnp.arange(Y_l)[None, :, None]
            # fresh local planes: edge rows from pr, edge planes from
            # pelo/pehi (already fresh-rowed)
            phi_f = jnp.where(yi == 0, prlo_[1:Z_l + 1], phi)
            phi_f = jnp.where(yi == Y_l - 1, prhi_[1:Z_l + 1], phi_f)
            phi_f = jnp.concatenate(
                [pelo_[None], phi_f[1:-1], pehi_[None]])
            ext = jnp.concatenate(
                [lo2[None], lo1[None], phi_f, hi1[None], hi2[None]])
            tgt = ext[1:Z_l + 3]                 # planes -1..Z
            orient_ext = jnp.concatenate(
                [olo[None], orient, ohi[None]])
            wg = jnp.asarray(wall_grad, dtype)
            out = tgt
            for kk, (ex, ey, ez) in enumerate(orient_vecs):
                if ez:
                    neigh = ext[1 + ez:Z_l + 3 + ez]
                elif ey:
                    neigh = jnp.roll(tgt, -ey, axis=1)
                    rows = (pyhi_ if ey == 1 else pylo_)  # (Z+2,1,X)
                    edge = Y_l - 1 if ey == 1 else 0
                    neigh = jnp.where(yi == edge, rows, neigh)
                else:
                    neigh = jnp.roll(tgt, -ex, axis=2)
                out = jnp.where(orient_ext == kk + 1, neigh - wg, out)
            return out

        def local_step_zy(f0, f1, phi, pelo, pehi, glo0, glo1, ghi0,
                          ghi1, gylo0, gylo1, gyhi0, gyhi1, prlo,
                          prhi, *rest):
            pelo_, pehi_ = pelo[0, 0], pehi[0, 0]
            glo0_, glo1_ = glo0[0, 0], glo1[0, 0]
            ghi0_, ghi1_ = ghi0[0, 0], ghi1[0, 0]
            prlo_, prhi_ = prlo[0, 0], prhi[0, 0]
            pylo_ = jax.lax.ppermute(prhi_, 'y', up_y)
            pyhi_ = jax.lax.ppermute(prlo_, 'y', down_y)
            # phi z-ghosts: +-1 = the neighbors' fresh edge planes
            # (valid rows); +-2 planes are read by the wetting mirror
            # only -- non-wetting passes the interior planes unchanged
            lo1 = jax.lax.ppermute(pehi_, 'z', up)
            lo2 = jax.lax.ppermute(phi[-2], 'z', up)
            hi1 = jax.lax.ppermute(pelo_, 'z', down)
            hi2 = jax.lax.ppermute(phi[1], 'z', down)
            r = 1 if self.has_mask else 0
            if self.wetting_zy:
                # lo2/hi2 feed the mirror's z-reach: they need fresh
                # edge rows (plane Z-2 rows sit at pr index Z-1;
                # plane 1 rows at pr index 2)
                yi2 = jnp.arange(phi.shape[1])[:, None]
                p_m2 = jnp.where(yi2 == 0, prlo_[Z_loc - 1], phi[-2])
                p_m2 = jnp.where(yi2 == phi.shape[1] - 1,
                                 prhi_[Z_loc - 1], p_m2)
                p_p1 = jnp.where(yi2 == 0, prlo_[2], phi[1])
                p_p1 = jnp.where(yi2 == phi.shape[1] - 1,
                                 prhi_[2], p_p1)
                lo2 = jax.lax.ppermute(p_m2, 'z', up)
                hi2 = jax.lax.ppermute(p_p1, 'z', down)
                orient, olo, ohi = rest[r], rest[r + 1][0], \
                    rest[r + 2][0]
                ww = _phi_w_ext(phi, pelo_, pehi_, prlo_, prhi_,
                                pylo_, pyhi_, lo1, lo2, hi1, hi2,
                                orient, olo, ohi, phi.dtype)
                phi_k = ww[1:-1]
                lo1_k, hi1_k = ww[0], ww[-1]
                pr_w_lo = ww[:, :1, :]
                pr_w_hi = ww[:, -1:, :]
                pylo_k = jax.lax.ppermute(pr_w_hi, 'y', up_y)
                pyhi_k = jax.lax.ppermute(pr_w_lo, 'y', down_y)
                kargs = [f0, f1, glo0_, glo1_, ghi0_, ghi1_,
                         phi_k, lo2, lo1_k, hi1_k, hi2,
                         phi_k[0], phi_k[-1],
                         gylo0[0, 0], gylo1[0, 0],
                         gyhi0[0, 0], gyhi1[0, 0],
                         pylo_k, pyhi_k,
                         pr_w_lo, pr_w_hi]
            else:
                kargs = [f0, f1, glo0_, glo1_, ghi0_, ghi1_,
                         phi, lo2, lo1, hi1, hi2, pelo_, pehi_,
                         gylo0[0, 0], gylo1[0, 0],
                         gyhi0[0, 0], gyhi1[0, 0],
                         pylo_, pyhi_, prlo_, prhi_]
            if self.has_mask:
                kargs.append(rest[0])
            f0_2, f1_2, phi2, rows0, rows1 = self.kernel(*kargs)
            glo0_2 = jax.lax.ppermute(f0_2[:, -1], 'z', up)
            glo1_2 = jax.lax.ppermute(f1_2[:, -1], 'z', up)
            ghi0_2 = jax.lax.ppermute(f0_2[:, 0], 'z', down)
            ghi1_2 = jax.lax.ppermute(f1_2[:, 0], 'z', down)
            (gylo0_2, gylo1_2, gyhi0_2, gyhi1_2, lo, hi, prlo2,
             prhi2) = _fe_zy_exchange(f0_2, f1_2, glo0_2, glo1_2,
                                      ghi0_2, ghi1_2,
                                      rows=(rows0, rows1))
            return (f0_2, f1_2, phi2, lo[None, None], hi[None, None],
                    glo0_2[None, None], glo1_2[None, None],
                    ghi0_2[None, None], ghi1_2[None, None],
                    gylo0_2[None, None], gylo1_2[None, None],
                    gyhi0_2[None, None], gyhi1_2[None, None],
                    prlo2[None, None], prhi2[None, None])

        def local_init_zy(f0, f1):
            glo0 = jax.lax.ppermute(f0[:, -1], 'z', up)
            glo1 = jax.lax.ppermute(f1[:, -1], 'z', up)
            ghi0 = jax.lax.ppermute(f0[:, 0], 'z', down)
            ghi1 = jax.lax.ppermute(f1[:, 0], 'z', down)
            phi = self.rho_kernel(f1, glo1, ghi1)
            (gylo0, gylo1, gyhi0, gyhi1, lo, hi, prlo,
             prhi) = _fe_zy_exchange(f0, f1, glo0, glo1, ghi0, ghi1)
            return (f0, f1, phi, lo[None, None], hi[None, None],
                    glo0[None, None], glo1[None, None],
                    ghi0[None, None], ghi1[None, None],
                    gylo0[None, None], gylo1[None, None],
                    gyhi0[None, None], gyhi1[None, None],
                    prlo[None, None], prhi[None, None])

        def local_step(f0, f1, phi, pelo, pehi, glo0, glo1, ghi0,
                       ghi1, *rest):
            # phi ghosts: plane -1 = neighbor's fresh edge (pehi up),
            # plane -2 = neighbor's interior plane Z-2 (valid in their
            # array); symmetric on the high side
            lo1 = jax.lax.ppermute(pehi[0], 'z', up)
            lo2 = jax.lax.ppermute(phi[-2], 'z', up)
            hi1 = jax.lax.ppermute(pelo[0], 'z', down)
            hi2 = jax.lax.ppermute(phi[1], 'z', down)
            kargs = [f0, f1, glo0[0], glo1[0], ghi0[0], ghi1[0],
                     phi, lo2, lo1, hi1, hi2, pelo[0], pehi[0]]
            r = 0
            if self.has_mask:
                kargs.append(rest[r]); r += 1
            if self.wetting:
                kargs += [rest[r], rest[r + 1][0], rest[r + 2][0]]
                r += 3
            f0_2, f1_2, phi2 = self.kernel(*kargs)
            glo0_2 = jax.lax.ppermute(f0_2[:, -1], 'z', up)
            glo1_2 = jax.lax.ppermute(f1_2[:, -1], 'z', up)
            ghi0_2 = jax.lax.ppermute(f0_2[:, 0], 'z', down)
            ghi1_2 = jax.lax.ppermute(f1_2[:, 0], 'z', down)
            lo, hi = stream_rho_edges(g, ipos_np, f1_2, glo1_2, ghi1_2)
            return (f0_2, f1_2, phi2, lo[None], hi[None],
                    glo0_2[None], glo1_2[None], ghi0_2[None],
                    ghi1_2[None])

        def local_init(f0, f1):
            glo0 = jax.lax.ppermute(f0[:, -1], 'z', up)
            glo1 = jax.lax.ppermute(f1[:, -1], 'z', up)
            ghi0 = jax.lax.ppermute(f0[:, 0], 'z', down)
            ghi1 = jax.lax.ppermute(f1[:, 0], 'z', down)
            phi = self.rho_kernel(f1, glo1, ghi1)
            return (f0, f1, phi, phi[0][None], phi[-1][None],
                    glo0[None], glo1[None], ghi0[None], ghi1[None])

        if self.two_axis:
            FSPEC = P(None, 'z', 'y', None)
            RSPEC = P('z', 'y', None)
            P4 = P('z', 'y', None, None)
            P5 = P('z', 'y', None, None, None)
            carry_specs = (FSPEC, FSPEC, RSPEC,
                           P4, P4,              # pelo, pehi
                           P5, P5, P5, P5,      # glo0/1, ghi0/1
                           P5, P5, P5, P5,      # gylo0/1, gyhi0/1
                           P5, P5)              # prlo, prhi
            step_fn, init_fn = local_step_zy, local_init_zy
        else:
            FSPEC = P(None, 'z', None, None)
            RSPEC = P('z', None, None)
            GSPEC = P('z', None, None, None)
            carry_specs = (FSPEC, FSPEC, RSPEC, RSPEC, RSPEC,
                           GSPEC, GSPEC, GSPEC, GSPEC)
            step_fn, init_fn = local_step, local_init
        in_specs = carry_specs
        if self.has_mask:
            in_specs = in_specs + (self._mask_spec,)
        if self.wetting:
            in_specs = in_specs + (self._orient_spec,) * 3
        self._sharded_step = shard_map(
            step_fn, mesh=mesh, in_specs=in_specs,
            out_specs=carry_specs, check_vma=False)
        self._sharded_init = shard_map(
            init_fn, mesh=mesh, in_specs=(FSPEC, FSPEC),
            out_specs=carry_specs, check_vma=False)

    @property
    def padded(self):
        return True

    def pad_state(self, state):
        f0, f1 = (f[self._qperm] for f in state)
        return self._sharded_init(f0, f1)

    def crop_state(self, carry):
        return tuple(f[self._qinv] for f in carry[:2])

    def step(self, carry, it=0):
        args = list(carry)
        if self.has_mask:
            args.append(self.mask_global)
        if self.wetting:
            args += [self.orient_global, self.orient_lo, self.orient_hi]
        return self._sharded_step(*args)

    def run_steps(self, state, n, it0=0):
        carry = self.pad_state(state)
        carry = jax.lax.fori_loop(
            0, n, lambda i, sc: self.step(sc, it0 + i), carry)
        return self.crop_state(carry)


def stream_rho_edge_rows_2d(grid, f, glo_blk, ghi_blk,
                            fxlo=None, fxhi=None):
    """Post-stream density of the two local edge y-rows from the 2D
    post-collision state ``f`` (Q, Y, X) and the ppermuted neighbor
    boundary BLOCKS (glo_blk = below-neighbor's top rows, ghi_blk =
    above-neighbor's bottom rows; each (Q, by, X) -- only the boundary
    row of each is read). Source selection, roll and summation order
    identical to make_rho_kernel_2d / the in-kernel emission, so
    sharded results stay BITWISE equal to the single-device fused
    engine. Returns (row_0, row_Ym1), each (1, X).

    ``fxlo``/``fxhi`` ((Q, Y+2); x-sharded meshes): the LEFT
    neighbor's column X-1 / the RIGHT neighbor's column 0, extended
    with their y-ghost entries (rows -1 and Y; the diagonal corners).
    The x-roll's wrapped lane is overwritten from them, so the rows'
    own corner lanes are correct too."""
    Y = f.shape[1]
    X = f.shape[2]
    xi = jnp.arange(X)[None, :]
    lo = hi = None
    for i in range(grid.Q):
        cx = int(grid.basis[i][0])
        cy = int(grid.basis[i][1])
        if cy == 1:
            r_lo, r_hi = glo_blk[i, -1:], f[i, -2:-1]
            src_lo, src_hi = -1, Y - 2
        elif cy == 0:
            r_lo, r_hi = f[i, 0:1], f[i, -1:]
            src_lo, src_hi = 0, Y - 1
        else:
            r_lo, r_hi = f[i, 1:2], ghi_blk[i, :1]
            src_lo, src_hi = 1, Y
        if cx:
            r_lo = jnp.roll(r_lo, cx, axis=1)
            r_hi = jnp.roll(r_hi, cx, axis=1)
            if fxlo is not None:
                # roll by +cx: cx=+1 wraps lane 0 (true source x=-1,
                # the left neighbor's column X-1); cx=-1 wraps lane
                # X-1 (the right neighbor's column 0)
                ext = fxlo if cx == 1 else fxhi
                lane = 0 if cx == 1 else X - 1
                r_lo = jnp.where(xi == lane, ext[i, src_lo + 1], r_lo)
                r_hi = jnp.where(xi == lane, ext[i, src_hi + 1], r_hi)
        lo = r_lo if lo is None else lo + r_lo
        hi = r_hi if hi is None else hi + r_hi
    return lo, hi


def stream_rho_edge_cols_2d(grid, f, glo_blk, ghi_blk, fxlo, fxhi,
                            cols=None):
    """Post-stream density of the two local edge COLUMNS (x=0 and
    x=X-1, all local rows) for x-sharded 2D Shan-Chen stepping -- the
    lanes the in-kernel emission wraps locally. ``glo_blk``/``ghi_blk``
    resolve the cross-row sources (the y-neighbors' boundary blocks,
    or the local wrap copies on a y-unsharded mesh); ``fxlo``/``fxhi``
    as in stream_rho_edge_rows_2d. Source selection and summation
    order match the emission, so the values are bitwise the
    single-device ones. Returns (col_0, col_Xm1), each (Y,).

    ``cols=(colx, Q)``: read the source columns from the
    KERNEL-EMITTED column array ((Y, 128) fp32; lane group g*Q + i =
    column (0, X-1, 1, X-2)[g] of direction i, pallas_step2d col_io)
    instead of column-slicing ``f`` -- a strided slice of the
    in-place-aliased state forces XLA to copy the whole array every
    step (benchmark/x_ghost_overhead.py). ``glo_blk=None`` wraps the
    cross-row ghost entries from the emitted columns themselves
    (x-only meshes, where y wraps locally and the local blocks would
    be aliased slices too)."""
    Y = f.shape[1]
    X = f.shape[2]
    if cols is not None:
        colx, Qn = cols
        lane_of = {0: 0, X - 1: Qn, 1: 2 * Qn, X - 2: 3 * Qn}
    lo = hi = None
    for i in range(grid.Q):
        cx = int(grid.basis[i][0])
        cy = int(grid.basis[i][1])

        def col_rows(c, i=i, cy=cy):
            """(Y,) rows y - cy of column c, ghosts from the blocks."""
            if cols is not None:
                col = colx[:, lane_of[c] + i]
                if glo_blk is None:
                    e_lo, e_hi = col[-1:], col[:1]
                else:
                    e_lo = glo_blk[i, -1:, c]
                    e_hi = ghi_blk[i, :1, c]
                ext = jnp.concatenate([e_lo, col, e_hi])
            else:
                ext = jnp.concatenate(
                    [glo_blk[i, -1:, c], f[i, :, c], ghi_blk[i, :1, c]])
            return ext[1 - cy:Y + 1 - cy]

        if cx == 1:
            c_lo = fxlo[i, 1 - cy:Y + 1 - cy]     # source x = -1
            c_hi = col_rows(X - 2)
        elif cx == -1:
            c_lo = col_rows(1)
            c_hi = fxhi[i, 1 - cy:Y + 1 - cy]     # source x = X
        else:
            c_lo = col_rows(0)
            c_hi = col_rows(X - 1)
        lo = c_lo if lo is None else lo + c_lo
        hi = c_hi if hi is None else hi + c_hi
    return lo, hi


class ShardedPallasSCMulti2D:
    """Sharded fused stepping for 2D Shan-Chen mixtures (K components;
    walls/obstacles only, like the single-device kernel) on ('y',),
    ('x',) and ('y','x') meshes.

    y-sharded carry: (fs, rhos, rlos, rhis, glos, ghis) -- K
    distribution sets, K densities (interior rows emitted in-kernel;
    the two global edge rows stale-by-contract), K fresh edge-row
    pairs, K ppermuted post-collision boundary BLOCKS (the kernel's
    wrap-block ghosts). x-sharded meshes carry, per component, the
    KERNEL-EMITTED boundary/inner columns (colx) and the fresh rho
    edge-column pair (recols): the kernel's ghost-column inputs
    (post-roll f wrap columns + raw-rho psi columns) and the rho
    edge-column re-stream (stream_rho_edge_cols_2d) are built from
    those -- column-slicing the in-place-aliased states into the
    ppermutes forces XLA to copy the whole arrays every step (see
    parallel.halo.ShardedPallasStep2D / benchmark/x_ghost_overhead.py).
    On an ('x',)-only mesh y wraps locally and the carry is
    (fs, rhos, colxs, recols) with rho fully fresh."""

    def __init__(self, mbuilder, domain_shape, mesh, interpret=False):
        from sailfish_tpu.ops.multigrid import ShanChenMultiStepBuilder
        from sailfish_tpu.ops.pallas_multi2d import (
            make_kernel_2d_sc_multi, make_rho_kernel_2d,
            pick_block_size)
        if not isinstance(mbuilder, ShanChenMultiStepBuilder):
            raise NotImplementedError(
                'fused 2D multi-component sharding covers Shan-Chen '
                'mixtures only (free energy uses the XLA engine)')
        axes = list(mesh.axis_names)
        if axes not in (['y'], ['x'], ['y', 'x']):
            raise NotImplementedError(
                'the sharded fused 2D multi-component kernel covers '
                f"('y',), ('x',) and ('y','x') meshes; got {axes}")
        self.y_sharded = 'y' in axes
        self.x_sharded = 'x' in axes
        for c in mbuilder.components:
            if c.model != 'bgk' or c.smagorinsky or c.sc_coupling:
                raise NotImplementedError(
                    'multi-component fused kernel is BGK-only')
        Y, X = domain_shape
        self.shape = domain_shape
        self.mesh = mesh
        ny = mesh.shape['y'] if self.y_sharded else 1
        nx = mesh.shape['x'] if self.x_sharded else 1
        self.nshards = ny * nx
        assert Y % ny == 0 and X % nx == 0
        Y_loc = Y // ny
        X_loc = X // nx
        check_plane_tiling(Y_loc, X_loc, interpret, dim=2)
        b0 = mbuilder.b0
        K = self.K = len(mbuilder.components)
        mask_np, patch_rows = classify_nodes(b0.maps)
        if patch_rows:
            raise NotImplementedError(
                'the fused multi-component 2D kernel covers walls/'
                'obstacles only; complex-BC scenes use the XLA engine')
        self.has_mask = bool((mask_np != 0).any())
        by = pick_block_size(mbuilder.grid.Q * K, Y_loc, X_loc)
        self.by = by
        if Y_loc // by < 4:
            raise NotImplementedError(
                'sharded 2D multi-component stepping needs >= 4 '
                f'y-blocks per shard (Y_loc={Y_loc}, by={by})')
        yax = 'y' if self.y_sharded else None
        xax = 'x' if self.x_sharded else None
        mspec = P(yax, xax)
        self.mask_global = None
        if self.has_mask:
            self.mask_global = jax.device_put(
                jnp.asarray(mask_np), NamedSharding(mesh, mspec))
        self.kernel = make_kernel_2d_sc_multi(
            mbuilder, Y_loc, X_loc, by=by, has_mask=self.has_mask,
            emit_rho=True, edge_io=self.y_sharded,
            x_ghosts=self.x_sharded, col_io=self.x_sharded,
            interpret=interpret)
        self.rho_kernel = make_rho_kernel_2d(b0, Y_loc, X_loc, by=by,
                                             interpret=interpret)
        up, down = _ring(ny)
        upx, downx = _ring(nx)
        g = mbuilder.grid
        basis = g.basis
        xdirs = [i for i in range(g.Q) if int(basis[i][0]) != 0]

        def build_xcols(f_local):
            """Per-component (Y_loc, 128) post-roll f wrap columns
            (the K-component twin of parallel.halo's build_xcols;
            lane j = direction xdirs[j], cross-shard rows resolved
            with a second ppermute hop)."""
            recv_last = jax.lax.ppermute(
                f_local[:, :, X_loc - 1], 'x', upx)
            recv_first = jax.lax.ppermute(f_local[:, :, 0], 'x', downx)
            cols = []
            for i in xdirs:
                cx, cy = int(basis[i][0]), int(basis[i][1])
                src = recv_last[i] if cx == 1 else recv_first[i]
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

        def build_rxcols(rho_f):
            """(Y_loc, 128) raw-rho psi ghost columns (lane
            3*side + (dy+1); see parallel.halo's build_rxcols)."""
            def ext(col):
                if self.y_sharded:
                    e_lo = jax.lax.ppermute(col[-1:], 'y', up)
                    e_hi = jax.lax.ppermute(col[:1], 'y', down)
                else:
                    e_lo, e_hi = col[-1:], col[:1]
                return jnp.concatenate([e_lo, col, e_hi])
            rxR = jax.lax.ppermute(ext(rho_f[:, 0]), 'x', downx)
            rxL = jax.lax.ppermute(ext(rho_f[:, X_loc - 1]), 'x', upx)
            lanes = [se[1 + dy:Y_loc + 1 + dy]
                     for se in (rxR, rxL) for dy in (-1, 0, 1)]
            rx = jnp.stack(lanes, axis=1)
            return jnp.pad(rx, ((0, 0), (0, 128 - 6)))

        def _f_col_ext(f2, c, glo_blk, ghi_blk):
            """(Q, Y+2) column c extended with the y-ghost entries
            (rows -1 and Y) from the boundary blocks."""
            return jnp.concatenate(
                [glo_blk[:, -1:, c], f2[:, :, c], ghi_blk[:, :1, c]],
                axis=1)

        def _fx_cols(f2, glo_blk, ghi_blk):
            fxlo = jax.lax.ppermute(
                _f_col_ext(f2, X_loc - 1, glo_blk, ghi_blk), 'x', upx)
            fxhi = jax.lax.ppermute(
                _f_col_ext(f2, 0, glo_blk, ghi_blk), 'x', downx)
            return fxlo, fxhi

        def _patch_cols(rho2, c0, cX):
            xi = jnp.arange(X_loc)[None, :]
            rho2 = jnp.where(xi == 0, c0[:, None], rho2)
            return jnp.where(xi == X_loc - 1, cX[:, None], rho2)

        Qn = g.Q

        def build_xcols_emitted(colx):
            """One component's xcol input from its KERNEL-EMITTED
            boundary columns of the previous step (lane i = x=0 column
            of direction i, lane Qn+i = x=X-1): same exchange as
            build_xcols, but nothing slices the in-place-aliased
            state (see parallel.halo.ShardedPallasStep2D)."""
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

        def _fx_cols_emitted(colx2, glo_blk, ghi_blk):
            """_fx_cols from the kernel-emitted boundary columns of
            this step's output; ghost entries from the ppermuted
            boundary blocks (y-sharded; fresh) or the emitted columns'
            own wrap rows (x-only mesh: pass glo_blk=None)."""
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

        def build_rxcols_from(recols):
            """build_rxcols from one component's carried (Y_loc, 2)
            fresh edge-column pair (an un-aliased array)."""
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

        def slice_cols_init(f_local):
            """Initial colx: one-time column slices of the un-aliased
            initial state, lane semantics identical to the kernel
            emission (4 groups: x = 0, X-1, 1, X-2)."""
            cols = []
            for c in (0, X_loc - 1, 1, X_loc - 2):
                for i in range(Qn):
                    cols.append(f_local[i, :, c])
            colx = jnp.stack(cols, axis=1).astype(jnp.float32)
            return jnp.pad(colx, ((0, 0), (0, 128 - len(cols))))

        def local_step(*args):
            i = 0
            fs = list(args[i:i + K]); i += K
            rhos = list(args[i:i + K]); i += K
            rlos = list(args[i:i + K]); i += K
            rhis = list(args[i:i + K]); i += K
            glos = list(args[i:i + K]); i += K
            ghis = list(args[i:i + K]); i += K
            colxs = recolss = None
            if self.x_sharded:
                colxs = list(args[i:i + K]); i += K
                recolss = list(args[i:i + K]); i += K
            mask = args[i] if self.has_mask else None
            # ghost rho blocks: only their boundary row is consumed by
            # the kernel; build them around the neighbors' fresh edge
            # rows
            zpad = jnp.zeros((by - 1, X_loc), fs[0].dtype)
            rglos = [jnp.concatenate(
                [zpad, jax.lax.ppermute(r[0], 'y', up)], axis=0)
                for r in rhis]
            rghis = [jnp.concatenate(
                [jax.lax.ppermute(r[0], 'y', down), zpad], axis=0)
                for r in rlos]
            kargs = (fs + [gl[0] for gl in glos]
                     + [gh[0] for gh in ghis] + rhos + rglos + rghis
                     + [r[0] for r in rlos] + [r[0] for r in rhis])
            if self.x_sharded:
                kargs += [build_xcols_emitted(cx) for cx in colxs]
                kargs += [build_rxcols_from(rc) for rc in recolss]
            if self.has_mask:
                kargs.append(mask)
            out = self.kernel(*kargs)
            fs2 = out[:K]
            rhos2 = list(out[K:2 * K])
            colxs2 = list(out[2 * K:]) if self.x_sharded else None
            glos2 = [jax.lax.ppermute(f[:, -by:], 'y', up) for f in fs2]
            ghis2 = [jax.lax.ppermute(f[:, :by], 'y', down)
                     for f in fs2]
            los, his, recols2 = [], [], []
            for c in range(K):
                if self.x_sharded:
                    fxlo, fxhi = _fx_cols_emitted(
                        colxs2[c], glos2[c], ghis2[c])
                    lo, hi = stream_rho_edge_rows_2d(
                        g, fs2[c], glos2[c], ghis2[c], fxlo, fxhi)
                    c0, cX = stream_rho_edge_cols_2d(
                        g, fs2[c], glos2[c], ghis2[c], fxlo, fxhi,
                        cols=(colxs2[c], Qn))
                    rhos2[c] = _patch_cols(rhos2[c], c0, cX)
                    recols2.append(jnp.stack([c0, cX], axis=1))
                else:
                    lo, hi = stream_rho_edge_rows_2d(
                        g, fs2[c], glos2[c], ghis2[c])
                los.append(lo[None])
                his.append(hi[None])
            out = (tuple(fs2) + tuple(rhos2) + tuple(los)
                   + tuple(his) + tuple(f[None] for f in glos2)
                   + tuple(f[None] for f in ghis2))
            if self.x_sharded:
                out += tuple(colxs2) + tuple(recols2)
            return out

        def local_init(*fs):
            glos = [jax.lax.ppermute(f[:, -by:], 'y', up) for f in fs]
            ghis = [jax.lax.ppermute(f[:, :by], 'y', down) for f in fs]
            # local pre-pass (edge rows stale: it wraps locally) +
            # fresh edge rows from the ppermuted faces
            rhos = [self.rho_kernel(f) for f in fs]
            los, his, colxs, recols = [], [], [], []
            for c, f in enumerate(fs):
                if self.x_sharded:
                    fxlo, fxhi = _fx_cols(f, glos[c], ghis[c])
                    lo, hi = stream_rho_edge_rows_2d(
                        g, f, glos[c], ghis[c], fxlo, fxhi)
                    c0, cX = stream_rho_edge_cols_2d(
                        g, f, glos[c], ghis[c], fxlo, fxhi)
                    rhos[c] = _patch_cols(rhos[c], c0, cX)
                    colxs.append(slice_cols_init(f))
                    recols.append(jnp.stack([c0, cX], axis=1))
                else:
                    lo, hi = stream_rho_edge_rows_2d(
                        g, f, glos[c], ghis[c])
                los.append(lo[None])
                his.append(hi[None])
            out = (tuple(fs) + tuple(rhos) + tuple(los) + tuple(his)
                   + tuple(f[None] for f in glos)
                   + tuple(f[None] for f in ghis))
            if self.x_sharded:
                out += tuple(colxs) + tuple(recols)
            return out

        def local_step_x(*args):
            """('x',)-only mesh: y wraps locally, carry
            (fs, rhos, colxs, recols)."""
            fs = list(args[:K])
            rhos = list(args[K:2 * K])
            colxs = list(args[2 * K:3 * K])
            recolss = list(args[3 * K:4 * K])
            kargs = (fs + [f[:, -by:] for f in fs]
                     + [f[:, :by] for f in fs] + rhos
                     + [build_xcols_emitted(cx) for cx in colxs]
                     + [build_rxcols_from(rc) for rc in recolss])
            if self.has_mask:
                kargs.append(args[4 * K])
            out = self.kernel(*kargs)
            fs2 = out[:K]
            rhos2 = list(out[K:2 * K])
            colxs2 = list(out[2 * K:])
            recols2 = []
            for c in range(K):
                fxlo, fxhi = _fx_cols_emitted(colxs2[c], None, None)
                c0, cX = stream_rho_edge_cols_2d(
                    g, fs2[c], None, None, fxlo, fxhi,
                    cols=(colxs2[c], Qn))
                rhos2[c] = _patch_cols(rhos2[c], c0, cX)
                recols2.append(jnp.stack([c0, cX], axis=1))
            return (tuple(fs2) + tuple(rhos2) + tuple(colxs2)
                    + tuple(recols2))

        def local_init_x(*fs):
            rhos = [self.rho_kernel(f) for f in fs]
            out = []
            colxs, recols = [], []
            for c, f in enumerate(fs):
                glo = f[:, -by:]
                ghi = f[:, :by]
                fxlo, fxhi = _fx_cols(f, glo, ghi)
                c0, cX = stream_rho_edge_cols_2d(
                    g, f, glo, ghi, fxlo, fxhi)
                out.append(_patch_cols(rhos[c], c0, cX))
                colxs.append(slice_cols_init(f))
                recols.append(jnp.stack([c0, cX], axis=1))
            return (tuple(fs) + tuple(out) + tuple(colxs)
                    + tuple(recols))

        FSPEC = P(None, yax, xax)
        RSPEC = P(yax, xax)
        if self.y_sharded:
            ESPEC = P(yax, None, xax)
            GSPEC = P(yax, None, None, xax)
            carry_specs = ((FSPEC,) * K + (RSPEC,) * K
                           + (ESPEC,) * 2 * K + (GSPEC,) * 2 * K)
            step_fn, init_fn = local_step, local_init
        else:
            carry_specs = (FSPEC,) * K + (RSPEC,) * K
            step_fn, init_fn = local_step_x, local_init_x
        if self.x_sharded:
            # per-component kernel-emitted colx (Y_loc, 128) + fresh
            # rho edge-column pairs (Y_loc, 2)
            carry_specs = carry_specs + (RSPEC,) * 2 * K
        in_specs = carry_specs
        if self.has_mask:
            in_specs = in_specs + (mspec,)
        self._sharded_step = shard_map(
            step_fn, mesh=mesh, in_specs=in_specs,
            out_specs=carry_specs, check_vma=False)
        self._sharded_init = shard_map(
            init_fn, mesh=mesh, in_specs=(FSPEC,) * K,
            out_specs=carry_specs, check_vma=False)

    @property
    def padded(self):
        """The between-steps carry is (fs, rhos, edges, faces);
        pad_state/crop_state convert once per chunk."""
        return True

    def pad_state(self, state):
        return self._sharded_init(*state)

    def crop_state(self, carry):
        return tuple(carry[:self.K])

    def step(self, carry, it=0):
        args = list(carry)
        if self.has_mask:
            args.append(self.mask_global)
        return self._sharded_step(*args)

    def run_steps(self, state, n, it0=0):
        carry = self.pad_state(state)
        carry = jax.lax.fori_loop(
            0, n, lambda i, sc: self.step(sc, it0 + i), carry)
        return self.crop_state(carry)


class ShardedPallasFE2D:
    """Sharded fused stepping for 2D binary free-energy scenes
    (walls/obstacles + wetting, like the single-device kernel) on
    ('y',), ('x',) and ('y','x') meshes.

    y-sharded carry: (f0, f1, phi, pelo, pehi, glo0, glo1, ghi0,
    ghi1). The phi wrap blocks are assembled per step from the carried
    phi + fresh edge rows and ppermuted (their boundary rows must be
    the neighbors' FRESH edges -- a shard's own emitted rows 0/Y-1 are
    stale-by-contract); orientation wrap blocks are static. x-sharded
    meshes carry the KERNEL-EMITTED per-component boundary/inner
    columns (colx0, colx1) and the fresh phi edge-column pair
    (pecols): the kernel's ghost-column inputs and the phi
    edge-column re-stream are built from those -- column-slicing the
    in-place-aliased states into the ppermutes forces XLA to copy the
    whole arrays every step (see benchmark/x_ghost_overhead.py). An
    ('x',)-only mesh carries (f0, f1, phi, colx0, colx1, pecols)."""

    def __init__(self, mbuilder, domain_shape, mesh, interpret=False):
        from sailfish_tpu.ops.pallas_multi2d import (
            make_kernel_2d_fe, make_rho_kernel_2d, pick_block_size)
        axes = list(mesh.axis_names)
        if axes not in (['y'], ['x'], ['y', 'x']):
            raise NotImplementedError(
                "the sharded fused 2D FE kernel covers ('y',), ('x',) "
                f"and ('y','x') meshes; got {axes}")
        self.y_sharded = 'y' in axes
        self.x_sharded = 'x' in axes
        self.wetting = bool(mbuilder._has_dry_nodes)
        # x-sharded wetting: the wall mirror widens the phi stencil's
        # x-reach to two columns, beyond the ghost-column machinery --
        # so the mirror moves OUT of the kernel (the 2D twin of
        # ShardedPallasFE3D.wetting_zy): each step computes the
        # wetting-adjusted phi_w in XLA from the carried raw-phi
        # materials (selects + one subtract, same order as the
        # in-kernel mirror) and feeds the kernel's non-wetting
        # x_ghosts mode, shipping already-adjusted phi_w columns.
        self.wetting_x = self.wetting and self.x_sharded
        Y, X = domain_shape
        self.shape = domain_shape
        self.mesh = mesh
        ny = mesh.shape['y'] if self.y_sharded else 1
        nx = mesh.shape['x'] if self.x_sharded else 1
        self.nshards = ny * nx
        assert Y % ny == 0 and X % nx == 0
        Y_loc = Y // ny
        X_loc = X // nx
        check_plane_tiling(Y_loc, X_loc, interpret, dim=2)
        b0 = mbuilder.b0
        mask_np, patch_rows = classify_nodes(b0.maps)
        if patch_rows:
            raise NotImplementedError(
                'the fused FE 2D kernel covers walls/obstacles only; '
                'complex-BC scenes use the XLA engine')
        self.has_mask = bool((mask_np != 0).any())
        by = pick_block_size(mbuilder.grid.Q * 2, Y_loc, X_loc)
        self.by = by
        if Y_loc // by < 4:
            raise NotImplementedError(
                'sharded 2D FE stepping needs >= 4 y-blocks per '
                f'shard (Y_loc={Y_loc}, by={by})')
        yax = 'y' if self.y_sharded else None
        xax = 'x' if self.x_sharded else None
        mspec = P(yax, xax)
        self.mask_global = None
        if self.has_mask:
            self.mask_global = jax.device_put(
                jnp.asarray(mask_np), NamedSharding(mesh, mspec))
        self.orient_global = None
        if self.wetting_x:
            orient_np = np.asarray(mbuilder._dry_orient)
            self.orient_global = jax.device_put(
                jnp.asarray(orient_np), NamedSharding(mesh, mspec))
        elif self.wetting:
            orient_np = np.asarray(mbuilder._dry_orient)
            self.orient_global = jax.device_put(
                jnp.asarray(orient_np),
                NamedSharding(mesh, P('y', None)))
            # static neighbor wrap blocks of the orientation map
            S = self.nshards
            oglo = np.stack([
                np.take(orient_np,
                        np.arange(s * Y_loc - by, s * Y_loc) % Y,
                        axis=0) for s in range(S)])
            oghi = np.stack([
                np.take(orient_np,
                        np.arange((s + 1) * Y_loc,
                                  (s + 1) * Y_loc + by) % Y,
                        axis=0) for s in range(S)])
            self.orient_lo = jax.device_put(
                jnp.asarray(oglo),
                NamedSharding(mesh, P('y', None, None)))
            self.orient_hi = jax.device_put(
                jnp.asarray(oghi),
                NamedSharding(mesh, P('y', None, None)))
        self.kernel = make_kernel_2d_fe(
            mbuilder, Y_loc, X_loc, by=by, has_mask=self.has_mask,
            wetting=self.wetting and not self.x_sharded,
            emit_rho=True, edge_io=self.y_sharded,
            x_ghosts=self.x_sharded, col_io=self.x_sharded,
            interpret=interpret)
        self.rho_kernel = make_rho_kernel_2d(b0, Y_loc, X_loc, by=by,
                                             interpret=interpret)
        up, down = _ring(ny)
        upx, downx = _ring(nx)
        g = mbuilder.grid
        basis = g.basis
        xdirs = [i for i in range(g.Q) if int(basis[i][0]) != 0]

        def build_xcols(f_local):
            """Per-component (Y_loc, 128) post-roll f wrap columns
            (see ShardedPallasSCMulti2D.build_xcols)."""
            recv_last = jax.lax.ppermute(
                f_local[:, :, X_loc - 1], 'x', upx)
            recv_first = jax.lax.ppermute(f_local[:, :, 0], 'x', downx)
            cols = []
            for i in xdirs:
                cx, cy = int(basis[i][0]), int(basis[i][1])
                src = recv_last[i] if cx == 1 else recv_first[i]
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

        def build_pxcols(phi_f):
            """(Y_loc, 128) raw-phi ghost columns for the stencil wrap
            lanes (lane 3*side + (dy+1); the phi twin of
            ShardedPallasSCMulti2D.build_rxcols)."""
            def ext(col):
                if self.y_sharded:
                    e_lo = jax.lax.ppermute(col[-1:], 'y', up)
                    e_hi = jax.lax.ppermute(col[:1], 'y', down)
                else:
                    e_lo, e_hi = col[-1:], col[:1]
                return jnp.concatenate([e_lo, col, e_hi])
            pxR = jax.lax.ppermute(ext(phi_f[:, 0]), 'x', downx)
            pxL = jax.lax.ppermute(ext(phi_f[:, X_loc - 1]), 'x', upx)
            lanes = [se[1 + dy:Y_loc + 1 + dy]
                     for se in (pxR, pxL) for dy in (-1, 0, 1)]
            px = jnp.stack(lanes, axis=1)
            return jnp.pad(px, ((0, 0), (0, 128 - 6)))

        def _f_col_ext(f2, c, glo_blk, ghi_blk):
            return jnp.concatenate(
                [glo_blk[:, -1:, c], f2[:, :, c], ghi_blk[:, :1, c]],
                axis=1)

        def _fx_cols(f2, glo_blk, ghi_blk):
            fxlo = jax.lax.ppermute(
                _f_col_ext(f2, X_loc - 1, glo_blk, ghi_blk), 'x', upx)
            fxhi = jax.lax.ppermute(
                _f_col_ext(f2, 0, glo_blk, ghi_blk), 'x', downx)
            return fxlo, fxhi

        def _patch_cols(phi2, c0, cX):
            xi = jnp.arange(X_loc)[None, :]
            phi2 = jnp.where(xi == 0, c0[:, None], phi2)
            return jnp.where(xi == X_loc - 1, cX[:, None], phi2)

        Qn = g.Q

        def build_xcols_emitted(colx):
            """One component's xcol input from its kernel-emitted
            boundary columns (see ShardedPallasSCMulti2D)."""
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

        def _fx_cols_emitted(colx2, glo_blk, ghi_blk):
            """_fx_cols from the kernel-emitted boundary columns;
            glo_blk=None wraps the ghost entries locally (x-only)."""
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

        def build_pxcols_from(pecols):
            """build_pxcols from the carried (Y_loc, 2) fresh phi
            edge-column pair (un-aliased)."""
            def ext(col):
                if self.y_sharded:
                    e_lo = jax.lax.ppermute(col[-1:], 'y', up)
                    e_hi = jax.lax.ppermute(col[:1], 'y', down)
                else:
                    e_lo, e_hi = col[-1:], col[:1]
                return jnp.concatenate([e_lo, col, e_hi])
            pxR = jax.lax.ppermute(ext(pecols[:, 0]), 'x', downx)
            pxL = jax.lax.ppermute(ext(pecols[:, 1]), 'x', upx)
            lanes = [se[1 + dy:Y_loc + 1 + dy]
                     for se in (pxR, pxL) for dy in (-1, 0, 1)]
            px = jnp.stack(lanes, axis=1)
            return jnp.pad(px, ((0, 0), (0, 128 - 6)))

        def slice_cols_init(f_local):
            """Initial colx from the un-aliased initial state (4
            groups: x = 0, X-1, 1, X-2; kernel emission layout)."""
            cols = []
            for c in (0, X_loc - 1, 1, X_loc - 2):
                for i in range(Qn):
                    cols.append(f_local[i, :, c])
            colx = jnp.stack(cols, axis=1).astype(jnp.float32)
            return jnp.pad(colx, ((0, 0), (0, 128 - len(cols))))

        wall_grad = mbuilder.wall_grad_phase
        orient_vecs = [(int(v[0]), int(v[1]))
                       for v in g.orientation_vectors]

        def _phi_w_local(phi_f, row_m1, row_Y, col_m1, col_X, orient):
            """Wetting-adjusted phi over the local shard, computed in
            XLA (the wetting_x mode; the 1-axis path mirrors
            in-kernel, pallas_multi2d.phi_w_rows -- same select +
            subtract order). ``phi_f`` must have FRESH edge rows and
            columns; the orientation vectors are axis-aligned units,
            so each mirror read crosses at most one shard face and
            every source is in the carried materials."""
            yi = jnp.arange(Y_loc)[:, None]
            xi = jnp.arange(X_loc)[None, :]
            wg = jnp.asarray(wall_grad, phi_f.dtype)
            out = phi_f
            for kk, (ex, ey) in enumerate(orient_vecs):
                if ey:
                    neigh = jnp.roll(phi_f, -ey, axis=0)
                    if ey == 1:
                        neigh = jnp.where(yi == Y_loc - 1, row_Y,
                                          neigh)
                    else:
                        neigh = jnp.where(yi == 0, row_m1, neigh)
                else:
                    neigh = jnp.roll(phi_f, -ex, axis=1)
                    if ex == 1:
                        neigh = jnp.where(xi == X_loc - 1,
                                          col_X[:, None], neigh)
                    else:
                        neigh = jnp.where(xi == 0, col_m1[:, None],
                                          neigh)
                out = jnp.where(orient == kk + 1, neigh - wg, out)
            return out

        def local_step(f0, f1, phi, pelo, pehi, glo0, glo1, ghi0,
                       ghi1, *rest):
            colx0 = colx1 = pecols = None
            b = 0
            if self.x_sharded:
                colx0, colx1, pecols = rest[0], rest[1], rest[2]
                b = 3
            r = b + (1 if self.has_mask else 0)
            phi_k, pelo_k, pehi_k = phi, pelo[0], pehi[0]
            if self.wetting_x:
                # fresh-rowed raw phi -> XLA-side wetting mirror (see
                # _phi_w_local); the kernel runs non-wetting on phi_w.
                # phi_f is a DERIVED (un-aliased) array, so slicing
                # its columns is safe
                orient = rest[r]
                yi = jnp.arange(Y_loc)[:, None]
                phi_f = jnp.where(yi == 0, pelo[0], phi)
                phi_f = jnp.where(yi == Y_loc - 1, pehi[0], phi_f)
                row_m1 = jax.lax.ppermute(pehi[0], 'y', up)
                row_Y = jax.lax.ppermute(pelo[0], 'y', down)
                pxraw = build_pxcols(phi_f)
                phi_k = _phi_w_local(phi_f, row_m1, row_Y,
                                     pxraw[:, 4], pxraw[:, 1], orient)
                pelo_k, pehi_k = phi_k[0:1], phi_k[-1:]
            # phi wrap blocks: boundary rows replaced with the FRESH
            # edge rows before the ppermute
            pglo = jax.lax.ppermute(
                jnp.concatenate([phi_k[-by:-1], pehi_k], axis=0),
                'y', up)
            pghi = jax.lax.ppermute(
                jnp.concatenate([pelo_k, phi_k[1:by]], axis=0),
                'y', down)
            kargs = [f0, f1, glo0[0], glo1[0], ghi0[0], ghi1[0],
                     phi_k, pglo, pghi, pelo_k, pehi_k]
            if self.x_sharded:
                # wetting_x: phi_k is the fresh XLA-side phi_w, safe
                # to column-slice; non-wetting: phi_k is the ALIASED
                # carried phi -- use the carried edge-column pair
                pxin = build_pxcols(phi_k) if self.wetting_x else                     build_pxcols_from(pecols)
                kargs += [build_xcols_emitted(colx0),
                          build_xcols_emitted(colx1), pxin]
            if self.has_mask:
                kargs.append(rest[b])
            if self.wetting and not self.wetting_x:
                kargs += [rest[r], rest[r + 1][0], rest[r + 2][0]]
            out = self.kernel(*kargs)
            if self.x_sharded:
                f0_2, f1_2, phi2, colx0_2, colx1_2 = out
            else:
                f0_2, f1_2, phi2 = out
            glo0_2 = jax.lax.ppermute(f0_2[:, -by:], 'y', up)
            glo1_2 = jax.lax.ppermute(f1_2[:, -by:], 'y', up)
            ghi0_2 = jax.lax.ppermute(f0_2[:, :by], 'y', down)
            ghi1_2 = jax.lax.ppermute(f1_2[:, :by], 'y', down)
            if self.x_sharded:
                fxlo, fxhi = _fx_cols_emitted(colx1_2, glo1_2, ghi1_2)
                lo, hi = stream_rho_edge_rows_2d(
                    g, f1_2, glo1_2, ghi1_2, fxlo, fxhi)
                c0, cX = stream_rho_edge_cols_2d(
                    g, f1_2, glo1_2, ghi1_2, fxlo, fxhi,
                    cols=(colx1_2, Qn))
                phi2 = _patch_cols(phi2, c0, cX)
                return (f0_2, f1_2, phi2, lo[None], hi[None],
                        glo0_2[None], glo1_2[None], ghi0_2[None],
                        ghi1_2[None], colx0_2, colx1_2,
                        jnp.stack([c0, cX], axis=1))
            lo, hi = stream_rho_edge_rows_2d(g, f1_2, glo1_2, ghi1_2)
            return (f0_2, f1_2, phi2, lo[None], hi[None],
                    glo0_2[None], glo1_2[None], ghi0_2[None],
                    ghi1_2[None])

        def local_init(f0, f1):
            glo0 = jax.lax.ppermute(f0[:, -by:], 'y', up)
            glo1 = jax.lax.ppermute(f1[:, -by:], 'y', up)
            ghi0 = jax.lax.ppermute(f0[:, :by], 'y', down)
            ghi1 = jax.lax.ppermute(f1[:, :by], 'y', down)
            phi = self.rho_kernel(f1)   # edge rows stale (local wrap)
            if self.x_sharded:
                fxlo, fxhi = _fx_cols(f1, glo1, ghi1)
                lo, hi = stream_rho_edge_rows_2d(
                    g, f1, glo1, ghi1, fxlo, fxhi)
                c0, cX = stream_rho_edge_cols_2d(
                    g, f1, glo1, ghi1, fxlo, fxhi)
                phi = _patch_cols(phi, c0, cX)
                return (f0, f1, phi, lo[None], hi[None], glo0[None],
                        glo1[None], ghi0[None], ghi1[None],
                        slice_cols_init(f0), slice_cols_init(f1),
                        jnp.stack([c0, cX], axis=1))
            lo, hi = stream_rho_edge_rows_2d(g, f1, glo1, ghi1)
            return (f0, f1, phi, lo[None], hi[None], glo0[None],
                    glo1[None], ghi0[None], ghi1[None])

        def local_step_x(f0, f1, phi, colx0, colx1, pecols, *rest):
            """('x',)-only mesh: y wraps locally, carry
            (f0, f1, phi, colx0, colx1, pecols) with phi fully fresh
            (edge columns re-streamed from the emitted columns)."""
            phi_k = phi
            if self.wetting_x:
                # phi is fully fresh on an x-mesh, so the carried
                # edge-column pair IS phi's own columns -- the raw-phi
                # stencil columns come from it without slicing phi
                pxraw = build_pxcols_from(pecols)
                phi_k = _phi_w_local(
                    phi, phi[-1:], phi[0:1], pxraw[:, 4], pxraw[:, 1],
                    rest[1 if self.has_mask else 0])
            pxin = build_pxcols(phi_k) if self.wetting_x else                 build_pxcols_from(pecols)
            kargs = [f0, f1, f0[:, -by:], f1[:, -by:], f0[:, :by],
                     f1[:, :by], phi_k, build_xcols_emitted(colx0),
                     build_xcols_emitted(colx1), pxin]
            if self.has_mask:
                kargs.append(rest[0])
            f0_2, f1_2, phi2, colx0_2, colx1_2 = self.kernel(*kargs)
            fxlo, fxhi = _fx_cols_emitted(colx1_2, None, None)
            c0, cX = stream_rho_edge_cols_2d(g, f1_2, None, None,
                                             fxlo, fxhi,
                                             cols=(colx1_2, Qn))
            return (f0_2, f1_2, _patch_cols(phi2, c0, cX),
                    colx0_2, colx1_2, jnp.stack([c0, cX], axis=1))

        def local_init_x(f0, f1):
            phi = self.rho_kernel(f1)   # edge lanes stale (local wrap)
            glo = f1[:, -by:]
            ghi = f1[:, :by]
            fxlo, fxhi = _fx_cols(f1, glo, ghi)
            c0, cX = stream_rho_edge_cols_2d(g, f1, glo, ghi,
                                             fxlo, fxhi)
            return (f0, f1, _patch_cols(phi, c0, cX),
                    slice_cols_init(f0), slice_cols_init(f1),
                    jnp.stack([c0, cX], axis=1))

        FSPEC = P(None, yax, xax)
        RSPEC = P(yax, xax)
        if self.y_sharded:
            ESPEC = P(yax, None, xax)
            GSPEC = P(yax, None, None, xax)
            carry_specs = (FSPEC, FSPEC, RSPEC, ESPEC, ESPEC,
                           GSPEC, GSPEC, GSPEC, GSPEC)
            step_fn, init_fn = local_step, local_init
        else:
            carry_specs = (FSPEC, FSPEC, RSPEC)
            step_fn, init_fn = local_step_x, local_init_x
        if self.x_sharded:
            # kernel-emitted colx0/colx1 (Y_loc, 128) + the fresh phi
            # edge-column pair (Y_loc, 2)
            carry_specs = carry_specs + (RSPEC, RSPEC, RSPEC)
        in_specs = carry_specs
        if self.has_mask:
            in_specs = in_specs + (mspec,)
        if self.wetting_x:
            in_specs = in_specs + (mspec,)
        elif self.wetting:
            in_specs = in_specs + (P('y', None),
                                   P('y', None, None),
                                   P('y', None, None))
        self._sharded_step = shard_map(
            step_fn, mesh=mesh, in_specs=in_specs,
            out_specs=carry_specs, check_vma=False)
        self._sharded_init = shard_map(
            init_fn, mesh=mesh, in_specs=(FSPEC, FSPEC),
            out_specs=carry_specs, check_vma=False)

    @property
    def padded(self):
        return True

    def pad_state(self, state):
        return self._sharded_init(*state)

    def crop_state(self, carry):
        return tuple(carry[:2])

    def step(self, carry, it=0):
        args = list(carry)
        if self.has_mask:
            args.append(self.mask_global)
        if self.wetting_x:
            args.append(self.orient_global)
        elif self.wetting:
            args += [self.orient_global, self.orient_lo,
                     self.orient_hi]
        return self._sharded_step(*args)

    def run_steps(self, state, n, it0=0):
        carry = self.pad_state(state)
        carry = jax.lax.fori_loop(
            0, n, lambda i, sc: self.step(sc, it0 + i), carry)
        return self.crop_state(carry)
