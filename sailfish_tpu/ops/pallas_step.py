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
    as rolls of the full (Y, X) plane, which makes them globally periodic
    exactly like jnp.roll; the z ghost ring carries z periodicity (the
    counterpart of the reference's ghost envelope, controller.py:482-494).
  * Grid over z: each program DMAs Q contiguous (Y, X) planes from
    z+1-c_z (pull streaming as plane-shifted reads), rolls by (c_y, c_x),
    collides, and writes the (Q, Y, X) result to plane z+1 of the output.
  * The kernel collides every node as plain fluid (BGK + uniform Guo
    forcing). Boundary nodes are then *patched* by the exact XLA BC
    machinery (StepBuilder.for_window) on thin slabs covering all
    non-fluid nodes -- the TPU analog of the reference's bulk/boundary
    kernel split (subdomain_runner.py:48-63), with the bulk on the fast
    path and the boundary at surface cost.

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


# -- boundary-slab cover -----------------------------------------------------

def boundary_boxes(type_map, fluid_id=0):
    """Cover all non-fluid nodes with a small set of boxes (python slices
    over the spatial axes): up to 6 domain-face slabs of thickness 1..2
    plus one bbox for any interior remainder."""
    nonfluid = type_map != fluid_id
    shape = type_map.shape
    dim = len(shape)
    boxes = []
    covered = np.zeros_like(nonfluid)

    def full(axis_slice, axis):
        out = [slice(0, n) for n in shape]
        out[axis] = axis_slice
        return out

    for axis in range(dim):
        for side in (0, 1):
            t = 0
            while t < 2:
                sl = full(slice(t, t + 1) if side == 0 else
                          slice(shape[axis] - t - 1, shape[axis] - t), axis)
                if np.any(nonfluid[tuple(sl)] & ~covered[tuple(sl)]):
                    t += 1
                else:
                    break
            if t > 0:
                sl = full(slice(0, t) if side == 0 else
                          slice(shape[axis] - t, shape[axis]), axis)
                boxes.append(tuple(sl))
                covered[tuple(sl)] = True

    rest = nonfluid & ~covered
    if np.any(rest):
        idx = np.nonzero(rest)
        boxes.append(tuple(slice(int(a.min()), int(a.max()) + 1)
                           for a in idx))
    return boxes


def expand_box(box, pad, shape):
    return tuple(slice(max(s.start - pad, 0), min(s.stop + pad, n))
                 for s, n in zip(box, shape))


def inner_slices(box, ebox):
    """Slices selecting `box` within the coordinate frame of `ebox`."""
    return tuple(slice(b.start - e.start, b.stop - e.start)
                 for b, e in zip(box, ebox))


def window_shifted(plane, window, shift):
    """plane[window - shift] with periodic wrap, built from static slices
    only -- reads just the window-sized region (the roll-then-slice
    formulation makes XLA materialize the full rolled array, which
    dominated the step cost). ``window``: python slices per axis (spatial,
    unpadded coords); ``shift``: source offset (c_x, c_y, c_z) reordered
    to match the array axes by the caller."""
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


# -- the kernel --------------------------------------------------------------

def _collide_planes(builder, fs):
    """BGK collision on a list of Q (Y, X) VMEM planes -> list of Q."""
    g = builder.grid
    dtype = fs[0].dtype
    rho = fs[0]
    for i in range(1, g.Q):
        rho = rho + fs[i]
    mom = [eq.signed_sum(g.basis[:, a], fs) for a in range(g.dim)]
    inv_rho = 1.0 / rho
    u = [m * inv_rho for m in mom]
    has_force = (builder.force_dev is not None
                 and builder.force_model == 'guo')
    if has_force:
        fvec = np.asarray(builder.body_force, dtype=np.float64).reshape(-1)
        u = [ua + jnp.asarray(0.5 * fvec[a], dtype) * inv_rho
             for a, ua in enumerate(u)]
    usq = u[0] * u[0]
    for a in range(1, g.dim):
        usq = usq + u[a] * u[a]
    tau_inv = jnp.asarray(builder.tau_inv, dtype)
    out = []
    w = g.weights
    for i in range(g.Q):
        cu = eq.signed_sum(g.basis[i], u)
        poly = 3.0 * cu + 4.5 * cu * cu - 1.5 * usq
        if builder.incompressible:
            feq = jnp.asarray(w[i], dtype) * (rho + poly)
        else:
            feq = jnp.asarray(w[i], dtype) * (rho + rho * poly)
        fpost = fs[i] + tau_inv * (feq - fs[i])
        if has_force:
            fvec = np.asarray(builder.body_force,
                              dtype=np.float64).reshape(-1)
            cF = float(np.dot(g.basis[i], fvec))
            uF = u[0] * jnp.asarray(fvec[0], dtype)
            for a in range(1, g.dim):
                uF = uF + u[a] * jnp.asarray(fvec[a], dtype)
            pref = (1.0 - 0.5 * builder.tau_inv) * w[i]
            fpost = fpost + jnp.asarray(pref, dtype) * (
                3.0 * (jnp.asarray(cF, dtype) - uF) + 9.0 * cu * cF)
        out.append(fpost)
    return out


def make_kernel_3d(builder, Z, Y, X, interpret=False):
    """Returns fused(fpad) -> out_padded; state (Q, Z+2, Y, X); the output
    ghost planes are NOT refreshed here."""
    g = builder.grid
    Q = g.Q
    dtype = builder.dtype
    basis = g.basis  # (Q, 3) as (cx, cy, cz)

    def kernel(f_hbm, out_hbm, fs_buf, out_buf, in_sems, out_sem):
        z0 = pl.program_id(0)

        copies = []
        for i in range(Q):
            cz = int(basis[i][2])
            src = f_hbm.at[i, z0 + 1 - cz]
            c = pltpu.make_async_copy(src, fs_buf.at[i], in_sems.at[i])
            c.start()
            copies.append(c)
        for c in copies:
            c.wait()

        fs = []
        for i in range(Q):
            cx, cy = int(basis[i][0]), int(basis[i][1])
            plane = fs_buf[i]
            if cy:
                plane = pltpu.roll(plane, cy % Y, axis=0)
            if cx:
                plane = pltpu.roll(plane, cx % X, axis=1)
            fs.append(plane)

        out = _collide_planes(builder, fs)
        for i in range(Q):
            out_buf[i] = out[i]

        oc = pltpu.make_async_copy(
            out_buf, out_hbm.at[:, z0 + 1], out_sem)
        oc.start()
        oc.wait()

    fused = pl.pallas_call(
        kernel,
        grid=(Z,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((Q, Z + 2, Y, X), dtype),
        scratch_shapes=[
            pltpu.VMEM((Q, Y, X), dtype),
            pltpu.VMEM((Q, Y, X), dtype),
            pltpu.SemaphoreType.DMA((Q,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )
    return fused


# -- padded-state helpers ----------------------------------------------------

def to_padded(f):
    """(Q, Z, Y, X) -> (Q, Z+2, Y, X) with periodic z ghost planes."""
    fpad = jnp.pad(f, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return refresh_ghosts(fpad)


def from_padded(fpad):
    return fpad[:, 1:-1]


def refresh_ghosts(fpad):
    """Periodic ghost planes in z (matches jnp.roll wrap semantics;
    non-periodic domain edges are the BC nodes' responsibility, same
    contract as the ghost layer in the reference)."""
    fpad = fpad.at[:, 0].set(fpad[:, -2])
    fpad = fpad.at[:, -1].set(fpad[:, 1])
    return fpad


# -- full fused step (kernel + boundary patches) -----------------------------

class PallasStep3D:
    """Drop-in replacement for StepBuilder.build() on one device (3D)."""

    def __init__(self, builder, domain_shape, interpret=False):
        self.builder = builder
        Zs, Ys, Xs = domain_shape
        self.shape = domain_shape
        self.kernel = make_kernel_3d(builder, Zs, Ys, Xs,
                                     interpret=interpret)
        self._make_patches()

    def _make_patches(self):
        b = self.builder
        boxes = boundary_boxes(b.maps.type_map, fluid_id=nt._NTFluid.id)
        self.patches = []
        for box in boxes:
            ebox = expand_box(box, 2, self.shape)
            sub = b.for_window(ebox, flatten=True)
            self.patches.append((box, ebox, inner_slices(box, ebox), sub))

    def _patch(self, f, out_pad):
        """Recompute BC slabs exactly with the XLA machinery and write the
        corrected values into the padded output. All gathers are static
        wrapped-window slices (reads only slab-sized regions)."""
        b = self.builder
        g = b.grid

        def axes_shift(vec):
            # basis vectors are (cx, cy, cz); array axes are (z, y, x)
            return (int(vec[2]), int(vec[1]), int(vec[0]))

        for box, ebox, inner, sub in self.patches:
            qsl = (slice(None),)
            box_shape = tuple(s.stop - s.start for s in ebox)
            f_box = f[qsl + ebox].reshape(g.Q, -1)
            fs_box = jnp.stack([
                window_shifted(f[i], ebox, axes_shift(g.basis[i]))
                .reshape(-1) for i in range(g.Q)])

            def sampler(vec, _f=f, _ebox=ebox):
                sh = axes_shift(-np.asarray(vec))
                return jnp.stack([window_shifted(_f[i], _ebox, sh)
                                  .reshape(-1) for i in range(g.Q)])

            fs_box = sub.fix_missing(fs_box, f_box, sampler)
            rho, u = eq.macroscopic(g, fs_box)
            rho, u = sub._solve_macro_bc(fs_box, rho, u)
            fs2 = sub._pre_collision_bc(fs_box, rho, u)
            fpost = sub._collide(fs2, rho, u)
            if sub.has_dry:
                fpost = jnp.where(sub.dev['wet'][None], fpost, fs2)
            fpost = sub._post_collision(fs2, fpost)
            piece = fpost.reshape((g.Q,) + box_shape)[qsl + inner]
            out_pad = jax.lax.dynamic_update_slice(
                out_pad, piece,
                (0, box[0].start + 1, box[1].start, box[2].start))
        return out_pad

    def step_padded(self, fpad):
        out = self.kernel(fpad)
        f = from_padded(fpad)
        out = self._patch(f, out)
        return refresh_ghosts(out)

    def run_steps(self, f, n):
        """(Q, Z, Y, X) unpadded in/out; jit-friendly."""
        fpad = to_padded(f)
        fpad = jax.lax.fori_loop(0, n, lambda i, fp: self.step_padded(fp),
                                 fpad)
        return from_padded(fpad)
