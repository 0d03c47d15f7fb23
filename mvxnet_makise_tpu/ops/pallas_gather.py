"""Pallas TPU kernel: bilinear FPN gather as banded selector-matmuls.

Reference semantics: ``featureMaping`` (/root/reference/modules/imhead/
Pipe.py:23-82) — for every point, bilinearly interpolate each FPN level
at the point's image projection and concatenate the levels.  The XLA
formulation (ops/gather.py) lowers to row-gathers and is *row-issue
bound*: measured on v5e, 262k 2 KB patch-rows move at ~25-60 GB/s
(~41 ms/batch-8 with the table builds) although the payload is ~1.6 GB.

This kernel reaches the memory floor by turning the gather into MXU
work.  Key observations:

  * the three FPN levels halve exactly (stride 4/8/16 of one padded
    image), so a point's tap *rows* at every level are determined by its
    P2 row up to a +-1 it carries along;
  * bilinear interpolation is linear, so a whole window of points can be
    computed as ``sel @ feature_rows`` where ``sel`` embeds the four tap
    weights as a sparse (window, Wf) matrix — built on the fly in VMEM
    (never touching HBM) and contracted on the MXU.

Dataflow:

  1. (XLA prep) points are sorted by P2 feature row ("band") and padded
     so every ``window``-point block lies inside ONE band — each block
     then needs exactly 2 P2 rows / 3 P3 rows / 3 P4 rows, loaded by
     BlockSpec index maps reading per-window scalars (no dynamic DMA,
     no overflow case, ever);
  2. (kernel, grid = (B, n_windows)) per block and level: build
     ``sel (window, nrows*Wf)`` from per-point (row-offset, col, fx, fy)
     and multiply against the resident feature rows;
  3. downstream pointwise work (the fusion MLP) runs directly on the
     band-sorted padded layout — order is irrelevant to pointwise math
     and masked statistics — and only the final 16-channel output is
     un-permuted (ops consumers: models/image_head.PointImageHead).

HBM traffic: feature rows stream once (Pallas skips re-fetch while the
block index is unchanged, and consecutive windows share rows), point
data and outputs stream once — the streaming minimum for this op.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-point record layout in the padded point-data buffer (f32):
# [r0, c0, fr, fc] x 3 levels + [valid, 0, 0, 0]
_PD = 16


def _level_geometry(image_size, shapes):
    """Per-level (ry, rx) region sizes (Pipe.py:41-45 convention)."""
    im_h, im_w = image_size
    return [(im_h / h, im_w / w) for h, w, _ in shapes]


def _taps(points_rc, Hf, Wf, ry, rx, eps):
    """Per-point integer tap base + fractional weights for one level."""
    r = jnp.clip(points_rc[:, 0] / ry - eps, 0.0, Hf - 1.0)
    c = jnp.clip(points_rc[:, 1] / rx - eps, 0.0, Wf - 1.0)
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(c).astype(jnp.int32)
    fr = r - r0.astype(r.dtype)
    fc = c - c0.astype(c.dtype)
    return r0, c0, fr, fc


def _gather_kernel(bases_ref, pd_ref,
                   f2a, f2b, f3a, f3b, f3c, f4a, f4b, f4c,
                   out_ref, *, window: int, shapes, swapped: bool):
    """One grid step = one (window,) point block of one frame.

    bases_ref: scalar-prefetch (B*W*3,) per-window minimum rows
    (flattened — multi-dim SMEM operands get lane-padded past the SMEM
    budget).
    pd_ref: (1, window, _PD) f32 point records.
    f2a/f2b: (1, 1, Wf2, C) the two P2 rows; f3*/f4*: three rows each.
    out_ref: (1, window, 3*C).
    """
    pd = pd_ref[0]                                    # (window, _PD)
    valid = pd[:, 12:13]                              # (window, 1)
    b = pl.program_id(0)
    w = pl.program_id(1)
    n_windows = pl.num_programs(1)

    offs = [0]
    for _, _, C in shapes:
        offs.append(offs[-1] + C)

    level_rows = [(f2a, f2b), (f3a, f3b, f3c), (f4a, f4b, f4c)]
    for l, (Hf, Wf, C) in enumerate(shapes):
        base = bases_ref[(b * n_windows + w) * 3 + l]
        r0 = pd[:, 4 * l + 0:4 * l + 1].astype(jnp.int32)  # (window, 1)
        c0 = pd[:, 4 * l + 1:4 * l + 2].astype(jnp.int32)
        fr = pd[:, 4 * l + 2:4 * l + 3]
        fc = pd[:, 4 * l + 3:4 * l + 4]
        r1 = jnp.minimum(r0 + 1, Hf - 1)
        c1 = jnp.minimum(c0 + 1, Wf - 1)
        d0 = r0 - base                                # (window, 1)
        d1 = r1 - base

        if swapped:
            # reference Pipe.py:72-75 exact weights
            w00, w10 = fr * fc, (1 - fr) * fc
            w01, w11 = fr * (1 - fc), (1 - fr) * (1 - fc)
        else:
            w00, w10 = (1 - fr) * (1 - fc), fr * (1 - fc)
            w01, w11 = (1 - fr) * fc, fr * fc

        col = jax.lax.broadcasted_iota(jnp.int32, (window, Wf), 1)
        acc = None
        for k, row_ref in enumerate(level_rows[l]):
            row = row_ref[0, 0]                       # (Wf, C)
            # selector for this slab row: taps whose row-offset == k
            s = (jnp.where((d0 == k) & (col == c0), w00, 0.0)
                 + jnp.where((d0 == k) & (col == c1), w01, 0.0)
                 + jnp.where((d1 == k) & (col == c0), w10, 0.0)
                 + jnp.where((d1 == k) & (col == c1), w11, 0.0))
            s = (s * valid).astype(row.dtype)
            part = jax.lax.dot_general(
                s, row, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        out_ref[0, :, offs[l]:offs[l + 1]] = acc.astype(out_ref.dtype)


def plan_band_layout(band: jnp.ndarray, n_bands: int, window: int,
                     n_windows: int):
    """Band-sorted padded layout for one frame.

    band: (P,) int32 band id per point (any order).  Returns
    (order (P,) sort permutation, pos (P,) padded position of sorted
    point j, band_of_window (n_windows,) int32).
    """
    P = band.shape[0]
    order = jnp.argsort(band, stable=True)
    sband = band[order]
    starts = jnp.searchsorted(sband, jnp.arange(n_bands + 1))
    counts = starts[1:] - starts[:-1]
    wins = (counts + window - 1) // window            # windows per band
    woff = jnp.concatenate([jnp.zeros((1,), wins.dtype),
                            jnp.cumsum(wins)])        # window offset/band
    pos = (woff[sband] * window
           + jnp.arange(P) - starts[sband])           # (P,) sorted order

    # band of each window: scatter band ids at their window offsets,
    # then forward-fill (cummax) — unused trailing windows get the last
    # band, which is harmless (their points are all padding)
    wb = jnp.zeros((n_windows,), jnp.int32).at[
        jnp.minimum(woff[:-1], n_windows - 1)].max(
        jnp.arange(n_bands, dtype=jnp.int32) * (counts > 0))
    band_of_window = jax.lax.cummax(wb)
    return order, pos, band_of_window


def fpn_gather_banded(features: Sequence[jnp.ndarray],
                      points_rc: jnp.ndarray,
                      valid: jnp.ndarray,
                      image_size: Tuple[int, int],
                      *,
                      eps: float = 1e-6,
                      swapped_weights: bool = False,
                      window: int = 128,
                      interpret: bool = False):
    """Banded bilinear FPN gather (batched).

    Args:
      features: list of 3 (B, Hf_l, Wf_l, C) maps, each level exactly
        half the previous (torchvision FPN levels of one padded image).
      points_rc: (B, P, 2) original-image (row, col) per point.
      valid: (B, P) bool.
      image_size: (h, w) original image size.

    Returns:
      (gathered (B, Pp, sum C) in band-sorted padded order,
       pos (B, P) padded position per input point,
       padmask (B, Pp) bool real-row mask).
    ``gathered[b, pos[b, j]] == bilinear_gather_fpn(...)[b, j]`` for
    valid points; padding and invalid rows are zero.
    """
    B, P, _ = points_rc.shape
    shapes = [f.shape[1:] for f in features]
    Hf2 = shapes[0][0]
    n_windows = P // window + Hf2
    Pp = n_windows * window
    geoms = _level_geometry(image_size, shapes)

    def prep(rc, ok):
        recs, r0s = [], []
        for (Hf, Wf, C), (ry, rx) in zip(shapes, geoms):
            r0, c0, fr, fc = _taps(rc, Hf, Wf, ry, rx, eps)
            recs.append(jnp.stack(
                [r0.astype(jnp.float32), c0.astype(jnp.float32),
                 fr.astype(jnp.float32), fc.astype(jnp.float32)], axis=1))
            r0s.append(r0)
        rec = jnp.concatenate(
            recs + [ok.astype(jnp.float32)[:, None],
                    jnp.zeros((P, 3), jnp.float32)], axis=1)   # (P, _PD)

        order, pos_sorted, band_of_window = plan_band_layout(
            r0s[0], Hf2, window, n_windows)
        pdata = jnp.zeros((Pp, _PD), jnp.float32).at[
            pos_sorted].set(rec[order], mode="drop")
        padmask = jnp.zeros((Pp,), bool).at[pos_sorted].set(
            ok[order], mode="drop")
        pos = jnp.zeros((P,), jnp.int32).at[order].set(pos_sorted)

        # per-window minimum tap row per level (r0 within a band spans
        # <= 2 consecutive values at P3/P4, 1 at P2)
        bases = []
        for l, (Hf, Wf, C) in enumerate(shapes):
            nrows = 2 if l == 0 else 3
            bmin = jax.ops.segment_min(
                r0s[l][order], pos_sorted // window,
                num_segments=n_windows, indices_are_sorted=True)
            bmin = jnp.where(bmin == jnp.iinfo(jnp.int32).max, 0, bmin)
            bases.append(jnp.clip(bmin, 0, Hf - nrows))
        return pdata, jnp.stack(bases, 1).astype(jnp.int32).ravel(), \
            pos, padmask

    pdata, bases, pos, padmask = jax.vmap(prep)(points_rc, valid)

    Ctot = sum(C for _, _, C in shapes)
    f2, f3, f4 = features

    def rowspec(l, k):
        Hf = shapes[l][0]

        def imap(b, w, bases_ref):
            base = bases_ref[(b * n_windows + w) * 3 + l]
            return (b, jnp.minimum(base + k, Hf - 1), 0, 0)

        return pl.BlockSpec((1, 1, shapes[l][1], shapes[l][2]), imap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_windows),
        in_specs=[
            pl.BlockSpec((1, window, _PD), lambda b, w, s: (b, w, 0)),
            rowspec(0, 0), rowspec(0, 1),
            rowspec(1, 0), rowspec(1, 1), rowspec(1, 2),
            rowspec(2, 0), rowspec(2, 1), rowspec(2, 2),
        ],
        out_specs=pl.BlockSpec((1, window, Ctot),
                               lambda b, w, s: (b, w, 0)),
    )
    kernel = functools.partial(_gather_kernel, window=window,
                               shapes=shapes, swapped=swapped_weights)
    gathered = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Pp, Ctot), f2.dtype),
        interpret=interpret,
    )(bases.ravel(), pdata, f2, f2, f3, f3, f3, f4, f4, f4)
    return gathered, pos, padmask


# ---------------------------------------------------------------------------
# differentiable wrapper: forward = kernel, backward = XLA scatter-add
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fpn_gather_banded_diff(features, points_rc, valid, image_size,
                           eps, swapped_weights, window, interpret):
    return fpn_gather_banded(
        list(features), points_rc, valid, image_size, eps=eps,
        swapped_weights=swapped_weights, window=window,
        interpret=interpret)


def _fwd(features, points_rc, valid, image_size, eps, swapped, window,
         interpret):
    out = fpn_gather_banded_diff(features, points_rc, valid, image_size,
                                 eps, swapped, window, interpret)
    # zero-sized templates carry each level's static shape/dtype through
    # the residuals (residual leaves must be JAX types)
    templates = tuple(f[:0] for f in features)
    return out, (templates, points_rc, valid, out[1])


def _bwd(image_size, eps, swapped, window, interpret, res, g):
    """Transpose: scatter each padded cotangent row's four tap weights
    back into the level grids (pure XLA; training-path only)."""
    templates, points_rc, valid, pos = res
    fshapes = tuple((1,) + t.shape[1:] for t in templates)
    fdtypes = tuple(t.dtype for t in templates)
    g_gath = g[0]                                     # (B, Pp, Ctot)
    B, P, _ = points_rc.shape
    geoms = _level_geometry(image_size, [s[1:] for s in fshapes])

    # cotangent rows back in point order
    gp = jnp.take_along_axis(g_gath, pos[..., None], axis=1)  # (B, P, C)

    grads = []
    off = 0
    for (_, Hf, Wf, C), dt, (ry, rx) in zip(fshapes, fdtypes, geoms):
        gl = gp[..., off:off + C]
        off += C

        def one(rc, ok, gl1):
            r0, c0, fr, fc = _taps(rc, Hf, Wf, ry, rx, eps)
            r1 = jnp.minimum(r0 + 1, Hf - 1)
            c1 = jnp.minimum(c0 + 1, Wf - 1)
            if swapped:
                ws = (fr * fc, (1 - fr) * fc, fr * (1 - fc),
                      (1 - fr) * (1 - fc))
            else:
                ws = ((1 - fr) * (1 - fc), fr * (1 - fc),
                      (1 - fr) * fc, fr * fc)
            taps = (r0 * Wf + c0, r1 * Wf + c0, r0 * Wf + c1,
                    r1 * Wf + c1)
            buf = jnp.zeros((Hf * Wf, C), jnp.float32)
            okf = ok.astype(jnp.float32)
            for t, wgt in zip(taps, ws):
                buf = buf.at[t].add(
                    gl1.astype(jnp.float32)
                    * (wgt * okf)[:, None], mode="drop")
            return buf.reshape(Hf, Wf, C)

        grads.append(jax.vmap(one)(points_rc, valid, gl).astype(dt))
    return tuple(grads), None, None


fpn_gather_banded_diff.defvjp(_fwd, _bwd)
