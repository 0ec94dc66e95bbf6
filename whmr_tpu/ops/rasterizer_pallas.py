"""Pallas TPU kernel for the z-buffer rasterizer inner loop.

The rasterizer's cost is the per-(pixel, face) coverage/depth test — pure
VPU work (barycentrics are 3 FMAs per pair; K=3 'matmuls' cannot feed the
MXU). The XLA scan version (ops/rasterizer.py) round-trips its running
(zbuf, attr) carry through HBM every chunk and its fused batch intermediate
grows as B x P x chunk (OOM at batch 64 / chunk 1024); this kernel keeps
the accumulators and face tables in VMEM for the whole image and streams
pixel tiles, bounding memory explicitly.

Mosaic-shaped design notes:
- Struct-of-arrays face layout (B, 3, F): every in-kernel access is a 2D
  slice; no lane-collapsing reshapes, no >2D gathers (both unsupported).
- Winner attributes are computed gather-free: an exact-tie-normalized
  equality mask against the chunk minimum turns barycentric attribute
  interpolation into three (tile_p, chunk) x (chunk, C) matmuls.
- The depth accumulator lives as (tile_p, 1) and writes a (B, P, 1) output.

Culling (the round-2 perf lever — VERDICT item 3): pixel tiles are 2D
blocks (e.g. 32x32), and each face chunk carries a per-batch projected
bounding box in SMEM. A chunk whose bbox misses the tile's pixel-center
rectangle is skipped with lax.cond — exact, because a triangle can only
cover pixel centers inside its own bbox. Culling is effective when chunks
are spatially compact patches of the mesh surface: `spatial_sort_faces`
(chunk-aligned KD bisection over template-space face centroids) is
applied once at topology load, which keeps each chunk local on the body
under any rigid pose/projection.

Measured on v5e @B=32, 128x128, 13.8k-face SMPL (scripts/bench_train.py):
round-1 kernel (row tiles, no cull) 160 ms; (tile_p, chunk) sweep with
culling: (1024,256) 44.1, (512,1024) 19.7, (256,1024) 13.7, (128,1024)
11.8 ms <- default, 13.5x. Small tiles + big chunks win: per-chunk
iteration overhead dominates over wasted lanes, and 16x8-px tiles cull
hardest (a 1024-face KD cell ~7% of the body surface misses most tiles).
(1024,1024)/(4096,256) exceed VMEM and fail to compile.

Grid: (batch, pixel_tiles); fori_loop over face chunks inside. The
live (tile_p, chunk) temporaries must fit scoped VMEM (~16 MB on v5e):
tile_p=128 x chunk=1024 keeps ~10 such temps near 5 MB.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whmr_tpu.ops.rasterizer import RasterOut, _face_chunks

_BIG = 1e9

# Default face-chunk size of rasterize_pallas; spatial_sort_faces uses the
# same value so KD cell boundaries coincide with runtime chunk boundaries.
DEFAULT_CHUNK = 1024


def spatial_sort_faces(
    faces: np.ndarray, v_template: np.ndarray, chunk: int = DEFAULT_CHUNK
) -> np.ndarray:
    """Reorder faces by chunk-aligned KD bisection of template centroids.

    A static topology permutation (render output is face-order invariant up
    to z-ties) that makes every contiguous `chunk`-face group a compact KD
    cell of the mesh surface, so its projected bbox stays small under any
    rigid pose — the precondition for per-chunk tile culling to bite.
    Recursively splits the face set at the widest centroid axis into two
    chunk-multiple halves, so chunk boundaries coincide with cell
    boundaries. Measured on the synthetic SMPL mesh (B=8 random poses,
    32x32 tiles, 256-face cells/54 chunks): avg chunks hitting a tile = 5.7
    (KD) vs 9.0 (Morton), 6.4 (native grid order), 26.9 (random order); KD
    is also input-order invariant (5.73 from a random permutation).
    """
    cent = v_template[faces].mean(axis=1)  # (F, 3)
    out = []

    def rec(idx):
        if idx.size <= chunk:
            out.append(idx)
            return
        c = cent[idx]
        ax = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        n_chunks = -(-idx.size // chunk)
        left = (n_chunks // 2) * chunk
        part = np.argpartition(c[:, ax], left)
        rec(idx[part[:left]])
        rec(idx[part[left:]])

    rec(np.arange(faces.shape[0]))
    return np.ascontiguousarray(faces[np.concatenate(out)])


def _face_tables(verts_pix, verts_z, attrs, faces):
    """Per-face tables in struct-of-arrays layout, plus chunk-cull bboxes.

    Returns (coef_a, coef_b, coef_c, tz, ta, fx_lo, fx_hi, fy_lo, fy_hi):
    the first four (B, 3, F) [bary index j leading], ta (B, 3C, F), and
    per-face projected bbox extrema (B, F) with degenerate (padding) faces
    poisoned to an empty box so they can never match a tile.
    """
    tri = verts_pix[:, faces]          # (B, F, 3, 2)
    tz = verts_z[:, faces]             # (B, F, 3)
    ta = attrs[:, faces]               # (B, F, 3, C)

    p0, p1, p2 = tri[:, :, 0], tri[:, :, 1], tri[:, :, 2]
    area = (p1[..., 0] - p0[..., 0]) * (p2[..., 1] - p0[..., 1]) - (
        p1[..., 1] - p0[..., 1]
    ) * (p2[..., 0] - p0[..., 0])
    inv_area = jnp.where(jnp.abs(area) > 1e-9, 1.0 / area, 0.0)

    def edge_coef(pa, pb):
        a = pa[..., 1] - pb[..., 1]
        b = pb[..., 0] - pa[..., 0]
        c = pa[..., 0] * pb[..., 1] - pa[..., 1] * pb[..., 0]
        return a, b, c

    coefs = [edge_coef(p1, p2), edge_coef(p2, p0), edge_coef(p0, p1)]
    coef_a = jnp.stack([c[0] for c in coefs], axis=1) * inv_area[:, None]
    coef_b = jnp.stack([c[1] for c in coefs], axis=1) * inv_area[:, None]
    coef_c = jnp.stack([c[2] for c in coefs], axis=1) * inv_area[:, None]
    # Degenerate (padding) faces: inv_area = 0 makes bary = 0 everywhere,
    # which would PASS the >= 0 coverage test; poison their constant term.
    degenerate = (jnp.abs(area) <= 1e-9)[:, None, :]
    coef_c = jnp.where(degenerate, -1.0, coef_c)
    b, f, _, c = ta.shape
    # Attribute rows laid out (B, 3*C, F), row = j*C + c: keeps F on the
    # 128-lane axis (a trailing C=3 dim would pad 42x in VMEM tiling).
    ta_rows = jnp.transpose(ta, (0, 2, 3, 1)).reshape(b, 3 * c, f)

    # Per-face projected bbox; padding faces get an empty (inverted) box.
    deg = degenerate[:, 0, :]
    fx, fy = tri[..., 0], tri[..., 1]              # (B, F, 3)
    fx_lo = jnp.where(deg, _BIG, fx.min(axis=-1))
    fx_hi = jnp.where(deg, -_BIG, fx.max(axis=-1))
    fy_lo = jnp.where(deg, _BIG, fy.min(axis=-1))
    fy_hi = jnp.where(deg, -_BIG, fy.max(axis=-1))
    return (
        coef_a,
        coef_b,
        coef_c,
        jnp.swapaxes(tz, 1, 2),  # (B, 3, F)
        ta_rows,                 # (B, 3C, F)
        fx_lo, fx_hi, fy_lo, fy_hi,
    )


def _kernel(
    bbox_ref, ca_ref, cb_ref, cc_ref, tz_ref, ta_ref, zbuf_ref, attr_ref,
    *, tile_p, chunk, tile_h, tile_w, nbx, n_chunks, n_attr, ox, oy,
):
    pt = pl.program_id(1)
    by = pt // nbx
    bx = pt % nbx
    idx = jax.lax.broadcasted_iota(jnp.int32, (tile_p, 1), 0)
    # ox/oy: window origin — sample coordinates match the enclosing full
    # frame exactly (bit-identical bary evaluation to render-then-slice).
    px = (bx * tile_w + idx % tile_w).astype(jnp.float32) + 0.5 + ox  # (tile_p, 1)
    py = (by * tile_h + idx // tile_w).astype(jnp.float32) + 0.5 + oy
    # Pixel-center rectangle of this tile, for the chunk bbox overlap test.
    x0 = bx.astype(jnp.float32) * tile_w + 0.5 + ox
    y0 = by.astype(jnp.float32) * tile_h + 0.5 + oy
    x1 = x0 + (tile_w - 1)
    y1 = y0 + (tile_h - 1)

    def compute(ci, carry):
        best_z, best_attr = carry                      # (tile_p,1), (tile_p,C)
        sl = pl.ds(ci * chunk, chunk)

        def bary(j):
            a = ca_ref[0, j:j + 1, sl]                 # (1, chunk)
            b = cb_ref[0, j:j + 1, sl]
            c = cc_ref[0, j:j + 1, sl]
            return px * a + py * b + c                 # (tile_p, chunk)

        b0, b1, b2 = bary(0), bary(1), bary(2)
        inside = (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0)
        z = (
            b0 * tz_ref[0, 0:1, sl]
            + b1 * tz_ref[0, 1:2, sl]
            + b2 * tz_ref[0, 2:3, sl]
        )
        z_masked = jnp.where(inside, z, _BIG)
        cz = jnp.min(z_masked, axis=1, keepdims=True)  # (tile_p, 1)

        win = ((z_masked == cz) & inside).astype(jnp.float32)
        cnt = jnp.sum(win, axis=1, keepdims=True)
        win = win / jnp.maximum(cnt, 1.0)

        # Per-channel attribute interpolation as broadcast-multiply +
        # row-sum (VPU); ta rows are (1, chunk) slices, no transposes.
        wb = (win * b0, win * b1, win * b2)
        cols = []
        for c_idx in range(n_attr):
            acc = None
            for j in range(3):
                term = jnp.sum(
                    wb[j] * ta_ref[0, j * n_attr + c_idx:j * n_attr + c_idx + 1, sl],
                    axis=1, keepdims=True,
                )
                acc = term if acc is None else acc + term
            cols.append(acc)
        win_attr = jnp.concatenate(cols, axis=1)  # (tile_p, C)

        take = cz < best_z
        return (
            jnp.where(take, cz, best_z),
            jnp.where(take, win_attr, best_attr),
        )

    def body(ci, carry):
        # Chunk-vs-tile bbox test on SMEM scalars; a miss skips the whole
        # (tile_p x chunk) coverage pass. A triangle can only cover pixel
        # centers inside its own bbox; the bboxes carry a small pad (see
        # caller) so fp32 rounding of the bary evaluation cannot make a
        # culled chunk differ from the unculled path at boundary pixels.
        hit = (
            (bbox_ref[0, 1, ci] >= x0)
            & (bbox_ref[0, 0, ci] <= x1)
            & (bbox_ref[0, 3, ci] >= y0)
            & (bbox_ref[0, 2, ci] <= y1)
        )
        return lax.cond(hit, lambda c: compute(ci, c), lambda c: c, carry)

    init = (
        jnp.full((tile_p, 1), _BIG, jnp.float32),
        jnp.zeros((tile_p, n_attr), jnp.float32),
    )
    zbuf, attr = lax.fori_loop(0, n_chunks, body, init)
    zbuf_ref[0] = zbuf
    attr_ref[0] = attr


def _pick_tile_hw(h: int, w: int, tile_p: int) -> Tuple[int, int]:
    """Largest 2D block (tile_h, tile_w) with tile_h*tile_w == tile_p that
    tiles (h, w) evenly and is as square as possible (tighter cull boxes)."""
    best = None
    tw = 1
    while tw <= min(w, tile_p):
        th = tile_p // tw
        if tw * th == tile_p and w % tw == 0 and th <= h and h % th == 0:
            score = abs(th - tw)
            if best is None or score < best[0]:
                best = (score, th, tw)
        tw *= 2
    if best is None:
        raise ValueError(f"no 2D tiling of ({h}, {w}) with tile_p={tile_p}")
    return best[1], best[2]


def rasterize_pallas(
    verts_pix: jnp.ndarray,
    verts_z: jnp.ndarray,
    attrs: jnp.ndarray,
    faces: np.ndarray,
    resolution: Tuple[int, int] = (128, 128),
    chunk: int = DEFAULT_CHUNK,
    tile_p: int = 128,
    tile_hw: Optional[Tuple[int, int]] = None,
    origin: Tuple[float, float] = (0.0, 0.0),
    interpret: bool = False,
) -> RasterOut:
    """Drop-in alternative to ops.rasterizer.rasterize (same signature/out).

    Pixel tiles are (tile_h, tile_w) 2D blocks so per-chunk bbox culling
    prunes in both axes; pass faces through `spatial_sort_faces` (done by
    training/gt_renderer.build_render_consts) for compact chunk bboxes.
    `origin` renders an (H, W) window of the enclosing frame bit-identically
    to rendering it fully and slicing (see ops.rasterizer.rasterize).
    """
    h, w = resolution
    b, v, c = attrs.shape
    n_pix = h * w
    assert n_pix % tile_p == 0, (n_pix, tile_p)
    tile_h, tile_w = tile_hw if tile_hw is not None else _pick_tile_hw(h, w, tile_p)
    assert tile_h * tile_w == tile_p, (tile_h, tile_w, tile_p)
    nby, nbx = h // tile_h, w // tile_w

    faces_pad = _face_chunks(np.asarray(faces), chunk).reshape(-1, 3)
    n_faces = faces_pad.shape[0]
    n_chunks = n_faces // chunk

    ca, cb, cc, tz, ta, fx_lo, fx_hi, fy_lo, fy_hi = _face_tables(
        verts_pix, verts_z, attrs, jnp.asarray(faces_pad)
    )
    # Per-chunk bbox table (B, 4, K) rows [xmin, xmax, ymin, ymax] -> SMEM.
    # Boxes are padded by a small margin so the cull is conservative under
    # fp32 rounding of the barycentric evaluation (a face whose true bbox
    # ends within ~1e-6 of a pixel center could still shade it through
    # rounding of px*a + py*b + c; without the pad that pixel would match
    # in the XLA path but be culled here).
    pad = 0.0625
    bbox = jnp.stack(
        [
            fx_lo.reshape(b, n_chunks, chunk).min(axis=-1) - pad,
            fx_hi.reshape(b, n_chunks, chunk).max(axis=-1) + pad,
            fy_lo.reshape(b, n_chunks, chunk).min(axis=-1) - pad,
            fy_hi.reshape(b, n_chunks, chunk).max(axis=-1) + pad,
        ],
        axis=1,
    )

    kern = functools.partial(
        _kernel,
        tile_p=tile_p, chunk=chunk, tile_h=tile_h, tile_w=tile_w,
        nbx=nbx, n_chunks=n_chunks, n_attr=c,
        ox=float(origin[0]), oy=float(origin[1]),
    )
    face_spec = pl.BlockSpec(
        (1, 3, n_faces), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    zbuf, attr = pl.pallas_call(
        kern,
        grid=(b, n_pix // tile_p),
        in_specs=[
            pl.BlockSpec(
                (1, 4, n_chunks), lambda i, j: (i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            face_spec,
            face_spec,
            face_spec,
            face_spec,
            pl.BlockSpec(
                (1, 3 * c, n_faces), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_p, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_p, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pix, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pix, c), jnp.float32),
        ],
        interpret=interpret,
    )(bbox, ca, cb, cc, tz, ta)

    # Outputs are written in (tile, in-tile row-major) order; un-block.
    zbuf = (
        zbuf.reshape(b, nby, nbx, tile_h, tile_w)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h, w)
    )
    attr = (
        attr.reshape(b, nby, nbx, tile_h, tile_w, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h, w, c)
    )
    mask = zbuf < _BIG * 0.5
    return RasterOut(attrs=attr * mask[..., None], zbuf=zbuf, mask=mask)
