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

Grid: (batch, pixel_tiles); fori_loop over face chunks inside. The
live (tile_p, chunk) temporaries must fit scoped VMEM (~16 MB on v5e):
tile_p=1024 x chunk=256 keeps ~10 such temps near 10 MB.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whmr_tpu.ops.rasterizer import RasterOut, _face_chunks

_BIG = 1e9


def _face_tables(verts_pix, verts_z, attrs, faces):
    """Per-face tables in struct-of-arrays layout.

    Returns (coef_a, coef_b, coef_c, tz, ta): the first four (B, 3, F)
    [bary index j leading], ta (B, 3, F, C).
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
    return (
        coef_a,
        coef_b,
        coef_c,
        jnp.swapaxes(tz, 1, 2),  # (B, 3, F)
        ta_rows,                 # (B, 3C, F)
    )


def _kernel(
    ca_ref, cb_ref, cc_ref, tz_ref, ta_ref, zbuf_ref, attr_ref,
    *, tile_p, chunk, width, n_chunks, n_attr,
):
    pt = pl.program_id(1)
    flat = pt * tile_p + jax.lax.broadcasted_iota(jnp.int32, (tile_p, 1), 0)
    px = (flat % width).astype(jnp.float32) + 0.5   # (tile_p, 1)
    py = (flat // width).astype(jnp.float32) + 0.5

    def body(ci, carry):
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

    init = (
        jnp.full((tile_p, 1), _BIG, jnp.float32),
        jnp.zeros((tile_p, n_attr), jnp.float32),
    )
    zbuf, attr = lax.fori_loop(0, n_chunks, body, init)
    zbuf_ref[0] = zbuf
    attr_ref[0] = attr


def rasterize_pallas(
    verts_pix: jnp.ndarray,
    verts_z: jnp.ndarray,
    attrs: jnp.ndarray,
    faces: np.ndarray,
    resolution: Tuple[int, int] = (128, 128),
    chunk: int = 256,
    tile_p: int = 1024,
    interpret: bool = False,
) -> RasterOut:
    """Drop-in alternative to ops.rasterizer.rasterize (same signature/out)."""
    h, w = resolution
    b, v, c = attrs.shape
    n_pix = h * w
    assert n_pix % tile_p == 0, (n_pix, tile_p)

    faces_pad = _face_chunks(np.asarray(faces), chunk).reshape(-1, 3)
    n_faces = faces_pad.shape[0]
    n_chunks = n_faces // chunk

    ca, cb, cc, tz, ta = _face_tables(
        verts_pix, verts_z, attrs, jnp.asarray(faces_pad)
    )

    kern = functools.partial(
        _kernel, tile_p=tile_p, chunk=chunk, width=w, n_chunks=n_chunks, n_attr=c
    )
    face_spec = pl.BlockSpec(
        (1, 3, n_faces), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    zbuf, attr = pl.pallas_call(
        kern,
        grid=(b, n_pix // tile_p),
        in_specs=[
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
    )(ca, cb, cc, tz, ta)

    zbuf = zbuf.reshape(b, h, w)
    attr = attr.reshape(b, h, w, c)
    mask = zbuf < _BIG * 0.5
    return RasterOut(attrs=attr * mask[..., None], zbuf=zbuf, mask=mask)
