"""Batched z-buffer triangle rasterizer in pure JAX (pytorch3d replacement).

Renders GT supervision maps on-device: the reference rasterizes GT meshes
with pytorch3d's CUDA rasterizer to make IUV images and inverse-depth maps
for the aux heads (utils/renderer.py:289-533, called per train step at
core/trainer.py:442-464). Here the same render is one XLA program:

- Barycentric coordinates are LINEAR in pixel coordinates, so evaluating
  them for all pixels x all faces of a chunk is a (P, 3) x (3, 3F) matmul —
  MXU work, not scalar loops.
- The depth test is a running masked-min over face chunks (lax.scan), so
  peak memory is P x CHUNK rather than P x F.
- Attributes (IUV / depth / any per-vertex C-dim signal) are interpolated
  with the winning triangle's barycentrics.

This targets small supervision maps (128x128). Full-resolution demo overlay
rendering uses the native C++ scanline rasterizer (whmr_tpu/inference/
renderer.py) where per-face bounding-box loops win on CPU.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_BIG = 1e9


class RasterOut(NamedTuple):
    attrs: jnp.ndarray  # (B, H, W, C) interpolated attributes (0 on bg)
    zbuf: jnp.ndarray   # (B, H, W) depth of nearest face (BIG on bg)
    mask: jnp.ndarray   # (B, H, W) foreground mask


def _face_chunks(faces: np.ndarray, chunk: int) -> np.ndarray:
    """Pad faces to a multiple of chunk with degenerate (all-0) triangles."""
    f = faces.shape[0]
    pad = (-f) % chunk
    if pad:
        faces = np.concatenate([faces, np.zeros((pad, 3), faces.dtype)], axis=0)
    return faces.reshape(-1, chunk, 3)


def rasterize(
    verts_pix: jnp.ndarray,
    verts_z: jnp.ndarray,
    attrs: jnp.ndarray,
    faces: np.ndarray,
    resolution: Tuple[int, int] = (128, 128),
    chunk: int = 1024,
    origin: Tuple[float, float] = (0.0, 0.0),
) -> RasterOut:
    """Rasterize batched meshes with a per-pixel depth test.

    Args:
      verts_pix: (B, V, 2) vertex positions in PIXEL coordinates (x right,
        y down), already projected.
      verts_z: (B, V) camera-space depth per vertex (smaller = closer).
      attrs: (B, V, C) per-vertex attributes to interpolate.
      faces: (F, 3) HOST numpy triangle indices (static mesh topology,
        shared across the batch and baked into the compiled program).
      resolution: (H, W) output size.
      chunk: faces per scan step (memory/latency knob).
      origin: (x0, y0) pixel offset of the output window — rendering a
        (H, W) window at origin (x0, y0) is BIT-IDENTICAL to rendering the
        enclosing full frame and slicing [y0:y0+H, x0:x0+W] (the pixel
        sample coordinates are the same fp32 values; only wasted margin
        work is skipped).
    """
    h, w = resolution
    b, v, c = attrs.shape
    # Bound the live barycentric intermediate (B x P x chunk x 3 fp32):
    # XLA fuses the vmapped scan body across the batch, so the chunk size
    # must shrink with batch to stay well under HBM (~1 GB budget here).
    budget_elems = (1 << 28) // 4  # 256 MB of fp32
    max_chunk = max(64, budget_elems // max(b * h * w * 3, 1))
    chunk = min(chunk, max_chunk)
    faces_np = np.asarray(faces)
    fchunks = jnp.asarray(_face_chunks(faces_np, chunk))  # (K, chunk, 3)

    # Pixel-center sample grid, homogeneous: (P, 3) with columns [x, y, 1].
    ys = jnp.arange(h, dtype=jnp.float32) + 0.5 + float(origin[1])
    xs = jnp.arange(w, dtype=jnp.float32) + 0.5 + float(origin[0])
    px = jnp.stack(
        [
            jnp.tile(xs[None, :], (h, 1)).reshape(-1),
            jnp.tile(ys[:, None], (1, w)).reshape(-1),
            jnp.ones(h * w, jnp.float32),
        ],
        axis=-1,
    )  # (P, 3)

    def render_one(vp, vz, at):
        """vp: (V,2), vz: (V,), at: (V,C) -> per-image buffers."""

        def scan_body(carry, fchunk):
            best_z, best_attr = carry
            tri = vp[fchunk]          # (chunk, 3, 2)
            tz = vz[fchunk]           # (chunk, 3)
            ta = at[fchunk]           # (chunk, 3, C)

            p0, p1, p2 = tri[:, 0], tri[:, 1], tri[:, 2]
            # Twice signed area; degenerate padded faces get area 0.
            area = (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) - (
                p1[:, 1] - p0[:, 1]
            ) * (p2[:, 0] - p0[:, 0])
            inv_area = jnp.where(jnp.abs(area) > 1e-9, 1.0 / area, 0.0)

            # Barycentric w0 at pixel p is the edge function of (p1, p2):
            #   w0(p) = ((p1-p).x*(p2-p).y - (p1-p).y*(p2-p).x) / area
            # expanded to a*x + b*y + c form for the matmul.
            def edge_coef(pa, pb):
                a = pa[:, 1] - pb[:, 1]
                bcoef = pb[:, 0] - pa[:, 0]
                ccoef = pa[:, 0] * pb[:, 1] - pa[:, 1] * pb[:, 0]
                return jnp.stack([a, bcoef, ccoef], axis=-1)  # (chunk, 3)

            e0 = edge_coef(p1, p2)
            e1 = edge_coef(p2, p0)
            e2 = edge_coef(p0, p1)
            coefs = jnp.stack([e0, e1, e2], axis=1)  # (chunk, 3bary, 3abc)
            coefs = coefs * inv_area[:, None, None]

            # (P, 3) @ (3, chunk*3) -> (P, chunk, 3) barycentrics. MXU path.
            bary = jnp.einsum(
                "pk,cjk->pcj", px, coefs, precision=lax.Precision.HIGHEST
            )

            inside = jnp.all(bary >= 0.0, axis=-1) & (jnp.abs(area) > 1e-9)[None, :]
            z_px = jnp.einsum("pcj,cj->pc", bary, tz, precision=lax.Precision.HIGHEST)
            z_masked = jnp.where(inside, z_px, _BIG)

            chunk_best = jnp.argmin(z_masked, axis=1)  # (P,)
            chunk_z = jnp.take_along_axis(z_masked, chunk_best[:, None], axis=1)[:, 0]

            take = chunk_z < best_z
            win_bary = jnp.take_along_axis(
                bary, chunk_best[:, None, None], axis=1
            )[:, 0]  # (P, 3)
            win_attr = jnp.einsum(
                "pj,pjc->pc", win_bary, ta[chunk_best],
                precision=lax.Precision.HIGHEST,
            )
            new_z = jnp.where(take, chunk_z, best_z)
            new_attr = jnp.where(take[:, None], win_attr, best_attr)
            return (new_z, new_attr), None

        init = (
            jnp.full((h * w,), _BIG, jnp.float32),
            jnp.zeros((h * w, c), jnp.float32),
        )
        (zbuf, attr), _ = lax.scan(scan_body, init, fchunks)
        return zbuf.reshape(h, w), attr.reshape(h, w, c)

    zbuf, attr = jax.vmap(render_one)(verts_pix, verts_z, attrs)
    mask = zbuf < _BIG * 0.5
    return RasterOut(attrs=attr * mask[..., None], zbuf=zbuf, mask=mask)


def project_weak_perspective_to_pixels(
    verts: jnp.ndarray,
    camera: jnp.ndarray,
    resolution: Tuple[int, int],
    focal_length: float = 1000.0,
    crop_res: float = 256.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crop-frame weak-persp projection to pixel coords for rasterization.

    Matches the GT camera the reference feeds its IUV renderer
    (core/trainer.py:445-449: gt_camera [s, tx, ty] with s = 2f/(res*tz)).

    Returns (verts_pix (B,V,2), verts_z (B,V)).
    """
    h, w = resolution
    s, tx, ty = camera[:, 0:1], camera[:, 1:2], camera[:, 2:3]
    tz = 2 * focal_length / (crop_res * s)
    x = verts[..., 0] + tx
    y = verts[..., 1] + ty
    z = verts[..., 2] + tz
    # NDC in [-1, 1] under the weak-persp model, then to pixels.
    xn = x / z * focal_length / (crop_res / 2)
    yn = y / z * focal_length / (crop_res / 2)
    px = (xn + 1.0) * 0.5 * w
    py = (yn + 1.0) * 0.5 * h
    return jnp.stack([px, py], axis=-1), z
