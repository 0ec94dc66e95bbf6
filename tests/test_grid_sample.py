"""grid_sample_2d parity vs torch.nn.functional.grid_sample (align_corners=True).

The MAF feature pooling depends on exact bilinear semantics
(reference maf_extractor.py:117-121); torch-cpu is the golden oracle.
"""

import pytest
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from whmr_tpu.ops.grid_sample import grid_sample_2d

pytestmark = pytest.mark.smoke


def torch_reference(feat_nhwc, points):
    """points: (B, N, 2) in [-1,1]; replicates maf_extractor.py:119."""
    feat_nchw = torch.from_numpy(np.transpose(feat_nhwc, (0, 3, 1, 2)))
    grid = torch.from_numpy(points).unsqueeze(2)  # (B, N, 1, 2)
    out = F.grid_sample(feat_nchw, grid, align_corners=True, padding_mode="zeros")[..., 0]
    return np.transpose(out.numpy(), (0, 2, 1))  # (B, N, C)


class TestGridSample:
    def test_interior_points(self, rng):
        feat = rng.randn(2, 24, 32, 8).astype(np.float32)
        pts = rng.uniform(-0.95, 0.95, size=(2, 67, 2)).astype(np.float32)
        ours = np.asarray(grid_sample_2d(jnp.asarray(feat), jnp.asarray(pts)))
        ref = torch_reference(feat, pts)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_out_of_bounds_zero_padding(self, rng):
        feat = rng.randn(2, 16, 16, 4).astype(np.float32)
        pts = rng.uniform(-2.0, 2.0, size=(2, 50, 2)).astype(np.float32)
        ours = np.asarray(grid_sample_2d(jnp.asarray(feat), jnp.asarray(pts)))
        ref = torch_reference(feat, pts)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_exact_corners(self, rng):
        feat = rng.randn(1, 8, 12, 3).astype(np.float32)
        pts = np.array([[[-1.0, -1.0], [1.0, -1.0], [-1.0, 1.0], [1.0, 1.0]]], np.float32)
        ours = np.asarray(grid_sample_2d(jnp.asarray(feat), jnp.asarray(pts)))
        expected = np.stack(
            [feat[0, 0, 0], feat[0, 0, -1], feat[0, -1, 0], feat[0, -1, -1]]
        )[None]
        np.testing.assert_allclose(ours, expected, atol=1e-6)

    def test_grid_63_points_vitpose_shape(self, rng):
        """The MAF step-0 grid: 7x9=63 points over a 32x24 map (whmr.py:341-346)."""
        feat = rng.randn(4, 32, 24, 256).astype(np.float32)
        xv, yv = np.meshgrid(np.linspace(-1, 1, 7), np.linspace(-1, 1, 9), indexing="ij")
        pts = np.stack([xv.reshape(-1), yv.reshape(-1)], axis=-1)[None].repeat(4, 0).astype(np.float32)
        ours = np.asarray(grid_sample_2d(jnp.asarray(feat), jnp.asarray(pts)))
        ref = torch_reference(feat, pts)
        assert ours.shape == (4, 63, 256)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_differentiable(self, rng):
        import jax

        feat = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
        pts = jnp.asarray(rng.uniform(-0.9, 0.9, size=(1, 5, 2)).astype(np.float32))
        g = jax.grad(lambda p: jnp.sum(grid_sample_2d(feat, p)))(pts)
        assert np.all(np.isfinite(np.asarray(g)))
