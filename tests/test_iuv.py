"""IUV codec round-trip tests (SURVEY.md §4: iuvmap.py:67 <-> :5)."""

import pytest
import numpy as np
import jax.numpy as jnp

from whmr_tpu.ops.iuv import INDEX2MASK, iuv_img2map, iuv_map2img

pytestmark = pytest.mark.smoke


def random_iuv_image(rng, b=2, h=16, w=16):
    part = rng.randint(0, 25, size=(b, h, w)).astype(np.float32)
    u = rng.uniform(0, 1, size=(b, h, w)).astype(np.float32)
    v = rng.uniform(0, 1, size=(b, h, w)).astype(np.float32)
    # U/V are zero on background, as rendered GT would be
    u[part == 0] = 0
    v[part == 0] = 0
    return np.stack([part / 24.0, u, v], axis=-1)


class TestIUVCodec:
    def test_img2map_shapes(self, rng):
        img = random_iuv_image(rng)
        maps = iuv_img2map(jnp.asarray(img))
        assert maps["u"].shape == (2, 16, 16, 25)
        assert maps["index"].shape == (2, 16, 16, 25)
        assert maps["ann"].shape == (2, 16, 16, 15)

    def test_index_is_one_hot(self, rng):
        img = random_iuv_image(rng)
        maps = iuv_img2map(jnp.asarray(img))
        sums = np.asarray(maps["index"]).sum(-1)
        np.testing.assert_allclose(sums, 1.0)

    def test_ann_grouping(self, rng):
        img = random_iuv_image(rng)
        maps = iuv_img2map(jnp.asarray(img))
        part = np.round(img[..., 0] * 24).astype(int)
        ann = np.asarray(maps["ann"]).argmax(-1)
        # part 1 and 2 both map to ann group 1; part 23,24 -> group 14
        for ann_i, parts in enumerate(INDEX2MASK):
            for p in parts:
                assert np.all(ann[part == p] == ann_i)

    def test_roundtrip(self, rng):
        img = random_iuv_image(rng)
        maps = iuv_img2map(jnp.asarray(img))
        back = np.asarray(
            iuv_map2img(maps["u"], maps["v"], maps["index"], maps["ann"])
        )
        np.testing.assert_allclose(back, img, atol=1e-5)
