"""On-device fused preprocessing vs the host PIL pipeline (tolerance ladder:
resampler implementations differ, SURVEY.md §7 hard parts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.ops.preprocess import encode_with_fused_preprocess, preprocess_batch


@pytest.mark.parametrize("kind", ["clip", "squarepad", "targetpad"])
def test_device_preprocess_close_to_pil(rng, kind):
    src = rng.randint(0, 256, (3, 48, 64, 3), dtype=np.uint8)
    dim = 32
    got = np.asarray(preprocess_batch(jnp.asarray(src), dim, kind))
    tf = ImageTransform(kind, dim)
    want = np.stack([tf(Image.fromarray(s)) for s in src])
    assert got.shape == want.shape
    # different bicubic implementations: demand agreement within a few
    # 8-bit steps on average and bounded everywhere
    scale = 1.0 / 0.26
    assert np.abs(got - want).mean() < 2.0 / 255.0 * scale
    assert np.abs(got - want).max() < 16.0 / 255.0 * scale


def test_device_preprocess_shapes_tall(rng):
    src = rng.randint(0, 256, (2, 100, 40, 3), dtype=np.uint8)
    out = preprocess_batch(jnp.asarray(src), 32, "targetpad")
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_fused_encode(rng):
    from spn4cir_tpu.models.api import build_backbone

    bb = build_backbone("clip", clip_model_name="test-tiny")
    params = bb.init_params(jax.random.PRNGKey(0))
    src = rng.randint(0, 256, (2, 40, 52, 3), dtype=np.uint8)
    feats = encode_with_fused_preprocess(bb, params, jnp.asarray(src))
    assert feats.shape == (2, bb.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1),
                               1.0, rtol=1e-5)
