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


# ---------------------------------------------------------------------------
# Dynamic (per-image geometry) path: canvas staging + batched-einsum resize.
# ---------------------------------------------------------------------------

from spn4cir_tpu.ops.preprocess import (  # noqa: E402
    pad_geometry,
    preprocess_batch_dynamic,
    stage_raw_image,
)


def _stage_batch(images, canvas, kind):
    canv, ext = zip(*(stage_raw_image(im, canvas, kind) for im in images))
    return (jnp.asarray(np.stack(canv)),
            jnp.asarray(np.asarray(ext, np.int32)))


@pytest.mark.parametrize("kind", ["clip", "squarepad", "targetpad"])
def test_dynamic_matches_static_uniform_batch(rng, kind):
    """Same weight construction as jax.image.resize => matches the static
    fused path on a uniform-size batch (up to f32 einsum-order noise)."""
    src = rng.randint(0, 256, (3, 48, 64, 3), dtype=np.uint8)
    dim = 32
    want = np.asarray(preprocess_batch(jnp.asarray(src), dim, kind))
    canv, ext = _stage_batch(src, 96, kind)
    got = np.asarray(preprocess_batch_dynamic(canv, ext, dim, kind))
    np.testing.assert_allclose(got, want, atol=1.5e-2 / 0.26, rtol=0)
    # the uint8-quantization rounding makes almost all pixels bit-equal
    assert (np.abs(got - want) > 1e-6).mean() < 0.02


@pytest.mark.parametrize("kind", ["clip", "squarepad", "targetpad", "blip_eval"])
def test_dynamic_close_to_pil_mixed_sizes(rng, kind):
    """Per-image geometry vs the host PIL pipeline, same tolerance ladder as
    the static test (resampler implementations differ by O(1/255))."""
    dim = 32
    sizes = [(48, 64), (100, 40), (37, 53), (64, 48), (32, 32)]
    images = [rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
              for h, w in sizes]
    canv, ext = _stage_batch(images, 128, kind)
    got = np.asarray(preprocess_batch_dynamic(canv, ext, dim, kind))
    tf = ImageTransform(kind, dim)
    want = np.stack([tf(Image.fromarray(im)) for im in images])
    assert got.shape == want.shape
    scale = 1.0 / 0.26
    assert np.abs(got - want).mean() < 2.0 / 255.0 * scale
    assert np.abs(got - want).max() < 16.0 / 255.0 * scale


def test_dynamic_one_compile_many_sizes(rng):
    """The whole point: one jit trace serves every image geometry."""
    dim = 32
    c0 = preprocess_batch_dynamic._cache_size()
    for h, w in [(40, 60), (80, 30), (55, 55)]:
        im = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        canv, ext = _stage_batch([im], 96, "targetpad")
        out = preprocess_batch_dynamic(canv, ext, dim, "targetpad")
        assert out.shape == (1, dim, dim, 3)
    assert preprocess_batch_dynamic._cache_size() - c0 <= 1


def test_stage_oversized_image_fits_canvas(rng):
    """Padded extent > canvas -> host pre-downscale; output stays within the
    PIL ladder (two-stage resize delta documented in stage_raw_image)."""
    dim = 32
    im = rng.randint(0, 256, (300, 120, 3), dtype=np.uint8)
    canvas, (ph, pw) = stage_raw_image(im, 128, "targetpad")
    assert canvas.shape == (128, 128, 3)
    assert max(ph, pw) <= 128
    got = np.asarray(preprocess_batch_dynamic(
        jnp.asarray(canvas[None]), jnp.asarray([[ph, pw]], np.int32),
        dim, "targetpad"))[0]
    want = ImageTransform("targetpad", dim)(Image.fromarray(im))
    scale = 1.0 / 0.26
    assert np.abs(got - want).mean() < 3.0 / 255.0 * scale
    assert np.abs(got - want).max() < 24.0 / 255.0 * scale


def test_pad_geometry_matches_host_transforms():
    for h, w in [(48, 64), (100, 40), (64, 64), (10, 200)]:
        from spn4cir_tpu.data.transforms import square_pad, target_pad
        im = Image.new("RGB", (w, h))
        sp = square_pad(im)
        vp, hp = pad_geometry(h, w, "squarepad")
        assert sp.size == (w + 2 * hp, h + 2 * vp)
        tp = target_pad(im)
        vp, hp = pad_geometry(h, w, "targetpad")
        assert tp.size == (w + 2 * hp, h + 2 * vp)
        assert pad_geometry(h, w, "clip") == (0, 0)
