"""On-device fused image preprocessing (pad -> resize -> crop -> normalize).

The host-side parity pipeline lives in `spn4cir_tpu.data.transforms` (PIL)
and `spn4cir_tpu/native` (C++); this module is the device path per the north
star ("preprocessing fuses into JAX ops feeding the ViT", BASELINE.json):
uint8 image batches stream to HBM and the whole preprocess fuses with the
encoder under one jit — useful when host CPU (not PCIe/HBM) is the
bottleneck, and for TPU-side augmentation.

Geometry matches ImageTransform up to resampler differences: XLA's bicubic
(`jax.image.resize`) uses a Keys kernel without PIL's uint8 intermediate
quantization, so outputs differ from PIL by O(1/255) per pixel — within the
feature-parity tolerance ladder (SURVEY.md §7 "hard parts")."""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from spn4cir_tpu.data.transforms import CLIP_MEAN, CLIP_STD


def _resize_bicubic(images: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    return jax.image.resize(images, (*images.shape[:-3], h, w, images.shape[-1]),
                            method="bicubic", antialias=True)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def preprocess_batch(
    images_u8: jnp.ndarray,
    dim: int,
    kind: str = "targetpad",
    target_ratio: float = 1.25,
    mean: Sequence[float] = CLIP_MEAN,
    std: Sequence[float] = CLIP_STD,
) -> jnp.ndarray:
    """(B, H, W, 3) uint8 (fixed source size) -> (B, dim, dim, 3) f32.

    jit-traced per source shape; pad geometry is static (shapes must be
    static under XLA), matching the host pipeline for that source size.
    """
    b, h, w, c = images_u8.shape
    x = images_u8.astype(jnp.float32)

    # static pad geometry (transforms.py parity for a fixed source size)
    if kind == "squarepad":
        side = max(w, h)
        hp, vp = (side - w) // 2, (side - h) // 2
        x = jnp.pad(x, ((0, 0), (vp, vp), (hp, hp), (0, 0)))
        h, w = h + 2 * vp, w + 2 * hp
    elif kind == "targetpad":
        if max(w, h) / min(w, h) >= target_ratio:
            scaled = max(w, h) / target_ratio
            hp = max(int((scaled - w) / 2), 0)
            vp = max(int((scaled - h) / 2), 0)
            x = jnp.pad(x, ((0, 0), (vp, vp), (hp, hp), (0, 0)))
            h, w = h + 2 * vp, w + 2 * hp

    if w <= h:
        rw, rh = dim, max(1, int(dim * h / w))
    else:
        rw, rh = max(1, int(dim * w / h)), dim
    x = _resize_bicubic(x, rh, rw)
    x = jnp.clip(jnp.round(x), 0.0, 255.0)

    top = int(round((rh - dim) / 2.0))
    left = int(round((rw - dim) / 2.0))
    x = jax.lax.dynamic_slice(
        x, (0, max(top, 0), max(left, 0), 0), (b, dim, dim, c))

    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    return (x / 255.0 - mean_a) / std_a


def encode_with_fused_preprocess(backbone, params, images_u8, *,
                                 kind: str = "targetpad",
                                 target_ratio: float = 1.25):
    """One jit: device preprocess fused into the gallery encoder. The jitted
    graph is cached per (backbone, kind, ratio) — a fresh jax.jit per call
    would retrace + recompile the whole tower every batch."""
    cache = getattr(backbone, "_jit_cache", None)
    if cache is None:
        cache = backbone._jit_cache = {}
    key = ("fused_preprocess", kind, target_ratio)
    run = cache.get(key)
    if run is None:
        @jax.jit
        def run(p, raw):
            x = preprocess_batch(raw, backbone.input_dim, kind, target_ratio)
            return backbone.gallery_features(p, x)

        cache[key] = run
    return run(params, images_u8)
