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

from spn4cir_tpu.data.transforms import (  # noqa: F401  (staging re-export)
    CLIP_MEAN,
    CLIP_STD,
    RawBatch,
    RawStageTransform,
    pad_geometry,
    stage_raw_image,
)


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


# ---------------------------------------------------------------------------
# Dynamic (per-image geometry) fused preprocess: the production device path.
#
# Real galleries have per-image sizes, which static shapes under jit cannot
# express directly. The host stages each decoded uint8 image into a fixed
# zero CANVAS (pad offsets applied host-side, so the canvas holds the padded
# image at the origin) and ships (canvas, padded extents). The device then
# runs resize+crop+normalize as TWO BATCHED EINSUMS against per-image
# separable bicubic weight matrices — built from traced (H, W) with taps
# beyond the true extent masked and rows renormalized, which is exactly
# `jax.image.resize`'s boundary handling (plain scale_and_translate on a
# canvas would zero-extend instead and diverge at image edges by up to
# ~40/255; measured). Output is identical to `preprocess_batch` for any
# uniform-size batch and jit-compiles ONCE per (canvas, dim) geometry.
# ---------------------------------------------------------------------------


def _keys_cubic(x: jnp.ndarray) -> jnp.ndarray:
    """Keys bicubic kernel, a = -0.5 (matches jax.image 'cubic' and PIL)."""
    out = ((1.5 * x - 2.5) * x * x + 1.0) * (x <= 1.0)
    out += (((-0.5 * x + 2.5) * x - 4.0) * x + 2.0) * ((x > 1.0) & (x < 2.0))
    return out


def _dyn_axis_weights(canvas: int, dim: int, true_in, out_full, crop0):
    """(canvas, dim) bicubic weight matrix for one image axis.

    true_in: padded input extent (traced int32); out_full: full resized
    extent rh/rw; crop0: crop offset top/left. Output column j samples input
    position ((j + crop0) + 0.5) * true_in / out_full - 0.5 — resize (jax
    translation-0 semantics) composed with the center crop. Antialias
    widens the kernel by the inverse scale on downscale."""
    true_f = true_in.astype(jnp.float32)
    out_f = out_full.astype(jnp.float32)
    inv_scale = true_f / out_f  # input pixels per output pixel
    sample = (jnp.arange(dim, dtype=jnp.float32) + crop0.astype(jnp.float32)
              + 0.5) * inv_scale - 0.5  # (dim,)
    kernel_scale = jnp.maximum(inv_scale, 1.0)  # antialias on downscale
    idx = jnp.arange(canvas, dtype=jnp.float32)[:, None]  # (canvas, 1)
    w = _keys_cubic(jnp.abs(sample[None, :] - idx) / kernel_scale)
    w = jnp.where(idx < true_f, w, 0.0)  # taps beyond the true image
    total = jnp.sum(w, axis=0, keepdims=True)
    w = jnp.where(jnp.abs(total) > 1e-6, w / total, 0.0)  # edge renorm
    valid = (sample >= -0.5) & (sample <= true_f - 0.5)
    return jnp.where(valid[None, :], w, 0.0)


def _dyn_geometry(h, w, dim: int, kind: str):
    """Per-image resize/crop geometry from traced padded extents (int32).
    Integer arithmetic mirrors transforms.py:resize_shortest/center_crop
    (int() truncation via //, round-half-even via jnp.round)."""
    if kind == "blip_eval":
        zero = jnp.zeros((), jnp.float32)
        return (jnp.full((), dim, jnp.int32), jnp.full((), dim, jnp.int32),
                zero, zero)
    short_w = w <= h
    rh = jnp.where(short_w, jnp.maximum(1, (dim * h) // w), dim)
    rw = jnp.where(short_w, dim, jnp.maximum(1, (dim * w) // h))
    top = jnp.round((rh - dim).astype(jnp.float32) / 2.0)
    left = jnp.round((rw - dim).astype(jnp.float32) / 2.0)
    return rh.astype(jnp.int32), rw.astype(jnp.int32), top, left


@functools.partial(jax.jit, static_argnums=(2, 3))
def preprocess_batch_dynamic(
    canvas_u8: jnp.ndarray,
    extents: jnp.ndarray,
    dim: int,
    kind: str = "targetpad",
    mean: Sequence[float] = CLIP_MEAN,
    std: Sequence[float] = CLIP_STD,
) -> jnp.ndarray:
    """(B, C, C, 3) uint8 canvases + (B, 2) int32 padded extents (H, W)
    -> (B, dim, dim, 3) f32 normalized.

    The canvas holds each PADDED image at the origin (host applies the
    SquarePad/TargetPad offsets when pasting; 'clip'/'blip_eval' paste the
    raw image), zeros elsewhere. One compile per (C, dim, kind)."""
    b, c, _, _ = canvas_u8.shape
    h = extents[:, 0].astype(jnp.int32)
    w = extents[:, 1].astype(jnp.int32)
    rh, rw, top, left = jax.vmap(
        lambda hh, ww: _dyn_geometry(hh, ww, dim, kind))(h, w)
    wy = jax.vmap(lambda t, o, cr: _dyn_axis_weights(c, dim, t, o, cr))(
        h, rh, top)  # (B, C, dim)
    wx = jax.vmap(lambda t, o, cr: _dyn_axis_weights(c, dim, t, o, cr))(
        w, rw, left)  # (B, C, dim)
    x = canvas_u8.astype(jnp.float32)
    x = jnp.einsum("bcd,bcwk->bdwk", wy, x)  # rows:    (B, dim, C, 3)
    x = jnp.einsum("bwd,bywk->bydk", wx, x)  # columns: (B, dim, dim, 3)
    x = jnp.clip(jnp.round(x), 0.0, 255.0)  # PIL's uint8 intermediate
    mean_a = jnp.asarray(mean, jnp.float32)
    std_a = jnp.asarray(std, jnp.float32)
    return (x / 255.0 - mean_a) / std_a


def absorb_raw(fn, input_dim: int, kind: str):
    """Wrap a jittable `(params, images, *rest)` encoder so a RawBatch
    image argument is device-preprocessed (resize/crop/normalize) before
    the tower — the bank-extraction hook for `--device_preprocess`. Plain
    float32 image arrays pass through untouched, so the wrapper is a no-op
    for the host pipeline. RawBatch is a NamedTuple, so jit preserves the
    container type and the isinstance dispatch resolves at trace time."""

    def wrapped(params, images, *rest):
        if isinstance(images, RawBatch):
            images = preprocess_batch_dynamic(images.canvas, images.extents,
                                              input_dim, kind)
        return fn(params, images, *rest)

    return wrapped


def index_features_from_raw(backbone, params, canvas_u8, extents, *,
                            kind: str = "targetpad"):
    """One jit: dynamic device preprocess fused into the gallery/index
    encoder — the production `--device_preprocess` path. The host ships
    (canvas, extents) from RawStageTransform / NativeLoader.stage_raw_batch;
    resize+crop+normalize and the tower run as a single XLA program, cached
    per (kind,) on the backbone (one compile serves every image geometry)."""
    cache = getattr(backbone, "_jit_cache", None)
    if cache is None:
        cache = backbone._jit_cache = {}
    key = ("raw_index_features", kind)
    run = cache.get(key)
    if run is None:
        @jax.jit
        def run(p, canv, ext):
            x = preprocess_batch_dynamic(canv, ext, backbone.input_dim, kind)
            return backbone.index_features(p, x)

        cache[key] = run
    return run(params, canvas_u8, extents)


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
