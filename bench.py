"""Headline benchmark: gallery encode + retrieval throughput on one chip.

Measures the reference's hot eval path (SURVEY.md §3.2: gallery encode ->
query scoring -> ranking) as images/sec/chip with CLIP ViT-B/32 in bf16:
each step encodes a 128-image batch, L2-normalizes, scores it against a
16k-image gallery, and takes top-50 — all on device.

Methodology: the dev harness tunnels every dispatch to a remote TPU
(seconds of fixed RPC latency), so steps run inside one jitted
`lax.fori_loop` and the reported rate is differenced between a long and a
short loop, cancelling dispatch/compile constants:
    images_per_sec = (K_long - K_short) * BATCH / (T_long - T_short)
Inputs rotate through an on-device buffer indexed by the loop counter so XLA
cannot hoist the encoder out of the loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md) and
its stack (PyTorch CUDA) cannot run here, so the baseline constant below is
an estimate of the reference eval path on its published hardware (V100 32GB,
fp16 CLIP ViT-B/32 batch inference + argsort ranking): ~900 images/sec.
North star: >3x (BASELINE.json).
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMAGES_PER_SEC = 900.0  # V100 fp16 ViT-B/32 encode+rank estimate

BATCH = 128
GALLERY = 16384
DISTINCT = 2      # distinct on-device batches rotated through the loop
K_SHORT = 4
K_LONG = 36
REPEATS = 3


def main():
    from spn4cir_tpu.models.api import build_backbone

    backbone = build_backbone("clip", clip_model_name="ViT-B/32",
                              dtype=jnp.bfloat16)
    params = jax.jit(backbone.init_params)(jax.random.PRNGKey(0))

    @jax.jit
    def make_inputs(key):
        k1, k2 = jax.random.split(key)
        gallery = jax.random.normal(k1, (GALLERY, backbone.embed_dim), jnp.float32)
        gallery = gallery / jnp.linalg.norm(gallery, axis=1, keepdims=True)
        images = jax.random.uniform(
            k2, (DISTINCT, BATCH, backbone.input_dim, backbone.input_dim, 3),
            jnp.bfloat16)
        return gallery, images

    gallery, images = make_inputs(jax.random.PRNGKey(0))
    jax.block_until_ready((gallery, images))

    def loop(n_steps):
        def run(images, gallery):
            def body(i, acc):
                imgs = jax.lax.dynamic_index_in_dim(
                    images, jnp.mod(i, DISTINCT), keepdims=False)
                feats = backbone.gallery_features(params, imgs)
                scores = jnp.dot(feats, gallery.T,
                                 preferred_element_type=jnp.float32)
                _, idx = jax.lax.top_k(scores, 50)
                return acc + jnp.sum(idx[:, 0])

            return jax.lax.fori_loop(0, n_steps, body, jnp.int32(0))

        return jax.jit(run)

    short_fn = loop(K_SHORT)
    long_fn = loop(K_LONG)
    # compile both
    jax.block_until_ready(short_fn(images, gallery))
    jax.block_until_ready(long_fn(images, gallery))

    def timed(fn):
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(images, gallery))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = timed(short_fn)
    t_long = timed(long_fn)
    ips = (K_LONG - K_SHORT) * BATCH / max(t_long - t_short, 1e-9)
    print(json.dumps({
        "metric": "gallery_encode_retrieval_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
