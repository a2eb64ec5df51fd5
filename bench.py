"""Headline benchmark: gallery encode + retrieval throughput on one chip.

Measures the reference's hot eval path (SURVEY.md §3.2: gallery encode ->
query scoring -> ranking) as images/sec/chip with CLIP ViT-B/32 in bf16:
each step encodes a 256-image batch, L2-normalizes, scores it against a
16k-image gallery, and extracts top-50 — all on device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Synthetic inputs are generated ON DEVICE (the dev harness tunnels H2D
transfers; production feeds real decoded batches, whose preprocessing
overlaps encode on the host).

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

BATCH = 256
GALLERY = 16384
STEPS = 16
WARMUP = 2
INNER = 4  # batches per jitted call (amortizes dispatch latency)


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
            k2, (INNER, BATCH, backbone.input_dim, backbone.input_dim, 3),
            jnp.bfloat16)
        return gallery, images

    gallery, images = make_inputs(jax.random.PRNGKey(0))
    jax.block_until_ready((gallery, images))

    @jax.jit
    def encode_and_rank(images, gallery):
        def body(_, imgs):
            feats = backbone.gallery_features(params, imgs)
            scores = jnp.dot(feats, gallery.T, preferred_element_type=jnp.float32)
            _, idx = jax.lax.top_k(scores, 50)
            return 0, idx
        _, idx = jax.lax.scan(body, 0, images)
        return idx

    # compile + warmup
    out = encode_and_rank(images, gallery)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        jax.block_until_ready(encode_and_rank(images, gallery))

    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = encode_and_rank(images, gallery)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    total_images = STEPS * INNER * BATCH
    ips = total_images / dt
    print(json.dumps({
        "metric": "gallery_encode_retrieval_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
