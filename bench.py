"""Headline benchmark: gallery encode + retrieval throughput on one chip.

Measures the reference's hot eval path (SURVEY.md §3.2: gallery encode ->
query scoring -> ranking) as images/sec/chip with CLIP ViT-B/32 in bf16:
encode a batch, L2-normalize, score against a 16k-image gallery, take
top-50 — all on device in one jitted call.

Methodology: the dev harness tunnels every dispatch to a remote TPU with
seconds of RPC latency and its remote compiler rejects looping programs, so
throughput is measured by *batch-size differencing*: the same program runs
at a small and a large batch and
    images_per_sec = (B_large - B_small) / (t_large - t_small)
cancels the per-dispatch constant. Times are min-of-N (robust to network
jitter). Inputs are generated on device.

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

GALLERY = 16384
B_SMALL = 256
B_LARGE = 2048
REPEATS = 7


def main():
    from spn4cir_tpu.models.api import build_backbone

    backbone = build_backbone("clip", clip_model_name="ViT-B/32",
                              dtype=jnp.bfloat16)
    params = jax.jit(backbone.init_params)(jax.random.PRNGKey(0))

    gallery = jax.jit(
        lambda k: jax.random.normal(k, (GALLERY, backbone.embed_dim)))(
            jax.random.PRNGKey(1))
    gallery = gallery / jnp.linalg.norm(gallery, axis=1, keepdims=True)

    def make_images(batch):
        imgs = jax.jit(
            lambda k: jax.random.uniform(
                k, (batch, backbone.input_dim, backbone.input_dim, 3),
                jnp.bfloat16))(jax.random.PRNGKey(batch))
        return jax.block_until_ready(imgs)

    # encode and rank run as separate dispatches: the dev harness's remote
    # compiler rejects the fused program (HTTP 413); the per-dispatch
    # constant cancels in the batch differencing either way.
    @jax.jit
    def encode(images):
        return backbone.gallery_features(params, images)

    @jax.jit
    def rank(feats, gallery):
        scores = jnp.dot(feats, gallery.T, preferred_element_type=jnp.float32)
        _, idx = jax.lax.top_k(scores, 50)
        return idx

    def step(images):
        return rank(encode(images), gallery)

    def timed(images):
        jax.block_until_ready(step(images))  # compile
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            jax.block_until_ready(step(images))
            best = min(best, time.perf_counter() - t0)
        return best

    imgs_small = make_images(B_SMALL)
    imgs_large = make_images(B_LARGE)
    t_small = timed(imgs_small)
    t_large = timed(imgs_large)

    ips = (B_LARGE - B_SMALL) / max(t_large - t_small, 1e-9)
    print(json.dumps({
        "metric": "gallery_encode_retrieval_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
