"""Headline benchmark: gallery encode + retrieval throughput on one chip.

Measures the reference's hot eval path (SURVEY.md §3.2: gallery encode ->
query scoring -> ranking) as images/sec/chip with CLIP ViT-B/32 in bf16:
encode a batch, L2-normalize, score against a 16k-image gallery, take
top-50 — all on device.

Methodology notes for this dev harness (remote TPU behind an RPC tunnel):
  - `block_until_ready` does not synchronize remote execution here, so each
    step is forced by fetching a scalar reduction of its outputs;
  - the remote compiler rejects fused encode+rank and looping programs
    (HTTP 413), so encode and rank are separate jits;
  - per-dispatch RPC constants cancel by *batch differencing*:
        images_per_sec = (B_large - B_small) / (t_large - t_small)
    with min-of-N timing. Inputs are generated on device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md) and
its stack (PyTorch CUDA) cannot run here, so the baseline constant below is
an estimate of the reference eval path on its published hardware (V100 32GB,
fp16 CLIP ViT-B/32 batch inference + argsort ranking): ~900 images/sec.
North star: >3x (BASELINE.json).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_IMAGES_PER_SEC = 900.0  # V100 fp16 ViT-B/32 encode+rank estimate

# Env overrides exist for smoke-testing the harness plumbing (CPU, tiny
# shapes) — production numbers are only valid at the defaults.
GALLERY = int(os.environ.get("SPN4CIR_BENCH_GALLERY", 16384))
B_SMALL = int(os.environ.get("SPN4CIR_BENCH_B_SMALL", 1024))
B_LARGE = int(os.environ.get("SPN4CIR_BENCH_B_LARGE", 8192))
REPEATS = int(os.environ.get("SPN4CIR_BENCH_REPEATS", 7))


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
        return jax.jit(
            lambda k: jax.random.uniform(
                k, (batch, backbone.input_dim, backbone.input_dim, 3),
                jnp.bfloat16))(jax.random.PRNGKey(batch))

    @jax.jit
    def encode(p, images):
        return backbone.gallery_features(p, images)

    @jax.jit
    def rank(feats, gallery):
        scores = jnp.dot(feats, gallery.T, preferred_element_type=jnp.float32)
        _, idx = jax.lax.top_k(scores, 50)
        # scalar handle: fetching this forces the whole chain to execute
        return jnp.sum(idx[:, :1])

    def step(images):
        return float(rank(encode(params, images), gallery))

    def timed(images):
        step(images)  # compile + warm
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            step(images)
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


def _wait_for_device():
    """Bounded retry for transient tunnel outages (the dev harness's TPU
    RPC tunnel drops occasionally). JAX caches a failed backend init for
    the life of the process, so each retry re-execs a fresh interpreter.
    Stays silent on stdout — the one-JSON-line contract belongs to main()."""
    import os
    import sys
    import time

    attempt = int(os.environ.get("SPN4CIR_BENCH_ATTEMPT", "0"))
    try:
        jax.devices()
        return
    except RuntimeError as exc:
        if attempt >= 9:  # ~15 min of retries, then fail loudly
            print(f"device unavailable after {attempt} retries: {exc}",
                  file=sys.stderr)
            raise
    time.sleep(90)
    os.environ["SPN4CIR_BENCH_ATTEMPT"] = str(attempt + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def _supervised():
    """Run the measurement in a killable child with a deadline.

    The dev tunnel occasionally stalls SERVER-side mid-dispatch (observed
    round 5: even a 256x256 jit hangs for 30+ min, then the tunnel
    recovers). A Python-level alarm cannot interrupt a hung RPC stuck in a
    C call, so the parent forks a child for the whole measurement and
    SIGKILLs it past the deadline, retrying with a pause. stdout stays the
    child's one JSON line (forwarded verbatim on success)."""
    import os
    import subprocess
    import sys
    import time

    deadline_s = int(os.environ.get("SPN4CIR_BENCH_DEADLINE", "900"))
    for attempt in range(3):
        env = dict(os.environ, SPN4CIR_BENCH_CHILD="1")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=None if deadline_s <= 0 else deadline_s,
                check=False)
        except subprocess.TimeoutExpired:
            # subprocess.run already SIGKILLed the child
            print(f"bench attempt {attempt + 1} hung past {deadline_s}s; "
                  "killed", file=sys.stderr)
        else:
            if proc.returncode == 0:
                return
            print(f"bench attempt {attempt + 1} failed "
                  f"(rc={proc.returncode}); retrying", file=sys.stderr)
        time.sleep(120)
    sys.exit(1)


if __name__ == "__main__":
    import os as _os

    if _os.environ.get("SPN4CIR_BENCH_CHILD"):
        _wait_for_device()
        main()
    else:
        _supervised()
