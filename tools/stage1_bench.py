"""Stage-1 training-step throughput at reference scale.

Stage-1 fine-tunes the FULL model end-to-end (both image encodes + text
encode, in-batch InfoNCE — ref `clip4cir/models.py:146-161` `wo_bank`
branch, `zscir/models.py:145-169`): per step it runs fwd+bwd over 2B
images plus B captions, so unlike stage-2 (frozen-bank, text-only live
tower) the image towers dominate. This measures that step on hardware.

Methodology matches bench.py / train_bench.py for the remote-TPU harness:
scalar-fetch forcing, min-of-N over multi-step chains. Prints one JSON
line per measurement.

Usage: python tools/stage1_bench.py [--clip-model-name RN50x4] [--batch 64]
       [--dim 288] [--grad_ckpt] [--mesh_data N] [--mesh_model N]

--mesh_data/--mesh_model run the sharded stage-1 step
(parallel.train.make_sharded_stage1_step) instead of the single-chip one —
the multi-chip scaling A/B (global batch = --batch, so per-device batch
shrinks as mesh_data grows; ideal scaling holds step time constant while
--batch rises with the mesh).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clip-model-name", default="RN50x4")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--dim", type=int, default=288)
    p.add_argument("--grad_ckpt", action="store_true")
    p.add_argument("--fp32", action="store_true",
                   help="fp32 baseline (default bf16)")
    p.add_argument("--mesh_data", type=int, default=0,
                   help="data-axis size (0 = single-chip step)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel axis size")
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--steps", type=int, default=3,
                   help="chained steps per timing rep")
    p.add_argument("--device_preprocess", action="store_true",
                   help="raw-staged arm: image entries are uint8 RawBatch "
                        "canvases (2x dim) + extents; the fused "
                        "resize/crop/normalize runs inside the train-step "
                        "jit (stage1_loss_fn raw_kind). Measures the "
                        "chip-side tax of --device_preprocess on the "
                        "stage-1 fwd+bwd step (XLA emits no backward for "
                        "the preprocess: its inputs are integers)")
    args = p.parse_args()

    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.train.stage1 import create_stage1_state, stage1_train_step

    backbone = build_backbone(
        "clip", clip_model_name=args.clip_model_name, tau=0.02,
        dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
        remat=args.grad_ckpt)
    params = jax.jit(backbone.init_params)(jax.random.PRNGKey(0))
    state = create_stage1_state(backbone, params, 2e-6)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    raw_kind = None
    if args.device_preprocess:
        import numpy as np

        from spn4cir_tpu.data.transforms import RawBatch

        raw_kind = "targetpad"
        canvas = 2 * args.dim
        rng = np.random.RandomState(7)

        def raw(key):
            canv = jax.random.randint(
                key, (args.batch, canvas, canvas, 3), 0, 256,
                jnp.int32).astype(jnp.uint8)
            ext = rng.randint(int(0.55 * canvas), canvas + 1,
                              size=(args.batch, 2))
            return RawBatch(canv, jnp.asarray(ext, jnp.int32))

        batch = {"refer_images": raw(k1), "target_images": raw(k2),
                 "text_ids": jax.random.randint(
                     k3, (args.batch, 77), 0, 49000).astype(jnp.int32)}
    else:
        batch = {
            "refer_images": jax.random.normal(
                k1, (args.batch, args.dim, args.dim, 3), jnp.float32),
            "target_images": jax.random.normal(
                k2, (args.batch, args.dim, args.dim, 3), jnp.float32),
            "text_ids": jax.random.randint(
                k3, (args.batch, 77), 0, 49000).astype(jnp.int32),
        }

    use_mesh = args.mesh_data > 1 or args.mesh_model > 1
    if use_mesh:
        from spn4cir_tpu.parallel.mesh import make_mesh, replicate, shard_batch
        from spn4cir_tpu.parallel.train import (make_sharded_stage1_step,
                                                tp_state_shardings)

        mesh = make_mesh(data=args.mesh_data or None, bank=1,
                         model=args.mesh_model)
        batch = shard_batch(batch, mesh)
        if args.mesh_model > 1:
            template = state
            state = jax.device_put(state, tp_state_shardings(state, mesh))
            sharded = make_sharded_stage1_step(backbone, mesh,
                                               state_template=template,
                                               raw_kind=raw_kind)
        else:
            state = replicate(state, mesh)
            sharded = make_sharded_stage1_step(backbone, mesh,
                                               raw_kind=raw_kind)

        def run_step(st):
            return sharded(st, batch)
    else:
        def run_step(st):
            return stage1_train_step(backbone, st, batch,
                                     raw_kind=raw_kind)

    s, loss = run_step(state)  # compile
    float(loss)
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        s2 = state
        for _ in range(args.steps):
            s2, loss = run_step(s2)
        float(loss)
        best = min(best, (time.perf_counter() - t0) / args.steps)

    print(json.dumps({
        "metric": "stage1_train_step_seconds",
        "config": {"model": args.clip_model_name, "batch": args.batch,
                   "dim": args.dim, "grad_ckpt": args.grad_ckpt,
                   "dtype": "float32" if args.fp32 else "bfloat16",
                   "mesh_data": args.mesh_data, "mesh_model": args.mesh_model,
                   "device_preprocess": bool(args.device_preprocess)},
        "value": round(best, 4),
        "triplets_per_sec": round(args.batch / best, 1),
        "images_per_sec": round(2 * args.batch / best, 1),
    }))


if __name__ == "__main__":
    main()
