"""Production-tower throughput + MFU on the real TPU chip (VERDICT next #5).

Measures encode images/sec for every production tower the recipes use —
CLIP ViT-B/32@224, RN50x4@288 (clip4cir flagship), ViT-B/16@224 (tgcir),
BLIP ViT-B@384 (blip4cir), EVA ViT-g@224 (blip24cir) — and the stage-2
train step at recipe scale, incl. the blip2 60k-bank config.

Methodology (dev harness, remote chip over RPC — see bench.py):
scalar-fetch forcing, batch differencing to cancel RPC constants,
min-of-N. MFU = XLA cost_analysis FLOPs / time / peak (v5e bf16 ~197e12).

Usage: python tools/tower_bench.py [--towers a,b,...] [--train] [--json out]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

PEAK_FLOPS = 197e12  # v5e bf16


def synthetic_bert_vocab_file() -> str:
    """A real-sized (30522) stand-in vocab so blip/blip2 backbones construct
    without the HF asset; token text is irrelevant to encode/train FLOPs."""
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "bench_bert_vocab.txt")
    if not os.path.exists(path):
        rows = ["[PAD]"] + [f"[unused{i}]" for i in range(99)] + [
            "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        rows += [f"tok{i}" for i in range(30522 - len(rows))]
        with open(path, "w") as f:
            f.write("\n".join(rows) + "\n")
    return path


def force(x):
    """Fetch a scalar: the only reliable sync on the RPC harness."""
    return float(jnp.sum(x if x.dtype == jnp.float32 else x.astype(jnp.float32)))


def time_encode(encode, params, make_images, b_small, b_large, repeats=5):
    imgs_s = make_images(b_small)
    imgs_l = make_images(b_large)
    force(encode(params, imgs_s))  # compile+warm
    force(encode(params, imgs_l))

    def best(images):
        out = []
        for _ in range(repeats):
            t0 = time.monotonic()
            force(encode(params, images))
            out.append(time.monotonic() - t0)
        return min(out)

    t_s, t_l = best(imgs_s), best(imgs_l)
    ips = (b_large - b_small) / max(t_l - t_s, 1e-9)
    return ips, t_s, t_l


def vit_flops_per_image(tokens: int, width: int, layers: int,
                        mlp_width: int, patch: int, in_ch: int = 3) -> float:
    """Analytic forward FLOPs (2 per MAC). XLA cost_analysis cannot be used
    here: nn.scan towers compile to a while-loop and the analysis counts the
    body ONCE, not layers× (measured: ViT-B/32 reports 0.95 GF vs 8.6 GF)."""
    per_layer = (8 * tokens * width * width            # qkv + out proj
                 + 4 * tokens * tokens * width         # scores + apply
                 + 4 * tokens * width * mlp_width)     # MLP
    embed = 2 * tokens * width * in_ch * patch * patch
    return float(layers * per_layer + embed)


def flops_per_image(encode, params, images, analytic: float = 0.0):
    if analytic:
        return analytic
    # non-scanned models (the ModifiedResNet tower) are counted correctly
    try:
        comp = jax.jit(encode).lower(params, images).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) / images.shape[0]
    except Exception as exc:  # pragma: no cover
        print(f"  [cost_analysis unavailable: {exc}]")
        return 0.0


def analytic_tower_flops(bb, backbone_name) -> float:
    """Per-image encode FLOPs from the tower geometry (scanned ViTs)."""
    if backbone_name == "clip":
        cfg = bb.cfg
        if not cfg.is_vit:
            return 0.0  # ResNet tower: fall back to cost_analysis
        tokens = (cfg.image_resolution // cfg.vision_patch_size) ** 2 + 1
        return vit_flops_per_image(tokens, cfg.vision_width,
                                   cfg.vision_layers, 4 * cfg.vision_width,
                                   cfg.vision_patch_size)
    if backbone_name == "blip":
        vc = bb.vit_cfg
        return vit_flops_per_image(vc.num_tokens, vc.width, vc.layers,
                                   4 * vc.width, vc.patch_size)
    if backbone_name == "blip2":
        vc = bb.vit_cfg
        tokens = (vc.image_size // vc.patch_size) ** 2 + 1
        return vit_flops_per_image(tokens, vc.width, vc.layers,
                                   int(vc.mlp_ratio * vc.width), vc.patch_size)
    return 0.0


def bench_tower(name, backbone_name, bb_kw, b_small, b_large, results,
                device_preprocess=False):
    from spn4cir_tpu.models.api import build_backbone

    print(f"== {name} ==", flush=True)
    if backbone_name in ("blip", "blip2"):
        bb_kw = dict(bb_kw, bert_vocab_path=synthetic_bert_vocab_file())
    bb = build_backbone(backbone_name, dtype=jnp.bfloat16, **bb_kw)
    params = jax.jit(bb.init_params)(jax.random.PRNGKey(0))

    def make_images(batch):
        return jax.jit(lambda k: jax.random.uniform(
            k, (batch, bb.input_dim, bb.input_dim, 3), jnp.bfloat16))(
            jax.random.PRNGKey(batch))

    encode = jax.jit(lambda p, im: bb.gallery_features(p, im))
    ips, t_s, t_l = time_encode(encode, params, make_images, b_small, b_large)
    fpi = flops_per_image(lambda p, im: bb.gallery_features(p, im), params,
                          make_images(min(b_small, 64)),
                          analytic=analytic_tower_flops(bb, backbone_name))
    mfu = ips * fpi / PEAK_FLOPS if fpi else 0.0
    print(f"  {ips:,.0f} img/s  t({b_small})={t_s*1e3:.0f}ms "
          f"t({b_large})={t_l*1e3:.0f}ms  {fpi/1e9:.1f} GF/img  MFU={mfu:.1%}",
          flush=True)
    results[name] = {"images_per_sec": round(ips, 1),
                     "gflops_per_image": round(fpi / 1e9, 2),
                     "mfu": round(mfu, 4), "b_small": b_small,
                     "b_large": b_large}
    if device_preprocess:
        bench_tower_devpre(name, bb, params, b_small, b_large, encode,
                           make_images, results)
    return bb, params


def bench_tower_devpre(name, bb, params, b_small, b_large, plain_encode,
                       make_images, results):
    """The chip-side half of the --device_preprocess hardware A/B: fused
    resize/crop/normalize + encode (`preprocess_batch_dynamic` inside the
    encoder jit, the production raw-staged path) vs the plain encode.
    Inputs are device-created uint8 canvases at the production canvas side
    (2x input dim, cli/common.py default) with a seeded spread of per-image
    padded extents — same shape of work as RawStageTransform output, no
    host/H2D term (tools/loader_bench.py and tools/e2e_index_bench.py cover
    those).

    Runs at 1/4 the tower's plain bench batches: the fused arm holds the
    uint8 canvases (4x the pixel count) plus the f32 separable-resize
    intermediates (~3-5 MB/image at 224-288px towers), so the plain arm's
    8k differencing batch blows HBM — and production raw staging feeds
    loader-sized batches anyway. The plain arm is re-timed at the SAME
    reduced batches so the reported delta is apples-to-apples."""
    import numpy as np

    from spn4cir_tpu.ops.preprocess import preprocess_batch_dynamic

    b_small, b_large = max(1, b_small // 4), max(2, b_large // 4)
    canvas = 2 * bb.input_dim
    rng = np.random.RandomState(7)

    plain_ips, _, _ = time_encode(plain_encode, params, make_images,
                                  b_small, b_large)

    def make_raw(batch):
        canv = jax.jit(lambda k: jax.random.randint(
            k, (batch, canvas, canvas, 3), 0, 256, jnp.int32)
            .astype(jnp.uint8))(jax.random.PRNGKey(batch))
        # padded extents spread over [0.55*canvas, canvas] per axis — spans
        # upscale and downscale geometries like a real gallery
        ext = rng.randint(int(0.55 * canvas), canvas + 1, size=(batch, 2))
        return canv, jnp.asarray(ext, jnp.int32)

    fused = jax.jit(lambda p, cv, ex: bb.gallery_features(
        p, preprocess_batch_dynamic(cv, ex, bb.input_dim, "targetpad")))

    # inline time_encode for the two-argument input
    cv_s, ex_s = make_raw(b_small)
    cv_l, ex_l = make_raw(b_large)
    force(fused(params, cv_s, ex_s))
    force(fused(params, cv_l, ex_l))

    def best(cv, ex, repeats=5):
        out = []
        for _ in range(repeats):
            t0 = time.monotonic()
            force(fused(params, cv, ex))
            out.append(time.monotonic() - t0)
        return min(out)

    t_s, t_l = best(cv_s, ex_s), best(cv_l, ex_l)
    ips = (b_large - b_small) / max(t_l - t_s, 1e-9)
    delta = ips / plain_ips - 1.0 if plain_ips else 0.0
    print(f"  devpre {ips:,.0f} img/s  t({b_small})={t_s*1e3:.0f}ms "
          f"t({b_large})={t_l*1e3:.0f}ms  vs plain@same-B {plain_ips:,.0f} "
          f"({delta:+.1%})", flush=True)
    results[f"{name}_device_preprocess"] = {
        "images_per_sec": round(ips, 1), "canvas": canvas,
        "plain_images_per_sec_same_batch": round(plain_ips, 1),
        "vs_plain_encode": round(delta, 4),
        "b_small": b_small, "b_large": b_large}


def bench_stage2(name, backbone_name, bb_kw, batch, bank_rows, results,
                 bank_dtype=jnp.bfloat16, text_len=None, repeats=5):
    import numpy as np

    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.train.stage2 import create_train_state, stage2_train_step

    print(f"== stage-2 {name} (B={batch}, M={bank_rows}) ==", flush=True)
    if backbone_name in ("blip", "blip2"):
        bb_kw = dict(bb_kw, bert_vocab_path=synthetic_bert_vocab_file())
    bb = build_backbone(backbone_name, dtype=jnp.bfloat16, **bb_kw)
    params = jax.jit(bb.init_params)(jax.random.PRNGKey(0))
    # frozen subtrees never receive gradients in stage 2 — hold them in bf16
    # (halves the idle HBM of e.g. the 1B-param EVA tower on the shared chip)
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    flat = {k: (v if bb.trainable_filter(k) or v.dtype != jnp.float32
                else v.astype(jnp.bfloat16)) for k, v in flat.items()}
    params = traverse_util.unflatten_dict(flat)
    spec = bb.bank_spec()
    state = create_train_state(bb, params, 2e-5)
    bank = jax.jit(lambda k: jax.random.normal(
        k, (bank_rows, *spec.target_shape), bank_dtype))(jax.random.PRNGKey(1))
    refer = jax.jit(lambda k: jax.random.normal(
        k, (batch, *spec.refer_shape), jnp.bfloat16))(jax.random.PRNGKey(2))
    rng = np.random.RandomState(0)
    captions = ["make the dress shorter and more casual"] * batch
    text = jnp.asarray(bb.tokenize(captions))
    labels = jnp.asarray(rng.randint(0, bank_rows, size=(batch,)))
    batch_d = {"refer_feats": refer, "text_ids": text, "labels": labels}

    state, loss = stage2_train_step(bb, state, bank, batch_d)  # compile
    force(loss)
    times = []
    for _ in range(repeats):
        t0 = time.monotonic()
        state, loss = stage2_train_step(bb, state, bank, batch_d)
        force(loss)
        times.append(time.monotonic() - t0)
    # RPC constant: estimate with a no-op scalar fetch
    t0 = time.monotonic()
    force(loss)
    rpc = time.monotonic() - t0
    step = max(min(times) - rpc, 1e-9)
    print(f"  step={step*1e3:.0f}ms (raw {min(times)*1e3:.0f}ms, rpc~{rpc*1e3:.0f}ms)"
          f"  {batch/step:,.0f} triplets/s", flush=True)
    results[f"stage2_{name}"] = {"step_ms": round(step * 1e3, 1),
                                 "triplets_per_sec": round(batch / step, 1),
                                 "batch": batch, "bank_rows": bank_rows}


TOWERS = {
    "clip_vit_b32_224": ("clip", {"clip_model_name": "ViT-B/32"}, 1024, 8192),
    "clip_rn50x4_288": ("clip", {"clip_model_name": "RN50x4"}, 128, 1024),
    "clip_vit_b16_224": ("clip", {"clip_model_name": "ViT-B/16"}, 256, 2048),
    "clip_vit_l14_224": ("clip", {"clip_model_name": "ViT-L/14"}, 128, 1024),
    "blip_vit_b_384": ("blip", {"blip_size": "base"}, 64, 512),
    "eva_vit_g_224": ("blip2", {"blip2_size": "pretrain"}, 32, 256),
}

# CPU-drivable smoke geometry (not a production tower); selectable by name
# but excluded from the default tower list so hardware runs don't record
# meaningless batch-4/16 differencing throughput into the results JSON.
SMOKE_TOWERS = {
    "clip_tiny_test": ("clip", {"clip_model_name": "test-tiny"}, 4, 16),
}


def bench_text(name, backbone_name, bb_kw, results,
               b_small=1024, b_large=8192):
    """Text-tower encode throughput (captions/s): the path the causal-packed
    attention kernel accelerates (CLIP text towers, S=77 static causal mask
    — ops/attention_kernels.py:packed_causal_attention_pallas). The live
    network of every stage-2 step and of all query-side eval/serving."""
    from spn4cir_tpu.models.api import build_backbone

    if backbone_name != "clip":
        print(f"== text {name} == skipped (CLIP text towers only)", flush=True)
        results[f"text_{name}"] = {"skipped": "CLIP text towers only"}
        return
    print(f"== text {name} ==", flush=True)
    bb = build_backbone(backbone_name, dtype=jnp.bfloat16, **bb_kw)
    params = jax.jit(bb.init_params)(jax.random.PRNGKey(0))
    cfg = bb.cfg

    def make_ids(batch):
        caps = [f"a photo of item {i % 97} with pattern {i % 7} and trim"
                for i in range(batch)]
        return jnp.asarray(bb.tokenize(caps))

    encode = jax.jit(lambda p, ids: bb.encode_text(p, ids))
    cps, t_s, t_l = time_encode(encode, params, make_ids, b_small, b_large)
    # analytic transformer FLOPs at S=77 (patch=0 zeroes the embed term)
    fpc = vit_flops_per_image(cfg.context_length, cfg.transformer_width,
                              cfg.transformer_layers,
                              4 * cfg.transformer_width, patch=0)
    mfu = cps * fpc / PEAK_FLOPS
    print(f"  {cps:,.0f} captions/s  t({b_small})={t_s*1e3:.0f}ms "
          f"t({b_large})={t_l*1e3:.0f}ms  {fpc/1e9:.2f} GF/cap  MFU={mfu:.1%}",
          flush=True)
    results[f"text_{name}"] = {"captions_per_sec": round(cps, 1),
                               "gflops_per_caption": round(fpc / 1e9, 2),
                               "mfu": round(mfu, 4)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--towers", default=",".join(TOWERS))
    p.add_argument("--train", action="store_true",
                   help="also run the stage-2 recipe-scale steps")
    p.add_argument("--json", default="")
    p.add_argument("--attn", default="auto", choices=["auto", "xla", "packed"],
                   help="attention dispatch A/B: 'xla' pins every tower to "
                        "the einsum path (disables the packed short-S and "
                        "fused long-S Pallas kernels) so per-tower kernel "
                        "wins can be measured with one flag flip; 'packed' "
                        "forces the packed kernel up to its PACK_ROWS limit "
                        "(the S=197 ViT-B/16 packing experiment)")
    p.add_argument("--text", action="store_true",
                   help="bench the TEXT towers (encode_text captions/s) "
                        "instead of the image towers — the causal-packed "
                        "attention kernel's target path")
    p.add_argument("--device_preprocess", action="store_true",
                   help="also measure fused device preprocess+encode "
                        "(uint8 canvas + per-image extents -> "
                        "preprocess_batch_dynamic inside the encoder jit) "
                        "against each tower's plain arm — the chip-side "
                        "half of the --device_preprocess A/B")
    args = p.parse_args()

    if args.attn == "xla":
        from spn4cir_tpu.ops import attention_kernels as _ak

        _ak.MAX_PACKED_SEQ = 0
        _ak.MIN_FUSED_SEQ = 10 ** 9
    elif args.attn == "packed":
        from spn4cir_tpu.ops import attention_kernels as _ak

        _ak.MAX_PACKED_SEQ = _ak.PACK_ROWS
        _ak.MIN_FUSED_SEQ = 10 ** 9

    print("devices:", jax.devices(), flush=True)
    results = {}
    for name in args.towers.split(","):
        if not name:
            continue
        bn, kw, bs, bl = {**TOWERS, **SMOKE_TOWERS}[name]
        key = f"text_{name}" if args.text else name
        try:
            if args.text:
                bench_text(name, bn, kw, results)
            else:
                bench_tower(name, bn, kw, bs, bl, results,
                            device_preprocess=args.device_preprocess)
        except Exception as exc:
            print(f"  FAILED: {type(exc).__name__}: {str(exc)[:200]}",
                  flush=True)
            results[key] = {"error": str(exc)[:200]}
    if args.train:
        for spec in (
            ("clip_rn50x4", "clip", {"clip_model_name": "RN50x4"}, 256, 60000),
            ("blip2_cirr", "blip2", {"blip2_size": "pretrain"}, 32, 60000),
        ):
            try:
                bench_stage2(spec[0], spec[1], spec[2], spec[3], spec[4],
                             results)
            except Exception as exc:
                print(f"  FAILED: {type(exc).__name__}: {str(exc)[:200]}",
                      flush=True)
                results[f"stage2_{spec[0]}"] = {"error": str(exc)[:200]}
    print(json.dumps(results, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
