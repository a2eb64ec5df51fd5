"""Decompose the 7B decode step on hardware: where does the time go?

The verdict question (round 3 -> 4): measured decode is ~2-3x the naive
weight-streaming floor (int8 7B ~= 6.6 GB/step -> ~8 ms/step at v5e's
~819 GB/s). This tool times ISOLATED proxies of each decode-step component
at the same geometry so the residual can be attributed:

  full        llama_generate decode steps (total minus prefill-only run)
  matmuls     the 7 weight matmuls x layers + lm_head on (B, D) activations
              (pure weight streaming; no attention, no cache)
  attention   softmax(q K^T) V over the full (B, L) cache x layers
              (pure cache streaming; no weights)
  cache_upd   the per-layer dynamic_update_slice pair into the carried cache

All proxies run as a lax.scan of T identical steps inside one jit (same
dispatch shape as production decode). Weight dtype int8 (QuantKernel) or
bf16; cache dtype selectable. Numbers are ms per decode step (the whole
batch advances one position).

Usage (hardware):
  python tools/decode_profile.py --batch 8 --cache_len 343 --steps 32
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def random_params_like(tree, scale=0.02):
    """DEVICE-side random params from an eval_shape tree — a host-built 7B
    int8 tree would ship ~6.7 GB through the dev tunnel (tools/llava_bench
    pattern)."""
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(jax.random.PRNGKey(0), len(leaves))
    outs = []
    for k, leaf in zip(keys, leaves):
        shape = leaf.shape
        if jnp.issubdtype(leaf.dtype, jnp.integer):
            outs.append(jax.jit(lambda key, s=shape: jax.random.randint(
                key, s, -127, 128, jnp.int32).astype(jnp.int8))(k))
        elif leaf.dtype == jnp.float32 and len(shape) <= 1:
            outs.append(jax.jit(lambda key, s=shape: jnp.abs(
                jax.random.normal(key, s, jnp.float32)) * (scale / 127))(k))
        else:
            outs.append(jax.jit(lambda key, s=shape, d=leaf.dtype:
                                jax.random.normal(key, s, d) * scale)(k))
    return jax.tree_util.tree_unflatten(treedef, outs)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--cache_len", type=int, default=343,
                   help="cache rows live during decode (prompt+new)")
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--weights", default="int8", choices=["bf16", "int8"])
    p.add_argument("--cache_dtype", default="bf16",
                   choices=["f32", "bf16", "int8"])
    p.add_argument("--size", default="7b", choices=["7b", "tiny"])
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--quant_kernel", action="store_true",
                   help="route int8 matmuls through the Pallas kernel in "
                        "the matmul proxy and the full run")
    p.add_argument("--attn_kernel", action="store_true",
                   help="route decode attention through the fused Pallas "
                        "kernel (ops/decode_attn.py) in the full run, and "
                        "emit a kernel variant of the attention-only proxy "
                        "(cache padded to a lane multiple, masked tail)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from spn4cir_tpu.models.llama import (LlamaConfig, LlamaLM, _mm,
                                          init_llama_state, llama_generate,
                                          quantize_llama_weights)

    cfg = (LlamaConfig.llama2_7b_chat() if args.size == "7b"
           else LlamaConfig.tiny())
    B, L, T = args.batch, args.cache_len, args.steps
    cache_dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16,
                   "int8": jnp.int8}[args.cache_dtype]

    lshapes = jax.eval_shape(
        lambda k: LlamaLM(cfg).init(k, input_ids=jnp.zeros((1, 4), jnp.int32)),
        jax.random.PRNGKey(0))
    if args.weights == "int8":
        qshapes = jax.eval_shape(quantize_llama_weights, lshapes["params"])
        params = random_params_like(qshapes)
    else:
        params = random_params_like(lshapes)["params"]
    layer = params["layers"]["layer"]
    D = cfg.hidden_size

    def timeit(fn, *xs):
        out = fn(*xs)
        jax.tree_util.tree_map(
            lambda a: None, jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.monotonic()
            out = fn(*xs)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(jax.device_get(leaf)).ravel()[0]  # sync
            best = min(best, time.monotonic() - t0)
        return best

    def report(name, seconds, per=T, extra=None):
        row = {"metric": f"decode_{name}", "ms_per_step":
               round(seconds / per * 1e3, 3), "batch": B, "cache_len": L,
               "steps": T, "weights": args.weights,
               "cache_dtype": args.cache_dtype}
        row.update(extra or {})
        print(json.dumps(row), flush=True)

    # ---- 1) full decode: generate(P + T) minus prefill-only(P) ----------
    P = max(L - T, 1)
    emb = jnp.asarray((np.random.RandomState(1).rand(B, P, D) * 0.02)
                      .astype(np.float32))
    qk = bool(args.quant_kernel)
    ak = bool(args.attn_kernel)
    gen_full = jax.jit(lambda pp, e, r: llama_generate(
        pp, cfg, e, eos_id=-1, pad_id=0, max_new_tokens=T,
        cache_dtype=cache_dtype, rng=r, quant_kernel=qk, attn_kernel=ak))
    gen_one = jax.jit(lambda pp, e, r: llama_generate(
        pp, cfg, e, eos_id=-1, pad_id=0, max_new_tokens=1,
        cache_dtype=cache_dtype, rng=r, quant_kernel=qk, attn_kernel=ak))
    t_full = timeit(gen_full, params, emb, jax.random.PRNGKey(0))
    t_one = timeit(gen_one, params, emb, jax.random.PRNGKey(0))
    report("full", t_full - t_one, per=T - 1,
           extra={"prefill_s": round(t_one, 3),
                  "quant_kernel": qk, "attn_kernel": ak})

    # ---- 2) matmul-only proxy ------------------------------------------
    # params must be ARGUMENTS: a closure would capture the 6.6 GB tree as
    # lowered constants and ship it through the dev tunnel to the compiler
    def matmul_scan(pp, x):
        lyr = pp["layers"]["layer"]

        def step(x, _):
            def one_layer(x, lp):
                at = lp["attn"]
                mm = lambda a, w: _mm(a, w, qk)  # noqa: E731
                q = mm(x, at["q"]["kernel"])
                k = mm(x, at["k"]["kernel"])
                v = mm(x, at["v"]["kernel"])
                x = x + mm(q + k + v, at["o"]["kernel"]).astype(x.dtype)
                g = mm(x, lp["gate"]["kernel"])
                u = mm(x, lp["up"]["kernel"])
                x = x + mm(jax.nn.silu(g) * u,
                           lp["down"]["kernel"]).astype(x.dtype)
                return x, None

            x, _ = jax.lax.scan(one_layer, x, lyr)
            logits = _mm(x.astype(jnp.float32), pp["lm_head"], qk)
            return x + logits[:, :D].astype(x.dtype) * 0, None

        x, _ = jax.lax.scan(step, x, None, length=T)
        return x

    x0 = jnp.asarray((np.random.RandomState(2).rand(B, D) * 0.02)
                     .astype(np.float32))
    report("matmuls_only", timeit(jax.jit(matmul_scan), params, x0),
           extra={"quant_kernel": qk})

    # ---- 3) attention-only proxy ---------------------------------------
    hd = cfg.head_dim
    H = cfg.num_heads
    # int8 proxies at bf16 (random int8 + per-row scales would change the
    # math under test; f32 would 4x the stream AND blow HBM at B=32 —
    # 32 layers x 32 x 343 x 4096 x 4 B ~= 5.8 GB next to 6.7 GB weights)
    kv = jax.jit(lambda k: jax.random.normal(
        k, (cfg.num_layers, B, L, cfg.kv_heads * hd),
        jnp.bfloat16 if cache_dtype == jnp.int8 else cache_dtype) * 0.02)(
            jax.random.PRNGKey(3))

    def attn_scan(kv_arg, q0):
        def step(q, _):
            def one_layer(q, ck):
                kh = ck.reshape(B, L, cfg.kv_heads, hd)
                if cfg.kv_heads != H:
                    kh = jnp.repeat(kh, H // cfg.kv_heads, 2)
                lg = jnp.einsum("bhd,bkhd->bhk", q.reshape(B, H, hd), kh,
                                preferred_element_type=jnp.float32)
                w = jax.nn.softmax(lg * hd ** -0.5, -1).astype(kh.dtype)
                ctx = jnp.einsum("bhk,bkhd->bhd", w, kh)
                return ctx.reshape(B, D).astype(q.dtype), None

            q, _ = jax.lax.scan(one_layer, q, kv_arg)
            return q, None

        q, _ = jax.lax.scan(step, q0, None, length=T)
        return q

    report("attention_only", timeit(jax.jit(attn_scan), kv, x0))

    # ---- 3b) attention-only proxy through the fused kernel ---------------
    if ak:
        from spn4cir_tpu.models.llama import NEG_INF
        from spn4cir_tpu.ops.decode_attn import (decode_attention,
                                                 supports_decode_attention)

        Lp = -(-L // 128) * 128  # the generate path pads the cache likewise
        if supports_decode_attention(H, cfg.kv_heads, hd, Lp):
            kv_pad = jax.jit(lambda a: jnp.pad(
                a, ((0, 0), (0, 0), (0, Lp - L), (0, 0))))(kv)
            bias = jnp.broadcast_to(
                jnp.where(jnp.arange(Lp)[None, :] < L, 0.0, NEG_INF),
                (B, Lp)).astype(jnp.float32)

            def attn_scan_k(kv_arg, q0, bias_arg):
                def step(q, _):
                    def one_layer(q, li):
                        ctx = decode_attention(q.reshape(B, H, hd), kv_arg,
                                               kv_arg, li, bias_arg)
                        return ctx.reshape(B, D).astype(q.dtype), None

                    q, _ = jax.lax.scan(one_layer, q,
                                        jnp.arange(cfg.num_layers))
                    return q, None

                q, _ = jax.lax.scan(step, q0, None, length=T)
                return q

            kv.delete()  # padded copy supersedes it; free ~3-6 GB HBM
            report("attention_only_kernel",
                   timeit(jax.jit(attn_scan_k), kv_pad, x0, bias),
                   extra={"padded_len": Lp})
            kv_pad.delete()
        else:
            print(json.dumps({"metric": "decode_attention_only_kernel",
                              "skipped": "geometry unsupported"}),
                  flush=True)
    else:
        kv.delete()

    # ---- 4) cache-update-only proxy --------------------------------------
    def upd_scan(carry):
        k_cache, x = carry

        def step(carry, i):
            k_cache, x = carry

            def one_layer(carry, li):
                k_cache, x = carry
                row = (x[:, : cfg.kv_heads * hd])[None, :, None, :]
                k_cache = jax.lax.dynamic_update_slice(
                    k_cache, row.astype(k_cache.dtype), (li, 0, i % L, 0))
                return (k_cache, x), None

            (k_cache, x), _ = jax.lax.scan(
                step_inner := one_layer, (k_cache, x),
                jnp.arange(cfg.num_layers))
            return (k_cache, x + 1e-6), None

        (k_cache, x), _ = jax.lax.scan(step, (k_cache, x),
                                       jnp.arange(T))
        return k_cache[0, 0, 0, 0] + x[0, 0]

    st = init_llama_state(cfg, B, L, dtype=(
        jnp.bfloat16 if cache_dtype == jnp.int8 else cache_dtype))
    report("cache_update_only", timeit(jax.jit(upd_scan), (st.k, x0)))

    # ---- theoretical floors ----------------------------------------------
    wbytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize
                 for v in jax.tree_util.tree_leaves(params))
    cbytes = 2 * cfg.num_layers * B * L * cfg.kv_heads * hd * (
        jnp.dtype(jnp.bfloat16 if cache_dtype == jnp.int8
                  else cache_dtype).itemsize)
    print(json.dumps({"metric": "decode_floors",
                      "weight_bytes_gb": round(wbytes / 2 ** 30, 2),
                      "kv_cache_gb": round(cbytes / 2 ** 30, 3),
                      "weight_stream_ms_at_819gbps":
                          round(wbytes / (819 * 2 ** 30) * 1e3, 2),
                      "cache_read_ms_at_819gbps":
                          round(cbytes / (819 * 2 ** 30) * 1e3, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
