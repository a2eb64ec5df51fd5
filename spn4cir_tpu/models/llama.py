"""LLaMA decoder in flax: the language model behind the reference's LLaVA
captioner and LLaMA-2 rewriter.

Parity targets (checkpoint-convertible via
`spn4cir_tpu.models.convert.convert_llama_state_dict`):
  * the LLaVA-v1 language model — HF `LlamaForCausalLM` as subclassed by the
    vendored `zscir/llava/model/language_model/llava_llama.py:34-46`
    (LlavaLlamaModel = LlavaMetaModel + LlamaModel);
  * the rewriter LM — LLaMA-2-7b-chat loaded through
    `zscir/llama_generate.py:29-41`.

Architecture (HF `modeling_llama`): RMSNorm (f32 accumulation) pre-norm,
rotary position embeddings applied to q/k, optional grouped-query attention
(LLaVA-v1 7B/13B use MHA: num_kv_heads == num_heads), SwiGLU MLP
(down(silu(gate(x)) * up(x))), no biases anywhere, untied lm_head.

TPU-native: layers are nn.scan-rolled (stacked params under 'layers'); the
teacher-forced forward is one fused causal-attention program; generation is
the standard prefill/decode split — `llama_prefill` consumes the whole
prompt in one MXU-shaped causal forward that fills the static KV cache,
then `llama_generate` scans only the sampled tail with per-token decode
steps (models/generation.py pattern). RoPE cos/sin tables are precomputed
per geometry.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any
NEG_INF = -1e9

# Production default for the fused Pallas decode-attention kernel
# (ops/decode_attn.py) when callers pass attn_kernel=None. ON per the
# round-5 hardware A/B (BENCHMARKS.md round 5: {einsum,kernel} x {bf16,int8
# KV} x B{8,16,32} on both 7B workloads — kernel wins every B>=16 cell by
# 1.23-2.19x, wins rewriter B=8 by ~9%, and is within noise on captioner
# B=8; it un-parks the B>8 cache-read-contention regime the round-4
# decomposition identified). Geometry the kernel does not support (GQA,
# off-lane head dims — every tiny test config) silently takes the einsum
# path either way, so tests stay bit-deterministic.
DECODE_ATTN_DEFAULT = True


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: Optional[int] = None  # None => MHA (LLaVA-v1 7B/13B)
    intermediate_size: int = 11008
    max_position_embeddings: int = 2048
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6

    @property
    def kv_heads(self) -> int:
        return self.num_kv_heads or self.num_heads

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def llama_7b(cls) -> "LlamaConfig":
        return cls()

    @classmethod
    def llama2_7b_chat(cls) -> "LlamaConfig":
        # LLaMA-2 ships rms_norm_eps=1e-5 and a 4k context
        return cls(max_position_embeddings=4096, rms_eps=1e-5)

    @classmethod
    def tiny(cls, vocab_size: int = 128, **kw) -> "LlamaConfig":
        base = dict(vocab_size=vocab_size, hidden_size=32, num_layers=2,
                    num_heads=4, intermediate_size=64,
                    max_position_embeddings=128)
        base.update(kw)
        return cls(**base)


# ---------------------------------------------------------------------------
# RoPE (HF layout: [first-half, second-half] rotate_half, NOT interleaved)
# ---------------------------------------------------------------------------


def rope_tables(cfg: LlamaConfig, positions: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for the given (…,) int positions -> (…, head_dim)."""
    hd = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta
                      ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
               ) -> jnp.ndarray:
    """x: (..., S, H, head_dim); cos/sin: (S, head_dim) (broadcast over
    leading dims and heads). HF apply_rotary_pos_emb semantics."""
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    c = cos[..., :, None, :]
    s = sin[..., :, None, :]
    return x * c + rotated * s


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    """HF LlamaRMSNorm: variance in f32, scale applied in input dtype."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return ((xf * jax.lax.rsqrt(var + eps)).astype(dt)) * scale.astype(dt)


# ---------------------------------------------------------------------------
# weight-only int8 (serving): per-output-channel absmax
# ---------------------------------------------------------------------------


class QuantKernel(NamedTuple):
    """An int8 weight matrix with per-output-channel scales. Decode at 7B
    is weight-bandwidth-bound; int8 halves the HBM read (and the weight
    footprint: 13.4 GB bf16 -> 6.7 GB, leaving real batch room on a 16 GB
    chip). The convert fuses into the matmul read; scales apply to the
    (…, F) output — dequantization after the contraction."""

    values: jnp.ndarray  # (..., D, F) int8
    scales: jnp.ndarray  # (..., F) f32


def _mm(x, w, use_kernel: bool = False):
    """x @ w for dense or QuantKernel weights (dequant-after-matmul).

    `use_kernel` routes int8 weights through the fused Pallas matmul
    (ops/quant_matmul.py). Hardware A/Bs (BENCHMARKS.md round 4) showed XLA
    fuses the `.astype` dequant into its matmul schedule — no HBM weight
    copy materializes even at decode — and beats the kernel on both 7B
    decode workloads, so llama_generate now defaults the kernel OFF; the
    path stays for per-geometry re-evaluation via --quant_kernel."""
    if isinstance(w, QuantKernel):
        if use_kernel and w.values.ndim == 2:
            from spn4cir_tpu.ops.quant_matmul import quant_matmul
            return quant_matmul(x, w.values, w.scales)
        return (x @ w.values.astype(x.dtype)) * w.scales.astype(x.dtype)
    return x @ w


def _embed_rows(table, ids):
    """Embedding lookup for dense or QuantKernel ((V, D) values with per-
    ROW (V,) scales — the lookup axis)."""
    if isinstance(table, QuantKernel):
        rows = jnp.asarray(table.values)[ids]
        return rows.astype(jnp.float32) * jnp.asarray(
            table.scales)[ids][..., None]
    return jnp.asarray(table)[ids]


def quantize_llama_weights(params: Dict[str, Any]) -> Dict[str, Any]:
    """Weight-only int8 quantization of a LlamaLM param tree: every matmul
    kernel (attn q/k/v/o, mlp gate/up/down — stacked over layers — and
    lm_head) gets per-output-channel absmax scales; embed_tokens gets
    per-row scales (it is read row-wise); RMSNorm scales stay f32.
    The tree shape is preserved — llama_prefill/llama_decode_step/
    llama_generate consume it directly."""

    def quant_cols(w):  # (..., D, F) -> scales over F
        w = jnp.asarray(w, jnp.float32)
        absmax = jnp.max(jnp.abs(w), axis=-2)
        scales = jnp.maximum(absmax, 1e-12) / 127.0
        vals = jnp.clip(jnp.round(w / scales[..., None, :]),
                        -127, 127).astype(jnp.int8)
        return QuantKernel(vals, scales)

    def quant_rows(w):  # (V, D) -> scales over V
        w = jnp.asarray(w, jnp.float32)
        absmax = jnp.max(jnp.abs(w), axis=-1)
        scales = jnp.maximum(absmax, 1e-12) / 127.0
        vals = jnp.clip(jnp.round(w / scales[..., None]),
                        -127, 127).astype(jnp.int8)
        return QuantKernel(vals, scales)

    layer = params["layers"]["layer"]
    qlayer = {
        "input_ln": layer["input_ln"],
        "post_ln": layer["post_ln"],
        "attn": {k: {"kernel": quant_cols(layer["attn"][k]["kernel"])}
                 for k in ("q", "k", "v", "o")},
        "gate": {"kernel": quant_cols(layer["gate"]["kernel"])},
        "up": {"kernel": quant_cols(layer["up"]["kernel"])},
        "down": {"kernel": quant_cols(layer["down"]["kernel"])},
    }
    return {
        "embed_tokens": quant_rows(params["embed_tokens"]),
        "layers": {"layer": qlayer},
        "norm": params["norm"],
        "lm_head": quant_cols(params["lm_head"]),
    }


# ---------------------------------------------------------------------------
# flax modules (teacher-forced full-sequence forward)
# ---------------------------------------------------------------------------


class _RMSNorm(nn.Module):
    eps: float

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        return rms_norm(x, scale, self.eps)


def _repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(B, S, kvH, D) -> (B, S, kvH*n_rep, D), HF repeat_kv order."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)
                            ).reshape(b, s, h * n_rep, d)


class _LlamaAttention(nn.Module):
    cfg: LlamaConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        cfg = self.cfg
        hd = cfg.head_dim
        b, s, _ = x.shape
        dense = lambda feats, name: nn.Dense(  # noqa: E731
            feats, use_bias=False, dtype=self.dtype, name=name)
        q = dense(cfg.num_heads * hd, "q")(x).reshape(b, s, cfg.num_heads, hd)
        k = dense(cfg.kv_heads * hd, "k")(x).reshape(b, s, cfg.kv_heads, hd)
        v = dense(cfg.kv_heads * hd, "v")(x).reshape(b, s, cfg.kv_heads, hd)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        k = _repeat_kv(k, cfg.num_heads // cfg.kv_heads)
        v = _repeat_kv(v, cfg.num_heads // cfg.kv_heads)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        logits = logits + mask  # (1/B, 1, S, S) additive
        w = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, s, -1)
        return dense(cfg.hidden_size, "o")(ctx)


class _LlamaLayer(nn.Module):
    cfg: LlamaConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        cfg = self.cfg
        h = _RMSNorm(cfg.rms_eps, name="input_ln")(x)
        x = x + _LlamaAttention(cfg, self.dtype, name="attn")(h, cos, sin, mask)
        h = _RMSNorm(cfg.rms_eps, name="post_ln")(x)
        gate = nn.Dense(cfg.intermediate_size, use_bias=False,
                        dtype=self.dtype, name="gate")(h)
        up = nn.Dense(cfg.intermediate_size, use_bias=False,
                      dtype=self.dtype, name="up")(h)
        down = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                        name="down")(jax.nn.silu(gate) * up)
        return x + down


class _ScanLayer(nn.Module):
    cfg: LlamaConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        return _LlamaLayer(self.cfg, self.dtype, name="layer")(
            x, cos, sin, mask), None


class LlamaLM(nn.Module):
    """Teacher-forced causal LM: ids or embeddings -> (B, S, vocab) logits.

    `inputs_embeds` takes precedence over `input_ids` — the LLaVA path feeds
    embeddings with image features spliced in (llava_arch.py:96-200)."""

    cfg: LlamaConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids=None, inputs_embeds=None,
                 attention_mask=None):
        cfg = self.cfg
        embed = self.param("embed_tokens", nn.initializers.normal(0.02),
                           (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        if inputs_embeds is None:
            inputs_embeds = embed[input_ids]
        x = inputs_embeds.astype(self.dtype)
        s = x.shape[1]
        cos, sin = rope_tables(cfg, jnp.arange(s))
        causal = jnp.where(
            jnp.arange(s)[None, :] <= jnp.arange(s)[:, None], 0.0, NEG_INF)
        mask = causal[None, None]
        if attention_mask is not None:
            pad = (1.0 - attention_mask.astype(jnp.float32)) * NEG_INF
            mask = mask + pad[:, None, None, :]
        scanned = nn.scan(
            _ScanLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.num_layers,
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
        )(cfg=cfg, dtype=self.dtype, name="layers")
        x, _ = scanned(x, cos, sin, mask)
        x = _RMSNorm(cfg.rms_eps, name="norm")(x)
        head = self.param("lm_head", nn.initializers.normal(0.02),
                          (cfg.hidden_size, cfg.vocab_size), jnp.float32)
        return x.astype(jnp.float32) @ head


# ---------------------------------------------------------------------------
# KV-cached incremental decoding (pure functions over the LlamaLM params)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LlamaDecodeState:
    """Static-shape KV cache: k/v (n_layers, B, L, kv_heads*head_dim).

    int8 cache (`init_llama_state(dtype=jnp.int8)`): k/v hold per-row
    symmetric int8 and k_scale/v_scale (n_layers, B, L) f32 hold the
    per-(layer, batch, position) absmax/127 scales. Decode bandwidth is
    cache-read-bound after the weights; int8 halves it again vs bf16 AND
    halves the cache HBM footprint (the resource that capped rewriter
    batching at B=8 — BENCHMARKS.md round 4). Scales factor out of both
    attention contractions exactly: logits scale per key row, and the
    value scale folds into the softmax weights."""

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


jax.tree_util.register_pytree_node(
    LlamaDecodeState,
    lambda s: ((s.k, s.v, s.k_scale, s.v_scale), None),
    lambda _, c: LlamaDecodeState(*c),
)


def init_llama_state(cfg: LlamaConfig, batch: int, max_length: int,
                     dtype=jnp.float32) -> LlamaDecodeState:
    """dtype=bfloat16 halves KV-cache HBM at 7B scale (32 layers × 4096 —
    the cache, not the weights, bounds batch size on a 16 GB chip);
    dtype=int8 halves it again with per-row scales (see LlamaDecodeState)."""
    z = jnp.zeros((cfg.num_layers, batch, max_length,
                   cfg.kv_heads * cfg.head_dim), dtype)
    if dtype == jnp.int8:
        s = jnp.ones((cfg.num_layers, batch, max_length), jnp.float32)
        return LlamaDecodeState(z, z, s, s)
    return LlamaDecodeState(z, z)


def _quant_rows(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., D) -> int8 rows + (...,) f32 absmax/127 scales (symmetric)."""
    scale = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(t.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def llama_prefill(params: Dict[str, Any], cfg: LlamaConfig,
                  state: LlamaDecodeState, x: jnp.ndarray, *,
                  positions: Optional[jnp.ndarray] = None,
                  pad_mask: Optional[jnp.ndarray] = None,
                  quant_kernel: bool = False,
                  ) -> Tuple[jnp.ndarray, LlamaDecodeState]:
    """Consume the whole prompt in ONE batched forward: x (B, P, D) input
    embeddings -> (last-position logits (B, vocab), cache filled for
    positions [0, P)).

    `positions` (B, P) / `pad_mask` (B, P, 1=real) support LEFT-padded
    ragged prompt batches (HF left-padding semantics: per-row RoPE positions
    from the mask cumsum, pad keys masked out); both default to the dense
    single-length case.

    The sequential alternative — P incremental decode steps — is P
    weight-streaming matvecs (~P x 17 ms at 7B on a v5e chip); this is one
    MXU-shaped causal forward over all positions, the standard
    prefill/decode split of production LLM serving."""
    hd = cfg.head_dim
    n_rep = cfg.num_heads // cfg.kv_heads
    batch, plen, _ = x.shape
    cos, sin = rope_tables(
        cfg, jnp.arange(plen) if positions is None else positions)
    causal = jnp.where(
        jnp.arange(plen)[None, :] <= jnp.arange(plen)[:, None], 0.0, NEG_INF)
    if pad_mask is not None:
        # (B, 1, 1, P) additive key mask on top of the causal structure
        causal = causal[None, None] + (
            1.0 - pad_mask.astype(jnp.float32))[:, None, None, :] * NEG_INF
    else:
        causal = jnp.broadcast_to(causal[None, None], (1, 1, plen, plen))

    layer = params["layers"]["layer"]
    mm = lambda a, w: _mm(a, w, quant_kernel)  # noqa: E731
    quant = state.quantized

    def one_layer(x, xs):
        if quant:
            lp, ck, cv, cks, cvs = xs
        else:
            lp, ck, cv = xs
        h = rms_norm(x, lp["input_ln"]["scale"], cfg.rms_eps)
        at = lp["attn"]
        q = mm(h, at["q"]["kernel"]).reshape(batch, plen, cfg.num_heads, hd)
        k = mm(h, at["k"]["kernel"]).reshape(batch, plen, cfg.kv_heads, hd)
        v = mm(h, at["v"]["kernel"])
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kflat = k.reshape(batch, plen, -1)
        if quant:
            kq, ks = _quant_rows(kflat)
            vq, vs = _quant_rows(v)
            ck = jax.lax.dynamic_update_slice(ck, kq, (0, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, vq, (0, 0, 0))
            cks = jax.lax.dynamic_update_slice(cks, ks, (0, 0))
            cvs = jax.lax.dynamic_update_slice(cvs, vs, (0, 0))
        else:
            ck = jax.lax.dynamic_update_slice(
                ck, kflat.astype(ck.dtype), (0, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                              (0, 0, 0))
        kh = _repeat_kv(k.reshape(batch, plen, cfg.kv_heads, hd), n_rep)
        vh = _repeat_kv(v.reshape(batch, plen, cfg.kv_heads, hd), n_rep)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kh,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        logits = logits + causal
        w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(batch, plen, -1)
        x = x + mm(ctx, at["o"]["kernel"]).astype(x.dtype)
        h = rms_norm(x, lp["post_ln"]["scale"], cfg.rms_eps)
        gate = mm(h, lp["gate"]["kernel"])
        up = mm(h, lp["up"]["kernel"])
        x = x + mm(jax.nn.silu(gate) * up,
                   lp["down"]["kernel"]).astype(x.dtype)
        return x, (ck, cv, cks, cvs) if quant else (ck, cv)

    xs_in = ((layer, state.k, state.v, state.k_scale, state.v_scale)
             if quant else (layer, state.k, state.v))
    x, new_cache = jax.lax.scan(one_layer, x, xs_in)
    last = rms_norm(x[:, -1], params["norm"]["scale"], cfg.rms_eps)
    logits = mm(last.astype(jnp.float32), params["lm_head"])
    return logits, LlamaDecodeState(*new_cache)


def _cache_write(cache, li, off, kflat, v):
    """Write rows [off, off+c) of layer `li` into the carried cache tuple
    ((k, v) or (k, v, k_scale, v_scale)); the int8 form quantizes per row
    at write time. kflat/v: (B, c, dkv) full precision; li traced int32."""
    if len(cache) == 4:
        ck, cv, cks, cvs = cache
        kq, ks = _quant_rows(kflat)
        vq, vs = _quant_rows(v)
        ck = jax.lax.dynamic_update_slice(ck, kq[None], (li, 0, off, 0))
        cv = jax.lax.dynamic_update_slice(cv, vq[None], (li, 0, off, 0))
        cks = jax.lax.dynamic_update_slice(cks, ks[None], (li, 0, off))
        cvs = jax.lax.dynamic_update_slice(cvs, vs[None], (li, 0, off))
        return (ck, cv, cks, cvs)
    ck, cv = cache
    ck = jax.lax.dynamic_update_slice(
        ck, kflat[None].astype(ck.dtype), (li, 0, off, 0))
    cv = jax.lax.dynamic_update_slice(
        cv, v[None].astype(cv.dtype), (li, 0, off, 0))
    return (ck, cv)


def _cache_read(cfg, cache, li, end: int, batch: int, n_rep: int):
    """Rows [0, end) of layer `li` -> (kh, vh, k_scale|None, v_scale|None),
    heads expanded. int8 rows convert in-registers (XLA fuses the convert
    into the attention dots — the HBM read stays 1 byte/elem); the per-row
    scales factor out of both contractions exactly."""
    hd = cfg.head_dim
    dkv = cfg.kv_heads * hd
    ks = jax.lax.dynamic_slice(
        cache[0], (li, 0, 0, 0), (1, batch, end, dkv))[0]
    vs = jax.lax.dynamic_slice(
        cache[1], (li, 0, 0, 0), (1, batch, end, dkv))[0]
    kh = _repeat_kv(ks.reshape(batch, end, cfg.kv_heads, hd), n_rep)
    vh = _repeat_kv(vs.reshape(batch, end, cfg.kv_heads, hd), n_rep)
    if len(cache) == 4:
        cks = jax.lax.dynamic_slice(cache[2], (li, 0, 0),
                                    (1, batch, end))[0]
        cvs = jax.lax.dynamic_slice(cache[3], (li, 0, 0),
                                    (1, batch, end))[0]
        return (kh.astype(jnp.float32), vh.astype(jnp.float32), cks, cvs)
    return kh, vh, None, None


def llama_prefill_chunked(params: Dict[str, Any], cfg: LlamaConfig,
                          state: LlamaDecodeState, x: jnp.ndarray, *,
                          chunk: int,
                          positions: Optional[jnp.ndarray] = None,
                          pad_mask: Optional[jnp.ndarray] = None,
                          quant_kernel: bool = False,
                          ) -> Tuple[jnp.ndarray, LlamaDecodeState]:
    """`llama_prefill` in fixed-size prompt chunks: caps the prefill working
    set so batch can scale.

    Dense prefill's f32 attention logits are (B, H, P, P) — 410 MB at
    B=16/P=448/7B, which is what stalls rewriter batching past B=8
    (BENCHMARKS.md round 3). Chunk c consumes positions [off, off+C) in one
    forward that attends over cache rows [0, off+C): logits shrink to
    (B, H, C, off+C) and the peak is the LAST chunk's ~(C/P) x the dense
    blow-up. The chunk loop is unrolled in Python (n_chunks is static), so
    every cache slice bound is static; the KV caches ride the layer scan's
    CARRY (indexed per-layer update) — carry aliasing keeps the updates
    in-place, where an xs->ys cache (dense prefill's layout) would copy the
    whole cache per chunk.

    Same contract as llama_prefill, including left-padded ragged batches;
    equal logits up to cache_dtype rounding of earlier chunks' keys (decode
    reads the cache at cache_dtype the same way)."""
    hd = cfg.head_dim
    n_rep = cfg.num_heads // cfg.kv_heads
    batch, plen, _ = x.shape
    layer = params["layers"]["layer"]
    mm = lambda a, w: _mm(a, w, quant_kernel)  # noqa: E731
    li_axis = jnp.arange(cfg.num_layers)
    quant = state.quantized
    cache = ((state.k, state.v, state.k_scale, state.v_scale) if quant
             else (state.k, state.v))
    last = None

    for off in range(0, plen, chunk):
        end = min(off + chunk, plen)
        c = end - off
        xb = x[:, off:end]
        pos_b = (jnp.arange(off, end) if positions is None
                 else positions[:, off:end])
        cos, sin = rope_tables(cfg, pos_b)
        # key j in [0, end) visible to chunk row i (global off+i) iff
        # j <= off+i and (ragged) j is a real token
        causal = jnp.where(
            jnp.arange(end)[None, :] <= (off + jnp.arange(c))[:, None],
            0.0, NEG_INF)
        if pad_mask is not None:
            causal = causal[None, None] + (
                1.0 - pad_mask[:, :end].astype(jnp.float32)
            )[:, None, None, :] * NEG_INF
        else:
            causal = jnp.broadcast_to(causal[None, None], (1, 1, c, end))

        def one_layer(carry, xs, *, off=off, end=end, c=c, cos=cos, sin=sin,
                      causal=causal):
            xb, cache = carry[0], carry[1:]
            lp, li = xs
            h = rms_norm(xb, lp["input_ln"]["scale"], cfg.rms_eps)
            at = lp["attn"]
            q = mm(h, at["q"]["kernel"]).reshape(batch, c, cfg.num_heads, hd)
            k = mm(h, at["k"]["kernel"]).reshape(batch, c, cfg.kv_heads, hd)
            v = mm(h, at["v"]["kernel"])
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            cache = _cache_write(cache, li, off,
                                 k.reshape(batch, c, -1), v)
            kh, vh, kh_scale, vh_scale = _cache_read(
                cfg, cache, li, end, batch, n_rep)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, kh,
                preferred_element_type=jnp.float32) * (hd ** -0.5)
            if kh_scale is not None:
                logits = logits * kh_scale[:, None, None, :]
            logits = logits + causal
            w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
            if vh_scale is not None:
                w = w * vh_scale[:, None, None, :].astype(w.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(batch, c, -1)
            xb = xb + mm(ctx, at["o"]["kernel"]).astype(xb.dtype)
            h = rms_norm(xb, lp["post_ln"]["scale"], cfg.rms_eps)
            gate = mm(h, lp["gate"]["kernel"])
            up = mm(h, lp["up"]["kernel"])
            xb = xb + mm(jax.nn.silu(gate) * up,
                         lp["down"]["kernel"]).astype(xb.dtype)
            return (xb, *cache), None

        (xb, *cache), _ = jax.lax.scan(
            one_layer, (xb, *cache), (layer, li_axis))
        cache = tuple(cache)
        last = xb[:, -1]

    out = rms_norm(last, params["norm"]["scale"], cfg.rms_eps)
    logits = mm(out.astype(jnp.float32), params["lm_head"])
    return logits, LlamaDecodeState(*cache)


def llama_decode_step(params: Dict[str, Any], cfg: LlamaConfig,
                      state: LlamaDecodeState, x: jnp.ndarray,
                      pos: jnp.ndarray, *,
                      rope_pos: Optional[jnp.ndarray] = None,
                      key_mask: Optional[jnp.ndarray] = None,
                      quant_kernel: bool = False,
                      attn_kernel: bool = False,
                      ) -> Tuple[jnp.ndarray, LlamaDecodeState]:
    """One incremental step: x (B, D) input embedding at cache position
    `pos` (scalar int32) -> (logits (B, vocab), updated state).

    `rope_pos` (B,) gives per-row RoPE positions when the batch was LEFT-
    padded (each row's token count differs from its cache index); `key_mask`
    (B, L) marks valid cache rows (pad prompt positions get 0). Both default
    to the dense case (rope position == cache position, all rows valid).

    `attn_kernel` routes the attention (logits -> softmax -> context) of
    every layer through the fused Pallas decode kernel
    (ops/decode_attn.py) when the geometry supports it (MHA, hd and cache
    length lane-tiled); otherwise the XLA einsum path runs."""
    hd = cfg.head_dim
    n_rep = cfg.num_heads // cfg.kv_heads
    batch = x.shape[0]
    max_len = state.k.shape[2]
    cos, sin = rope_tables(cfg, pos if rope_pos is None else rope_pos)
    if rope_pos is not None:
        cos, sin = cos[:, None, :], sin[:, None, :]  # (B, 1, hd) over heads
    half = hd // 2

    def rope1(t):  # t: (B, H, hd) at a single position
        rotated = jnp.concatenate([-t[..., half:], t[..., :half]], axis=-1)
        return t * cos + rotated * sin

    pos_ids = jnp.arange(max_len)
    mask = jnp.where(pos_ids <= pos, 0.0, NEG_INF)[None, None, :]  # (1,1,L)
    if key_mask is not None:
        mask = mask + (
            1.0 - key_mask.astype(jnp.float32))[:, None, :] * NEG_INF

    layer = params["layers"]["layer"]
    mm = lambda a, w: _mm(a, w, quant_kernel)  # noqa: E731
    quant = state.quantized
    cache0 = ((state.k, state.v, state.k_scale, state.v_scale) if quant
              else (state.k, state.v))

    use_attn_kernel = False
    bias2d = None
    if attn_kernel:
        from spn4cir_tpu.ops.decode_attn import (decode_attention,
                                                 supports_decode_attention)
        use_attn_kernel = supports_decode_attention(
            cfg.num_heads, cfg.kv_heads, hd, max_len)
        if use_attn_kernel:
            # one (B, L) additive mask carries the causal position bound
            # AND the left-padding key mask into the kernel
            bias2d = jnp.broadcast_to(
                mask[:, 0, :], (batch, max_len)).astype(jnp.float32)

    # The KV caches ride the layer scan's CARRY with a per-layer indexed
    # dynamic_update_slice — carry buffers alias in place under XLA's scan
    # lowering, where the previous xs->ys layout forced a fresh stacked ys
    # cache allocation (a full cache write) every step.
    def one_layer(carry, xs):
        x, cache = carry[0], carry[1:]
        lp, li = xs
        h = rms_norm(x, lp["input_ln"]["scale"], cfg.rms_eps)
        at = lp["attn"]
        q = mm(h, at["q"]["kernel"]).reshape(batch, cfg.num_heads, hd)
        k = mm(h, at["k"]["kernel"]).reshape(batch, cfg.kv_heads, hd)
        v = mm(h, at["v"]["kernel"])
        q = rope1(q)
        k = rope1(k)
        cache = _cache_write(cache, li, pos,
                             k.reshape(batch, 1, -1), v[:, None])
        if use_attn_kernel:
            # fused pass over the stacked cache: the layer block is picked
            # by the kernel's scalar-prefetch index map, so no per-layer
            # slice materializes in HBM
            ctx = decode_attention(
                q, cache[0], cache[1], li, bias2d,
                cache[2] if quant else None,
                cache[3] if quant else None).reshape(batch, -1)
        else:
            kh, vh, kh_scale, vh_scale = _cache_read(
                cfg, cache, li, max_len, batch, n_rep)
            logits = jnp.einsum(
                "bhd,bkhd->bhk", q, kh,
                preferred_element_type=jnp.float32) * (hd ** -0.5)
            if kh_scale is not None:
                logits = logits * kh_scale[:, None, :]
            logits = logits + mask
            w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
            if vh_scale is not None:
                w = w * vh_scale[:, None, :].astype(w.dtype)
            ctx = jnp.einsum("bhk,bkhd->bhd", w, vh).reshape(batch, -1)
        # keep the residual stream in its input dtype (bf16 weights would
        # otherwise promote x to f32 mid-scan and break the layer carry)
        x = x + mm(ctx, at["o"]["kernel"]).astype(x.dtype)
        h = rms_norm(x, lp["post_ln"]["scale"], cfg.rms_eps)
        gate = mm(h, lp["gate"]["kernel"])
        up = mm(h, lp["up"]["kernel"])
        x = x + mm(jax.nn.silu(gate) * up,
                   lp["down"]["kernel"]).astype(x.dtype)
        return (x, *cache), None

    (x, *new_cache), _ = jax.lax.scan(
        one_layer, (x, *cache0), (layer, jnp.arange(cfg.num_layers)))
    x = rms_norm(x, params["norm"]["scale"], cfg.rms_eps)
    logits = mm(x.astype(jnp.float32), params["lm_head"])
    return logits, LlamaDecodeState(*new_cache)


def llama_generate(params: Dict[str, Any], cfg: LlamaConfig,
                   inputs_embeds: jnp.ndarray, *, eos_id: int, pad_id: int,
                   max_new_tokens: int, do_sample: bool = False,
                   temperature: float = 1.0, top_p: float = 1.0,
                   top_k: int = 0, cache_dtype=jnp.float32,
                   rng: Optional[jax.Array] = None,
                   attention_mask: Optional[jnp.ndarray] = None,
                   cache_sharding=None,
                   quant_kernel: Optional[bool] = None,
                   prefill_chunk: Optional[int] = None,
                   attn_kernel: Optional[bool] = None) -> jnp.ndarray:
    """Generate continuations of an embedded prompt.

    inputs_embeds: (B, P, D) — the prompt as embeddings (image features may
    be spliced in; llava_arch.py:96-200). Returns (B, max_new_tokens) new
    token ids, `pad_id` after EOS.

    Sampling follows HF `generate` warper order (temperature -> top-k ->
    top-p), matching both the captioner's T=0.01/top_p=0.01 setup
    (zscir/captioner_llava.py:51-59) and the rewriter's do_sample/top_k=10
    (zscir/llama_generate.py:55-63). The whole prompt is consumed by the
    same `lax.scan` as the sampled tail — one compiled program per
    (B, P, max_new_tokens) geometry.

    Ragged prompt batches: pass LEFT-padded embeddings with
    `attention_mask` (B, P, 1=real). Per-row RoPE positions come from the
    mask cumsum and pad keys stay masked through prefill AND every decode
    step — each row's stream then matches what it would produce alone
    (HF left-padding semantics). Without a mask, all rows share prompt
    length P (the captioner's one-shared-prompt case).

    `quant_kernel` controls the DECODE steps only: prefill always takes the
    XLA path regardless (kernel-on prefill regressed on hardware — see the
    comment above the llama_prefill call).

    `prefill_chunk` routes the prompt through llama_prefill_chunked in
    fixed-size chunks — caps the (B, H, P, P) f32 attention-logit working
    set so large-batch long-prompt prefill fits (the B=16 rewriter
    regression, BENCHMARKS.md round 3).

    `attn_kernel` routes every DECODE step's attention through the fused
    Pallas kernel (ops/decode_attn.py) and pads the cache length to a lane
    multiple; prefill and the per-step GEMMs are untouched (they are
    already MXU/weight-bound under XLA — decode decomposition,
    BENCHMARKS.md round 4)."""
    from spn4cir_tpu.models.generation import top_k_filter, top_p_filter

    if quant_kernel is None:
        # Default OFF everywhere: the v5e decode A/B (BENCHMARKS.md round 4)
        # measured the fused int8 kernel LOSING to XLA's own int8 matmul on
        # both 7B workloads — llava captions 7.55 -> 6.78 /s (B=8), rewriter
        # 2.78 -> 2.15 prompts/s (B=1) — i.e. XLA fuses the dequant into its
        # MXU schedule and does not materialize a weight copy at decode
        # either. The kernel + --quant_kernel stay for re-evaluation on
        # other geometries. (Under tensor parallelism the kernel was always
        # off: GSPMD would all-gather the weight shards of an opaque
        # pallas_call.)
        quant_kernel = False

    if attn_kernel is None:
        attn_kernel = DECODE_ATTN_DEFAULT
    if cache_sharding is not None:
        # tensor-parallel decode: GSPMD would all-gather the cache shards of
        # an opaque pallas_call (same reason quant_kernel is TP-off)
        attn_kernel = False

    batch, prompt_len, _ = inputs_embeds.shape
    total = prompt_len + max_new_tokens
    if attn_kernel:
        # the fused decode kernel wants a lane-tiled cache length; the tail
        # rows stay masked by the position bound (and exp(-1e9) is exactly
        # 0.0 in f32, so the einsum path is bit-unchanged by the padding)
        total = -(-total // 128) * 128
    state = init_llama_state(cfg, batch, total, dtype=cache_dtype)
    if cache_sharding is not None:
        # tensor-parallel runs (parallel/tp.py:shard_llama_params): pin the
        # KV cache's head dim to the k/v projections' column shards so GSPMD
        # never materializes a replicated (L, B, S, D_kv) cache
        state = LlamaDecodeState(
            jax.lax.with_sharding_constraint(state.k, cache_sharding),
            jax.lax.with_sharding_constraint(state.v, cache_sharding),
            # int8-cache scales have no head dim to shard; leave placement
            # to GSPMD
            state.k_scale, state.v_scale)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    embed_table = params["embed_tokens"]
    if not isinstance(embed_table, QuantKernel):
        embed_table = jnp.asarray(embed_table)
    if attention_mask is not None:
        am = attention_mask.astype(jnp.int32)
        positions = jnp.clip(jnp.cumsum(am, axis=1) - 1, 0)  # (B, P)
        lengths = jnp.sum(am, axis=1)  # (B,) real token counts
        # generated positions are always valid keys; cache rows past the
        # last generated position (kernel-path padding) are never valid
        valid = jnp.concatenate(
            [am, jnp.ones((batch, max_new_tokens), jnp.int32),
             jnp.zeros((batch, total - prompt_len - max_new_tokens),
                       jnp.int32)], axis=1)
    else:
        am = positions = lengths = valid = None

    def sample_from(logits, key):
        if do_sample:
            filt = logits / jnp.maximum(temperature, 1e-6)
            if top_k:
                filt = top_k_filter(filt, top_k)
            if top_p < 1.0:
                filt = top_p_filter(filt, top_p)
            return jax.random.categorical(key, filt).astype(jnp.int32)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # prefill: the whole prompt in one MXU-shaped causal forward (cache
    # rows [0, prompt_len)), then a scan of only max_new_tokens-1 decode
    # steps — not prompt_len + max_new_tokens sequential steps.
    # The fused int8 kernel is DECODE-only: prefill's (B·P, D) GEMMs are
    # compute-bound (XLA's dequant copy amortizes over thousands of rows and
    # its MXU schedule wins — hardware A/B: kernel-on prefill regressed 7B
    # generate 3.0→3.5 ms/position and VMEM-OOM'd at (3584, 11008) row
    # blocks), while decode re-streams every weight once per token, the
    # memory-bound case the kernel exists for.
    if prefill_chunk and prefill_chunk < prompt_len:
        logits0, state = llama_prefill_chunked(
            params, cfg, state, inputs_embeds, chunk=prefill_chunk,
            positions=positions, pad_mask=am, quant_kernel=False)
    else:
        logits0, state = llama_prefill(params, cfg, state, inputs_embeds,
                                       positions=positions, pad_mask=am,
                                       quant_kernel=False)
    rng, sub = jax.random.split(rng)
    tok0 = sample_from(logits0, sub)
    out = jnp.full((batch, max_new_tokens), pad_id, jnp.int32)
    out = out.at[:, 0].set(tok0)
    finished = tok0 == eos_id

    def step(carry, i):
        out, state, last_tok, finished, rng = carry
        x = _embed_rows(embed_table, last_tok)
        logits, state = llama_decode_step(
            params, cfg, state, x, prompt_len + i - 1,
            rope_pos=None if lengths is None else lengths + i - 1,
            key_mask=valid, quant_kernel=quant_kernel,
            attn_kernel=attn_kernel)
        rng, sub = jax.random.split(rng)
        nxt = sample_from(logits, sub)
        nxt = jnp.where(finished, pad_id, nxt)
        newly_done = nxt == eos_id
        out = jax.lax.dynamic_update_slice(out, nxt[:, None], (0, i))
        return (out, state, nxt, finished | newly_done, rng), None

    init = (out, state, tok0, finished, rng)
    (out, _, _, _, _), _ = jax.lax.scan(step, init,
                                        jnp.arange(1, max_new_tokens))
    return out
