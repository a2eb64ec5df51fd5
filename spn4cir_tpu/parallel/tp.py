"""Tensor parallelism for the encoder towers (Megatron-style, GSPMD-driven).

SURVEY.md §2.7: the reference has no TP (largest model ~1.4B params,
single-GPU); the TPU-native plan is "shard ViT/Q-Former MLP + attention
heads over an ICI mesh axis — needed for EVA-ViT-g at large batch". This
module implements that the idiomatic XLA way: annotate *parameter*
shardings on a 'model' mesh axis and let the SPMD partitioner derive the
computation sharding and insert the collectives (one all-reduce after the
attention out-projection, one after the MLP down-projection per block —
the classic Megatron pattern, here produced by the compiler rather than
hand-written NCCL as in megatron/torch stacks).

Column-parallel (output dim sharded): qkv and MLP up-projection kernels +
biases. Row-parallel (input dim sharded): attention out and MLP
down-projection kernels; their biases stay replicated (added after the
all-reduce). Everything else — LayerNorms, embeddings, patch conv, heads —
is replicated. Works on any tower built from `models/layers.py` blocks
(CLIP ViT/text, BLIP ViT, EVA ViT-g): nn.scan stacks params with a leading
layer axis, which stays unsharded.

Dims that don't divide the model-axis size fall back to replicated — the
result is always correct; only the balance changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_MODEL = "model"

# Dense param names from models/layers.py blocks. Column-parallel shards the
# kernel's OUTPUT dim (and its bias); row-parallel shards the INPUT dim.
_COLUMN = {("attn", "qkv", "kernel"), ("attn", "qkv", "bias"),
           ("mlp", "fc", "kernel"), ("mlp", "fc", "bias")}
_ROW = {("attn", "out", "kernel"), ("mlp", "proj", "kernel")}

# BERT-family naming (models/med.py _BertAttention/_BertLayer, used by MED
# and the Q-Former): separate query/key/value projections + "intermediate"
# FFN-up are column-parallel; every "output" kernel — the attention
# out-projection AND the FFN down-projection — is row-parallel (input dim =
# the sharded heads / intermediate width). Matched on the 2-name tail after
# the 3-name rules above.
_COLUMN2 = {(n, p) for n in ("query", "key", "value", "intermediate",
                             "intermediate_query")  # Q-Former split FFN
            for p in ("kernel", "bias")}
_ROW2 = {("output", "kernel"), ("output_query", "kernel")}


def make_tp_mesh(data: Optional[int] = None, model: int = 1,
                 devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh. Defaults: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    return Mesh(np.asarray(devices).reshape(data, model),
                (AXIS_DATA, AXIS_MODEL))


def _spec_for(path, shape, model_size: int) -> P:
    names = tuple(getattr(k, "key", getattr(k, "name", None)) for k in path)
    tail3, tail2 = names[-3:], names[-2:]
    column = tail3 in _COLUMN or tail2 in _COLUMN2
    row = tail3 in _ROW or tail2 in _ROW2
    if column and shape[-1] % model_size == 0:
        return P(*([None] * (len(shape) - 1)), AXIS_MODEL)
    if row and len(shape) >= 2 and shape[-2] % model_size == 0:
        return P(*([None] * (len(shape) - 2)), AXIS_MODEL, None)
    return P()


def tp_param_specs(params, mesh: Mesh):
    """PartitionSpec pytree for a param tree (see module docstring).
    Non-array leaves (a TrainState's step counter, schedule scalars)
    replicate."""
    model_size = mesh.shape[AXIS_MODEL]
    return jax.tree_util.tree_map_with_path(
        lambda path, x: (_spec_for(path, x.shape, model_size)
                         if hasattr(x, "shape") and getattr(x, "ndim", 0)
                         else P()), params)


def tp_param_shardings(params, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), tp_param_specs(params, mesh),
        is_leaf=lambda x: isinstance(x, P))


def shard_params_tp(params, mesh: Mesh):
    """Place a param tree on the mesh with TP shardings."""
    return jax.tree_util.tree_map(
        lambda x, sh: jax.device_put(x, sh), params,
        tp_param_shardings(params, mesh))


def make_tp_encode(encode_fn, params, mesh: Mesh):
    """jit `encode_fn(params, images)` with TP params + data-sharded batch.

    Returns (jitted_fn, sharded_params). The batch dim must divide the
    'data' axis size. Collectives are inserted by the SPMD partitioner."""
    sharded = shard_params_tp(params, mesh)
    fn = jax.jit(
        encode_fn,
        in_shardings=(tp_param_shardings(params, mesh),
                      NamedSharding(mesh, P(AXIS_DATA))),
        out_shardings=NamedSharding(mesh, P(AXIS_DATA)),
    )
    return fn, sharded


def make_model_mesh(model: int) -> Mesh:
    """(1, model) mesh over the first `model` devices — the datagen CLIs'
    --mesh_model shape (pure TP; datagen batch stays per-process)."""
    return make_tp_mesh(data=1, model=model,
                        devices=jax.devices()[:model])


# ---------------------------------------------------------------------------
# LLaMA / LLaVA (the datagen LMs — models/llama.py raw param trees)
# ---------------------------------------------------------------------------
#
# Same Megatron inference pattern, different tree naming: attn q/k/v and MLP
# gate/up are column-parallel (heads / FFN width sharded), attn o and MLP
# down row-parallel (one psum per block, inserted by GSPMD), lm_head
# column-parallel over vocab (sampling all-gathers a (B, V) f32 row — tiny
# next to weight traffic). embed_tokens shards its HIDDEN dim: lookups are
# row gathers, so sharding rows would all-gather the table; sharding D keeps
# the gather local and saves ~230 MB/chip at 7B on 8 chips. Works on dense
# AND weight-only int8 trees (QuantKernel leaves: values shard like the
# kernel; per-output-channel scales travel with column shards, replicate on
# row shards whose scales span the unsharded output dim). At 7B every
# sharded dim (heads 32, FFN 11008, vocab 32000, D 4096) divides any
# power-of-two model axis ≤ 32; indivisible dims fall back to replicated.

_LLAMA_COLUMN = frozenset({"q", "k", "v", "gate", "up"})
_LLAMA_ROW = frozenset({"o", "down"})


def _llama_walk(node, name, n):
    from spn4cir_tpu.models.llama import QuantKernel

    def last(x):
        return (P(*([None] * (x.ndim - 1)), AXIS_MODEL)
                if x.shape[-1] % n == 0 else P())

    def row2(x):
        return (P(*([None] * (x.ndim - 2)), AXIS_MODEL, None)
                if x.ndim >= 2 and x.shape[-2] % n == 0 else P())

    def kernel_spec(w, column):
        if isinstance(w, QuantKernel):
            return (QuantKernel(last(w.values), last(w.scales)) if column
                    else QuantKernel(row2(w.values), P()))
        return last(w) if column else row2(w)

    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            if k in _LLAMA_COLUMN and isinstance(v, dict) and "kernel" in v:
                out[k] = {kk: (kernel_spec(vv, True) if kk == "kernel"
                               else P()) for kk, vv in v.items()}
            elif k in _LLAMA_ROW and isinstance(v, dict) and "kernel" in v:
                out[k] = {kk: (kernel_spec(vv, False) if kk == "kernel"
                               else P()) for kk, vv in v.items()}
            else:
                out[k] = _llama_walk(v, k, n)
        return out
    if name == "embed_tokens":
        if isinstance(node, QuantKernel):
            return QuantKernel(last(node.values), P())
        return last(node)
    if name == "lm_head":
        return kernel_spec(node, True)
    return jax.tree_util.tree_map(lambda _: P(), node)


def llama_param_specs(params, mesh: Mesh):
    """PartitionSpec tree for a LlamaLM param tree (dense or int8)."""
    return _llama_walk(params, None, mesh.shape[AXIS_MODEL])


def _specs_to_shardings(specs, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), specs,
        is_leaf=lambda x: isinstance(x, P))


def llama_param_shardings(params, mesh: Mesh):
    return _specs_to_shardings(llama_param_specs(params, mesh), mesh)


def shard_llama_params(params, mesh: Mesh):
    """Place a LlamaLM param tree on the mesh with TP shardings. At 7B the
    per-chip footprint drops to weights/N (+ replicated embeds slice): bf16
    13.4 GB fits 2×16 GB chips; decode weight reads ride N×HBM."""
    return jax.tree_util.tree_map(
        lambda x, sh: jax.device_put(x, sh), params,
        llama_param_shardings(params, mesh))


def llama_cache_sharding(cfg, mesh: Mesh):
    """NamedSharding for the (L, B, S, kv_heads*head_dim) KV cache: heads
    follow the column-parallel k/v projections. None when indivisible
    (GSPMD then picks; results stay correct)."""
    width = cfg.kv_heads * cfg.head_dim
    if width % mesh.shape[AXIS_MODEL]:
        return None
    return NamedSharding(mesh, P(None, None, None, AXIS_MODEL))


def llava_param_specs(params, mesh: Mesh):
    """Specs for a full LlavaModule tree: encoder-tower TP rules on the
    vision trunk (models/layers.py naming), replicated mm_projector, LLaMA
    rules on the language model."""
    p = params["params"]
    return {"params": {
        "vision_tower": tp_param_specs(p["vision_tower"], mesh),
        "mm_projector": jax.tree_util.tree_map(lambda _: P(),
                                               p["mm_projector"]),
        "language_model": llama_param_specs(p["language_model"], mesh),
    }}


def llava_param_shardings(params, mesh: Mesh):
    return _specs_to_shardings(llava_param_specs(params, mesh), mesh)


def shard_llava_params(params, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x, sh: jax.device_put(x, sh), params,
        llava_param_shardings(params, mesh))
