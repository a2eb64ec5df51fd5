"""Torch checkpoint -> flax params converters.

Parity target: the reference's `load_ckpt` schema family (SURVEY.md §5
checkpoint row): OpenAI CLIP `.pt` state dicts (upstream or inside
`{'state_dict': ...}` / `{'CLIP': ...}` wrappers, ref
`clip4cir/models.py:58-63`), including fp16 weights (upcast to f32).

The converter maps the torch layout onto this repo's flax layout, stacking
per-layer block weights into the nn.scan axis. torch is imported lazily
(CPU-only wheel is available; conversion is a host-side offline step).
"""

from __future__ import annotations

import os

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        x32 = x.detach().to(torch.float32).cpu()
        arr = x32.numpy()
        if x32.data_ptr() == x.data_ptr():
            # .numpy() on an fp32 CPU tensor is a VIEW of the live parameter
            # storage (and jnp.asarray zero-copies aligned host arrays), so a
            # later in-place torch opt.step() would silently mutate the
            # converted tree. Own the memory.
            arr = arr.copy()
        return arr
    # np.array (copy) for the same reason: an already-f32 numpy input would
    # pass through np.asarray as itself and alias the caller's buffer
    return np.array(x, np.float32)


def _set(tree: Dict, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = jnp.asarray(value)  # _t() guarantees owned memory


def convert_clip_state_dict(sd: Dict[str, Any], num_vision_layers: int,
                            num_text_layers: int, is_vit: bool) -> Dict:
    """OpenAI-CLIP torch state dict -> {'params': ..., ['batch_stats': ...]}."""
    p: Dict = {}
    bs: Dict = {}

    def block_stack(prefix: str, n: int, out_prefix):
        """Stack n per-layer resblock weights into the scan axis."""
        def stacked(key):
            return np.stack([_t(sd[f"{prefix}.{i}.{key}"]) for i in range(n)])

        base = out_prefix + ("blocks", "block")
        _set(p, base + ("ln_1", "ln", "scale"), stacked("ln_1.weight"))
        _set(p, base + ("ln_1", "ln", "bias"), stacked("ln_1.bias"))
        _set(p, base + ("ln_2", "ln", "scale"), stacked("ln_2.weight"))
        _set(p, base + ("ln_2", "ln", "bias"), stacked("ln_2.bias"))
        _set(p, base + ("attn", "qkv", "kernel"),
             stacked("attn.in_proj_weight").transpose(0, 2, 1))
        _set(p, base + ("attn", "qkv", "bias"), stacked("attn.in_proj_bias"))
        _set(p, base + ("attn", "out", "kernel"),
             stacked("attn.out_proj.weight").transpose(0, 2, 1))
        _set(p, base + ("attn", "out", "bias"), stacked("attn.out_proj.bias"))
        _set(p, base + ("mlp", "fc", "kernel"),
             stacked("mlp.c_fc.weight").transpose(0, 2, 1))
        _set(p, base + ("mlp", "fc", "bias"), stacked("mlp.c_fc.bias"))
        _set(p, base + ("mlp", "proj", "kernel"),
             stacked("mlp.c_proj.weight").transpose(0, 2, 1))
        _set(p, base + ("mlp", "proj", "bias"), stacked("mlp.c_proj.bias"))

    if is_vit:
        _set(p, ("visual", "patch_embed", "kernel"),
             _t(sd["visual.conv1.weight"]).transpose(2, 3, 1, 0))
        _set(p, ("visual", "class_embedding"), _t(sd["visual.class_embedding"]))
        _set(p, ("visual", "positional_embedding"),
             _t(sd["visual.positional_embedding"]))
        _set(p, ("visual", "ln_pre", "ln", "scale"), _t(sd["visual.ln_pre.weight"]))
        _set(p, ("visual", "ln_pre", "ln", "bias"), _t(sd["visual.ln_pre.bias"]))
        block_stack("visual.transformer.resblocks", num_vision_layers,
                    ("visual", "transformer"))
        _set(p, ("visual", "ln_post", "ln", "scale"), _t(sd["visual.ln_post.weight"]))
        _set(p, ("visual", "ln_post", "ln", "bias"), _t(sd["visual.ln_post.bias"]))
        _set(p, ("visual", "proj"), _t(sd["visual.proj"]))
    else:
        _convert_modified_resnet(sd, p, bs)

    _set(p, ("text", "token_embedding"), _t(sd["token_embedding.weight"]))
    _set(p, ("text", "positional_embedding"), _t(sd["positional_embedding"]))
    block_stack("transformer.resblocks", num_text_layers, ("text", "transformer"))
    _set(p, ("text", "ln_final", "ln", "scale"), _t(sd["ln_final.weight"]))
    _set(p, ("text", "ln_final", "ln", "bias"), _t(sd["ln_final.bias"]))
    _set(p, ("text", "text_projection"), _t(sd["text_projection"]))
    _set(p, ("logit_scale",), _t(sd["logit_scale"]))

    out = {"params": p}
    if bs:
        out["batch_stats"] = bs
    return out


def _convert_modified_resnet(sd: Dict[str, Any], p: Dict, bs: Dict):
    """ModifiedResNet (RN50x4) tower (ref clip/model.py:94-154)."""
    def conv(torch_key, flax_path):
        _set(p, flax_path + ("kernel",), _t(sd[torch_key]).transpose(2, 3, 1, 0))

    def bn(torch_prefix, flax_prefix):
        _set(p, flax_prefix + ("bn", "scale"), _t(sd[torch_prefix + ".weight"]))
        _set(p, flax_prefix + ("bn", "bias"), _t(sd[torch_prefix + ".bias"]))
        _set(bs, flax_prefix + ("bn", "mean"), _t(sd[torch_prefix + ".running_mean"]))
        _set(bs, flax_prefix + ("bn", "var"), _t(sd[torch_prefix + ".running_var"]))

    for i in (1, 2, 3):
        conv(f"visual.conv{i}.weight", ("visual", f"conv{i}"))
        bn(f"visual.bn{i}", ("visual", f"bn{i}"))

    # residual stages: visual.layer{s}.{b}.*
    stages: Dict[int, int] = {}
    for key in sd:
        if key.startswith("visual.layer"):
            s = int(key.split(".")[1][len("layer"):])
            b = int(key.split(".")[2])
            stages[s] = max(stages.get(s, 0), b + 1)
    for s in sorted(stages):
        for b in range(stages[s]):
            tp = f"visual.layer{s}.{b}"
            fp = ("visual", f"layer{s}_{b}")
            for j in (1, 2, 3):
                conv(f"{tp}.conv{j}.weight", fp + (f"conv{j}",))
                bn(f"{tp}.bn{j}", fp + (f"bn{j}",))
            if f"{tp}.downsample.0.weight" in sd:
                conv(f"{tp}.downsample.0.weight", fp + ("downsample_conv",))
                bn(f"{tp}.downsample.1", fp + ("downsample_bn",))

    ap = "visual.attnpool"
    _set(p, ("visual", "attnpool", "positional_embedding"),
         _t(sd[f"{ap}.positional_embedding"]))
    for name in ("q_proj", "k_proj", "v_proj", "c_proj"):
        _set(p, ("visual", "attnpool", name, "kernel"),
             _t(sd[f"{ap}.{name}.weight"]).T)
        _set(p, ("visual", "attnpool", name, "bias"), _t(sd[f"{ap}.{name}.bias"]))


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a torch checkpoint file and unwrap the common containers
    ({'model': sd} — BLIP upstream; {'state_dict': sd} — SPN saves;
    {'CLIP': ...} etc. are handled by the model-specific converters)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        return obj.state_dict()
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        return obj["model"]
    if isinstance(obj, dict) and "state_dict" in obj:
        return obj["state_dict"]
    return obj


def load_torch_checkpoint(path: str, backbone, params_template):
    """Load a reference .pt/.pth checkpoint into backbone params.

    Handles the reference schema branches (clip4cir/models.py:58-63):
    raw OpenAI state dict, {'CLIP': sd}, {'state_dict': sd}, or a jit
    archive. Currently implemented for the CLIP backbone family."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    elif isinstance(obj, dict) and "state_dict" in obj:
        sd = obj["state_dict"]
    elif isinstance(obj, dict) and "CLIP" in obj:
        sd = obj["CLIP"]
    else:
        sd = obj
    # strip common wrappers
    sd = { (k[len("clip."):] if k.startswith("clip.") else k): v
           for k, v in sd.items() }

    cfg = backbone.cfg
    converted = convert_clip_state_dict(
        sd,
        num_vision_layers=(cfg.vision_layers if isinstance(cfg.vision_layers, int)
                           else 0),
        num_text_layers=cfg.transformer_layers,
        is_vit=cfg.is_vit,
    )
    _check_tree_matches(params_template, converted)
    return converted


def _check_tree_matches(template, converted):
    import jax

    t_flat = jax.tree_util.tree_leaves_with_path(template)
    c_flat = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(converted)}
    missing = []
    for key, leaf in t_flat:
        ks = jax.tree_util.keystr(key)
        if ks not in c_flat:
            missing.append(ks)
        elif tuple(c_flat[ks].shape) != tuple(leaf.shape):
            raise ValueError(f"shape mismatch at {ks}: "
                             f"{c_flat[ks].shape} vs {leaf.shape}")
    if missing:
        raise ValueError(f"converted checkpoint is missing params: {missing[:8]}"
                         f" (+{max(0, len(missing) - 8)} more)")


# ---------------------------------------------------------------------------
# MED BERT (blip4cir text encoder)
# ---------------------------------------------------------------------------

def _bert_attention(sd, prefix: str, n: int, qualifier: str) -> Dict:
    """Stack HF-BERT attention weights for n layers into our _BertAttention
    layout. qualifier: 'attention' (self) or 'crossattention'."""
    def stacked(key, transpose=False):
        arrs = [_t(sd[f"{prefix}.{i}.{qualifier}.{key}"]) for i in range(n)]
        out = np.stack(arrs)
        return out.transpose(0, 2, 1) if transpose else out

    return {
        "query": {"kernel": stacked("self.query.weight", True),
                  "bias": stacked("self.query.bias")},
        "key": {"kernel": stacked("self.key.weight", True),
                "bias": stacked("self.key.bias")},
        "value": {"kernel": stacked("self.value.weight", True),
                  "bias": stacked("self.value.bias")},
        "output": {"kernel": stacked("output.dense.weight", True),
                   "bias": stacked("output.dense.bias")},
        "ln": {"scale": stacked("output.LayerNorm.weight"),
               "bias": stacked("output.LayerNorm.bias")},
    }


def convert_med_state_dict(sd: Dict[str, Any], num_layers: int,
                           prefix: str = "text_encoder",
                           with_cross: bool = True) -> Dict:
    """HF/MED BertModel state dict -> MedBert params subtree (stacked scan).

    Parity: blip4cir/med.py BertModel layout — embeddings + per-layer
    attention / crossattention / intermediate / output. `with_cross=False`
    converts a plain HF BERT (no crossattention keys — e.g. the BGE text
    encoder, zscir/srm_utils.py:44-46); standard-BERT token_type embeddings
    are mapped when present."""
    emb = f"{prefix}.embeddings" if prefix else "embeddings"
    layer = f"{prefix}.encoder.layer" if prefix else "encoder.layer"

    def stacked(key, transpose=False):
        arrs = [_t(sd[f"{layer}.{i}.{key}"]) for i in range(num_layers)]
        out = np.stack(arrs)
        return out.transpose(0, 2, 1) if transpose else out

    layer_tree: Dict = {
        "self_attn": _bert_attention(sd, layer, num_layers, "attention"),
        "intermediate": {"kernel": stacked("intermediate.dense.weight", True),
                         "bias": stacked("intermediate.dense.bias")},
        "output": {"kernel": stacked("output.dense.weight", True),
                   "bias": stacked("output.dense.bias")},
        "ln": {"scale": stacked("output.LayerNorm.weight"),
               "bias": stacked("output.LayerNorm.bias")},
    }
    if with_cross:
        layer_tree["cross_attn"] = _bert_attention(sd, layer, num_layers,
                                                   "crossattention")
    p: Dict = {
        "word_embeddings": _t(sd[f"{emb}.word_embeddings.weight"]),
        "position_embeddings": _t(sd[f"{emb}.position_embeddings.weight"]),
        "embeddings_ln": {"scale": _t(sd[f"{emb}.LayerNorm.weight"]),
                          "bias": _t(sd[f"{emb}.LayerNorm.bias"])},
        "layers": {"layer": layer_tree},
    }
    if f"{emb}.token_type_embeddings.weight" in sd:
        p["token_type_embeddings"] = _t(sd[f"{emb}.token_type_embeddings.weight"])
    return p


def convert_bge_state_dict(sd: Dict[str, Any], num_layers: int = 12) -> Dict:
    """BAAI/bge-base-en (a standard HF BertModel save) -> MedBert params.
    The pooler head is unused (SRM takes the raw CLS hidden state,
    zscir/srm_utils.py:66-68)."""
    sd = {k[len("bert."):] if k.startswith("bert.") else k: v
          for k, v in sd.items()}
    return {"params": convert_med_state_dict(sd, num_layers, prefix="",
                                             with_cross=False)}


def interpolate_pos_embed(pos: np.ndarray, target_num_tokens: int,
                          num_prefix: int = 1) -> np.ndarray:
    """Bicubic pos-embed grid interpolation for mismatched resolutions,
    exactly the reference's interpolate_pos_embed (blip4cir/vit.py:284-308 /
    blip.py:232-236): prefix (CLS/dist) tokens unchanged, grid tokens
    resampled with torch bicubic align_corners=False. pos: (T, D) or
    (1, T, D); returns (target_num_tokens, D)."""
    import torch
    import torch.nn.functional as Fn

    pos = np.asarray(pos)
    if pos.ndim == 3:
        pos = pos[0]
    if pos.shape[0] == target_num_tokens:
        return pos
    dim = pos.shape[-1]
    orig = int(round((pos.shape[0] - num_prefix) ** 0.5))
    new = int(round((target_num_tokens - num_prefix) ** 0.5))
    assert orig * orig == pos.shape[0] - num_prefix, pos.shape
    assert new * new == target_num_tokens - num_prefix, target_num_tokens
    extra = pos[:num_prefix]
    grid = torch.tensor(pos[num_prefix:].reshape(1, orig, orig, dim)
                        ).permute(0, 3, 1, 2)
    grid = Fn.interpolate(grid, size=(new, new), mode="bicubic",
                          align_corners=False)
    grid = grid.permute(0, 2, 3, 1).reshape(new * new, dim).numpy()
    return np.concatenate([extra, grid], axis=0)


def convert_blip_vit_state_dict(sd: Dict[str, Any], num_layers: int,
                                prefix: str = "visual_encoder",
                                num_tokens: Optional[int] = None) -> Dict:
    """timm-style BLIP ViT -> BlipViT params subtree. `num_tokens` (the
    target model's 1+grid² token count) triggers bicubic pos-embed
    interpolation on resolution mismatch (ref blip4cir/blip.py:232-236)."""
    def stacked(key, transpose=False):
        arrs = [_t(sd[f"{prefix}.blocks.{i}.{key}"]) for i in range(num_layers)]
        out = np.stack(arrs)
        return out.transpose(0, 2, 1) if transpose else out

    pos = _t(sd[f"{prefix}.pos_embed"])[0]
    if num_tokens is not None:
        pos = interpolate_pos_embed(pos, num_tokens, num_prefix=1)
    return {
        "cls_token": _t(sd[f"{prefix}.cls_token"]),
        "pos_embed": pos,
        "patch_embed": {
            "kernel": _t(sd[f"{prefix}.patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{prefix}.patch_embed.proj.bias"]),
        },
        "blocks": {"blocks": {"block": {
            "ln_1": {"ln": {"scale": stacked("norm1.weight"),
                            "bias": stacked("norm1.bias")}},
            "ln_2": {"ln": {"scale": stacked("norm2.weight"),
                            "bias": stacked("norm2.bias")}},
            "attn": {
                "qkv": {"kernel": stacked("attn.qkv.weight", True),
                        "bias": stacked("attn.qkv.bias")},
                "out": {"kernel": stacked("attn.proj.weight", True),
                        "bias": stacked("attn.proj.bias")},
            },
            "mlp": {
                "fc": {"kernel": stacked("mlp.fc1.weight", True),
                       "bias": stacked("mlp.fc1.bias")},
                "proj": {"kernel": stacked("mlp.fc2.weight", True),
                         "bias": stacked("mlp.fc2.bias")},
            },
        }}},
        "norm": {"ln": {"scale": _t(sd[f"{prefix}.norm.weight"]),
                        "bias": _t(sd[f"{prefix}.norm.bias"])}},
    }


def convert_med_lm_state_dict(sd: Dict[str, Any], num_layers: int,
                              prefix: str = "text_decoder") -> Dict:
    """HF/MED BertLMHeadModel state dict -> MedLMModel params (bert trunk +
    cls.predictions LM head, ref blip4cir/med.py:520-553). The head's
    decoder weight/bias exist explicitly in BLIP checkpoints (tied or not),
    so they are mapped directly."""
    cls = f"{prefix}.cls.predictions"
    return {
        "bert": convert_med_state_dict(sd, num_layers, prefix=f"{prefix}.bert"),
        "lm_head": {
            "transform": {"kernel": _t(sd[f"{cls}.transform.dense.weight"]).T,
                          "bias": _t(sd[f"{cls}.transform.dense.bias"])},
            "transform_ln": {"scale": _t(sd[f"{cls}.transform.LayerNorm.weight"]),
                             "bias": _t(sd[f"{cls}.transform.LayerNorm.bias"])},
            "decoder": {"kernel": _t(sd[f"{cls}.decoder.weight"]).T,
                        "bias": _t(sd[f"{cls}.bias"])},
        },
    }


def convert_blip_caption(sd: Dict[str, Any], num_vit_layers: int = 12,
                         num_text_layers: int = 12,
                         num_tokens: Optional[int] = None) -> Dict:
    """BLIP captioner checkpoint (LAVIS blip_caption / upstream blip_decoder
    schema: visual_encoder.* + text_decoder.bert.* + text_decoder.cls.*) ->
    BlipCaptionModule params. `num_tokens` interpolates the pos-embed grid
    on resolution mismatch (ref blip.py:232-236)."""
    return {"params": {
        "visual_encoder": convert_blip_vit_state_dict(
            sd, num_vit_layers, num_tokens=num_tokens),
        "text_decoder": convert_med_lm_state_dict(sd, num_text_layers),
    }}


def convert_blip_retrieval(sd: Dict[str, Any], num_vit_layers: int = 12,
                           num_text_layers: int = 12,
                           tau: float = 0.03,
                           num_tokens: Optional[int] = None) -> Dict:
    """BLIP_Retrieval (ref blip4cir/blip_cir.py) -> BlipCirModule params.
    Accepts either bare keys or the CIRPlus 'blip.'-prefixed wrapper.
    `num_tokens` interpolates the pos-embed grid on resolution mismatch."""
    if any(k.startswith("blip.") for k in sd):
        sd = {k[len("blip."):]: v for k, v in sd.items() if k.startswith("blip.")}
    p = {
        "visual_encoder": convert_blip_vit_state_dict(
            sd, num_vit_layers, num_tokens=num_tokens),
        "text_encoder": convert_med_state_dict(sd, num_text_layers),
        "vision_proj": {"kernel": _t(sd["vision_proj.weight"]).T,
                        "bias": _t(sd["vision_proj.bias"])},
        "text_proj": {"kernel": _t(sd["text_proj.weight"]).T,
                      "bias": _t(sd["text_proj.bias"])},
        "tau": _t(sd["tau"]) if "tau" in sd else np.float32(tau),
    }
    return {"params": p}


# ---------------------------------------------------------------------------
# Unicom ViT (SRM matcher image encoder, zscir/unicom)
# ---------------------------------------------------------------------------

def convert_unicom_state_dict(sd: Dict[str, Any], num_layers: int) -> Dict:
    """DeepGlint Unicom VisionTransformer state dict -> UnicomViT params.

    Layout per zscir/unicom/vision_transformer.py: patch_embed.proj conv,
    pos_embed (1, P, D), blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc*},
    final norm, and the `feature` Sequential (Linear/BN/Linear/BN). Accepts
    raw or 'module.'-prefixed keys (the published ckpts are DDP saves,
    zscir/unicom/model.py:32-42)."""
    sd = {(k.split("module.")[-1] if "module." in k else k): v
          for k, v in sd.items()}

    def stacked(key, transpose=False):
        arrs = [_t(sd[f"blocks.{i}.{key}"]) for i in range(num_layers)]
        out = np.stack(arrs)
        return out.transpose(0, 2, 1) if transpose else out

    def bn(idx):
        return {"scale": _t(sd[f"feature.{idx}.weight"]),
                "bias": _t(sd[f"feature.{idx}.bias"]),
                "mean": _t(sd[f"feature.{idx}.running_mean"]),
                "var": _t(sd[f"feature.{idx}.running_var"])}

    return {"params": {
        "patch_embed": {
            "kernel": _t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd["patch_embed.proj.bias"])},
        "pos_embed": _t(sd["pos_embed"])[0],
        "blocks": {"block": {
            "norm1": {"scale": stacked("norm1.weight"),
                      "bias": stacked("norm1.bias")},
            "qkv": {"kernel": stacked("attn.qkv.weight", True)},
            "proj": {"kernel": stacked("attn.proj.weight", True),
                     "bias": stacked("attn.proj.bias")},
            "norm2": {"scale": stacked("norm2.weight"),
                      "bias": stacked("norm2.bias")},
            "fc1": {"kernel": stacked("mlp.fc1.weight", True),
                    "bias": stacked("mlp.fc1.bias")},
            "fc2": {"kernel": stacked("mlp.fc2.weight", True),
                    "bias": stacked("mlp.fc2.bias")},
        }},
        "norm": {"scale": _t(sd["norm.weight"]), "bias": _t(sd["norm.bias"])},
        "feature_fc1": {"kernel": _t(sd["feature.0.weight"]).T},
        "feature_bn1": bn(1),
        "feature_fc2": {"kernel": _t(sd["feature.2.weight"]).T},
        "feature_bn2": bn(3),
    }}


# ---------------------------------------------------------------------------
# Q-Former / EVA ViT-g (blip24cir)
# ---------------------------------------------------------------------------

def convert_eva_vit_state_dict(sd: Dict[str, Any], num_layers: int,
                               prefix: str = "visual_encoder",
                               num_tokens: Optional[int] = None) -> Dict:
    """EVA ViT-g -> EvaViT params. EVA attention has separate q_bias/v_bias
    with an implicit zero k bias (ref eva_vit.py); fused here as
    [q_bias; zeros; v_bias]. `num_tokens` triggers bicubic pos-embed
    interpolation on resolution mismatch (the LAVIS loader does the same
    via interpolate_pos_embed)."""
    def per_layer(i, key):
        return _t(sd[f"{prefix}.blocks.{i}.{key}"])

    qkv_kernels, qkv_biases = [], []
    for i in range(num_layers):
        w = per_layer(i, "attn.qkv.weight")  # (3D, D)
        d = w.shape[1]
        if f"{prefix}.blocks.{i}.attn.qkv.bias" in sd:
            b = per_layer(i, "attn.qkv.bias")
        else:
            qb = per_layer(i, "attn.q_bias")
            vb = per_layer(i, "attn.v_bias")
            b = np.concatenate([qb, np.zeros_like(qb), vb])
        qkv_kernels.append(w.T)
        qkv_biases.append(b)

    def stacked(key, transpose=False):
        arrs = [per_layer(i, key) for i in range(num_layers)]
        out = np.stack(arrs)
        return out.transpose(0, 2, 1) if transpose else out

    return {
        "cls_token": _t(sd[f"{prefix}.cls_token"]),
        "pos_embed": (interpolate_pos_embed(_t(sd[f"{prefix}.pos_embed"])[0],
                                             num_tokens)
                      if num_tokens is not None
                      else _t(sd[f"{prefix}.pos_embed"])[0]),
        "patch_embed": {
            "kernel": _t(sd[f"{prefix}.patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{prefix}.patch_embed.proj.bias"]),
        },
        "blocks": {"blocks": {"block": {
            "ln_1": {"ln": {"scale": stacked("norm1.weight"),
                            "bias": stacked("norm1.bias")}},
            "ln_2": {"ln": {"scale": stacked("norm2.weight"),
                            "bias": stacked("norm2.bias")}},
            "attn": {
                "qkv": {"kernel": np.stack(qkv_kernels),
                        "bias": np.stack(qkv_biases)},
                "out": {"kernel": stacked("attn.proj.weight", True),
                        "bias": stacked("attn.proj.bias")},
            },
            "mlp": {
                "fc": {"kernel": stacked("mlp.fc1.weight", True),
                       "bias": stacked("mlp.fc1.bias")},
                "proj": {"kernel": stacked("mlp.fc2.weight", True),
                         "bias": stacked("mlp.fc2.bias")},
            },
        }}},
    }


def _qformer_layer(sd, prefix: str, layer_ids, with_cross: bool) -> Dict:
    """One scan slice of Q-Former layers (the cross or plain member of each
    pair), stacked over `layer_ids`."""
    def stacked(key, transpose=False):
        arrs = [_t(sd[f"{prefix}.{i}.{key}"]) for i in layer_ids]
        out = np.stack(arrs)
        return out.transpose(0, 2, 1) if transpose else out

    def attn(qualifier):
        return {
            "query": {"kernel": stacked(f"{qualifier}.self.query.weight", True),
                      "bias": stacked(f"{qualifier}.self.query.bias")},
            "key": {"kernel": stacked(f"{qualifier}.self.key.weight", True),
                    "bias": stacked(f"{qualifier}.self.key.bias")},
            "value": {"kernel": stacked(f"{qualifier}.self.value.weight", True),
                      "bias": stacked(f"{qualifier}.self.value.bias")},
            "output": {"kernel": stacked(f"{qualifier}.output.dense.weight", True),
                       "bias": stacked(f"{qualifier}.output.dense.bias")},
            "ln": {"scale": stacked(f"{qualifier}.output.LayerNorm.weight"),
                   "bias": stacked(f"{qualifier}.output.LayerNorm.bias")},
        }

    out = {
        "self_attn": attn("attention"),
        "ffn": {
            "intermediate_query": {
                "kernel": stacked("intermediate_query.dense.weight", True),
                "bias": stacked("intermediate_query.dense.bias")},
            "output_query": {
                "kernel": stacked("output_query.dense.weight", True),
                "bias": stacked("output_query.dense.bias")},
            "ln_query": {"scale": stacked("output_query.LayerNorm.weight"),
                         "bias": stacked("output_query.LayerNorm.bias")},
            "intermediate": {
                "kernel": stacked("intermediate.dense.weight", True),
                "bias": stacked("intermediate.dense.bias")},
            "output": {"kernel": stacked("output.dense.weight", True),
                       "bias": stacked("output.dense.bias")},
            "ln": {"scale": stacked("output.LayerNorm.weight"),
                   "bias": stacked("output.LayerNorm.bias")},
        },
    }
    if with_cross:
        out["cross_attn"] = attn("crossattention")
    return out


def convert_qformer_state_dict(sd: Dict[str, Any], num_layers: int,
                               prefix: str = "Qformer.bert") -> Dict:
    """LAVIS Q-Former BertModel -> QFormer params (pair-scan layout:
    even layers -> cross_layer, odd -> plain_layer)."""
    emb = f"{prefix}.embeddings"
    layer = f"{prefix}.encoder.layer"
    cross_ids = list(range(0, num_layers, 2))
    plain_ids = list(range(1, num_layers, 2))
    return {
        "word_embeddings": _t(sd[f"{emb}.word_embeddings.weight"]),
        "position_embeddings": _t(sd[f"{emb}.position_embeddings.weight"]),
        "embeddings_ln": {"scale": _t(sd[f"{emb}.LayerNorm.weight"]),
                          "bias": _t(sd[f"{emb}.LayerNorm.bias"])},
        "pairs": {
            "cross_layer": _qformer_layer(sd, layer, cross_ids, True),
            "plain_layer": _qformer_layer(sd, layer, plain_ids, False),
        },
    }


def convert_blip2_cir(sd: Dict[str, Any], num_vit_layers: int = 39,
                      num_q_layers: int = 12, tau: float = 0.05,
                      num_tokens: Optional[int] = None) -> Dict:
    """Blip2QformerCirAlignPrompt state dict -> Blip2CirModule params.
    Missing stage-2 copies (Qformer_query / text_proj_q) are filled from
    their stage-1 sources (quirk SURVEY.md §8.11's double-load collapses to
    one copy). `num_tokens` interpolates the EVA pos-embed grid on
    resolution mismatch."""
    if any(k.startswith("blip_model.") for k in sd):
        sd = {k[len("blip_model."):]: v for k, v in sd.items()
              if k.startswith("blip_model.")}
    qformer = convert_qformer_state_dict(sd, num_q_layers, "Qformer.bert")
    has_q = any(k.startswith("Qformer_query.") for k in sd)
    qformer_query = (convert_qformer_state_dict(sd, num_q_layers,
                                                "Qformer_query.bert")
                     if has_q else jax.tree_util.tree_map(np.copy, qformer))
    # the trainable copy only runs the text re-read (no cross-attention), so
    # its cross-attn params are never materialized in the flax module
    qformer_query["pairs"]["cross_layer"].pop("cross_attn", None)
    text_proj = {"kernel": _t(sd["text_proj.weight"]).T,
                 "bias": _t(sd["text_proj.bias"])}
    text_proj_q = ({"kernel": _t(sd["text_proj_q.weight"]).T,
                    "bias": _t(sd["text_proj_q.bias"])}
                   if "text_proj_q.weight" in sd
                   else jax.tree_util.tree_map(np.copy, text_proj))
    p = {
        "visual_encoder": convert_eva_vit_state_dict(sd, num_vit_layers, num_tokens=num_tokens),
        "ln_vision": {"ln": {"scale": _t(sd["ln_vision.weight"]),
                             "bias": _t(sd["ln_vision.bias"])}},
        "qformer": qformer,
        "qformer_query": qformer_query,
        "vision_proj": {"kernel": _t(sd["vision_proj.weight"]).T,
                        "bias": _t(sd["vision_proj.bias"])},
        "text_proj": text_proj,
        "text_proj_q": text_proj_q,
        "query_tokens": _t(sd["query_tokens"]),
        "prompt_tokens": _t(sd["prompt_tokens"]) if "prompt_tokens" in sd
                         else np.zeros_like(_t(sd["query_tokens"])),
        "tau": _t(sd["temp"]) if "temp" in sd else np.float32(tau),
    }
    return {"params": p}


# ---------------------------------------------------------------------------
# TG-CIR (full CIRPlus checkpoint)
# ---------------------------------------------------------------------------

def _tokenlearner_from_torch(sd: Dict[str, Any], prefix: str, num_tokens: int
                             ) -> Dict:
    """Reference TokenLearner = S separate SpatialAttention conv1d(dim->1)
    modules (tgcir/models.py:21-49); ours is one Dense(D->S). Stack each
    conv's weights into the corresponding Dense column."""
    kernels, biases = [], []
    for i in range(num_tokens):
        w = _t(sd[f"{prefix}.tokenizers.{i}.conv.0.weight"])  # (1, D, 1)
        b = _t(sd[f"{prefix}.tokenizers.{i}.conv.0.bias"])    # (1,)
        kernels.append(w.reshape(-1))
        biases.append(b.reshape(()))
    return {"attn": {"kernel": np.stack(kernels, axis=1),
                     "bias": np.stack(biases)}}


def _gate_mlp_from_torch(sd: Dict[str, Any], prefix: str) -> Dict:
    """s_remain_map Sequential(Linear, ReLU, Linear, Sigmoid)
    (tgcir/models.py:165-170) -> GateMLP fc1/fc2."""
    return {
        "fc1": {"kernel": _t(sd[f"{prefix}.0.weight"]).T,
                "bias": _t(sd[f"{prefix}.0.bias"])},
        "fc2": {"kernel": _t(sd[f"{prefix}.2.weight"]).T,
                "bias": _t(sd[f"{prefix}.2.bias"])},
    }


def convert_tgcir_state_dict(sd: Dict[str, Any], num_vision_layers: int,
                             num_text_layers: int,
                             local_tokens: int = 8) -> Dict:
    """TG-CIR CIRPlus state dict -> TGCIRModule params.

    Handles the reference's aliased submodules (backbone.image_backbone is
    the same tensors as backbone.clip.visual) and drops params our module
    does not use (t_remain_map / t_replace_map / local_weight are created
    but never exercised by the trained path, SURVEY.md §2.3)."""
    if any(k.startswith("state_dict.") for k in sd):
        sd = {k[len("state_dict."):]: v for k, v in sd.items()}
    bb = "backbone"
    clip_sd = {k[len(f"{bb}.clip."):]: v for k, v in sd.items()
               if k.startswith(f"{bb}.clip.")}
    clip_params = convert_clip_state_dict(
        clip_sd, num_vision_layers, num_text_layers, is_vit=True)
    p: Dict = {
        "clip": clip_params["params"],
        "fc": {"kernel": _t(sd[f"{bb}.fc.weight"]).T,
               "bias": _t(sd[f"{bb}.fc.bias"])},
        "text_fc": {"kernel": _t(sd[f"{bb}.text_fc.weight"]).T,
                    "bias": _t(sd[f"{bb}.text_fc.bias"])},
        "tokenlearn": _tokenlearner_from_torch(sd, f"{bb}.tokenlearn",
                                               local_tokens),
        "tokenlearn_text": _tokenlearner_from_torch(sd, f"{bb}.tokenlearn_text",
                                                    local_tokens),
        "masks": {"masks": _t(sd[f"{bb}.masks.weight"])},
        "masks_text": {"masks": _t(sd[f"{bb}.masks_text.weight"])},
        "s_remain": _gate_mlp_from_torch(sd, "s_remain_map"),
    }
    return {"params": p}


# ---------------------------------------------------------------------------
# LLaMA / LLaVA (zscir captioner + rewriter LMs)
# ---------------------------------------------------------------------------

def convert_llama_state_dict(sd: Dict[str, Any], num_layers: int,
                             prefix: str = "model.") -> Dict:
    """HF LlamaForCausalLM state dict -> LlamaLM params.

    Layout per HF modeling_llama (the LM inside the vendored LLaVA,
    zscir/llava/model/language_model/llava_llama.py:34-46, and the rewriter
    LM zscir/llama_generate.py:29-33): model.embed_tokens.weight,
    model.layers.{i}.self_attn.{q,k,v,o}_proj.weight,
    model.layers.{i}.{input,post_attention}_layernorm.weight,
    model.layers.{i}.mlp.{gate,up,down}_proj.weight, model.norm.weight,
    lm_head.weight. All Linears are bias-free; weights transpose to
    kernels. `prefix` strips the enclosing module path ("model." for a bare
    LlamaForCausalLM)."""

    def stacked(key, transpose=True):
        arrs = [_t(sd[f"{prefix}layers.{i}.{key}"]) for i in range(num_layers)]
        out = np.stack(arrs)
        return out.transpose(0, 2, 1) if transpose else out

    return {"params": {
        "embed_tokens": _t(sd[f"{prefix}embed_tokens.weight"]),
        "layers": {"layer": {
            "input_ln": {"scale": stacked("input_layernorm.weight", False)},
            "attn": {
                "q": {"kernel": stacked("self_attn.q_proj.weight")},
                "k": {"kernel": stacked("self_attn.k_proj.weight")},
                "v": {"kernel": stacked("self_attn.v_proj.weight")},
                "o": {"kernel": stacked("self_attn.o_proj.weight")},
            },
            "post_ln": {
                "scale": stacked("post_attention_layernorm.weight", False)},
            "gate": {"kernel": stacked("mlp.gate_proj.weight")},
            "up": {"kernel": stacked("mlp.up_proj.weight")},
            "down": {"kernel": stacked("mlp.down_proj.weight")},
        }},
        "norm": {"scale": _t(sd[f"{prefix}norm.weight"])},
        "lm_head": _t(sd["lm_head.weight"]).T,
    }}


def convert_hf_clip_vision(sd: Dict[str, Any], num_layers: int,
                           prefix: str = "vision_model.") -> Dict:
    """HF CLIPVisionModel state dict -> LlavaVisionTower params.

    Only the first `num_layers` encoder blocks are converted — the LLaVA
    feature tap (clip_encoder.py:29-37, hidden_states[-2]) never runs the
    final block or post_layernorm, so the tower omits them entirely. HF's
    separate q/k/v projections fuse into the qkv Dense our
    MultiHeadAttention uses."""
    p: Dict = {}

    def stacked(key, transpose=False):
        arrs = [_t(sd[f"{prefix}encoder.layers.{i}.{key}"])
                for i in range(num_layers)]
        out = np.stack(arrs)
        return out.transpose(0, 2, 1) if transpose else out

    emb = prefix + "embeddings."
    _set(p, ("patch_embed", "kernel"),
         _t(sd[emb + "patch_embedding.weight"]).transpose(2, 3, 1, 0))
    _set(p, ("class_embedding",), _t(sd[emb + "class_embedding"]))
    _set(p, ("positional_embedding",),
         _t(sd[emb + "position_embedding.weight"]))
    _set(p, ("ln_pre", "ln", "scale"), _t(sd[prefix + "pre_layrnorm.weight"]))
    _set(p, ("ln_pre", "ln", "bias"), _t(sd[prefix + "pre_layrnorm.bias"]))
    base = ("transformer", "blocks", "block")
    _set(p, base + ("ln_1", "ln", "scale"), stacked("layer_norm1.weight"))
    _set(p, base + ("ln_1", "ln", "bias"), stacked("layer_norm1.bias"))
    _set(p, base + ("ln_2", "ln", "scale"), stacked("layer_norm2.weight"))
    _set(p, base + ("ln_2", "ln", "bias"), stacked("layer_norm2.bias"))
    qkv_w = np.concatenate([stacked("self_attn.q_proj.weight", True),
                            stacked("self_attn.k_proj.weight", True),
                            stacked("self_attn.v_proj.weight", True)], axis=2)
    qkv_b = np.concatenate([stacked("self_attn.q_proj.bias"),
                            stacked("self_attn.k_proj.bias"),
                            stacked("self_attn.v_proj.bias")], axis=1)
    _set(p, base + ("attn", "qkv", "kernel"), qkv_w)
    _set(p, base + ("attn", "qkv", "bias"), qkv_b)
    _set(p, base + ("attn", "out", "kernel"),
         stacked("self_attn.out_proj.weight", True))
    _set(p, base + ("attn", "out", "bias"), stacked("self_attn.out_proj.bias"))
    _set(p, base + ("mlp", "fc", "kernel"), stacked("mlp.fc1.weight", True))
    _set(p, base + ("mlp", "fc", "bias"), stacked("mlp.fc1.bias"))
    _set(p, base + ("mlp", "proj", "kernel"), stacked("mlp.fc2.weight", True))
    _set(p, base + ("mlp", "proj", "bias"), stacked("mlp.fc2.bias"))
    return {"params": p}


def convert_llava_state_dict(sd: Dict[str, Any], num_llama_layers: int,
                             num_vision_layers: int) -> Dict:
    """LlavaLlamaForCausalLM state dict -> LlavaModule params.

    Key families (zscir/llava/model/llava_arch.py:26-33 +
    llava_llama.py:34-46): the LLaMA trunk under 'model.', the projector at
    'model.mm_projector.{weight,bias}', and the HF CLIPVisionModel at
    'model.vision_tower.vision_tower.vision_model.'. Pass
    `num_vision_layers = LlavaVisionConfig.effective_layers` so the unused
    final block(s) are dropped at conversion time."""
    llama = convert_llama_state_dict(sd, num_llama_layers, prefix="model.")
    vt_prefix = None
    for cand in ("model.vision_tower.vision_tower.vision_model.",
                 "model.vision_tower.0.vision_tower.vision_model.",
                 "vision_tower.vision_model.",
                 "vision_model."):
        if f"{cand}embeddings.class_embedding" in sd:
            vt_prefix = cand
            break
    if vt_prefix is None:
        raise KeyError("no CLIPVisionModel keys found in state dict")
    vision = convert_hf_clip_vision(sd, num_vision_layers, prefix=vt_prefix)
    return {"params": {
        "vision_tower": vision["params"],
        "mm_projector": {"kernel": _t(sd["model.mm_projector.weight"]).T,
                         "bias": _t(sd["model.mm_projector.bias"])},
        "language_model": llama["params"],
    }}


def quantize_llama_weights_host(params: Dict[str, Any]) -> Dict[str, Any]:
    """Host-side (numpy) weight-only int8 quantization of a converted
    LlamaLM tree — the checkpoint path companion to
    models.llama.quantize_llama_weights (which runs on device and needs
    both precisions resident: ~20 GB transient at 7B). Use this right
    after convert_llama_state_dict / convert_llava_state_dict, then ship
    only the int8 tree to the chip (6.7 GB at 7B)."""
    from spn4cir_tpu.models.llama import QuantKernel

    def quant_cols(w):
        w = np.asarray(w, np.float32)
        absmax = np.max(np.abs(w), axis=-2)
        scales = np.maximum(absmax, 1e-12) / 127.0
        vals = np.clip(np.round(w / scales[..., None, :]),
                       -127, 127).astype(np.int8)
        return QuantKernel(vals, scales)

    def quant_rows(w):
        w = np.asarray(w, np.float32)
        absmax = np.max(np.abs(w), axis=-1)
        scales = np.maximum(absmax, 1e-12) / 127.0
        vals = np.clip(np.round(w / scales[..., None]),
                       -127, 127).astype(np.int8)
        return QuantKernel(vals, scales)

    layer = params["layers"]["layer"]
    return {
        "embed_tokens": quant_rows(params["embed_tokens"]),
        "layers": {"layer": {
            "input_ln": layer["input_ln"],
            "post_ln": layer["post_ln"],
            "attn": {k: {"kernel": quant_cols(layer["attn"][k]["kernel"])}
                     for k in ("q", "k", "v", "o")},
            "gate": {"kernel": quant_cols(layer["gate"]["kernel"])},
            "up": {"kernel": quant_cols(layer["up"]["kernel"])},
            "down": {"kernel": quant_cols(layer["down"]["kernel"])},
        }},
        "norm": params["norm"],
        "lm_head": quant_cols(params["lm_head"]),
    }


def is_converted_checkpoint(path: str) -> bool:
    """True when `path` was written by save_model / tools/convert_ckpt.py
    (flax msgpack) rather than torch. Detected by the sidecar metadata or
    extension, with a content sniff as fallback: torch zip saves start
    'PK\\x03\\x04' and legacy pickle with 0x80 exactly, while our msgpack
    root is a fixmap with >=1 entries (0x81-0x8f)."""
    if path.endswith((".msgpack", ".flax")):
        return True
    if os.path.exists(path + ".meta.json"):
        return True
    try:
        with open(path, "rb") as f:
            first = f.read(1)
    except OSError:
        return False
    return bool(first) and 0x81 <= first[0] <= 0x8F


def load_converted_params(path: str):
    """Load a checkpoint written by save_model (flax msgpack). QuantKernel
    leaves (weight-only int8 LLMs) serialize as {'values','scales'} dicts —
    flax flattens NamedTuples to their field dict — and are rebuilt here so
    `_mm` / `_embed_rows` dispatch on the tuple type again."""
    from flax import serialization

    from spn4cir_tpu.models.llama import QuantKernel

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    def rebuild(node):
        if isinstance(node, dict):
            if (set(node.keys()) == {"values", "scales"}
                    and getattr(node["values"], "dtype", None) == np.int8):
                return QuantKernel(node["values"], node["scales"])
            return {k: rebuild(v) for k, v in node.items()}
        return node

    return rebuild(raw)


def has_quantized_leaves(tree) -> bool:
    """True when any leaf is already a QuantKernel (pre-quantized converted
    checkpoint) — re-quantizing would int8-quantize int8 values."""
    import jax

    from spn4cir_tpu.models.llama import QuantKernel

    return any(isinstance(leaf, QuantKernel) for leaf in
               jax.tree_util.tree_leaves(
                   tree, is_leaf=lambda x: isinstance(x, QuantKernel)))
