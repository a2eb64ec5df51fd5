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

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().to(torch.float32).cpu().numpy()
    return np.asarray(x, np.float32)


def _set(tree: Dict, path, value):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = jnp.asarray(value)


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
