"""Activation parity vs the reference BLIP ViT and EVA ViT-g implementations
(PyTorch oracles loaded read-only with timm/fairscale shims)."""

import importlib.util
import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn

REF_VIT = "/root/reference/blip4cir/vit.py"
REF_EVA = "/root/reference/blip24cir/lavis/models/eva_vit.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_VIT),
                                reason="reference repo not mounted")


def _shim_modules():
    """Minimal stand-ins for timm/fairscale/lavis pieces the reference ViTs
    import (standard definitions; shims live only in this test)."""

    class PatchEmbed(nn.Module):
        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, **_):
            super().__init__()
            self.num_patches = (img_size // patch_size) ** 2
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def _identity_module(*a, **k):
        return a[0] if a else None

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt._cfg = lambda **k: dict(k)
    vt.PatchEmbed = PatchEmbed
    reg = types.ModuleType("timm.models.registry")
    reg.register_model = lambda fn: fn
    layers = types.ModuleType("timm.models.layers")
    layers.trunc_normal_ = nn.init.trunc_normal_
    layers.DropPath = DropPath
    layers.drop_path = lambda x, *a, **k: x
    layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    helpers = types.ModuleType("timm.models.helpers")
    helpers.named_apply = lambda fn, module, *a, **k: module
    helpers.adapt_input_conv = lambda *a, **k: None
    models.vision_transformer = vt
    models.registry = reg
    models.layers = layers
    models.helpers = helpers
    timm.models = models
    for name, mod in [("timm", timm), ("timm.models", models),
                      ("timm.models.vision_transformer", vt),
                      ("timm.models.registry", reg),
                      ("timm.models.layers", layers),
                      ("timm.models.helpers", helpers)]:
        sys.modules.setdefault(name, mod)

    fs = types.ModuleType("fairscale")
    fs_nn = types.ModuleType("fairscale.nn")
    fs_cp = types.ModuleType("fairscale.nn.checkpoint")
    fs_ca = types.ModuleType("fairscale.nn.checkpoint.checkpoint_activations")
    fs_ca.checkpoint_wrapper = lambda m, *a, **k: m
    for name, mod in [("fairscale", fs), ("fairscale.nn", fs_nn),
                      ("fairscale.nn.checkpoint", fs_cp),
                      ("fairscale.nn.checkpoint.checkpoint_activations", fs_ca)]:
        sys.modules.setdefault(name, mod)

    lavis = types.ModuleType("lavis")
    common = types.ModuleType("lavis.common")
    dist = types.ModuleType("lavis.common.dist_utils")
    dist.download_cached_file = lambda *a, **k: None
    common.dist_utils = dist
    lavis.common = common
    for name, mod in [("lavis", lavis), ("lavis.common", common),
                      ("lavis.common.dist_utils", dist)]:
        sys.modules.setdefault(name, mod)


def _load(path, name):
    _shim_modules()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize(model, seed=0):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.02)
    return model.float().eval()


def test_blip_vit_parity(rng):
    from spn4cir_tpu.models.blip_vit import BlipViT, BlipViTConfig
    from spn4cir_tpu.models.convert import convert_blip_vit_state_dict

    ref_mod = _load(REF_VIT, "ref_blip_vit")
    cfg = BlipViTConfig(image_size=32, patch_size=16, width=64, layers=2,
                        heads=2)
    ref_model = _randomize(ref_mod.VisionTransformer(
        img_size=cfg.image_size, patch_size=cfg.patch_size,
        embed_dim=cfg.width, depth=cfg.layers, num_heads=cfg.heads,
        use_grad_checkpointing=False, drop_path_rate=0.0, drop_rate=0.0,
        qkv_bias=True,
        norm_layer=lambda d: nn.LayerNorm(d, eps=1e-6)))
    sd = {f"visual_encoder.{k}": v for k, v in ref_model.state_dict().items()}
    params = {"params": convert_blip_vit_state_dict(sd, cfg.layers)}

    imgs = rng.randn(2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(BlipViT(cfg).apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)


def test_eva_vit_parity(rng):
    from spn4cir_tpu.models.blip24cir import EvaViT, EvaViTConfig
    from spn4cir_tpu.models.convert import convert_eva_vit_state_dict

    ref_mod = _load(REF_EVA, "ref_eva_vit")
    cfg = EvaViTConfig(image_size=28, patch_size=14, width=64, layers=2,
                       heads=2, mlp_ratio=4.0)
    ref_model = _randomize(ref_mod.VisionTransformer(
        img_size=cfg.image_size, patch_size=cfg.patch_size,
        embed_dim=cfg.width, depth=cfg.layers, num_heads=cfg.heads,
        mlp_ratio=cfg.mlp_ratio, qkv_bias=True, drop_path_rate=0.0,
        norm_layer=lambda d: nn.LayerNorm(d, eps=1e-6),
        use_checkpoint=False))
    sd = {f"visual_encoder.{k}": v for k, v in ref_model.state_dict().items()}
    params = {"params": convert_eva_vit_state_dict(sd, cfg.layers)}

    imgs = rng.randn(2, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    with torch.no_grad():
        want = ref_model(torch.tensor(imgs.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(EvaViT(cfg).apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)


REF_TGCIR = "/root/reference/tgcir/models.py"


@pytest.mark.skipif(not os.path.exists(REF_TGCIR),
                    reason="reference tgcir not mounted")
def test_tgcir_spatial_attention_parity(rng):
    """The reference TokenLearner is S SpatialAttention modules; ours is one
    Dense(D->S) + einsum. Verify slot-for-slot equivalence by loading each
    conv's weights into the corresponding Dense column."""
    # SpatialAttention is self-contained; execute just that class
    src = open(REF_TGCIR).read()
    start = src.index("class SpatialAttention")
    end = src.index("class TokenLearner")
    ns = {"nn": nn, "torch": torch}
    exec(src[start:end], ns)  # test-only oracle, never shipped
    SpatialAttention = ns["SpatialAttention"]

    from spn4cir_tpu.models.tgcir import TokenLearner

    d, s, b, l = 16, 3, 2, 7
    refs = [_randomize(SpatialAttention(dim=d), seed=i) for i in range(s)]
    x = rng.randn(b, l, d).astype(np.float32)

    kernel = np.stack([r.conv[0].weight.detach().numpy().reshape(d)
                       for r in refs], axis=1)          # (D, S)
    bias = np.stack([r.conv[0].bias.detach().numpy().reshape(())
                     for r in refs])                     # (S,)
    params = {"params": {"attn": {"kernel": jnp.asarray(kernel),
                                  "bias": jnp.asarray(bias)}}}
    got = np.asarray(TokenLearner(num_tokens=s).apply(params, jnp.asarray(x)))

    with torch.no_grad():
        want = np.stack([r(torch.tensor(x))[0].numpy() for r in refs], axis=1)
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=1e-4)
