"""Unicom ViT: activation parity vs the reference torch module
(zscir/unicom/vision_transformer.py, loaded read-only as oracle)."""

import importlib.util
import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF_UNICOM = "/root/reference/zscir/unicom/vision_transformer.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_UNICOM),
                                reason="reference repo not mounted")

from spn4cir_tpu.models.convert import convert_unicom_state_dict  # noqa: E402
from spn4cir_tpu.models.unicom import UnicomConfig, UnicomViT  # noqa: E402


def _load_ref():
    """Load the reference module with timm layer stubs (timm is not in this
    image; only DropPath/trunc_normal_ are imported and DropPath is unused
    at drop_path_rate=0)."""
    if "timm.models.layers" not in sys.modules:
        timm = sys.modules.setdefault("timm", types.ModuleType("timm"))
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, p=0.0):
                super().__init__()

            def forward(self, x):
                return x

        layers.DropPath = DropPath
        layers.trunc_normal_ = torch.nn.init.trunc_normal_
        models.layers = layers
        timm.models = models
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if "torchvision" not in sys.modules:
        # only transform constructors are imported; the oracle never calls them
        tv = types.ModuleType("torchvision")
        tfm = types.ModuleType("torchvision.transforms")
        for name in ("CenterCrop", "Compose", "InterpolationMode", "Normalize",
                     "Resize", "ToTensor"):
            setattr(tfm, name, type(name, (), {}))
        tv.transforms = tfm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tfm
    spec = importlib.util.spec_from_file_location("ref_unicom", REF_UNICOM)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_unicom_parity():
    ref = _load_ref()
    cfg = UnicomConfig.tiny()
    model = ref.VisionTransformer(
        input_size=cfg.input_size, patch_size=cfg.patch_size, in_channels=3,
        dim=cfg.dim, embedding_size=cfg.embedding_size, depth=cfg.depth,
        num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
        drop_path_rate=0.0, using_checkpoint=False)
    torch.manual_seed(0)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
        # make running stats non-trivial so the BN path is actually checked
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.05)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    model = model.float().eval()

    rng = np.random.RandomState(1)
    images = rng.randn(2, cfg.input_size, cfg.input_size, 3).astype(np.float32)
    with torch.no_grad():
        want = model(torch.tensor(images.transpose(0, 3, 1, 2))).numpy()

    params = convert_unicom_state_dict(model.state_dict(), cfg.depth)
    got = np.asarray(UnicomViT(cfg).apply(
        jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(images)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_unicom_ddp_prefix_and_geometries():
    ref = _load_ref()
    cfg = UnicomConfig.tiny()
    model = ref.VisionTransformer(
        input_size=cfg.input_size, patch_size=cfg.patch_size, dim=cfg.dim,
        embedding_size=cfg.embedding_size, depth=cfg.depth,
        num_heads=cfg.num_heads, drop_path_rate=0.0, using_checkpoint=False)
    sd = {f"module.{k}": v for k, v in model.state_dict().items()}
    params = convert_unicom_state_dict(sd, cfg.depth)
    tmpl = UnicomViT(cfg).init(jax.random.PRNGKey(0),
                               jnp.zeros((1, cfg.input_size, cfg.input_size, 3)))
    assert (jax.tree_util.tree_structure(tmpl) ==
            jax.tree_util.tree_structure(
                jax.tree_util.tree_map(jnp.asarray, params)))
    # production geometry constants match the reference build_model table
    l14 = UnicomConfig.vit_l14()
    assert (l14.dim, l14.depth, l14.num_heads, l14.embedding_size,
            l14.num_patches) == (1024, 24, 16, 768, 256)
