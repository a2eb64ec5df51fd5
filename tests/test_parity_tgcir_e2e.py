"""TG-CIR end-to-end Recall parity: the reference's own tgcir validate
pipeline (torch, /root/reference/tgcir) vs this framework, same converted
CIRPlus weights, same on-disk dataset — the second backbone on the
tolerance ladder (after clip4cir, tests/test_parity_e2e.py).

Notably exercises the quirk the ladder itself surfaced: the published
tgcir FIQ eval does NOT filter the reference image from rankings
(tgcir/validate.py:48-58), unlike clip4cir."""

import importlib
import os
import sys
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/tgcir"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference repo not mounted")

from tests.fixtures import make_fiq  # noqa: E402
from tests.test_parity_e2e import TorchPreprocess, _stub_torchvision  # noqa: E402


@pytest.fixture(scope="module")
def ref_modules():
    _stub_torchvision()
    # the reference hardcodes .cuda() tensor moves inside the model
    # (tgcir/models.py:45,101-106 TokenLearner buffer + mask indices);
    # identity them for the CPU oracle
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    from tests.refmods import restore, save_and_clear

    sys.path.insert(0, REF_DIR)
    names = ["clip", "data_utils", "utils", "models", "validate"]
    saved = save_and_clear(names)  # incl. submodules — see tests/refmods.py
    try:
        mods = {n: importlib.import_module(n) for n in names}
        from tests.test_parity_e2e import _force_inprocess_dataloaders
        _force_inprocess_dataloaders(mods)
        yield mods
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.path.remove(REF_DIR)
        restore(names, saved)


@pytest.fixture(scope="module")
def shared_model(ref_modules):
    """Reference torch CIRPlus at the test-tgcir geometry + converted
    params. clip.load is patched to hand the constructed tower to
    Backbone.__init__ (tgcir/models.py:55) instead of downloading."""
    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.models.clip import CLIP_CONFIGS
    from spn4cir_tpu.models.convert import convert_tgcir_state_dict

    cfg = CLIP_CONFIGS["test-tgcir"]
    clip_pkg = ref_modules["clip"]
    ref_clip_model = clip_pkg.model.CLIP(
        embed_dim=cfg.embed_dim, image_resolution=cfg.image_resolution,
        vision_layers=cfg.vision_layers, vision_width=cfg.vision_width,
        vision_patch_size=cfg.vision_patch_size,
        context_length=cfg.context_length, vocab_size=cfg.vocab_size,
        transformer_width=cfg.transformer_width,
        transformer_heads=cfg.transformer_heads,
        transformer_layers=cfg.transformer_layers).float()

    models_mod = ref_modules["models"]
    orig_load = models_mod.clip.load
    models_mod.clip.load = lambda name, **kw: (ref_clip_model, None)
    try:
        ref_model = models_mod.CIRPlus("test-tgcir", device=torch.device("cpu"))
    finally:
        models_mod.clip.load = orig_load
    torch.manual_seed(0)
    with torch.no_grad():
        for p in ref_model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
        # keep the reference's striped mask init semantics meaningful:
        # ReLU(mask) must not zero everything
        for m in (ref_model.backbone.masks, ref_model.backbone.masks_text):
            m.weight.abs_()
    ref_model = ref_model.float().eval()

    bb = build_backbone("tgcir", clip_model_name="test-tgcir")
    params = jax.tree_util.tree_map(
        jnp.asarray,
        convert_tgcir_state_dict(ref_model.state_dict(), cfg.vision_layers,
                                 cfg.transformer_layers))
    return bb, params, ref_model


def test_tgcir_fiq_recall_parity(tmp_path_factory, ref_modules, shared_model):
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import fiq_val_retrieval

    bb, params, ref_model = shared_model
    root = make_fiq(str(tmp_path_factory.mktemp("fiq") / "fashionIQ_dataset"),
                    n_images=30, n_val=12, extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)

    validate = ref_modules["validate"]
    validate.args = SimpleNamespace(data_path=root, fiq_val_type=0)
    validate.device = torch.device("cpu")
    ref_modules["utils"].device = torch.device("cpu")
    classic = ref_modules["data_utils"].CIRDataset(
        "fiq", "val", "classic", TorchPreprocess(tf), root, ["dress"])
    idx_feats, idx_feats_p, idx_names = (
        ref_modules["utils"].extract_index_features(
            classic, ref_model, device=torch.device("cpu")))
    relative = ref_modules["data_utils"].CIRDataset(
        "fiq", "val", "relative", TorchPreprocess(tf), root, ["dress"])
    want_r10, want_r50 = validate.compute_fiq_val_metrics(
        relative, ref_model, idx_feats, idx_feats_p, idx_names)

    got = fiq_val_retrieval(bb, params, root, "dress", tf)
    assert got["recall_at10"] == pytest.approx(want_r10, abs=1e-4)
    assert got["recall_at50"] == pytest.approx(want_r50, abs=1e-4)

    # rung 1: token-set features vs the reference's own
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.eval.retrieval import extract_index_features

    classic_ours = CIRDataset("fiq", "val", "classic", tf, root, ["dress"])
    index = extract_index_features(bb, params, classic_ours, 8)
    ours = np.asarray(index.refer)  # (N, 12, 512) raw token sets
    ref = idx_feats.numpy()
    order = [{n: i for i, n in enumerate(idx_names)}[n]
             for n in classic_ours.gallery_names]
    ref = ref[order]
    cos = (ours * ref).sum(-1) / (
        np.linalg.norm(ours, axis=-1) * np.linalg.norm(ref, axis=-1) + 1e-12)
    assert cos.min() > 0.999, cos.min()
