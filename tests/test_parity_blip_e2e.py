"""End-to-end Recall parity for blip4cir: the reference's OWN validate
pipeline (torch, loaded read-only from /root/reference/blip4cir) vs this
framework, with the SAME converted weights, SAME tokenizer, and the SAME
on-disk dataset — the tolerance ladder of tests/test_parity_e2e.py extended
to the BLIP backbone (cross-attention fusion, dual raw/pooled index
features):
  rung 1 — gallery feature cosines > 0.999,
  rung 2 — identical full ranked gallery order per query (FIQ),
  rung 3 — identical Recall@K (FIQ R@10/50; CIRR R@K + group subset).

The reference's BLIP_Retrieval is constructed at OUR test-tiny geometry by
patching its two factory seams: `create_vit` (their create_vit only builds
base/large — we instantiate their OWN vit.VisionTransformer small) and
`init_tokenizer` (BertTokenizer.from_pretrained needs network; both sides
share our WordPiece tokenizer over the tiny vocab instead — the vocab, the
[DEC]/[ENC] appends, and the enc-token swap all follow their
blip.init_tokenizer contract). Everything downstream — med.py BertModel,
vit.py VisionTransformer, blip_cir.img_txt_fusion/img_embed,
validate.compute_* — is the reference's own code."""

import importlib
import json
import os
import sys
import types
from functools import partial
from types import SimpleNamespace

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/blip4cir"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference repo not mounted")

from tests.fixtures import make_cirr, make_fiq  # noqa: E402
from tests.test_parity_e2e import (  # noqa: E402
    TorchPreprocess, _force_inprocess_dataloaders, _stub_torchvision)
from tests.test_reference_parity_bert import _shim_transformers  # noqa: E402
from tests.test_reference_parity_vit import _shim_modules  # noqa: E402


def _stub_timm_hub():
    """blip.py imports timm.models.hub.download_cached_file (checkpoint
    downloads we never trigger)."""
    if "timm.models.hub" in sys.modules:
        return
    hub = types.ModuleType("timm.models.hub")
    hub.download_cached_file = lambda *a, **k: None
    sys.modules["timm.models.hub"] = hub
    if "timm.models" in sys.modules:
        sys.modules["timm.models"].hub = hub


def _give_stubs_specs():
    """transformers probes importlib.util.find_spec('timm'); a stub module
    whose __spec__ is None makes that RAISE instead of answering."""
    import importlib.machinery

    for name, mod in list(sys.modules.items()):
        if ((name.split(".")[0] in ("timm", "fairscale", "lavis"))
                and getattr(mod, "__spec__", None) is None):
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)


class HFTokenizerShim:
    """The slice of the HF BertTokenizer interface blip_cir uses, backed by
    our WordPiece tokenizer so both frameworks tokenize identically
    (padding to a fixed 35 instead of 'longest' — pad keys are masked, so
    CLS outputs are unchanged; 35 is our blip TEXT_MAX_LEN)."""

    def __init__(self, tok):
        self.tok = tok
        self.enc_token_id = tok.enc_token_id

    def __call__(self, texts, padding="longest", truncation=False,
                 max_length=None, return_tensors="pt"):
        ids, mask = self.tok(texts, max_length=35)
        out = SimpleNamespace(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long))
        out.to = lambda device, **k: out
        return out


@pytest.fixture(scope="module")
def ref_modules():
    _stub_torchvision()
    _shim_modules()
    _stub_timm_hub()
    _give_stubs_specs()  # BEFORE transformers' find_spec('timm') probe
    _shim_transformers()
    sys.path.insert(0, REF_DIR)
    from tests.refmods import restore, save_and_clear

    names = ["med", "vit", "blip", "blip_cir", "models", "data_utils",
             "utils", "validate"]
    saved = save_and_clear(names)  # incl. submodules — see tests/refmods.py
    try:
        mods = {n: importlib.import_module(n)
                for n in ["med", "vit", "blip", "blip_cir", "data_utils",
                          "utils", "validate"]}
        _force_inprocess_dataloaders(mods)
        yield mods
    finally:
        sys.path.remove(REF_DIR)
        restore(names, saved)


@pytest.fixture(scope="module")
def shared_model(ref_modules, tmp_path_factory):
    """Reference torch BLIP_Retrieval at our test-tiny geometry + converted
    params + the shared tokenizer."""
    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.models.convert import convert_blip_retrieval

    bb = build_backbone("blip", blip_size="test-tiny")
    vit_cfg, med_cfg = bb.vit_cfg, bb.med_cfg
    shim_tok = HFTokenizerShim(bb.tokenizer)

    # their med config json, at our tiny geometry
    with open(os.path.join(REF_DIR, "configs", "med_config.json")) as f:
        med_json = json.load(f)
    med_json.update(vocab_size=med_cfg.vocab_size,
                    hidden_size=med_cfg.hidden_size,
                    num_hidden_layers=med_cfg.num_layers,
                    num_attention_heads=med_cfg.num_heads,
                    intermediate_size=med_cfg.intermediate_size,
                    max_position_embeddings=med_cfg.max_position_embeddings,
                    encoder_width=med_cfg.encoder_width)
    cfg_path = str(tmp_path_factory.mktemp("medcfg") / "med_config.json")
    with open(cfg_path, "w") as f:
        json.dump(med_json, f)

    blip_cir_mod = ref_modules["blip_cir"]
    ref_vit = ref_modules["vit"]

    def tiny_create_vit(vit, image_size, use_grad_checkpointing=False,
                        ckpt_layer=0, drop_path_rate=0):
        enc = ref_vit.VisionTransformer(
            img_size=vit_cfg.image_size, patch_size=vit_cfg.patch_size,
            embed_dim=vit_cfg.width, depth=vit_cfg.layers,
            num_heads=vit_cfg.heads, use_grad_checkpointing=False,
            ckpt_layer=0, drop_path_rate=0,
            norm_layer=partial(torch.nn.LayerNorm, eps=1e-6))
        return enc, vit_cfg.width

    saved_cv, saved_tok = blip_cir_mod.create_vit, blip_cir_mod.init_tokenizer
    blip_cir_mod.create_vit = tiny_create_vit
    blip_cir_mod.init_tokenizer = lambda: shim_tok
    try:
        ref_model = blip_cir_mod.BLIP_Retrieval(
            med_config=cfg_path, image_size=vit_cfg.image_size, vit="base",
            vit_grad_ckpt=False, vit_ckpt_layer=0, embed_dim=256)
    finally:
        blip_cir_mod.create_vit = saved_cv
        blip_cir_mod.init_tokenizer = saved_tok

    torch.manual_seed(0)
    with torch.no_grad():
        for p in ref_model.parameters():
            p.copy_(torch.randn_like(p) * 0.08)
    ref_model = ref_model.float().eval()

    params = jax.tree_util.tree_map(
        __import__("jax.numpy", fromlist=["asarray"]).asarray,
        convert_blip_retrieval(ref_model.state_dict(), vit_cfg.layers,
                               med_cfg.num_layers))
    return bb, params, ref_model


def _ref_extract_index(ref_modules, dataset, model):
    """utils.extract_index_features (blip4cir/utils.py:24-51) with its
    hardcoded (577, 768) buffers made size-generic — same loop, same
    img_embed(return_pool_and_normalized=True) calls."""
    from torch.utils.data import DataLoader

    loader = DataLoader(dataset=dataset, batch_size=8, num_workers=0,
                        collate_fn=ref_modules["utils"].collate_fn)
    feats, feats_p, names = [], [], []
    for batch_names, images in loader:
        with torch.no_grad():
            f, fp = model.img_embed(images, return_pool_and_normalized=True)
        feats.append(f)
        feats_p.append(fp)
        names.extend(batch_names)
    return torch.cat(feats), torch.cat(feats_p), names


def test_blip_fiq_recall_and_order_parity(tmp_path_factory, ref_modules,
                                          shared_model):
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import (extract_index_features,
                                            fiq_val_retrieval,
                                            generate_val_predictions,
                                            query_scores)

    bb, params, ref_model = shared_model
    root = make_fiq(str(tmp_path_factory.mktemp("fiq") / "fashionIQ_dataset"),
                    n_images=40, n_val=16, extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)

    data_utils = ref_modules["data_utils"]
    validate = ref_modules["validate"]
    classic = data_utils.CIRDataset("fiq", "val", "classic",
                                    TorchPreprocess(tf), root, ["dress"])
    idx_feats, idx_feats_p, idx_names = _ref_extract_index(
        ref_modules, classic, ref_model)
    relative = data_utils.CIRDataset("fiq", "val", "relative",
                                     TorchPreprocess(tf), root, ["dress"])
    want_r10, want_r50 = validate.compute_fiq_val_metrics(
        relative, ref_model, idx_feats, idx_feats_p, idx_names)

    got = fiq_val_retrieval(bb, params, root, "dress", tf)
    # rung 3: identical Recall (1e-4 absorbs f32-vs-f64 percent rounding)
    assert got["recall_at10"] == pytest.approx(want_r10, abs=1e-4)
    assert got["recall_at50"] == pytest.approx(want_r50, abs=1e-4)

    # rung 1 + 2 on our index/predictions
    classic_ours = CIRDataset("fiq", "val", "classic", tf, root, ["dress"])
    relative_ours = CIRDataset("fiq", "val", "relative", tf, root, ["dress"])
    index = extract_index_features(bb, params, classic_ours, 8,
                                   num_workers=0)
    name_to_row = {n: i for i, n in enumerate(idx_names)}
    order = [name_to_row[n] for n in classic_ours.gallery_names]
    cos = (np.asarray(index.target)
           * idx_feats_p.numpy()[order]).sum(-1)
    assert cos.min() > 0.999, cos.min()

    # rung 2: full ranked order per query (blip has no reference exclusion
    # on FIQ — fiq_exclude_reference=False — so ranks compare directly)
    pred, tgt = validate.generate_fiq_val_predictions(
        ref_model, relative, idx_names, idx_feats)
    ref_sorted = np.array(idx_names)[
        torch.argsort(1 - pred @ idx_feats_p.float().T, dim=-1).numpy()]
    preds = generate_val_predictions(bb, params, relative_ours, index, 8)
    scores = np.asarray(query_scores(bb, preds, index))
    ours_sorted = np.array(classic_ours.gallery_names)[
        np.argsort(-scores, axis=-1, kind="stable")]
    np.testing.assert_array_equal(ours_sorted, ref_sorted)


def test_blip_cirr_recall_parity(tmp_path_factory, ref_modules, shared_model):
    from pathlib import Path

    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import cirr_val_retrieval

    bb, params, ref_model = shared_model
    parent = tmp_path_factory.mktemp("cirr")
    root = make_cirr(str(parent / "cirr_dataset"), n_images=30, n_val=12,
                     extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)

    data_utils = ref_modules["data_utils"]
    validate = ref_modules["validate"]
    # quirk SURVEY.md §8.6: classic-mode roots hardcode base_path
    old_base = data_utils.base_path
    data_utils.base_path = Path(parent)
    try:
        classic = data_utils.CIRDataset("cirr", "val", "classic",
                                        TorchPreprocess(tf), root)
        idx_feats, idx_feats_p, idx_names = _ref_extract_index(
            ref_modules, classic, ref_model)
        relative = data_utils.CIRDataset("cirr", "val", "relative",
                                         TorchPreprocess(tf), root)
        (want_gr1, want_gr2, want_gr3, want_r1, want_r5, want_r10,
         want_r50) = validate.compute_cirr_val_metrics(
            relative, ref_model, idx_feats, idx_feats_p, idx_names)
    finally:
        data_utils.base_path = old_base

    got = cirr_val_retrieval(bb, params, root, tf)
    for key, want in [("recall_at1", want_r1), ("recall_at5", want_r5),
                      ("recall_at10", want_r10), ("recall_at50", want_r50),
                      ("group_recall_at1", want_gr1),
                      ("group_recall_at2", want_gr2),
                      ("group_recall_at3", want_gr3)]:
        assert got[key] == pytest.approx(want, abs=1e-4), (key, got[key],
                                                           want)
