"""End-to-end Recall parity for blip24cir (BLIP-2 / SPRC): the reference's
OWN validate pipeline — `Blip2QformerCirAlignPrompt.inference`'s
max-over-32-queries scoring included — vs this framework, with the SAME
converted weights, SAME tokenizer, SAME text processor, and the SAME
on-disk dataset. Completes the reference-in-the-loop ladder across all four
supervised backbones (clip4cir/tgcir: test_parity_e2e*, blip4cir:
test_parity_blip_e2e).

The vendored LAVIS tree is imported WITHOUT executing its package
__init__s (those pull omegaconf/iopath/yaml config machinery this
environment doesn't ship): synthetic parent packages with real __path__s
let importlib load exactly the needed leaves — lavis.common.registry,
dist_utils, logger, models.base_model, blip_models.blip_outputs,
blip2_models.{Qformer,blip2,blip2_qformer_cir_align_prompt}, eva_vit —
all the reference's own files. Only three network/geometry seams are
patched on Blip2Base, mirroring what load_model_and_preprocess does:
init_tokenizer (BertTokenizer.from_pretrained needs network — both sides
share our WordPiece tokenizer), init_Qformer
(BertConfig/BertLMHeadModel.from_pretrained needs network — their OWN
Qformer.BertLMHeadModel is constructed directly at tiny geometry), and
init_vision_encoder (create_eva_vit_g hardcodes the 1B geometry — their
OWN eva_vit.VisionTransformer is constructed small). num_query_tokens
stays 32: the reference hardcodes the fused-CLS index
(`last_hidden_state[:, 32, :]`, blip2_qformer_cir_align_prompt.py:307)."""

import importlib
import importlib.machinery
import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/blip24cir"
LAVIS_DIR = os.path.join(REF_DIR, "lavis")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference repo not mounted")

from tests.fixtures import make_cirr, make_fiq  # noqa: E402
from tests.test_parity_e2e import (  # noqa: E402
    TorchPreprocess, _force_inprocess_dataloaders, _stub_torchvision)
from tests.test_parity_blip_e2e import (  # noqa: E402
    _give_stubs_specs, _stub_timm_hub)
from tests.test_reference_parity_bert import _shim_transformers  # noqa: E402
from tests.test_reference_parity_vit import _shim_modules  # noqa: E402


def _pkg_stub(name, path=None):
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None,
                                                  is_package=path is not None)
    if path is not None:
        mod.__path__ = [path]
    return mod


def _install_lavis():
    """Synthetic lavis package skeleton over the REAL vendored files."""
    if "lavis.models.blip2_models.blip2" in sys.modules:
        return  # real tree already installed
    _shim_modules()  # timm.models.{layers,...} + fairscale stand-ins
    _stub_timm_hub()
    _give_stubs_specs()  # before transformers' find_spec probes
    _shim_transformers()  # moved transformers helpers
    # _shim_modules seeds a STUB lavis.common.dist_utils (enough for the
    # standalone eva_vit loads elsewhere); here the REAL files must win
    for name in [n for n in sys.modules if n.split(".")[0] == "lavis"]:
        del sys.modules[name]
    # omegaconf: imported by base_model for config plumbing our path never
    # touches
    if "omegaconf" not in sys.modules:
        oc = _pkg_stub("omegaconf")
        oc.OmegaConf = type("OmegaConf", (), {})
        sys.modules["omegaconf"] = oc
    for name, sub in [("lavis", ""), ("lavis.common", "common"),
                      ("lavis.models", "models"),
                      ("lavis.models.blip2_models", "models/blip2_models"),
                      ("lavis.models.blip_models", "models/blip_models")]:
        sys.modules[name] = _pkg_stub(name, os.path.join(LAVIS_DIR, sub))
    # lavis.common.utils pulls iopath/yaml/pandas/torchvision.datasets;
    # base_model only needs these two names from it
    cu = _pkg_stub("lavis.common.utils")
    cu.is_url = lambda s: isinstance(s, str) and s.startswith(
        ("http://", "https://"))
    cu.get_abs_path = lambda p: p
    sys.modules["lavis.common.utils"] = cu
    # blip2.py imports create_clip_vit_L (unused: we patch
    # init_vision_encoder)
    cv = _pkg_stub("lavis.models.clip_vit")
    cv.create_clip_vit_L = lambda *a, **k: None
    sys.modules["lavis.models.clip_vit"] = cv
    for leaf in ["lavis.common.registry", "lavis.common.dist_utils",
                 "lavis.common.logger", "lavis.models.base_model",
                 "lavis.models.blip_models.blip_outputs",
                 "lavis.models.blip2_models.Qformer",
                 "lavis.models.eva_vit",
                 "lavis.models.blip2_models.blip2",
                 "lavis.models.blip2_models.blip2_qformer_cir_align_prompt"]:
        importlib.import_module(leaf)
        if leaf == "lavis.models.base_model":
            # registry.register_model does `from lavis.models import
            # BaseModel`; surface it on the synthetic package
            sys.modules["lavis.models"].BaseModel = sys.modules[
                leaf].BaseModel


class HFTokenizerShim:
    """The HF BertTokenizer slice the blip2 model uses, backed by our
    WordPiece tokenizer (padding='max_length' = our fixed-length call)."""

    def __init__(self, tok):
        self.tok = tok

    def __len__(self):
        return self.tok.vocab_size

    def __call__(self, texts, padding="max_length", truncation=True,
                 max_length=32, return_tensors="pt"):
        ids, mask = self.tok(texts, max_length=max_length)
        out = SimpleNamespace(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long))
        out.to = lambda device, **k: out
        return out


@pytest.fixture(scope="module")
def ref_modules():
    _stub_torchvision()
    _install_lavis()
    sys.path.insert(0, REF_DIR)
    from tests.refmods import restore, save_and_clear

    names = ["data_utils", "utils", "validate", "models",
             "cirr_test_submission"]
    saved = save_and_clear(names)  # incl. submodules — see tests/refmods.py
    # validate.py imports `from models import CIRPlus`; models.py pulls
    # lavis.models.load_model_and_preprocess (the full config/registry
    # machine) — our tests construct the blip model directly, so satisfy
    # the import with a placeholder
    models_stub = _pkg_stub("models")
    models_stub.CIRPlus = type("CIRPlus", (), {})
    sys.modules["models"] = models_stub
    try:
        mods = {n: importlib.import_module(n)
                for n in ["data_utils", "utils", "validate",
                          "cirr_test_submission"]}
        _force_inprocess_dataloaders(mods)
        yield mods
    finally:
        sys.path.remove(REF_DIR)
        restore(names, saved)


@pytest.fixture(scope="module")
def shared_model(ref_modules):
    """Reference torch Blip2QformerCirAlignPrompt at tiny geometry (32
    query tokens — see module docstring) + converted params."""
    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.models.convert import convert_blip2_cir
    from spn4cir_tpu.models.qformer import QFormerConfig

    import dataclasses

    bb = build_backbone("blip2", blip2_size="test-tiny")
    # the reference indexes the fused CLS at a HARDCODED 32 — rebuild our
    # backbone with 32 query tokens so both sides share the geometry
    q_cfg = dataclasses.replace(QFormerConfig.tiny(bb.tokenizer.vocab_size),
                                num_query_tokens=32)
    bb = build_backbone("blip2", blip2_size="test-tiny", q_cfg=q_cfg)
    vit_cfg, q = bb.vit_cfg, bb.q_cfg
    shim_tok = HFTokenizerShim(bb.tokenizer)

    blip2_mod = sys.modules["lavis.models.blip2_models.blip2"]
    qformer_mod = sys.modules["lavis.models.blip2_models.Qformer"]
    eva_mod = sys.modules["lavis.models.eva_vit"]
    align_mod = sys.modules[
        "lavis.models.blip2_models.blip2_qformer_cir_align_prompt"]

    def tiny_vision_encoder(cls, vit_model, img_size, drop_path_rate,
                            use_grad_checkpoint, precision):
        enc = eva_mod.VisionTransformer(
            img_size=vit_cfg.image_size, patch_size=vit_cfg.patch_size,
            embed_dim=vit_cfg.width, depth=vit_cfg.layers,
            num_heads=vit_cfg.heads, mlp_ratio=vit_cfg.mlp_ratio,
            qkv_bias=True, drop_path_rate=0.0,
            norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
            use_checkpoint=False)
        ln_vision = torch.nn.LayerNorm(enc.num_features)
        return enc, ln_vision

    def tiny_qformer(cls, num_query_token, vision_width,
                     cross_attention_freq=2):
        cfg = qformer_mod.BertConfig(
            vocab_size=q.vocab_size, hidden_size=q.hidden_size,
            num_hidden_layers=q.num_layers,
            num_attention_heads=q.num_heads,
            intermediate_size=q.intermediate_size,
            max_position_embeddings=q.max_position_embeddings,
            pad_token_id=0, layer_norm_eps=1e-12)
        cfg.encoder_width = vision_width
        cfg.add_cross_attention = True
        cfg.cross_attention_freq = cross_attention_freq
        cfg.query_length = num_query_token
        qf = qformer_mod.BertLMHeadModel(config=cfg)
        query_tokens = torch.nn.Parameter(
            torch.zeros(1, num_query_token, cfg.hidden_size))
        query_tokens.data.normal_(mean=0.0, std=cfg.initializer_range)
        return qf, query_tokens

    Base = blip2_mod.Blip2Base
    saved = (Base.init_tokenizer, Base.init_vision_encoder,
             Base.init_Qformer)
    Base.init_tokenizer = classmethod(
        lambda cls, truncation_side="right": shim_tok)
    Base.init_vision_encoder = classmethod(tiny_vision_encoder)
    Base.init_Qformer = classmethod(tiny_qformer)
    try:
        ref_model = align_mod.Blip2QformerCirAlignPrompt(
            vit_model="eva_clip_g", img_size=vit_cfg.image_size,
            freeze_vit=True, num_query_token=q.num_query_tokens,
            cross_attention_freq=q.cross_attention_freq, embed_dim=256,
            max_txt_len=32)
    finally:
        (Base.init_tokenizer, Base.init_vision_encoder,
         Base.init_Qformer) = saved

    torch.manual_seed(0)
    with torch.no_grad():
        for p in ref_model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    ref_model.init_stage2(tau=0.05)  # eval path: Qformer_query/text_proj_q
    ref_model = ref_model.float().eval()

    import jax.numpy as jnp
    params = jax.tree_util.tree_map(jnp.asarray, convert_blip2_cir(
        ref_model.state_dict(), num_vit_layers=vit_cfg.layers,
        num_q_layers=q.num_layers))

    from spn4cir_tpu.models.blip24cir import Blip2CIR
    wrapper = SimpleNamespace(blip_model=ref_model,
                              txt_processors={"eval": Blip2CIR.pre_caption})
    return bb, params, wrapper


def _ref_extract_index(ref_modules, dataset, model):
    """utils.extract_index_features (blip24cir/utils.py:24-70) size-generic:
    the original's half-split CPU spill requires >=2 batches and crashes on
    fixture-sized galleries; same extract_target_features calls, same
    ((M,32,256) target feats, (M,P,width) frozen embeds) contract."""
    from torch.utils.data import DataLoader

    loader = DataLoader(dataset=dataset, batch_size=8, num_workers=0,
                        collate_fn=ref_modules["utils"].collate_fn)
    feats, raw, names = [], [], []
    for batch_names, images in loader:
        with torch.no_grad():
            f, fr = model.blip_model.extract_target_features(images,
                                                             mode="mean")
        feats.append(f)
        raw.append(fr)
        names.extend(batch_names)
    return (torch.cat(feats), torch.cat(raw)), names


def test_blip2_fiq_recall_parity(tmp_path_factory, ref_modules,
                                 shared_model):
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import fiq_val_retrieval

    bb, params, wrapper = shared_model
    root = make_fiq(str(tmp_path_factory.mktemp("fiq") / "fashionIQ_dataset"),
                    n_images=40, n_val=16, extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)

    data_utils = ref_modules["data_utils"]
    validate = ref_modules["validate"]
    dev = torch.device("cpu")
    classic = data_utils.CIRDataset("fiq", "val", "classic",
                                    TorchPreprocess(tf), root, ["dress"])
    idx_feats, idx_names = _ref_extract_index(ref_modules, classic, wrapper)
    relative = data_utils.CIRDataset("fiq", "val", "relative",
                                     TorchPreprocess(tf), root, ["dress"])
    want_r10, want_r50 = validate.compute_fiq_val_metrics(
        relative, wrapper, idx_feats, idx_names, device=dev)

    got = fiq_val_retrieval(bb, params, root, "dress", tf)
    assert got["recall_at10"] == pytest.approx(want_r10, abs=1e-4)
    assert got["recall_at50"] == pytest.approx(want_r50, abs=1e-4)


def test_blip2_cirr_recall_parity(tmp_path_factory, ref_modules,
                                  shared_model):
    from pathlib import Path

    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import cirr_val_retrieval

    bb, params, wrapper = shared_model
    parent = tmp_path_factory.mktemp("cirr")
    root = make_cirr(str(parent / "cirr_dataset"), n_images=30, n_val=12,
                     extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)

    data_utils = ref_modules["data_utils"]
    validate = ref_modules["validate"]
    old_base = data_utils.base_path
    data_utils.base_path = Path(parent)  # quirk SURVEY.md §8.6
    try:
        dev = torch.device("cpu")
        classic = data_utils.CIRDataset("cirr", "val", "classic",
                                        TorchPreprocess(tf), root)
        idx_feats, idx_names = _ref_extract_index(ref_modules, classic,
                                                  wrapper)
        relative = data_utils.CIRDataset("cirr", "val", "relative",
                                         TorchPreprocess(tf), root)
        (want_gr1, want_gr2, want_gr3, want_r1, want_r5, want_r10,
         want_r50) = validate.compute_cirr_val_metrics(
            relative, wrapper, idx_feats, idx_names, device=dev)
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


def test_blip2_cirr_submission_parity(tmp_path_factory, ref_modules,
                                      shared_model):
    """The CIRR test-server submission dicts through blip2's max-over-query
    `inference` scoring path, vs the reference's own
    blip24cir/cirr_test_submission.generate_cirr_test_dicts — equal modulo
    exact-score ties (see test_parity_e2e for the tie rationale)."""
    from pathlib import Path

    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import (extract_index_features,
                                            generate_val_predictions,
                                            query_scores)
    from spn4cir_tpu.eval.submission import generate_cirr_test_dicts

    bb, params, wrapper = shared_model
    parent = tmp_path_factory.mktemp("cirr_sub")
    root = make_cirr(str(parent / "cirr_dataset"), n_images=30, n_val=12,
                     extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)

    data_utils = ref_modules["data_utils"]
    sub = ref_modules["cirr_test_submission"]
    old_base = data_utils.base_path
    data_utils.base_path = Path(parent)  # quirk SURVEY.md §8.6
    try:
        classic = data_utils.CIRDataset("cirr", "test1", "classic",
                                        TorchPreprocess(tf), root)
        idx_feats, idx_names = _ref_extract_index(ref_modules, classic,
                                                  wrapper)
        relative = data_utils.CIRDataset("cirr", "test1", "relative",
                                         TorchPreprocess(tf), root)
        want_pred, want_group = sub.generate_cirr_test_dicts(
            relative, wrapper, idx_feats, idx_names,
            wrapper.txt_processors)
    finally:
        data_utils.base_path = old_base

    classic_ours = CIRDataset("cirr", "test1", "classic", tf, root)
    relative_ours = CIRDataset("cirr", "test1", "relative", tf, root)
    index = extract_index_features(bb, params, classic_ours, 8,
                                   num_workers=0)
    got_pred, got_group = generate_cirr_test_dicts(bb, params, relative_ours,
                                                   index, 8)

    import numpy as np

    preds = generate_val_predictions(bb, params, relative_ours, index, 8)
    scores = np.asarray(query_scores(bb, preds, index))
    name_to_col = {n: i for i, n in enumerate(classic_ours.gallery_names)}
    pid_to_row = {str(int(p)): i for i, p in enumerate(preds["pairid"])}

    # unlike the clip4cir submission test (exact bit-ties), the blip2
    # scoring path runs a full Q-Former fusion forward on each side —
    # torch-vs-XLA f32 contraction noise is ~1e-7 on these logits
    # (test_blip24cir activation parity), so scores closer than EPS_TIE
    # can legitimately swap; EPS_TIE is far below any rank-meaningful gap
    EPS_TIE = 1e-5

    def assert_order_modulo_ties(pid, ours, ref):
        assert sorted(ours) == sorted(ref), pid
        row = scores[pid_to_row[pid]]
        i = 0
        while i < len(ours):
            j = i
            while (j < len(ours) and
                   abs(row[name_to_col[ours[j]]]
                       - row[name_to_col[ours[i]]]) < EPS_TIE):
                j += 1
            assert sorted(ours[i:j]) == sorted(ref[i:j]), (pid, i, j)
            i = j

    assert set(got_pred) == set(want_pred)
    for pid, ref_names in want_pred.items():
        assert_order_modulo_ties(pid, [str(x) for x in got_pred[pid]],
                                 ref_names)
    assert set(got_group) == set(want_group)
    for pid, ref_names in want_group.items():
        assert_order_modulo_ties(pid, [str(x) for x in got_group[pid]],
                                 ref_names)
