"""End-to-end Recall parity: the reference's OWN validate pipeline (torch,
loaded read-only from /root/reference/clip4cir) vs this framework, with the
SAME converted weights and the SAME on-disk dataset.

This is the tolerance ladder (SURVEY.md §7 hard parts) run with the
reference code literally in the loop as the oracle:
  rung 1 — gallery/query feature cosines > 0.999,
  rung 2 — identical top-K retrieved ids per query,
  rung 3 — identical Recall@K numbers (FIQ R@10/50; CIRR R@K + subset).

No real FashionIQ/CIRR assets or upstream checkpoints exist in this
environment (zero egress), so the weights are random-but-shared and the
dataset is a fixture in the reference's exact JSON layout; the code path
exercised on both sides is the full production eval stack.
"""

import importlib
import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/clip4cir"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference repo not mounted")

from tests.fixtures import make_cirr, make_fiq  # noqa: E402


def _module_stub(name):
    """A sys.modules-insertable stub with a real __spec__ — a bare
    ModuleType has __spec__=None, which makes importlib.util.find_spec
    (e.g. transformers' ftfy availability probe) raise ValueError in any
    LATER test that imports transformers for the first time."""
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod




def _force_inprocess_dataloaders(mods):
    """The reference hardcodes num_workers=cpu_count()/8; forking DataLoader
    workers from this multithreaded (JAX) test process intermittently
    deadlocks the whole suite on the 1-core host. The oracle's numerics
    don't depend on workers — force in-process loading."""
    import torch.utils.data as _tud

    orig = _tud.DataLoader

    def dl0(*a, **k):
        k["num_workers"] = 0
        k.pop("prefetch_factor", None)
        k.pop("persistent_workers", None)
        return orig(*a, **k)

    for mod in mods.values():
        if getattr(mod, "DataLoader", None) is orig:
            mod.DataLoader = dl0


def _stub_torchvision():
    if "pkg_resources" not in sys.modules:
        # clip/clip.py:6 does `from pkg_resources import packaging` and then
        # uses packaging.version
        import packaging
        import packaging.version
        pr = _module_stub("pkg_resources")
        pr.packaging = packaging
        sys.modules["pkg_resources"] = pr
    if "ftfy" not in sys.modules:
        # the vendored SimpleTokenizer calls ftfy.fix_text in basic_clean;
        # identity is behavior-preserving for clean ASCII fixture captions
        ftfy = _module_stub("ftfy")
        ftfy.fix_text = lambda s: s
        sys.modules["ftfy"] = ftfy
    if "torchvision" in sys.modules:
        return
    tv = _module_stub("torchvision")
    tfm = _module_stub("torchvision.transforms")
    ftm = _module_stub("torchvision.transforms.functional")
    for name in ("CenterCrop", "Compose", "InterpolationMode", "Normalize",
                 "Resize", "ToTensor", "RandomHorizontalFlip"):
        # permissive constructors: reference models BUILD these at init time
        # (e.g. tgcir targetpad_transform inside CIRPlus.__init__) but the
        # oracles never CALL them — we always pass our own preprocess
        setattr(tfm, name, type(name, (), {
            "BICUBIC": None,
            "__init__": lambda self, *a, **k: None}))
    ftm.pad = None
    tfm.functional = ftm
    tv.transforms = tfm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tfm
    sys.modules["torchvision.transforms.functional"] = ftm


@pytest.fixture(scope="module")
def ref_modules():
    """Import the reference's clip4cir modules (flat-name imports)."""
    from tests.refmods import restore, save_and_clear

    _stub_torchvision()
    sys.path.insert(0, REF_DIR)
    names = ["clip", "data_utils", "utils", "validate", "models",
             "cirr_test_submission"]
    saved = save_and_clear(names)  # incl. submodules — see tests/refmods.py
    try:
        mods = {n: importlib.import_module(n) for n in names}
        _force_inprocess_dataloaders(mods)
        yield mods
    finally:
        sys.path.remove(REF_DIR)
        restore(names, saved)


class TorchPreprocess:
    """Shared pixel pipeline: our ImageTransform, emitted as CHW torch
    tensors for the reference DataLoader (picklable for workers)."""

    def __init__(self, tf):
        self.tf = tf

    def __call__(self, image):
        return torch.tensor(self.tf(image)).permute(2, 0, 1)


class RefCIRShim(torch.nn.Module):
    """The reference CIRPlus eval interface (models.py:19-56) around a
    vendored-CLIP torch model: encode_image/encode_text(strings)/
    element_wise_sum/output_dim."""

    def __init__(self, clip_model, clip_pkg):
        super().__init__()
        self.clip = clip_model
        self._tokenize = clip_pkg.tokenize
        self.output_dim = clip_model.visual.output_dim
        self.combining_function = self.element_wise_sum

    def encode_image(self, image):
        return self.clip.encode_image(image)

    def encode_text(self, text):
        return self.clip.encode_text(self._tokenize(text))

    def element_wise_sum(self, refer_image_feats, text_feats):
        return refer_image_feats + text_feats


@pytest.fixture(scope="module")
def shared_model(ref_modules):
    """Reference torch CLIP at our test-tiny geometry + converted params."""
    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.models.convert import convert_clip_state_dict

    bb = build_backbone("clip", clip_model_name="test-tiny")
    cfg = bb.cfg
    ref_clip_model = ref_modules["clip"].model.CLIP(
        embed_dim=cfg.embed_dim, image_resolution=cfg.image_resolution,
        vision_layers=cfg.vision_layers, vision_width=cfg.vision_width,
        vision_patch_size=cfg.vision_patch_size,
        context_length=cfg.context_length, vocab_size=cfg.vocab_size,
        transformer_width=cfg.transformer_width,
        transformer_heads=cfg.transformer_heads,
        transformer_layers=cfg.transformer_layers)
    torch.manual_seed(0)
    with torch.no_grad():
        for p in ref_clip_model.parameters():
            p.copy_(torch.randn_like(p) * 0.08)
    ref_clip_model = ref_clip_model.float().eval()
    shim = RefCIRShim(ref_clip_model, ref_modules["clip"])
    params = jax.tree_util.tree_map(jnp.asarray, convert_clip_state_dict(
        ref_clip_model.state_dict(), num_vision_layers=cfg.vision_layers,
        num_text_layers=cfg.transformer_layers, is_vit=cfg.is_vit))
    return bb, params, shim


def test_fiq_recall_parity(tmp_path_factory, ref_modules, shared_model):
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import fiq_val_retrieval

    bb, params, shim = shared_model
    root = make_fiq(str(tmp_path_factory.mktemp("fiq") / "fashionIQ_dataset"),
                    n_images=40, n_val=16, extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)

    validate = ref_modules["validate"]
    validate.args = SimpleNamespace(data_path=root, fiq_val_type=0)
    dev = torch.device("cpu")
    classic = ref_modules["data_utils"].CIRDataset(
        "fiq", "val", "classic", TorchPreprocess(tf), root, ["dress"])
    idx_feats, idx_names = ref_modules["utils"].extract_index_features(
        classic, shim, device=dev)
    relative = ref_modules["data_utils"].CIRDataset(
        "fiq", "val", "relative", TorchPreprocess(tf), root, ["dress"])
    want_r10, want_r50 = validate.compute_fiq_val_metrics(
        relative, shim, idx_feats, idx_names, device=dev)

    got = fiq_val_retrieval(bb, params, root, "dress", tf)
    # rung 3: identical Recall@K — identical hit COUNTS; the percentage is
    # compared at 1e-4 only because ours is f32 and torch's is f64 (one
    # count step is 100/N >> 1e-4)
    assert got["recall_at10"] == pytest.approx(want_r10, abs=1e-4)
    assert got["recall_at50"] == pytest.approx(want_r50, abs=1e-4)

    # rung 1: gallery feature cosines vs the reference's own features
    from spn4cir_tpu.eval.retrieval import extract_index_features
    classic_ours = __import__("spn4cir_tpu.data.datasets",
                              fromlist=["CIRDataset"]).CIRDataset(
        "fiq", "val", "classic", tf, root, ["dress"])
    index = extract_index_features(bb, params, classic_ours, 8)
    ours_feats = np.asarray(index.target)
    ref_feats = idx_feats.numpy()
    ref_feats = ref_feats / np.linalg.norm(ref_feats, axis=-1, keepdims=True)
    # align by name order
    name_to_row = {n: i for i, n in enumerate(idx_names)}
    order = [name_to_row[n] for n in classic_ours.gallery_names]
    cos = (ours_feats * ref_feats[order]).sum(-1)
    assert cos.min() > 0.999, cos.min()


def test_cirr_recall_parity(tmp_path_factory, ref_modules, shared_model):
    from pathlib import Path

    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import cirr_val_retrieval

    bb, params, shim = shared_model
    parent = tmp_path_factory.mktemp("cirr")
    root = make_cirr(str(parent / "cirr_dataset"), n_images=30, n_val=12,
                     extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)

    data_utils = ref_modules["data_utils"]
    validate = ref_modules["validate"]
    # the reference hardcodes classic-mode image roots at
    # base_path/'cirr_dataset' (data_utils.py:313, quirk SURVEY.md §8.6)
    old_base = data_utils.base_path
    data_utils.base_path = Path(parent)
    try:
        validate.args = SimpleNamespace(data_path=root, fiq_val_type=0)
        dev = torch.device("cpu")
        classic = data_utils.CIRDataset("cirr", "val", "classic",
                                        TorchPreprocess(tf), root)
        idx_feats, idx_names = ref_modules["utils"].extract_index_features(
            classic, shim, device=dev)
        relative = data_utils.CIRDataset("cirr", "val", "relative",
                                         TorchPreprocess(tf), root)
        (want_gr1, want_gr2, want_gr3, want_r1, want_r5, want_r10,
         want_r50) = validate.compute_cirr_val_metrics(
            relative, shim, idx_feats, idx_names, device=dev)
    finally:
        data_utils.base_path = old_base

    got = cirr_val_retrieval(bb, params, root, tf)
    for key, want in [("recall_at1", want_r1), ("recall_at5", want_r5),
                      ("recall_at10", want_r10), ("recall_at50", want_r50),
                      ("group_recall_at1", want_gr1),
                      ("group_recall_at2", want_gr2),
                      ("group_recall_at3", want_gr3)]:
        # identical hit counts (1e-4 absorbs f32-vs-f64 percentage rounding;
        # one count step is 100/N >> 1e-4)
        assert got[key] == pytest.approx(want, abs=1e-4), (key, got[key], want)


def test_topk_order_parity(tmp_path_factory, ref_modules, shared_model):
    """rung 2: the full ranked gallery order matches per query (FIQ)."""
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import (extract_index_features,
                                            generate_val_predictions,
                                            query_scores)

    bb, params, shim = shared_model
    root = make_fiq(str(tmp_path_factory.mktemp("fiq2") / "fashionIQ_dataset"),
                    n_images=40, n_val=16, extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)

    # reference side: predicted features + argsorted gallery names
    validate = ref_modules["validate"]
    validate.args = SimpleNamespace(data_path=root, fiq_val_type=0)
    dev = torch.device("cpu")
    classic = ref_modules["data_utils"].CIRDataset(
        "fiq", "val", "classic", TorchPreprocess(tf), root, ["dress"])
    idx_feats, idx_names = ref_modules["utils"].extract_index_features(
        classic, shim, device=dev)
    relative = ref_modules["data_utils"].CIRDataset(
        "fiq", "val", "relative", TorchPreprocess(tf), root, ["dress"])
    pred, tgt_names, ref_names = validate.generate_fiq_val_predictions(
        shim, relative, idx_names, idx_feats, device=dev)
    import torch.nn.functional as F
    ref_sorted = np.array(idx_names)[
        torch.argsort(1 - pred @ F.normalize(idx_feats, dim=-1).float().T,
                      dim=-1).numpy()]

    # our side
    classic_ours = CIRDataset("fiq", "val", "classic", tf, root, ["dress"])
    relative_ours = CIRDataset("fiq", "val", "relative", tf, root, ["dress"])
    index = extract_index_features(bb, params, classic_ours, 8)
    preds = generate_val_predictions(bb, params, relative_ours, index, 8)
    scores = np.asarray(query_scores(bb, preds, index))
    ours_sorted = np.array(classic_ours.gallery_names)[
        np.argsort(-scores, axis=-1, kind="stable")]
    np.testing.assert_array_equal(ours_sorted, ref_sorted)


def test_cirr_submission_parity(tmp_path_factory, ref_modules, shared_model):
    """The CIRR test-server submission dicts — pairid -> top-50 global and
    top-3 subset names — byte-equal to the reference's own
    cirr_test_submission.generate_cirr_test_dicts on the test1 split."""
    from pathlib import Path

    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import extract_index_features
    from spn4cir_tpu.eval.submission import generate_cirr_test_dicts

    bb, params, shim = shared_model
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
        idx_feats, idx_names = ref_modules["utils"].extract_index_features(
            classic, shim, device=torch.device("cpu"))
        relative = data_utils.CIRDataset("cirr", "test1", "relative",
                                         TorchPreprocess(tf), root)
        want_pred, want_group = sub.generate_cirr_test_dicts(
            relative, shim, idx_feats, idx_names)
    finally:
        data_utils.base_path = old_base

    from spn4cir_tpu.eval.retrieval import (generate_val_predictions,
                                            query_scores)

    classic_ours = CIRDataset("cirr", "test1", "classic", tf, root)
    relative_ours = CIRDataset("cirr", "test1", "relative", tf, root)
    index = extract_index_features(bb, params, classic_ours, 8,
                                   num_workers=0)
    got_pred, got_group = generate_cirr_test_dicts(bb, params, relative_ours,
                                                   index, 8)

    # tie-aware order equality: at tiny geometry two distinct gallery rows
    # can collide to the SAME f32 score on one side while differing by an
    # ulp on the other (different contraction order); rank order within an
    # exact tie is meaningless, so ties may permute — everything else must
    # match positionally
    preds = generate_val_predictions(bb, params, relative_ours, index, 8)
    scores = np.asarray(query_scores(bb, preds, index))
    name_to_col = {n: i for i, n in enumerate(classic_ours.gallery_names)}
    pid_to_row = {str(int(p)): i for i, p in enumerate(preds["pairid"])}

    def assert_order_modulo_ties(pid, ours, ref):
        assert sorted(ours) == sorted(ref), pid
        row = scores[pid_to_row[pid]]
        i = 0
        while i < len(ours):
            s = row[name_to_col[ours[i]]]
            j = i
            while j < len(ours) and row[name_to_col[ours[j]]] == s:
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
