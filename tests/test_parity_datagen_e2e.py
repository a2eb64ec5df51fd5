"""Reference-in-the-loop parity for the datagen (L6) pipeline.

The eval stack already has the reference's own torch code as the oracle
(test_parity_e2e and friends); this file closes the same loop for the
"scaling positives" data factory:

  - `zscir/get_cir_data.py` (the modified-text generator): the reference's
    own get_fiq/get_cirr run on a fixture tree, and our generator must
    produce the IDENTICAL triplet list — same partners, same template
    captions, same overflow fallbacks, same K-cap subset — because both
    sides consume the identical Mersenne rng stream (random.seed(s) vs
    random.Random(s)) with one sample() call per anchor in imagename order
    (ref get_cir_data.py:58-90).
  - `zscir/srm_utils.get_srm_out` (the pair matcher): the reference's own
    rank/negative loop run on injected similarity matrices, and our
    vectorized srm_scores must emit the same six tensors
    (ref srm_utils.py:142-183).

No real images/checkpoints exist here (zero egress), so captions and
similarity matrices are synthetic — the code paths exercised are the full
production ones on both sides.
"""

import importlib
import json
import os
import random
import sys
from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

ZS_REF = "/root/reference/zscir"
pytestmark = pytest.mark.skipif(not os.path.isdir(ZS_REF),
                                reason="reference repo not mounted")

from tests.fixtures import make_cirr, make_fiq  # noqa: E402
from tests.test_parity_e2e import _module_stub, _stub_torchvision  # noqa: E402


def _stub_timm():
    """zscir/unicom imports `from timm.models.layers import DropPath,
    trunc_normal_` at module load; timm is not installed. The SRM oracle
    (get_srm_out) never constructs the Unicom tower, so inert stand-ins are
    behavior-preserving."""
    if "timm" in sys.modules:
        return
    timm = _module_stub("timm")
    models = _module_stub("timm.models")
    layers = _module_stub("timm.models.layers")
    layers.DropPath = type("DropPath", (torch.nn.Module,), {})
    layers.trunc_normal_ = lambda *a, **k: None
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


# flat module names the zscir scripts import; other parity suites load
# same-named modules from clip4cir — always swap cleanly
_FLAT = ["clip", "data_utils", "data_utils_gen", "utils", "get_cir_data",
         "srm_utils", "unicom", "prompt", "prompts"]


@pytest.fixture()
def zscir_import():
    _stub_torchvision()
    _stub_timm()
    # srm_utils.py:7 additionally does `from torchvision.transforms import
    # transforms, ...` (the submodule re-import idiom)
    tfm = sys.modules["torchvision.transforms"]
    if not hasattr(tfm, "transforms"):
        tfm.transforms = tfm
    from tests.refmods import restore, save_and_clear

    saved = save_and_clear(_FLAT)  # incl. submodules — see tests/refmods.py
    sys.path.insert(0, ZS_REF)
    try:
        yield importlib.import_module
    finally:
        sys.path.remove(ZS_REF)
        restore(_FLAT, saved)


LONG_CAPTION = ("an exceptionally detailed garment " * 20).strip()  # > 77 tok


def _write_it_list(path, names):
    """Caption every train image; one caption is overlong to exercise the
    tokenizer-overflow fallback (quirk SURVEY.md par.8.14) on both sides."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    items = [{"image_id": n,
              "caption": LONG_CAPTION if i == 1 else f"a {n} with trim {i}"}
             for i, n in enumerate(names)]
    with open(path, "w") as f:
        json.dump(items, f)
    return {it["image_id"]: it["caption"] for it in items}


def _as_plain_dicts(triplets):
    return [dict(t) for t in triplets]


def test_get_cir_data_fiq_matches_reference(tmp_path, monkeypatch,
                                            zscir_import):
    """Uniform partner sampling, two templates, k=2: identical triplet
    stream (dict-equal element-wise, order preserved)."""
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.datagen.generate import (generate_extended_triplets,
                                              load_it_list)

    root = make_fiq(str(tmp_path / "fashionIQ_dataset"),
                    dress_types=("dress", "shirt", "toptee"))
    ds = CIRDataset("fiq", "train", "relative",
                    ImageTransform("targetpad", 224), root)
    it_path = str(tmp_path / "mm_data" / "fiq" / "fashioniq_it_llava_10.json")
    name2cap = _write_it_list(it_path, ds.imagenames)

    monkeypatch.chdir(tmp_path)
    gcd = zscir_import("get_cir_data")
    gcd.args = SimpleNamespace(data="fiq", seed=7, refer=False, model="clip",
                               k=2, K=-1, i2i_rank=-1, i2i_rank_max=-1,
                               use_llm=0, p_list="0,1", mllm="llava",
                               word_num=10)
    gcd.prompt_ids = [0, 1]
    random.seed(7)
    gcd.get_fiq()
    with open(tmp_path / "fashionIQ_dataset" / "captions"
              / "cap.extend_clip.train.json") as f:
        want = json.load(f)

    got = generate_extended_triplets(
        ds, load_it_list(it_path), k=2, prompt_ids=(0, 1), seed=7)
    assert _as_plain_dicts(got) == _as_plain_dicts(want)
    # the overlong caption actually hit the overflow fallback: every
    # template composed over it collapses to caption2 alone
    hit = [t for t in got if t["caption1"] == LONG_CAPTION]
    assert hit and all(t["captions"] == [t["caption2"]] * 2 for t in hit)


def test_get_cir_data_fiq_rank_window_refer_kcap(tmp_path, monkeypatch,
                                                 zscir_import):
    """The README's production config shape: --refer anchors, an
    i2i-similarity rank window, template 2, and a --K total cap."""
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.datagen.generate import (generate_extended_triplets,
                                              load_it_list)

    root = make_fiq(str(tmp_path / "fashionIQ_dataset"),
                    dress_types=("dress", "shirt", "toptee"))
    ds = CIRDataset("fiq", "train", "relative",
                    ImageTransform("targetpad", 224), root)
    it_path = str(tmp_path / "mm_data" / "fiq" / "fashioniq_it_llava_4.json")
    _write_it_list(it_path, ds.imagenames)

    m = len(ds.imagenames)
    rng = np.random.default_rng(3)
    i2i = rng.standard_normal((m, m)).astype(np.float32)
    fake = torch.from_numpy(rng.standard_normal((m, m)).astype(np.float32))
    torch.save([fake, fake, torch.from_numpy(i2i.copy()), fake],
               tmp_path / "mm_data" / "fiq" / "sims.pth")

    monkeypatch.chdir(tmp_path)
    gcd = zscir_import("get_cir_data")
    gcd.args = SimpleNamespace(data="fiq", seed=11, refer=True, model="clip",
                               k=2, K=6, i2i_rank=1, i2i_rank_max=5,
                               use_llm=0, p_list="2", mllm="llava",
                               word_num=4)
    gcd.prompt_ids = [2]
    random.seed(11)
    gcd.get_fiq()
    with open(tmp_path / "fashionIQ_dataset" / "captions"
              / "cap.extend_clip.train.json") as f:
        want = json.load(f)
    assert len(want) == 6  # the K-cap subset engaged

    got = generate_extended_triplets(
        ds, load_it_list(it_path), k=2, prompt_ids=(2,), refer_only=True,
        total_cap=6, i2i_ranks=np.argsort(-i2i, axis=1), rank_lo=1,
        rank_hi=5, seed=11)
    assert _as_plain_dicts(got) == _as_plain_dicts(want)


def test_get_cir_data_cirr_matches_reference(tmp_path, monkeypatch,
                                             zscir_import):
    """CIRR schema (target_hard/reference/caption + pairid=0 and img_set
    placeholders, quirk SURVEY.md par.8.13), uniform sampling."""
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.datagen.generate import (generate_extended_triplets,
                                              load_it_list)

    root = make_cirr(str(tmp_path / "cirr_dataset"), extended=False)
    ds = CIRDataset("cirr", "train", "relative",
                    ImageTransform("targetpad", 224), root)
    it_path = str(tmp_path / "mm_data" / "cirr" / "cirr_it_llava_10.json")
    _write_it_list(it_path, ds.imagenames)

    monkeypatch.chdir(tmp_path)
    gcd = zscir_import("get_cir_data")
    gcd.args = SimpleNamespace(data="cirr", seed=5, refer=False,
                               model="clip", k=3, K=-1, i2i_rank=-1,
                               i2i_rank_max=-1, use_llm=0, p_list="0,1",
                               mllm="llava", word_num=10)
    gcd.prompt_ids = [0, 1]
    random.seed(5)
    gcd.get_cirr()
    with open(tmp_path / "cirr_dataset" / "cirr" / "captions"
              / "cap.rc2.train.extend_clip.json") as f:
        want = json.load(f)

    got = generate_extended_triplets(
        ds, load_it_list(it_path), k=3, prompt_ids=(0, 1), seed=5)
    assert _as_plain_dicts(got) == _as_plain_dicts(want)


def _srm_fixture_tree(tmp_path, n_images=1100):
    """A JSON-only fiq tree whose train set is a generated cap.extend_zs
    file (the zscir loaders REPLACE human triplets, quirk SURVEY.md
    par.8.16). >=1001 unique images because the reference hardcodes
    K=1000 negative slots (srm_utils.py:155-160) and a smaller gallery
    breaks its own row assignment. mode='relative' init never decodes
    images, so none are materialized."""
    root = tmp_path / "fashionIQ_dataset"
    (root / "captions").mkdir(parents=True)
    (root / "image_splits").mkdir()
    with open(root / "captions" / "cap.dress.train.json", "w") as f:
        json.dump([], f)
    with open(root / "image_splits" / "split.dress.train.json", "w") as f:
        json.dump([], f)
    names = [f"im{i:04d}" for i in range(n_images)]
    trips = [{"candidate": names[i], "target": names[(i * 7 + 1) % n_images],
              "captions": [f"cap {i} alpha", f"cap {i} beta"]}
             for i in range(n_images)]
    with open(root / "captions" / "cap.extend_zs.train.json", "w") as f:
        json.dump(trips, f)
    return str(root), n_images


def test_srm_out_matches_reference(tmp_path, zscir_import):
    """The reference's own get_srm_out (argsort-position ranks + top-1000
    intra-modal negatives with the diagonal filled) vs our vectorized
    srm_scores, on identical injected similarity matrices: all six output
    tensors equal."""
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.datagen.srm import compute_sims, srm_scores

    root, m = _srm_fixture_tree(tmp_path)

    rng = np.random.default_rng(17)
    dim = 16
    clip_img = rng.standard_normal((m, dim)).astype(np.float32)
    clip_txt = rng.standard_normal((m, dim)).astype(np.float32)
    srm_img = rng.standard_normal((m, dim)).astype(np.float32)
    srm_txt = rng.standard_normal((m, dim)).astype(np.float32)
    sims = compute_sims(clip_img, clip_txt, srm_img, srm_txt)

    su = zscir_import("srm_utils")
    su.args = SimpleNamespace(dataset="fiq", data_path=root)
    su.dress_types = ["dress"]
    su.srm_path = str(tmp_path / "srm.pth")
    # get_srm_out mutates the intra matrices in place (fill_diagonal_)
    su.sims_cross_i2t = torch.from_numpy(sims["i2t"].copy())
    su.sims_cross_t2i = torch.from_numpy(sims["t2i"].copy())
    su.sims_intra_i2i = torch.from_numpy(sims["i2i"].copy())
    su.sims_intra_t2t = torch.from_numpy(sims["t2t"].copy())
    su.get_srm_out()
    r_fn, m_fn, t_fn, rt, rm, mt = torch.load(su.srm_path,
                                              weights_only=False)

    ds = CIRDataset("fiq", "train", "relative", None, root, ["dress"],
                    replace_extended=True, extend_suffix="zs")
    assert len(ds.triplets) == m and ds.num_unique_images == m
    refer = np.array([ds.imagename2id[t["reference_name"]]
                      for t in ds.triplets])
    target = np.array([ds.imagename2id[t["target_name"]]
                       for t in ds.triplets])
    got = srm_scores(sims, refer, target, k_negatives=1000)

    np.testing.assert_array_equal(got["rt"], rt.numpy())
    np.testing.assert_array_equal(got["rm"], rm.numpy())
    np.testing.assert_array_equal(got["mt"], mt.numpy())

    def assert_negatives_modulo_ties(got_idx, want_idx, score_rows):
        """Index lists may permute within runs of EXACTLY equal f32 scores
        (neither torch.argsort nor argpartition is stable; rank order
        within a tie is meaningless) — the score streams must be
        identical, which pins everything except tie order."""
        if np.array_equal(got_idx, want_idx):
            return
        np.testing.assert_array_equal(
            np.take_along_axis(score_rows, got_idx, axis=1),
            np.take_along_axis(score_rows, want_idx, axis=1))

    i2i_filled = sims["i2i"].copy()
    np.fill_diagonal(i2i_filled, -1e4)
    t2t_filled = sims["t2t"].copy()
    np.fill_diagonal(t2t_filled, -1e4)
    assert_negatives_modulo_ties(got["r_fn"], r_fn.numpy(),
                                 i2i_filled[refer])
    assert_negatives_modulo_ties(got["t_fn"], t_fn.numpy(),
                                 i2i_filled[target])
    assert_negatives_modulo_ties(got["m_fn"], m_fn.numpy(), t2t_filled)
