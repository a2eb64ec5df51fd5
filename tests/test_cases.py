"""Case-study + generic retrieval tooling tests (ref validate_case.py,
analysis_case.py, zscir/retrieval.py)."""

import json
import os

import jax
import numpy as np
import pytest

from spn4cir_tpu.data.datasets import CIRDataset
from spn4cir_tpu.data.transforms import ImageTransform
from spn4cir_tpu.eval.cases import compare_cases, dump_cases, export_case_images
from spn4cir_tpu.eval.generic_retrieval import (
    encode_paths,
    export_results,
    i2i_topk,
    list_images,
    t2i_topk,
)
from spn4cir_tpu.eval.retrieval import extract_index_features
from spn4cir_tpu.models.api import build_backbone
from tests.fixtures import make_fiq

TF = ImageTransform("targetpad", 32)


@pytest.fixture(scope="module")
def bb():
    return build_backbone("clip", clip_model_name="test-tiny")


@pytest.fixture(scope="module")
def params(bb):
    return bb.init_params(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def fiq_root(tmp_path_factory):
    return make_fiq(str(tmp_path_factory.mktemp("fiq")))


def test_dump_and_compare_cases(bb, params, fiq_root, tmp_path):
    classic = CIRDataset("fiq", "val", "classic", TF, fiq_root, ["dress"])
    relative = CIRDataset("fiq", "val", "relative", TF, fiq_root, ["dress"])
    index = extract_index_features(bb, params, classic, 4, num_workers=0)
    out = str(tmp_path / "cases" / "model_a.json")
    cases = dump_cases(bb, params, relative, index, out, top_k=5, batch_size=4)
    assert os.path.exists(out)
    assert len(cases) == len(relative.triplets)
    for c in cases:
        assert c["rank"] >= 0
        assert len(c["topk"]) == 5
        assert c["reference_name"] not in c["topk"][: c["rank"]]

    # synthetic comparison: force model A to fail, model B to win
    cases_b = [dict(c, rank=0) for c in cases]
    cases_a = [dict(c, rank=50) for c in cases]
    wins = compare_cases(cases_a, cases_b, fail_rank=10, win_rank=0)
    assert len(wins) == len(cases)

    name2path = dict(zip(classic.gallery_names, classic.gallery_paths))
    n = export_case_images(wins, name2path, str(tmp_path / "exported"), limit=2)
    assert n == 4  # 2 cases x (reference + target)


def test_generic_retrieval(bb, params, fiq_root, tmp_path):
    paths = list_images(os.path.join(fiq_root, "images"))
    assert len(paths) == 12
    feats = encode_paths(bb, params, paths, TF, batch_size=5)
    assert feats.shape == (12, bb.embed_dim)
    top = i2i_topk(feats, feats, k=3)
    assert top.shape == (12, 3)
    assert all(i not in top[i] for i in range(12))  # self excluded
    # text-to-image
    t = t2i_topk(bb, params, ["a blue dress"], feats, k=4)
    assert t.shape == (1, 4)
    export_results(paths[:2], paths, top[:2], str(tmp_path / "ret"))
    assert os.path.exists(tmp_path / "ret" / "query_0000")


def test_list_images_json_and_csv(tmp_path):
    items = ["/a.png", "/b.png"]
    jpath = str(tmp_path / "list.json")
    with open(jpath, "w") as f:
        json.dump(items, f)
    assert list_images(jpath) == items
    assert list_images("/a.png,/b.png") == items
