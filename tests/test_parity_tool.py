"""Parity-ladder tool self-tests (tools/parity_check.py)."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import parity_check  # noqa: E402


def _dump(rng, drift=0.0):
    n, q, d = 20, 8, 16
    index = rng.randn(n, d).astype(np.float32)
    query = rng.randn(q, d).astype(np.float32)
    return {
        "index_feats": index + drift * rng.randn(n, d).astype(np.float32),
        "query_feats": query,
        "target_gid": rng.randint(0, n, q),
        "refer_gid": (rng.randint(0, n, q) + 1) % n,
    }


def test_identical_dumps_pass(rng):
    a = _dump(rng)
    report = parity_check.compare(a, {k: v.copy() for k, v in a.items()},
                                  ks=(5, 10))
    assert report["index_feats_rung1_pass"]
    assert report["rung2_topk_match_frac"] == 1.0
    assert report["rung3_pass"]
    assert report["recall_at5_delta"] == 0.0


def test_drifted_features_fail_rung1(rng):
    a = _dump(rng)
    b = dict(a)
    b["index_feats"] = a["index_feats"] + 0.5 * np.random.RandomState(1).randn(
        *a["index_feats"].shape).astype(np.float32)
    report = parity_check.compare(a, b, ks=(5,))
    assert not report["index_feats_rung1_pass"]
