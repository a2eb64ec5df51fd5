"""Recall metrics vs a brute-force argsort oracle mirroring the reference
(`clip4cir/validate.py:19-51,111-156`)."""

import numpy as np
import jax.numpy as jnp

from spn4cir_tpu.eval import metrics as M


def _oracle_rank(scores, target, refer):
    """Reference semantics: sort descending, drop the reference entry, find
    the target position."""
    order = np.argsort(-scores, kind="stable")
    order = [i for i in order if i != refer]
    return order.index(target)


def test_target_ranks_match_oracle(rng):
    q, n = 20, 60
    scores = rng.randn(q, n).astype(np.float32)
    targets = rng.randint(0, n, q)
    refers = rng.randint(0, n, q)
    refers = np.where(refers == targets, (refers + 1) % n, refers)
    got = np.asarray(M.target_ranks(jnp.array(scores), jnp.array(targets), jnp.array(refers)))
    want = [_oracle_rank(scores[i], targets[i], refers[i]) for i in range(q)]
    np.testing.assert_array_equal(got, want)


def test_subset_ranks_match_oracle(rng):
    q, n, g = 15, 40, 6
    scores = rng.randn(q, n).astype(np.float32)
    members = np.stack([rng.choice(n, g, replace=False) for _ in range(q)])
    refers = members[:, 0]
    targets = members[:, 1]
    got = np.asarray(M.subset_ranks(jnp.array(scores), jnp.array(targets),
                                    jnp.array(refers), jnp.array(members)))
    for i in range(q):
        cands = [m for m in members[i] if m != refers[i]]
        order = sorted(cands, key=lambda m: -scores[i, m])
        assert got[i] == order.index(targets[i])


def test_recall_and_composites(rng):
    q, n = 30, 50
    scores = rng.randn(q, n).astype(np.float32)
    targets = rng.randint(0, n, q)
    refers = (targets + 1) % n
    fiq = M.fiq_metrics(jnp.array(scores), jnp.array(targets), jnp.array(refers))
    assert 0 <= fiq["recall_at10"] <= fiq["recall_at50"] <= 100
    members = np.stack([
        np.concatenate([[refers[i], targets[i]],
                        rng.choice(n, 4, replace=False)])
        for i in range(q)
    ])
    cirr = M.cirr_metrics(jnp.array(scores), jnp.array(targets),
                          jnp.array(refers), jnp.array(members))
    assert cirr["recall_at1"] <= cirr["recall_at5"] <= cirr["recall_at50"]
    assert cirr["arithmetic_mean"] == (cirr["recall_at5"] + cirr["group_recall_at1"]) / 2


def test_perfect_retrieval():
    # target column has the max score -> every recall is 100
    q, n = 5, 20
    scores = np.zeros((q, n), np.float32)
    targets = np.arange(q)
    refers = np.arange(q) + 10
    scores[np.arange(q), targets] = 10.0
    fiq = M.fiq_metrics(jnp.array(scores), jnp.array(targets), jnp.array(refers))
    assert fiq["recall_at10"] == 100.0


def test_reference_exclusion_matters():
    # reference outscores target; with exclusion target is rank 0
    scores = np.array([[5.0, 9.0, 1.0]], np.float32)
    r = M.target_ranks(jnp.array(scores), jnp.array([0]), jnp.array([1]))
    assert int(r[0]) == 0


def test_topk_names_excludes_reference():
    scores = np.array([[1.0, 9.0, 5.0, 3.0]], np.float32)
    top = np.asarray(M.topk_names(jnp.array(scores), jnp.array([1]), 3))
    assert 1 not in top[0]
    assert list(top[0]) == [2, 3, 0]


def test_subset_topk(rng):
    scores = np.array([[1.0, 9.0, 5.0, 3.0, 7.0]], np.float32)
    members = np.array([[1, 2, 3, 4]])
    top = np.asarray(M.subset_topk_names(jnp.array(scores), jnp.array([1]),
                                         jnp.array(members), 3))
    assert list(top[0]) == [4, 2, 3]


def test_fiq_average():
    per = [
        {"recall_at10": 30.0, "recall_at50": 50.0},
        {"recall_at10": 40.0, "recall_at50": 60.0},
    ]
    avg = M.fiq_average(per)
    assert avg["avg_recall_at10"] == 35.0
    assert avg["mean_recall"] == 45.0


def test_fiq_val_type1_retrieval_end_to_end(tmp_path_factory):
    """--fiq_val_type 1 (VAL-subset gallery): query gids must be resolved
    against the INDEX's name list, not the relative dataset's full gallery
    (they differ in size and order under type 1)."""
    import jax

    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import fiq_val_retrieval
    from spn4cir_tpu.models.api import build_backbone
    from tests.fixtures import make_fiq

    root = make_fiq(str(tmp_path_factory.mktemp("fiq_t1")))
    bb = build_backbone("clip", clip_model_name="test-tiny")
    params = bb.init_params(jax.random.PRNGKey(0))
    tf = ImageTransform("targetpad", bb.input_dim)
    got = fiq_val_retrieval(bb, params, root, "dress", tf, fiq_val_type=1)
    assert 0.0 <= got["recall_at10"] <= 100.0
    assert got["recall_at50"] == 100.0  # tiny gallery: everything in top-50
