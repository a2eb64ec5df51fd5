"""InfoNCE loss family vs numpy oracles (SURVEY.md §4 test plan)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spn4cir_tpu.ops import (
    bank_infonce,
    combine_negtype,
    in_batch_infonce,
    l2_normalize,
    max_query_infonce,
    negtype_losses,
    sampled_neg_infonce,
)


def np_softmax_ce(logits, labels):
    logits = logits - logits.max(axis=1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return float(-logp[np.arange(len(labels)), labels].mean())


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_in_batch_infonce_oracle(rng):
    q = _norm(rng.randn(16, 32)).astype(np.float32)
    t = _norm(rng.randn(16, 32)).astype(np.float32)
    tau = 0.05
    got = float(in_batch_infonce(jnp.array(q), jnp.array(t), tau))
    want = np_softmax_ce(q @ t.T / tau, np.arange(16))
    assert abs(got - want) < 1e-5


def test_bank_infonce_oracle(rng):
    q = _norm(rng.randn(8, 16)).astype(np.float32)
    bank = _norm(rng.randn(100, 16)).astype(np.float32)
    labels = rng.randint(0, 100, size=8)
    tau = 0.02
    got = float(bank_infonce(jnp.array(q), jnp.array(bank), jnp.array(labels), tau))
    want = np_softmax_ce(q @ bank.T / tau, labels)
    assert abs(got - want) < 1e-5


def test_sampled_neg_infonce_oracle(rng):
    q = _norm(rng.randn(8, 16)).astype(np.float32)
    bank = _norm(rng.randn(50, 16)).astype(np.float32)
    labels = rng.randint(0, 50, size=8)
    negs = rng.randint(0, 50, size=(8, 10))
    tau = 0.05
    got = float(
        sampled_neg_infonce(jnp.array(q), jnp.array(bank), jnp.array(labels), jnp.array(negs), tau)
    )
    cands = np.concatenate([bank[labels][:, None], bank[negs]], axis=1)
    logits = np.einsum("bd,bnd->bn", q, cands) / tau
    want = np_softmax_ce(logits, np.zeros(8, np.int64))
    assert abs(got - want) < 1e-5


def test_max_query_infonce_oracle(rng):
    f = _norm(rng.randn(4, 8)).astype(np.float32)
    bank = rng.randn(20, 6, 8).astype(np.float32)
    labels = rng.randint(0, 20, size=4)
    tau = 0.05
    got = float(max_query_infonce(jnp.array(f), jnp.array(bank), jnp.array(labels), tau))
    sims = np.einsum("bd,mqd->bmq", f, bank).max(axis=-1) / tau
    want = np_softmax_ce(sims, labels)
    assert abs(got - want) < 1e-5


def test_negtype_losses_oracle(rng):
    """Per-sample-loop oracle mirroring clip4cir/models_negtype.py:53-128."""
    b, d = 6, 12
    refer = rng.randn(b, d).astype(np.float32)
    text = rng.randn(b, d).astype(np.float32)
    target = _norm(rng.randn(b, d)).astype(np.float32)
    tau = 0.05
    losses = negtype_losses(jnp.array(refer), jnp.array(text), jnp.array(target), tau)

    query = _norm(refer + text)
    want_target = np_softmax_ce(query @ target.T / tau, np.arange(b))
    want_query = np_softmax_ce(target @ query.T / tau, np.arange(b))
    # text negatives: per reference image i, vary text j
    text_rows = np.stack([_norm(refer[i] + text) @ target[i] / tau for i in range(b)])
    want_text = np_softmax_ce(text_rows, np.arange(b))
    # refer negatives: per text i, vary reference j
    refer_rows = np.stack([_norm(refer + text[i]) @ target[i] / tau for i in range(b)])
    want_refer = np_softmax_ce(refer_rows, np.arange(b))

    assert abs(float(losses["target"]) - want_target) < 1e-5
    assert abs(float(losses["query"]) - want_query) < 1e-5
    assert abs(float(losses["text"]) - want_text) < 1e-5
    assert abs(float(losses["refer"]) - want_refer) < 1e-5

    # bitmask combination: 15 = all four averaged
    all_avg = combine_negtype(losses, 15)
    want_avg = (want_target + want_query + want_text + want_refer) / 4
    assert abs(float(all_avg) - want_avg) < 1e-5
    # 4 = target only (bit2)
    assert abs(float(combine_negtype(losses, 4)) - want_target) < 1e-5
    with pytest.raises(ValueError):
        combine_negtype(losses, 0)


def test_bank_infonce_grad_flows(rng):
    q = jnp.array(_norm(rng.randn(4, 8)).astype(np.float32))
    bank = jnp.array(_norm(rng.randn(30, 8)).astype(np.float32))
    labels = jnp.array(rng.randint(0, 30, size=4))

    g = jax.grad(lambda q_: bank_infonce(q_, bank, labels, 0.05))(q)
    assert g.shape == q.shape
    assert bool(jnp.any(g != 0))


def test_l2_normalize():
    x = jnp.array([[3.0, 4.0]])
    np.testing.assert_allclose(np.asarray(l2_normalize(x)), [[0.6, 0.8]], rtol=1e-6)


def test_sample_negatives_distribution():
    """Host negative sampling matches the reference's draw semantics
    (random.sample over range(M) minus the positive,
    clip4cir/models.py:109-113): distinct within a row, never the positive,
    uniform over the rest, stateless-reproducible."""
    from spn4cir_tpu.train.stage2 import sample_negatives

    M, NEG = 23, 7
    pos = np.array([0, 5, 22, 11])
    rng = np.random.RandomState(7)
    out = sample_negatives(rng, pos, M, NEG)
    assert out.shape == (4, NEG)
    for i, p in enumerate(pos):
        row = out[i]
        assert len(set(row.tolist())) == NEG, "duplicates within a row"
        assert p not in row, "positive sampled as negative"
        assert row.min() >= 0 and row.max() < M

    # reproducible from the same seed
    out2 = sample_negatives(np.random.RandomState(7), pos, M, NEG)
    np.testing.assert_array_equal(out, out2)

    # every non-positive id reachable (coverage over many draws)
    rng = np.random.RandomState(0)
    seen = set()
    for _ in range(300):
        seen.update(sample_negatives(rng, np.array([3]), 10, 4)[0].tolist())
    assert seen == set(range(10)) - {3}

    with pytest.raises(ValueError):
        sample_negatives(np.random.RandomState(0), np.array([0]), 4, 4)
