"""Pallas max-over-query bank InfoNCE (blip2 loss) vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.ops.infonce import max_query_infonce as xla_loss
from spn4cir_tpu.ops.maxquery_kernels import (
    max_query_infonce,
    max_query_infonce_pallas,
)


def _case(rng, b, m, q, d):
    feats = rng.randn(b, d).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    bank = rng.randn(m, q, d).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    labels = rng.randint(0, m, size=b)
    return jnp.asarray(feats), jnp.asarray(bank), jnp.asarray(labels)


@pytest.mark.parametrize("b,m,q,d", [
    (8, 40, 4, 32),
    (9, 70, 8, 16),    # ragged B and M
])
def test_forward_matches_xla(rng, b, m, q, d):
    feats, bank, labels = _case(rng, b, m, q, d)
    tau = 0.05
    got = float(max_query_infonce_pallas(feats, bank, labels, tau, 8, 16))
    want = float(xla_loss(feats, bank, labels, tau))
    assert abs(got - want) < 1e-4, (got, want)


def test_grad_matches_xla(rng):
    feats, bank, labels = _case(rng, 8, 50, 4, 16)
    tau = 0.07
    gp, gt = jax.grad(
        lambda f, t: max_query_infonce_pallas(f, bank, labels, t, 8, 16),
        argnums=(0, 1))(feats, jnp.float32(tau))
    gx, gxt = jax.grad(
        lambda f, t: xla_loss(f, bank, labels, t), argnums=(0, 1))(
            feats, jnp.float32(tau))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(gt), float(gxt), rtol=1e-4)


def test_dispatch_cpu(rng):
    feats, bank, labels = _case(rng, 4, 20, 4, 8)
    got = float(max_query_infonce(feats, bank, labels, 0.1, impl="auto"))
    want = float(xla_loss(feats, bank, labels, 0.1))
    assert abs(got - want) < 1e-5


def test_prepared_max_query_bank_matches_raw(rng):
    """PreparedMaxQueryBank (pre-transposed/padded once) must match the raw
    (M, Q, D) bank through the Pallas wrapper, loss and grad."""
    from spn4cir_tpu.ops.maxquery_kernels import (max_query_infonce,
                                                  max_query_infonce_pallas,
                                                  prepare_max_query_bank)

    feats = jnp.asarray(rng.randn(6, 16).astype(np.float32))
    bank = jnp.asarray(rng.randn(21, 4, 16).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 21, (6,)), jnp.int32)

    raw = float(max_query_infonce_pallas(feats, bank, labels, 0.05))
    prep = prepare_max_query_bank(bank, block_m=16)
    assert prep.qmd.shape == (4, 32, 16) and prep.m_actual == 21
    assert prep.shape == (21, 4, 16)
    got = float(max_query_infonce_pallas(feats, prep, labels, 0.05,
                                         block_m=16))
    assert abs(got - raw) < 1e-6, (got, raw)

    g_raw = jax.grad(
        lambda x: max_query_infonce_pallas(x, bank, labels, 0.05))(feats)
    g_prep = jax.grad(
        lambda x: max_query_infonce_pallas(x, prep, labels, 0.05,
                                           block_m=16))(feats)
    np.testing.assert_allclose(np.asarray(g_prep), np.asarray(g_raw),
                               atol=1e-6)
    # XLA fallback via .dense()
    got_xla = float(max_query_infonce(feats, prep, labels, 0.05, impl="xla"))
    assert abs(got_xla - raw) < 1e-4


def test_q8_max_query_kernel_matches_dequant_oracle(rng):
    """int8 path THROUGH the Pallas kernel (interpret mode on CPU): loss and
    dfeats equal the XLA loss on the dequantized bank; prepared int8 layout
    (values+scales pre-transposed/padded) matches too."""
    from spn4cir_tpu.ops import infonce as ref_ops
    from spn4cir_tpu.ops.bank_kernels import quantize_bank
    from spn4cir_tpu.ops.maxquery_kernels import (max_query_infonce_pallas,
                                                  prepare_max_query_bank)

    feats = jnp.asarray(rng.randn(6, 16).astype(np.float32))
    bank = jnp.asarray(rng.randn(21, 4, 16).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 21, (6,)), jnp.int32)
    qb = quantize_bank(bank)
    deq = jnp.asarray(np.asarray(qb.dequantize()))

    want = float(ref_ops.max_query_infonce(feats, deq, labels, 0.05))
    got = float(max_query_infonce_pallas(feats, qb, labels, 0.05,
                                         block_m=16))
    assert abs(got - want) < 1e-4 * max(1.0, abs(want)), (got, want)

    g_want = jax.grad(
        lambda x: ref_ops.max_query_infonce(x, deq, labels, 0.05))(feats)
    g_got = jax.grad(
        lambda x: max_query_infonce_pallas(x, qb, labels, 0.05,
                                           block_m=16))(feats)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               atol=1e-4)

    prep = prepare_max_query_bank(qb, block_m=16)
    assert prep.scales is not None and prep.scales.shape == (4, 32)
    got_p = float(max_query_infonce_pallas(feats, prep, labels, 0.05,
                                           block_m=16))
    assert abs(got_p - want) < 1e-4 * max(1.0, abs(want))
    # dense() round-trips the dequantized values
    np.testing.assert_allclose(np.asarray(prep.dense()), np.asarray(deq),
                               atol=1e-6)
    g_p = jax.grad(
        lambda x: max_query_infonce_pallas(x, prep, labels, 0.05,
                                           block_m=16))(feats)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_want),
                               atol=1e-4)
