"""Stage-1/stage-2 train-mode dropout option (VERDICT weak #5 / next #10):
the reference trains the live MED / Q-Former side in torch train mode with
HF BERT dropout 0.1; 0.0 remains the default for exact eval parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spn4cir_tpu.models.api import build_backbone


@pytest.mark.parametrize("name,size_kw", [
    ("blip", {"blip_size": "test-tiny"}),
    ("blip2", {"blip2_size": "test-tiny"}),
])
def test_stage2_loss_dropout_stochastic_and_default_deterministic(name, size_kw):
    bb = build_backbone(name, dropout=0.3, **size_kw)
    params = bb.init_params(jax.random.PRNGKey(0))
    spec = bb.bank_spec()
    rng = np.random.RandomState(0)
    B, M = 4, 16
    refer = jnp.asarray(rng.randn(B, *spec.refer_shape).astype(np.float32))
    bank = jnp.asarray(rng.randn(M, *spec.target_shape).astype(np.float32))
    text = jnp.asarray(bb.tokenize(["a red dress", "the shirt", "blue", "it"]))
    labels = jnp.asarray([0, 3, 7, 11])

    # no rng -> deterministic (dropout off), reproducible
    l0 = bb.stage2_loss(params, refer, text, bank, labels, impl="xla")
    l0b = bb.stage2_loss(params, refer, text, bank, labels, impl="xla")
    assert float(l0) == float(l0b)

    # train-mode rng -> stochastic across keys, reproducible per key
    la = bb.stage2_loss(params, refer, text, bank, labels, impl="xla",
                        dropout_rng=jax.random.PRNGKey(1))
    lb = bb.stage2_loss(params, refer, text, bank, labels, impl="xla",
                        dropout_rng=jax.random.PRNGKey(2))
    la2 = bb.stage2_loss(params, refer, text, bank, labels, impl="xla",
                         dropout_rng=jax.random.PRNGKey(1))
    assert float(la) != float(lb)
    assert float(la) == float(la2)
    # dropout-on loss differs from eval-mode loss
    assert float(la) != float(l0)


def test_dropout_zero_param_tree_unchanged():
    """dropout=0 backbones have the same param tree as before (no dropout
    params exist; nn.Dropout is parameter-free either way)."""
    a = build_backbone("blip", blip_size="test-tiny")
    b = build_backbone("blip", blip_size="test-tiny", dropout=0.1)
    pa = a.init_params(jax.random.PRNGKey(0))
    pb = b.init_params(jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(pa)
            == jax.tree_util.tree_structure(pb))
