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


def test_blip_stage1_dropout_changes_loss_not_eval():
    """VERDICT round-3 #7: stage-1 with a dropout rng runs MED train-mode
    dropout (loss differs from the deterministic pass and between rngs);
    eval paths stay deterministic regardless."""
    import numpy as np

    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.train.stage1 import create_stage1_state, stage1_train_step

    bb = build_backbone("blip", blip_size="test-tiny", dropout=0.1)
    params = bb.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b = 4
    dim = bb.input_dim
    batch = {
        "refer_images": jnp.asarray(rng.rand(b, dim, dim, 3), jnp.float32),
        "target_images": jnp.asarray(rng.rand(b, dim, dim, 3), jnp.float32),
        "text_ids": jnp.asarray(bb.tokenize([f"cap {i}" for i in range(b)])),
    }
    det = float(bb.stage1_loss(params, batch["refer_images"],
                               batch["target_images"], batch["text_ids"]))
    d1 = float(bb.stage1_loss(params, batch["refer_images"],
                              batch["target_images"], batch["text_ids"],
                              dropout_rng=jax.random.PRNGKey(1)))
    d2 = float(bb.stage1_loss(params, batch["refer_images"],
                              batch["target_images"], batch["text_ids"],
                              dropout_rng=jax.random.PRNGKey(2)))
    assert d1 != det and d2 != det and d1 != d2

    # the jitted step accepts the rng and trains
    state = create_stage1_state(bb, params, 1e-3)
    state2, loss = stage1_train_step(bb, state, batch, 0,
                                     jax.random.PRNGKey(3))
    assert int(state2.step) == 1 and np.isfinite(float(loss))

    # eval determinism: fusion without an rng is bit-stable
    refer_tokens = bb.encode_image(params, batch["refer_images"])
    q1 = bb.fuse(params, refer_tokens, batch["text_ids"])
    q2 = bb.fuse(params, refer_tokens, batch["text_ids"])
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))


def test_clip_stage1_loss_unchanged_signature():
    """clip's stage-1 (no dropout concept) keeps working through the same
    step signature with dropout_rng=None."""
    import numpy as np

    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.train.stage1 import create_stage1_state, stage1_train_step

    bb = build_backbone("clip", clip_model_name="test-tiny")
    params = bb.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    b, dim = 4, bb.input_dim
    batch = {
        "refer_images": jnp.asarray(rng.rand(b, dim, dim, 3), jnp.float32),
        "target_images": jnp.asarray(rng.rand(b, dim, dim, 3), jnp.float32),
        "text_ids": jnp.asarray(bb.tokenize([f"cap {i}" for i in range(b)])),
    }
    state = create_stage1_state(bb, params, 1e-3)
    state2, loss = stage1_train_step(bb, state, batch)
    assert int(state2.step) == 1 and np.isfinite(float(loss))
