"""SRM dual-encoder: BGE text-side parity vs HF BertModel, driver contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from spn4cir_tpu.models.convert import convert_bge_state_dict  # noqa: E402
from spn4cir_tpu.models.med import MedConfig  # noqa: E402
from spn4cir_tpu.models.srm import SRMModel  # noqa: E402


def test_bge_text_encoder_parity_vs_hf():
    """The BGE role is a stock HF BertModel whose CLS hidden state is
    L2-normalized (ref zscir/srm_utils.py:59-68)."""
    from transformers import BertConfig, BertModel

    cfg = MedConfig.tiny(vocab_size=64, type_vocab_size=2)
    hf_cfg = BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=2, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, hidden_act="gelu",
        layer_norm_eps=1e-12)
    torch.manual_seed(0)
    hf = BertModel(hf_cfg)
    with torch.no_grad():
        for p in hf.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
    hf = hf.float().eval()

    rng = np.random.RandomState(1)
    ids = rng.randint(1, 60, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    with torch.no_grad():
        out = hf(torch.tensor(ids), attention_mask=torch.tensor(mask))
        want = out.last_hidden_state[:, 0].numpy()
    want = want / np.linalg.norm(want, axis=-1, keepdims=True)

    srm = SRMModel(tiny=True, bge_cfg=cfg)
    params = {"bge": convert_bge_state_dict(hf.state_dict(), cfg.num_layers)}
    got = np.asarray(srm.encode_text_ids(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)


def test_srm_driver_contract():
    srm = SRMModel(tiny=True)
    params = srm.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    imgs = rng.randn(3, srm.input_dim, srm.input_dim, 3).astype(np.float32)
    feats = np.asarray(srm.encode_image(params, jnp.asarray(imgs)))
    assert feats.shape == (3, srm.visual_dim)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-5)
    tfeats = np.asarray(srm.encode_text(params, ["a red dress", "the shirt"]))
    assert tfeats.shape == (2, srm.text_dim)
    np.testing.assert_allclose(np.linalg.norm(tfeats, axis=-1), 1.0, atol=1e-5)
