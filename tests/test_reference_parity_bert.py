"""Activation-level parity against the reference MED BERT and Q-Former
(PyTorch oracles loaded read-only from /root/reference with import shims for
the newer transformers version; no reference code ships in this repo)."""

import importlib.util
import os
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF_MED = "/root/reference/blip4cir/med.py"
REF_QFORMER = "/root/reference/blip24cir/lavis/models/blip2_models/Qformer.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_MED),
                                reason="reference repo not mounted")


def _shim_transformers():
    """transformers 4.57 moved chunking/pruning helpers to pytorch_utils and
    dropped timm from this image; bridge what the 2022-era reference expects."""
    import transformers
    import transformers.modeling_utils as mu
    import transformers.pytorch_utils as pu

    for name in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
                 "prune_linear_layer"):
        if not hasattr(mu, name):
            setattr(mu, name, getattr(pu, name))
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        hub = types.ModuleType("timm.models.hub")
        hub.download_cached_file = lambda *a, **k: None
        models.hub = hub
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.hub"] = hub


def _load(path, name):
    _shim_transformers()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize(model, seed=0):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.02)
    return model.float().eval()


def test_med_bert_cross_attention_parity(rng):
    from spn4cir_tpu.models.convert import convert_med_state_dict
    from spn4cir_tpu.models.med import MedBert, MedConfig

    ref = _load(REF_MED, "ref_med")
    cfg = MedConfig.tiny(vocab_size=64)
    bert_cfg = ref.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        add_cross_attention=True, encoder_width=cfg.encoder_width,
        is_decoder=False)
    ref_model = _randomize(ref.BertModel(config=bert_cfg,
                                         add_pooling_layer=False))
    sd = {f"text_encoder.{k}": v for k, v in ref_model.state_dict().items()}
    params = {"params": convert_med_state_dict(sd, cfg.num_layers)}

    ids = rng.randint(1, 60, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    enc = rng.randn(2, 5, cfg.encoder_width).astype(np.float32)
    enc_mask = np.ones((2, 5), np.int64)

    with torch.no_grad():
        want = ref_model(
            torch.tensor(ids), attention_mask=torch.tensor(mask),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=torch.tensor(enc_mask),
            return_dict=True).last_hidden_state.numpy()
    ours = MedBert(cfg)
    got = np.asarray(ours.apply(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
        jnp.asarray(enc), jnp.asarray(enc_mask, jnp.int32)))
    # padded positions may differ (both mask them downstream); compare valid
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], want[valid], atol=3e-5, rtol=1e-3)


@pytest.mark.skipif(not os.path.exists(REF_QFORMER),
                    reason="reference Qformer not mounted")
def test_qformer_parity(rng):
    from spn4cir_tpu.models.convert import convert_qformer_state_dict
    from spn4cir_tpu.models.qformer import QFormer, QFormerConfig

    ref = _load(REF_QFORMER, "ref_qformer")
    cfg = QFormerConfig.tiny(vocab_size=64)
    bert_cfg = ref.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        add_cross_attention=True, encoder_width=cfg.encoder_width,
        cross_attention_freq=cfg.cross_attention_freq,
        query_length=cfg.num_query_tokens)
    ref_model = _randomize(ref.BertModel(config=bert_cfg,
                                         add_pooling_layer=False))
    sd = {f"Qformer.bert.{k}": v for k, v in ref_model.state_dict().items()}
    params = {"params": convert_qformer_state_dict(sd, cfg.num_layers)}

    b, nq = 2, cfg.num_query_tokens
    queries = rng.randn(b, nq, cfg.hidden_size).astype(np.float32)
    ids = rng.randint(1, 60, size=(b, 7)).astype(np.int64)
    text_mask = np.ones((b, 7), np.int64)
    full_mask = np.concatenate([np.ones((b, nq), np.int64), text_mask], axis=1)
    enc = rng.randn(b, 5, cfg.encoder_width).astype(np.float32)
    enc_mask = np.ones((b, 5), np.int64)

    ours = QFormer(cfg)

    # mode 1: query-only image read (cross-attention path)
    with torch.no_grad():
        want = ref_model(
            query_embeds=torch.tensor(queries),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=torch.tensor(enc_mask),
            return_dict=True).last_hidden_state.numpy()
    got = np.asarray(ours.apply(params, query_embeds=jnp.asarray(queries),
                                encoder_hidden_states=jnp.asarray(enc),
                                encoder_attention_mask=jnp.asarray(enc_mask, jnp.int32)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)

    # mode 2: fusion (text + queries + cross-attention)
    with torch.no_grad():
        want2 = ref_model(
            torch.tensor(ids), query_embeds=torch.tensor(queries),
            attention_mask=torch.tensor(full_mask),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=torch.tensor(enc_mask),
            return_dict=True).last_hidden_state.numpy()
    got2 = np.asarray(ours.apply(
        params, input_ids=jnp.asarray(ids, jnp.int32),
        query_embeds=jnp.asarray(queries),
        attention_mask=jnp.asarray(full_mask, jnp.int32),
        encoder_hidden_states=jnp.asarray(enc),
        encoder_attention_mask=jnp.asarray(enc_mask, jnp.int32)))
    np.testing.assert_allclose(got2, want2, atol=3e-5, rtol=1e-3)

    # mode 3: text re-read on cached states (no cross-attention)
    with torch.no_grad():
        want3 = ref_model(
            torch.tensor(ids), query_embeds=torch.tensor(queries),
            attention_mask=torch.tensor(full_mask),
            return_dict=True).last_hidden_state.numpy()
    got3 = np.asarray(ours.apply(
        params, input_ids=jnp.asarray(ids, jnp.int32),
        query_embeds=jnp.asarray(queries),
        attention_mask=jnp.asarray(full_mask, jnp.int32)))
    np.testing.assert_allclose(got3, want3, atol=3e-5, rtol=1e-3)
