"""MED LM decoder + generation: parity vs the reference torch
BertLMHeadModel (blip4cir/med.py:828-920) and internal cached-vs-full
consistency."""

import importlib.util
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF_MED = "/root/reference/blip4cir/med.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_MED),
                                reason="reference repo not mounted")

from tests.test_reference_parity_bert import _load  # noqa: E402


def _randomize(model, seed=0, scale=0.12):
    """Larger-scale weights than the shared 0.02 randomizer: at 0.02 the
    post-LN logits are nearly input-independent, so generation oracles
    degenerate into exact score ties whose resolution depends on top-k
    tie-breaking — not meaningful parity signal."""
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * scale)
    return model.float().eval()

from spn4cir_tpu.models.convert import convert_med_lm_state_dict  # noqa: E402
from spn4cir_tpu.models.generation import (  # noqa: E402
    apply_repetition_penalty, beam_generate, decode_step, generate,
    init_decode_state, top_p_filter)
from spn4cir_tpu.models.med import MedConfig, MedLMModel  # noqa: E402


@pytest.fixture(scope="module")
def lm_setup():
    rng = np.random.RandomState(0)
    ref = _load(REF_MED, "ref_med_lm")
    cfg = MedConfig.tiny(vocab_size=64)
    bert_cfg = ref.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        add_cross_attention=True, encoder_width=cfg.encoder_width,
        is_decoder=True, hidden_act="gelu", layer_norm_eps=1e-12)
    ref_model = _randomize(ref.BertLMHeadModel(config=bert_cfg))
    sd = {f"text_decoder.{k}": v for k, v in ref_model.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_med_lm_state_dict(sd, cfg.num_layers))
    enc = rng.randn(2, 5, cfg.encoder_width).astype(np.float32)
    return ref_model, cfg, params, enc


def _ref_logits(ref_model, ids, enc):
    enc_mask = torch.ones(enc.shape[:2], dtype=torch.long)
    with torch.no_grad():
        out = ref_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.ones_like(torch.tensor(ids)),
            encoder_hidden_states=torch.tensor(enc),
            encoder_attention_mask=enc_mask,
            return_dict=True, is_decoder=True)
    return out.logits.numpy()


def test_med_lm_teacher_forced_logits_parity(lm_setup):
    ref_model, cfg, params, enc = lm_setup
    rng = np.random.RandomState(1)
    ids = rng.randint(1, 60, size=(2, 7)).astype(np.int64)
    want = _ref_logits(ref_model, ids, enc)
    got = np.asarray(MedLMModel(cfg).apply(
        {"params": params}, jnp.asarray(ids, jnp.int32),
        jnp.ones((2, 7), jnp.int32), jnp.asarray(enc),
        jnp.ones((2, 5), jnp.int32)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-3)


def test_cached_decode_matches_full_forward(lm_setup):
    _, cfg, params, enc = lm_setup
    rng = np.random.RandomState(2)
    L = 6
    ids = rng.randint(1, 60, size=(2, L)).astype(np.int32)
    full = np.asarray(MedLMModel(cfg).apply(
        {"params": params}, jnp.asarray(ids), jnp.ones((2, L), jnp.int32),
        jnp.asarray(enc), jnp.ones((2, 5), jnp.int32)))
    state = init_decode_state(params, cfg, jnp.asarray(enc), L,
                              jnp.ones((2, 5), jnp.int32))
    step = jax.jit(lambda s, tok, pos: decode_step(params, cfg, s, tok, pos))
    for t in range(L):
        logits, state = step(state, jnp.asarray(ids[:, t]),
                             jnp.asarray(t, jnp.int32))
        np.testing.assert_allclose(np.asarray(logits), full[:, t],
                                   atol=2e-5, rtol=1e-3)


def test_greedy_generate_matches_torch_loop(lm_setup):
    ref_model, cfg, params, enc = lm_setup
    eos_id, pad_id, bos_id = 3, 0, 2
    max_len, min_len = 12, 4
    prompt = np.array([[bos_id, 11, 12], [bos_id, 11, 12]], np.int64)

    # torch oracle: teacher-force the growing sequence, argmax next token,
    # with HF MinLength EOS suppression
    seqs = prompt.copy()
    finished = np.zeros(2, bool)
    for t in range(prompt.shape[1] - 1, max_len - 1):
        logits = _ref_logits(ref_model, seqs, enc)[:, -1]
        if seqs.shape[1] < min_len:
            logits[:, eos_id] = -1e9
        nxt = logits.argmax(-1)
        nxt = np.where(finished, pad_id, nxt)
        finished |= nxt == eos_id
        seqs = np.concatenate([seqs, nxt[:, None]], axis=1)

    got = np.asarray(generate(
        params, cfg, jnp.asarray(enc), jnp.asarray(prompt, jnp.int32),
        eos_id=eos_id, pad_id=pad_id, max_length=max_len, min_length=min_len,
        enc_mask=jnp.ones((2, 5), jnp.int32)))
    want = np.full((2, max_len), pad_id, np.int64)
    want[:, :seqs.shape[1]] = seqs
    # after EOS the oracle pads too (same rule)
    np.testing.assert_array_equal(got, want)


def test_repetition_penalty_hf_semantics():
    logits = jnp.array([[2.0, -1.0, 0.5, 3.0]])
    tokens = jnp.array([[0, 1, 1, 3]])
    valid = jnp.array([[True, True, True, False]])  # token 3 not yet emitted
    out = np.asarray(apply_repetition_penalty(logits, tokens, valid, 2.0))
    np.testing.assert_allclose(out[0], [1.0, -2.0, 0.5, 3.0])


def test_top_p_filter_numpy_oracle():
    rng = np.random.RandomState(3)
    logits = rng.randn(4, 16).astype(np.float32)
    got = np.asarray(top_p_filter(jnp.asarray(logits), 0.7))
    for row_in, row_out in zip(logits, got):
        order = np.argsort(-row_in)
        p = np.exp(row_in - row_in.max())
        p = p / p.sum()
        cum = np.cumsum(p[order])
        keep = set()
        for rank, tok in enumerate(order):
            keep.add(tok)
            if cum[rank] > 0.7:
                break
        for tok in range(16):
            if tok in keep:
                assert row_out[tok] == row_in[tok]
            else:
                assert row_out[tok] <= -1e8


def test_top_p_filter_ties_keep_top_token():
    """Tied logits straddling the nucleus boundary must not eliminate all
    tokens (HF min_tokens_to_keep=1 guarantee; a value-threshold filter
    fails this)."""
    # 10 identical top logits, top_p cuts inside the tie
    logits = jnp.concatenate([jnp.full((1, 10), 5.0),
                              jnp.full((1, 20), -5.0)], axis=-1)
    out = np.asarray(top_p_filter(logits, 0.5))
    kept = out[0] > -1e8
    assert kept.any(), "all tokens eliminated"
    assert kept[:10].any() and not kept[10:].any()
    # degenerate: everything tied — top token must survive
    out2 = np.asarray(top_p_filter(jnp.zeros((1, 8)), 0.3))
    assert (out2[0] > -1e8).sum() >= 1


def test_nucleus_sampling_respects_filter(lm_setup):
    _, cfg, params, enc = lm_setup
    got = np.asarray(generate(
        params, cfg, jnp.asarray(enc),
        jnp.array([[2, 11], [2, 11]], jnp.int32), eos_id=3, pad_id=0,
        max_length=10, min_length=3, do_sample=True, top_p=0.9,
        repetition_penalty=1.1, rng=jax.random.PRNGKey(7)))
    assert got.shape == (2, 10)
    assert (got[:, :2] == np.array([[2, 11], [2, 11]])).all()


def _hf_generate(ref_model, **kw):
    """HF generate() oracle: the reference's own generation entry point
    (med.py:1324-1376 routes into it). transformers>=4.50 dropped the mixin
    from PreTrainedModel, so graft it back for the oracle."""
    from transformers.generation import GenerationMixin
    from transformers.generation.configuration_utils import GenerationConfig

    if not isinstance(ref_model, GenerationMixin):
        cls = type("GenLM", (type(ref_model), GenerationMixin), {})
        ref_model.__class__ = cls
    if getattr(ref_model, "generation_config", None) is None:
        ref_model.generation_config = GenerationConfig.from_model_config(
            ref_model.config)
    with torch.no_grad():
        return ref_model.generate(**kw).numpy()


def _pad_to(arr, width, pad_id):
    out = np.full((arr.shape[0], width), pad_id, arr.dtype)
    out[:, : arr.shape[1]] = arr
    return out


@pytest.mark.parametrize("seed,rep", [(0, 1.0), (1, 1.3), (2, 1.0)])
def test_greedy_matches_hf_generate(lm_setup, seed, rep):
    ref_model, cfg, params, _ = lm_setup
    rng = np.random.RandomState(100 + seed)
    enc = rng.randn(2, 5, cfg.encoder_width).astype(np.float32)
    prompt = np.array([[2, 11, 12], [2, 14, 15]], np.int64)
    max_len, min_len = 12, 5
    want = _hf_generate(
        ref_model, input_ids=torch.tensor(prompt), max_length=max_len,
        min_length=min_len, num_beams=1, do_sample=False, eos_token_id=3,
        pad_token_id=0, repetition_penalty=rep,
        encoder_hidden_states=torch.tensor(enc),
        encoder_attention_mask=torch.ones(2, 5, dtype=torch.long))
    got = np.asarray(generate(
        params, cfg, jnp.asarray(enc), jnp.asarray(prompt, jnp.int32),
        eos_id=3, pad_id=0, max_length=max_len, min_length=min_len,
        repetition_penalty=rep, enc_mask=jnp.ones((2, 5), jnp.int32)))
    np.testing.assert_array_equal(got, _pad_to(want, max_len, 0))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_beam_matches_hf_generate(lm_setup, seed):
    ref_model, cfg, params, _ = lm_setup
    rng = np.random.RandomState(200 + seed)
    enc = rng.randn(2, 5, cfg.encoder_width).astype(np.float32)
    prompt = np.array([[2, 11, 12], [2, 14, 15]], np.int64)
    max_len, min_len = 12, 5
    want = _hf_generate(
        ref_model, input_ids=torch.tensor(prompt), max_length=max_len,
        min_length=min_len, num_beams=3, eos_token_id=3, pad_token_id=0,
        repetition_penalty=1.3,
        encoder_hidden_states=torch.tensor(enc),
        encoder_attention_mask=torch.ones(2, 5, dtype=torch.long))
    got = np.asarray(beam_generate(
        params, cfg, jnp.asarray(enc), jnp.asarray(prompt, jnp.int32),
        num_beams=3, eos_id=3, pad_id=0, max_length=max_len,
        min_length=min_len, repetition_penalty=1.3,
        enc_mask=jnp.ones((2, 5), jnp.int32)))
    np.testing.assert_array_equal(got, _pad_to(want, max_len, 0))
