"""Autoregressive generation for the MED LM decoder (BLIP captioner).

Parity target: the reference's caption generation path —
`lavis/models/blip_models/blip_caption.py:136-205` (prompted generation,
BOS-swapped prompt, SEP as EOS) driving HF `generate` through
`lavis/models/med.py:1324-1376` `generate_from_encoder` (beam search with
num_beams=3 by default, or nucleus sampling with top_p=0.9 and
repetition_penalty=1.1), with logits processors MinLengthLogitsProcessor and
RepetitionPenaltyLogitsProcessor.

TPU-native design: the decoder keeps a per-layer KV cache (self-attention)
plus precomputed cross-attention K/V over the image tokens; every shape is
static and the whole generation is one `lax.scan` over time steps — a single
compiled program per (batch, max_length) geometry. The prompt is consumed by
the same scan (teacher-forced positions), so there is no separate prefill
program to compile.

All math mirrors `spn4cir_tpu.models.med` exactly (post-LN BERT layers,
f32 logit accumulation, LN eps 1e-12); `test_med_decoder.py` checks the
cached path bit-close against the full forward and against the reference's
torch BertLMHeadModel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from spn4cir_tpu.models.med import LN_EPS, MedConfig

NEG_INF = -1e9


# ---------------------------------------------------------------------------
# cached MED decoder (pure functions over the MedLMModel params tree)
# ---------------------------------------------------------------------------


def _ln_f32(x, scale, bias):
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


@dataclasses.dataclass
class DecodeState:
    """KV cache for incremental decoding. self_k/self_v: (n_layers, B, L, H);
    cross_k/cross_v: (n_layers, B, S, H) precomputed once per image."""

    self_k: jnp.ndarray
    self_v: jnp.ndarray
    cross_k: jnp.ndarray
    cross_v: jnp.ndarray
    cross_mask: Optional[jnp.ndarray]  # (B, S) {0,1} or None


jax.tree_util.register_pytree_node(
    DecodeState,
    lambda s: ((s.self_k, s.self_v, s.cross_k, s.cross_v, s.cross_mask), None),
    lambda _, c: DecodeState(*c),
)


def init_decode_state(params: Dict[str, Any], cfg: MedConfig,
                      enc_states: jnp.ndarray, max_length: int,
                      enc_mask: Optional[jnp.ndarray] = None) -> DecodeState:
    """Allocate the self-attn cache and precompute cross-attn K/V from the
    image tokens (done once; the decode loop never re-touches enc_states)."""
    layer = params["bert"]["layers"]["layer"]
    ca = layer["cross_attn"]
    # vmap over the stacked layer axis: enc (B,S,W) @ kernel (n,W,H) + bias
    proj = jax.vmap(lambda w, b: enc_states.astype(jnp.float32) @ w + b)
    cross_k = proj(ca["key"]["kernel"], ca["key"]["bias"])
    cross_v = proj(ca["value"]["kernel"], ca["value"]["bias"])
    n_layers = cross_k.shape[0]
    batch = enc_states.shape[0]
    hid = cfg.hidden_size
    zeros = jnp.zeros((n_layers, batch, max_length, hid), jnp.float32)
    return DecodeState(zeros, zeros, cross_k, cross_v, enc_mask)


def _attend(q, k, v, num_heads: int, mask_1d):
    """q: (B,H); k,v: (B,L,H); mask_1d: (B,L) additive. Returns (B,H)."""
    batch, hid = q.shape
    hd = hid // num_heads
    qh = q.reshape(batch, num_heads, hd)
    kh = k.reshape(batch, -1, num_heads, hd)
    vh = v.reshape(batch, -1, num_heads, hd)
    logits = jnp.einsum("bhd,bkhd->bhk", qh, kh,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    logits = logits + mask_1d[:, None, :]
    w = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("bhk,bkhd->bhd", w, vh)
    return ctx.reshape(batch, hid)


def decode_step(params: Dict[str, Any], cfg: MedConfig, state: DecodeState,
                token: jnp.ndarray, pos: jnp.ndarray
                ) -> Tuple[jnp.ndarray, DecodeState]:
    """One incremental decoder step: token (B,) int32 at position `pos`
    (scalar int32) -> (logits (B, vocab), updated state)."""
    bert = params["bert"]
    x = bert["word_embeddings"][token] + bert["position_embeddings"][pos]
    x = _ln_f32(x, bert["embeddings_ln"]["scale"], bert["embeddings_ln"]["bias"])

    max_len = state.self_k.shape[2]
    # valid self positions: 0..pos (inclusive of the token just written)
    pos_ids = jnp.arange(max_len)
    self_mask = jnp.where(pos_ids <= pos, 0.0, NEG_INF)[None, :]  # (1, L)
    cross_mask = (jnp.zeros((x.shape[0], state.cross_k.shape[2]), jnp.float32)
                  if state.cross_mask is None
                  else (1.0 - state.cross_mask.astype(jnp.float32)) * NEG_INF)

    layer = bert["layers"]["layer"]

    def one_layer(x, xs):
        lp, ck, cv, sk, sv = xs
        sa, ca = lp["self_attn"], lp["cross_attn"]
        # self-attention with cache update
        q = x @ sa["query"]["kernel"] + sa["query"]["bias"]
        k_new = x @ sa["key"]["kernel"] + sa["key"]["bias"]
        v_new = x @ sa["value"]["kernel"] + sa["value"]["bias"]
        sk = jax.lax.dynamic_update_slice(sk, k_new[:, None], (0, pos, 0))
        sv = jax.lax.dynamic_update_slice(sv, v_new[:, None], (0, pos, 0))
        ctx = _attend(q, sk, sv, cfg.num_heads, self_mask)
        out = ctx @ sa["output"]["kernel"] + sa["output"]["bias"]
        x = _ln_f32(x + out, sa["ln"]["scale"], sa["ln"]["bias"])
        # cross-attention over precomputed image K/V
        q = x @ ca["query"]["kernel"] + ca["query"]["bias"]
        ctx = _attend(q, ck, cv, cfg.num_heads, cross_mask)
        out = ctx @ ca["output"]["kernel"] + ca["output"]["bias"]
        x = _ln_f32(x + out, ca["ln"]["scale"], ca["ln"]["bias"])
        # FFN
        inter = jax.nn.gelu(x @ lp["intermediate"]["kernel"]
                            + lp["intermediate"]["bias"], approximate=False)
        out = inter @ lp["output"]["kernel"] + lp["output"]["bias"]
        x = _ln_f32(x + out, lp["ln"]["scale"], lp["ln"]["bias"])
        return x, (sk, sv)

    x, (new_k, new_v) = jax.lax.scan(
        one_layer, x,
        (layer, state.cross_k, state.cross_v, state.self_k, state.self_v))
    state = DecodeState(new_k, new_v, state.cross_k, state.cross_v,
                        state.cross_mask)

    head = params["lm_head"]
    h = x @ head["transform"]["kernel"] + head["transform"]["bias"]
    h = jax.nn.gelu(h, approximate=False)
    h = _ln_f32(h, head["transform_ln"]["scale"], head["transform_ln"]["bias"])
    logits = h @ head["decoder"]["kernel"] + head["decoder"]["bias"]
    return logits, state


# ---------------------------------------------------------------------------
# logits processors (HF semantics, ref transformers LogitsProcessorList)
# ---------------------------------------------------------------------------


def apply_repetition_penalty(logits, tokens, valid, penalty: float):
    """HF RepetitionPenaltyLogitsProcessor: for every token already in the
    sequence, divide positive logits by `penalty`, multiply negative ones.
    tokens: (B, L) buffer; valid: (B, L) bool for filled positions."""
    if penalty == 1.0:
        return logits
    vocab = logits.shape[-1]
    valid = jnp.broadcast_to(valid, tokens.shape)
    counts = jax.vmap(lambda t, m: jnp.zeros(vocab).at[t].add(m))(
        tokens, valid.astype(jnp.float32))
    present = counts > 0
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(present, penalized, logits)


def suppress_eos(logits, eos_id: int, cur_len, min_length: int):
    """HF MinLengthLogitsProcessor: EOS is unreachable while the sequence
    (prompt included) is shorter than min_length."""
    return jnp.where((cur_len < min_length)
                     & (jnp.arange(logits.shape[-1]) == eos_id)[None, :],
                     NEG_INF, logits)


def top_k_filter(logits, top_k: int):
    """HF TopKLogitsWarper: keep only the top_k highest logits, NEG_INF the
    rest. The threshold is the k-th highest VALUE (ties at the boundary all
    survive — identical to HF's `logits < topk(...).values[..., -1:]`)."""
    if top_k <= 0 or top_k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits, top_p: float):
    """Nucleus filtering (HF TopPLogitsWarper, min_tokens_to_keep=1): keep the
    smallest set of tokens whose cumulative probability exceeds top_p.

    Positional (sorted-index scatter) like HF, NOT a value threshold: with
    tied logits straddling the nucleus boundary a value threshold would also
    cut the kept copies — possibly every token — whereas HF cuts by sorted
    position and always keeps the top token."""
    idx = jnp.argsort(logits, axis=-1)  # ascending, ties positional
    sorted_logits = jnp.take_along_axis(logits, idx, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - top_p)          # the low-probability tail
    remove_sorted = remove_sorted.at[..., -1].set(False)  # min_tokens_to_keep
    inv = jnp.argsort(idx, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
    return jnp.where(remove, NEG_INF, logits)


# ---------------------------------------------------------------------------
# generation loops
# ---------------------------------------------------------------------------


def generate(params: Dict[str, Any], cfg: MedConfig, enc_states: jnp.ndarray,
             prompt_ids: jnp.ndarray, *, eos_id: int, pad_id: int,
             max_length: int = 30, min_length: int = 10,
             repetition_penalty: float = 1.0, do_sample: bool = False,
             top_p: float = 0.9, rng: Optional[jax.Array] = None,
             enc_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Greedy or nucleus-sampled generation (HF `generate` semantics for
    num_beams=1). prompt_ids: (B, P) with BOS already swapped in (ref
    blip_caption.py:184-186). Returns (B, max_length) token ids padded with
    `pad_id` after EOS. jit-able; one scan over max_length-1 steps."""
    batch, prompt_len = prompt_ids.shape
    assert prompt_len < max_length
    state = init_decode_state(params, cfg, enc_states, max_length, enc_mask)
    tokens = jnp.full((batch, max_length), pad_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids.astype(jnp.int32),
                                          (0, 0))
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, t):
        tokens, state, finished, rng = carry
        logits, state = decode_step(params, cfg, state, tokens[:, t], t)
        valid = (jnp.arange(max_length) <= t)[None, :]
        logits = apply_repetition_penalty(logits, tokens, valid,
                                          repetition_penalty)
        logits = suppress_eos(logits, eos_id, t + 1, min_length)
        if do_sample:
            rng, sub = jax.random.split(rng)
            nxt = jax.random.categorical(sub, top_p_filter(logits, top_p))
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = nxt.astype(jnp.int32)
        # teacher-force remaining prompt positions
        in_prompt = (t + 1) < prompt_len
        nxt = jnp.where(in_prompt, tokens[:, t + 1], nxt)
        nxt = jnp.where(finished, pad_id, nxt)
        newly_done = (~in_prompt) & (nxt == eos_id)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, t + 1))
        return (tokens, state, finished | newly_done, rng), None

    (tokens, _, _, _), _ = jax.lax.scan(
        step, (tokens, state, jnp.zeros((batch,), bool), rng),
        jnp.arange(max_length - 1))
    return tokens


def beam_generate(params: Dict[str, Any], cfg: MedConfig,
                  enc_states: jnp.ndarray, prompt_ids: jnp.ndarray, *,
                  eos_id: int, pad_id: int, num_beams: int = 3,
                  max_length: int = 30, min_length: int = 10,
                  repetition_penalty: float = 1.0,
                  length_penalty: float = 1.0,
                  enc_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Beam search with HF BeamSearchScorer semantics (the reference's
    captioner default path: num_beams=3, blip_caption.py:140,
    med.py:1366-1376). Specifically:

      * each step expands to the top 2*num_beams candidates; EOS candidates
        ranked < num_beams are banked into a per-row pool of num_beams best
        finished hypotheses, normalized by the sequence length *excluding*
        EOS (BeamHypotheses.add); non-EOS candidates fill the continuation
        slots;
      * a row freezes once its pool is full and the worst pooled score can
        no longer be beaten by the best live sum normalized at the *current*
        length (BeamHypotheses.is_done with early_stopping=False);
      * at max length, live beams of unfrozen rows join the pool normalized
        by the full length (BeamSearchScorer.finalize).

    Returns the best sequence per batch row, (B, max_length), padded after
    EOS. jit-able; one scan over max_length-1 steps."""
    batch, prompt_len = prompt_ids.shape
    assert prompt_len < max_length
    flat = batch * num_beams
    # image tokens repeat_interleave over beams (ref med.py:1341)
    enc_rep = jnp.repeat(enc_states, num_beams, axis=0)
    mask_rep = None if enc_mask is None else jnp.repeat(enc_mask, num_beams, 0)
    state = init_decode_state(params, cfg, enc_rep, max_length, mask_rep)
    tokens = jnp.full((flat, max_length), pad_id, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(
        tokens, jnp.repeat(prompt_ids.astype(jnp.int32), num_beams, 0), (0, 0))
    # beam 0 active, others start at -inf so the first expansion diversifies
    beam_scores = jnp.tile(jnp.array([0.0] + [NEG_INF] * (num_beams - 1)),
                           (batch,))  # (flat,)
    pool_tokens = jnp.zeros((batch, num_beams, max_length), jnp.int32)
    pool_scores = jnp.full((batch, num_beams), -jnp.inf)
    done = jnp.zeros((batch,), bool)

    def step(carry, t):
        tokens, state, beam_scores, pool_tokens, pool_scores, done = carry
        logits, state = decode_step(params, cfg, state, tokens[:, t], t)
        # HF beam search log-softmaxes FIRST, then runs the logits
        # processors on the log-probs (generation/utils.py _beam_search) —
        # unlike greedy/sampling, which process raw logits.
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        valid = (jnp.arange(max_length) <= t)[None, :]
        logp = apply_repetition_penalty(logp, tokens, valid,
                                        repetition_penalty)
        logp = suppress_eos(logp, eos_id, t + 1, min_length)
        vocab = logp.shape[-1]

        in_prompt = (t + 1) < prompt_len
        frozen = done | in_prompt  # (batch,) rows that must not change

        # candidate scores: (batch, num_beams * vocab) -> top 2*num_beams
        cand = (beam_scores[:, None] + logp).reshape(batch, num_beams * vocab)
        top_scores, top_idx = jax.lax.top_k(cand, 2 * num_beams)
        src_beam = top_idx // vocab          # (batch, 2nb)
        tok = (top_idx % vocab).astype(jnp.int32)
        is_eos = tok == eos_id

        # ---- bank EOS candidates ranked < num_beams into the pool ----
        # (HF: beam_token_rank >= num_beams EOS candidates are discarded.
        # Scores normalize by generated_len = cur_len - prompt_len, where
        # cur_len = t + 2 counts the EOS being added — BeamHypotheses.add
        # with generated_len, beam_search.py.)
        hyp_len = jnp.asarray(t + 2 - prompt_len, jnp.float32)
        bankable = is_eos[:, :num_beams] & ~frozen[:, None]
        cand_scores = jnp.where(bankable,
                                top_scores[:, :num_beams]
                                / (hyp_len ** length_penalty), -jnp.inf)
        cand_rows = jax.vmap(lambda tb, sb: tb[sb])(
            tokens.reshape(batch, num_beams, max_length),
            src_beam[:, :num_beams])                  # (batch, nb, L)
        cand_rows = cand_rows.at[:, :, t + 1].set(eos_id)
        merged_scores = jnp.concatenate([pool_scores, cand_scores], axis=1)
        merged_tokens = jnp.concatenate([pool_tokens, cand_rows], axis=1)
        keep = jnp.argsort(-merged_scores, axis=1)[:, :num_beams]
        pool_scores = jnp.take_along_axis(merged_scores, keep, 1)
        pool_tokens = jnp.take_along_axis(merged_tokens, keep[..., None], 1)

        # ---- continuation: top num_beams non-EOS candidates ----
        cont_scores = jnp.where(is_eos, NEG_INF, top_scores)
        order = jnp.argsort(-cont_scores, axis=-1)[:, :num_beams]
        new_scores = jnp.take_along_axis(cont_scores, order, 1)  # (batch, nb)
        new_beam = jnp.take_along_axis(src_beam, order, 1)
        new_tok = jnp.take_along_axis(tok, order, 1)

        # frozen rows (done / still in prompt) keep identity lineage
        ident = jnp.tile(jnp.arange(num_beams), (batch, 1))
        new_beam = jnp.where(frozen[:, None], ident, new_beam)
        forced = jax.lax.dynamic_slice_in_dim(
            prompt_ids, jnp.minimum(t + 1, prompt_len - 1), 1, axis=1)
        prompt_or_pad = jnp.where(in_prompt, jnp.repeat(forced, num_beams, 1),
                                  pad_id)
        new_tok = jnp.where(frozen[:, None], prompt_or_pad, new_tok)
        new_scores = jnp.where(frozen[:, None],
                               beam_scores.reshape(batch, num_beams),
                               new_scores)

        # ---- is_done (early_stopping=False heuristic) ----
        # HF passes next_scores.max() — the best candidate, EOS included —
        # normalized by the same generated_len (is_done, beam_search.py)
        best_possible = top_scores[:, 0] / (hyp_len ** length_penalty)
        pool_full = jnp.isfinite(pool_scores[:, num_beams - 1])
        done = done | (pool_full
                       & (pool_scores[:, num_beams - 1] >= best_possible)
                       & ~in_prompt)

        # reorder token buffers + caches to the selected source beams
        flat_idx = (new_beam + jnp.arange(batch)[:, None] * num_beams
                    ).reshape(-1)
        tokens = tokens[flat_idx]
        state = DecodeState(state.self_k[:, flat_idx], state.self_v[:, flat_idx],
                            state.cross_k, state.cross_v, state.cross_mask)
        tokens = jax.lax.dynamic_update_slice(
            tokens, new_tok.reshape(-1, 1), (0, t + 1))
        return (tokens, state, new_scores.reshape(-1), pool_tokens,
                pool_scores, done), None

    (tokens, _, beam_scores, pool_tokens, pool_scores, done), _ = jax.lax.scan(
        step,
        (tokens, state, beam_scores, pool_tokens, pool_scores, done),
        jnp.arange(max_length - 1))

    # finalize: live beams of unfrozen rows join the pool, normalized by
    # their generated length (max_length - prompt_len, finalize)
    live_scores = jnp.where(
        done[:, None], -jnp.inf,
        beam_scores.reshape(batch, num_beams)
        / (jnp.asarray(max_length - prompt_len, jnp.float32)
           ** length_penalty))
    merged_scores = jnp.concatenate([pool_scores, live_scores], axis=1)
    merged_tokens = jnp.concatenate(
        [pool_tokens, tokens.reshape(batch, num_beams, max_length)], axis=1)
    best = jnp.argmax(merged_scores, axis=1)
    out = merged_tokens[jnp.arange(batch), best]
    # blank everything after the first EOS past the prompt
    past = jnp.arange(max_length)[None, :] >= prompt_len
    eos_hits = (out == eos_id) & past
    eos_pos = jnp.argmax(eos_hits, axis=-1)
    cut = jnp.where(jnp.any(eos_hits, axis=-1), eos_pos, max_length - 1)
    keep = jnp.arange(max_length)[None, :] <= cut[:, None]
    return jnp.where(keep, out, pad_id)
