"""LLM rewriting of template-composed modification texts.

Parity target: `zscir/llama_generate.py:29-96` (LLaMA-2-7b-chat pipeline) with
the few-shot chat prompts of `zscir/prompt.py:41-115` and the plain rewrite
templates of `zscir/prompt.py:1-16`. The prompt blocks below are the
reference's *data contract* — generated `_llm` captions only match the
reference's distribution if the prompts match verbatim, so they are
reproduced exactly (content, ordering, whitespace), not approximated.

The LM itself is a pluggable text-generation callable (HF pipeline, JAX LM,
or a service); weights are external assets in this environment.
"""

from __future__ import annotations

from typing import Callable, Sequence

# Per-bucket recommended decode batch for the 7B jax LMs: (padded prompt
# length upper bound, batch @ float KV cache, batch @ int8 KV cache), from
# the round-5 hardware sweep (BENCHMARKS.md round 5: tools/hw_queue_r5.sh
# 448-bucket matrix + hw_queue_r5c.sh 256/640 buckets, kernel on).
# Measured winners: 256-bucket bf16 B=32 (24.64 prompts/s) / int8 B=32
# (25.42; the short cache removes the capacity bound), 448-bucket bf16
# B=16 / int8 B=32 (a bf16 B=32 x 448 cache is ~17 GB, past the 16 GB
# chip), 640-bucket bf16 B=16 (11.20 vs B=8's 9.79; landed on the third
# attempt after two dev-tunnel stalls — hw_queue_r5d.sh) / int8 B=32.
# Used by make_jax_batch_generate_fn when batch_size=0 ("auto"): prompts are
# partitioned by token length at these bounds and each partition batches at
# its own measured working point, so a CIRR/CC datagen run (mod_type=0
# composed prompts — different length distribution than FIQ's few-shot
# bucket) doesn't silently run at the FIQ point.
DECODE_BUCKET_BATCH = ((256, 32, 32), (448, 16, 32), (10 ** 9, 16, 32))


def recommended_llm_batch(prompt_tokens: int, cache_dtype=None) -> int:
    """Measured per-bucket --llm_batch default for a prompt of this many
    tokens (see DECODE_BUCKET_BATCH). `cache_dtype=None` means the 7B
    production default (bf16); an f32 cache halves the float working point
    (same HBM capacity/bandwidth math, double the bytes)."""
    itemsize = 2
    if cache_dtype is not None:
        import numpy as _np

        itemsize = _np.dtype(cache_dtype).itemsize
    for bound, float_b, int8_b in DECODE_BUCKET_BATCH:
        if prompt_tokens <= bound:
            if itemsize == 1:
                return int8_b
            return max(1, float_b // 2) if itemsize >= 4 else float_b
    return DECODE_BUCKET_BATCH[-1][1 if itemsize != 1 else 2]


# --- zscir/prompt.py:1-16 — llm_type 2 plain rewrite templates -------------

_REWRITE_TEMPLATE = (
    "Rewrite the sentence to maintain the original meaning while reducing "
    "grammatical errors and increasing the variety of expression\n"
    "Remember only output the new sentence without other additional words.\n"
    "sentence:{0}\n"
    "new sentence:\n"
)

PROMPT_TEMPLATES = {
    "fiq": _REWRITE_TEMPLATE,
    "cirr": _REWRITE_TEMPLATE,
}

# --- zscir/prompt.py:35-40 — llm_type 1 system prompt ----------------------

SYSTEM_PROMPT = """You are a researcher tasked with rewrite source sentence to mimic target sentence while trying to keep the original meaning.  
Please ensure that your responses are close to the style of the target sentences in the examples.
If you encounter harmful words, please change them to harmless content.
Remember only output the new sentence without other additional words.
Output answer in one string
"""

# --- zscir/prompt.py:44-66 — FIQ few-shot source/target pairs --------------

FIQ_CAPTION_PAIRS = [
    {
        "source": "The dress is a sleeveless, black, fitted, and stylish dress",
        "target": "is solid black with no sleeves",
    },
    {
        "source": "Red, flowy, short, sequined, and elegant.",
        "target": "is red and flowy",
    },
    {
        "source": "Obama Mama shirt, black color.",
        "target": "has the words Obama Mama on front",
    },
    {
        "source": "Striped, black and white, sleeveless, fitted, and stylish.",
        "target": "has sleeveless black and white stripes",
    },
    {
        "source": "Colorful striped top with a v-neck.",
        "target": "Has stripes.",
    },
]

# --- zscir/prompt.py:78-101 — CIRR few-shot source/target pairs ------------

CIRR_CAPTION_PAIRS = [
    {
        "source": "A large, brown dog with a black nose is sitting on the grass, looking up instead of A cute baby panda is being held by a person in a zoo",
        "target": "Dog in grass instead of a panda.",
    },
    {
        "source": "A street with several blue buildings, including churches, and a park with trees and bushes instead of A large, old stone church with a tower and a wall, surrounded by a grassy field and a dirt road",
        "target": "instead of an old fortress with a rampart, an Orthodox church with a courtyard.",
    },
    {
        "source": "A colorful parrot is standing on a perch in a cage instead of Two parrots are sitting on a branch, sharing a piece of fruit",
        "target": "Remove one of the parrots.",
    },
    {
        "source": "Two colorful parrots are kissing on a branch instead of A colorful parrot is perched on a tree branch, looking at the camera.",
        "target": "two birds, facing each other.",
    },
    {
        "source": "A monkey is standing on a grassy field, looking at the camera instead of A group of monkeys is sitting on the ground, with some of them touching each other.",
        "target": "I want the pic to show just one monkey.",
    },
]


def _few_shot_prompt(caption: str, pairs: Sequence[dict]) -> str:
    """LLaMA-2 chat formatting exactly as zscir/prompt.py:42-73 builds it
    (first shot carries the <<SYS>> block; note the reference's asymmetric
    'caption:' vs ' target caption:' spacing in the final turn)."""
    prompt = f"""<s>[INST] <<SYS>>\n{SYSTEM_PROMPT}<</SYS>>\n\n"""
    for i, pair in enumerate(pairs):
        if i == 0:
            prompt += (f"source caption: {pair['source']}\n"
                       f"target caption: [/INST]{pair['target']} </s>")
        else:
            prompt += (f"<s>[INST]source caption: {pair['source']}\n"
                       f"target caption: [/INST]{pair['target']} </s>")
    prompt += f"<s>[INST]source caption: {caption}\n target caption: [/INST]"
    return prompt


def get_fiq_prompt(caption: str) -> str:
    return _few_shot_prompt(caption, FIQ_CAPTION_PAIRS)


def get_cirr_prompt(caption: str) -> str:
    return _few_shot_prompt(caption, CIRR_CAPTION_PAIRS)


def get_prompt(caption: str, data: str = "fiq") -> str:
    """zscir/prompt.py:118-122."""
    if data == "fiq":
        return get_fiq_prompt(caption)
    return get_cirr_prompt(caption)


def post_process(output: str) -> str:
    """zscir/llama_generate.py:47-52: strip, keep text after the last ':',
    truncate at the first newline."""
    res = output.strip()
    if ":" in output:
        res = res.split(":")[-1]
    res = res.split("\n")[0]
    return res


def compose_old_text(caption1: str, caption2: str) -> str:
    """mod_type 0 composition (zscir/llama_generate.py:79-84): strip one
    trailing period from each caption, then '{1} instead of {0}'."""
    if caption1 and caption1[-1] == ".":
        caption1 = caption1[:-1]
    if caption2 and caption2[-1] == ".":
        caption2 = caption2[:-1]
    return "{1} instead of {0}".format(caption1, caption2)


def build_rewrite_prompt(caption1: str, caption2: str, data: str = "fiq",
                         mod_type: int = 0, llm_type: int = 1) -> str:
    """Full prompt for one rewrite, mirroring generate_modified_text
    (zscir/llama_generate.py:73-93): llm_type 1 -> few-shot chat prompt,
    otherwise the plain rewrite template."""
    old_text = compose_old_text(caption1, caption2) if mod_type == 0 else caption2
    if llm_type == 1:
        return get_prompt(old_text, data)
    return PROMPT_TEMPLATES[data].format(old_text)


def max_new_tokens_for(data: str) -> int:
    """zscir/llama_generate.py:94: 25 for FIQ, 50 otherwise."""
    return 25 if data == "fiq" else 50


def make_llm_rewriter(generate_fn: Callable[[str], str], data: str = "fiq",
                      mod_type: int = 0, llm_type: int = 1,
                      ) -> Callable[[str, str], str]:
    """Wrap a text-generation callable into the (caption1, caption2) ->
    llm_caption signature `generate_extended_triplets` expects. The callable
    receives the full prompt and must return only the continuation (the
    reference pipeline slices off the prompt echo, llama_generate.py:65-66);
    output goes through the reference's post_process."""

    def rewrite(caption1: str, caption2: str) -> str:
        prompt = build_rewrite_prompt(caption1, caption2, data, mod_type, llm_type)
        res = post_process(generate_fn(prompt))
        return res if res else caption2

    return rewrite


# --- zscir/prompts.py:1-66 — CC paraphrase prompt banks --------------------
# (kept verbatim for the CC3M out-of-domain triplet path; the reference
# prints their lengths at import, we only expose the lists.)

PROMPTS_REFERENCE = [
    "remove {0}",
    "{0} is removed",
]

PROMPTS_TARGET = [
    "{1}",
    "apply {1}",
    "add {1}",
    "if it is {1}",
    "{1} is the new option",
    "choose {1} instead",
    "{1} is the updated version",
    "use {1} from now on",
    "{1} is the new choice",
    "opt for {1}",
    "{1} is the updated option",
    "{1} is the new selection",
    "{1} is the new option available",
    "{1} is the updated choice",
    "{1} is introduced as the new option after",
]

PROMPTS_BOTH = [
    "I want an image of {1} instead of an image of {0}",
    "change {0} to {1}",
    "Replace the image of {0} with {1} in the output.",
    "Generate an output image where {1} is depicted instead of {0}.",
    "Transform the input image to show {1} instead of {0}.",
    "Obtain an image with {1} replacing {0} from the input.",
    "Produce an output image featuring {1} rather than {0}.",
    "Modify the input image to display {1} instead of {0}.",
    "Create a new image by substituting {0} for {1} in the original.",
    "Request an image of {1} as a replacement for {0}.",
    "replace {0} with {1}",
    "substitute {1} for {0}",
    "exchange {0} with {1}",
    "alter {0} to {1}",
    "convert {0} to {1}",
    "transform {0} into {1}",
    "swap {0} for {1}",
    "replace {0} with {1}",
    "remodel {0} into {1}",
    "redesign {0} as {1}",
    "update {0} to {1}",
    "revamp {0} into {1}",
    "substitute {1} for {0}",
    "modify {0} to become {1}",
    "turn {0} into {1}",
    "alter {0} to match {1}",
    "customize {0} to become {1}",
    "adapt {0} to fit {1}",
    "upgrade {0} to {1}",
    "change {0} to match {1}",
    "tweak {0} to become {1}",
    "amend {0} to fit {1}",
    "{0} is replaced with {1}",
    "{0} is removed and {1} is added",
    "{1} is introduced after {0} is removed",
    "{0} is removed and {1} takes its place",
    "{1} is added after {0} is removed",
    "{0} is removed and {1} is introduced",
    "{1} is added in place of {0}",
    "{1} is introduced after {0} is retired",
    "{1} is added as a replacement for {0}",
]


def make_jax_generate_fn(params, cfg, tokenizer, *, max_new_tokens: int = 25,
                         top_k: int = 10, seed: int = 0,
                         cache_dtype=None, mesh=None,
                         prefill_chunk=None, attn_kernel=None):
    """TPU-native LM execution for the rewriter: the JAX LLaMA decoder
    (models/llama.py) with the reference's exact sampling semantics
    (zscir/llama_generate.py:55-63: do_sample=True, top_k=10, HF-default
    temperature/top_p of 1.0, eos doubles as pad). Returns a
    `generate(prompt) -> continuation` callable for make_llm_rewriter.

    One compiled KV-cached scan per exact prompt length (few-shot rewrite
    prompts share most of their text, so lengths cluster tightly across a
    datagen run and the jit cache stays small)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spn4cir_tpu.models.llama import llama_generate

    eos = tokenizer.eos_token_id
    rng_holder = {"rng": jax.random.PRNGKey(seed)}
    jit_cache: dict = {}
    cache_sharding = _tp_cache_sharding(cfg, mesh)
    # TP params must stay on the XLA matmul path even when the cache
    # sharding fell back to None (indivisible kv width)
    quant_kernel = False if mesh is not None else None

    from spn4cir_tpu.models.llama import _embed_rows

    def generate(prompt: str) -> str:
        ids = tokenizer.encode(prompt)
        key = (len(ids), max_new_tokens)
        if key not in jit_cache:
            jit_cache[key] = jax.jit(lambda p, e, r: llama_generate(
                p, cfg, e, eos_id=eos, pad_id=eos,
                max_new_tokens=max_new_tokens, do_sample=True,
                temperature=1.0, top_p=1.0, top_k=top_k, rng=r,
                cache_sharding=cache_sharding, quant_kernel=quant_kernel,
                prefill_chunk=prefill_chunk, attn_kernel=attn_kernel,
                **({} if cache_dtype is None
                   else {"cache_dtype": cache_dtype})))
        # embedding lookup stays on device (dense or int8 QuantKernel) —
        # pulling the table to host per prompt would transfer GBs
        embeds = _embed_rows(params["embed_tokens"],
                             jnp.asarray(ids, jnp.int32))[None]
        rng_holder["rng"], sub = jax.random.split(rng_holder["rng"])
        out = np.asarray(jit_cache[key](params, embeds, sub))[0]
        toks = []
        for t in out.tolist():
            if t == eos:
                break
            toks.append(t)
        return tokenizer.decode(toks)

    return generate


def _tp_cache_sharding(cfg, mesh):
    """KV-cache sharding for tensor-parallel generation (None otherwise)."""
    if mesh is None:
        return None
    from spn4cir_tpu.parallel.tp import llama_cache_sharding
    return llama_cache_sharding(cfg, mesh)


def _place_llm_params(params, mesh):
    """One weight transfer at load time: plain device_put single-chip, or
    Megatron TP shards over the mesh 'model' axis (parallel/tp.py) — bf16
    7B (13.4 GB, too big for one 16 GB chip) fits from 2 chips up, and
    decode weight streaming rides N×HBM bandwidth."""
    import jax

    if mesh is None:
        return jax.device_put(params)
    from spn4cir_tpu.parallel.tp import shard_llama_params
    return shard_llama_params(params, mesh)


def make_jax_batch_generate_fn(params, cfg, tokenizer, *,
                               max_new_tokens: int = 25, top_k: int = 10,
                               seed: int = 0, batch_size: int = 8,
                               len_bucket: int = 32, cache_dtype=None,
                               mesh=None, prefill_chunk=None,
                               attn_kernel=None):
    """Batched TPU-native rewriting: many prompts per `llama_generate` call.

    The reference's HF pipeline rewrites one prompt per generate call
    (zscir/llama_generate.py:64) — at 7B scale decode is weight-bandwidth-
    bound, so B prompts per call cost nearly the same HBM traffic as one.
    Prompts are sorted by token length, grouped `batch_size` at a time, and
    LEFT-padded to the next `len_bucket` multiple; `llama_generate`'s
    attention_mask path keeps each row's stream identical to what it would
    produce alone (per-row RoPE positions, pad keys masked). Sorting keeps
    bucket padding waste low and the jit cache small — one compiled program
    per (padded_len,) geometry, with short groups padded by repeating rows
    so the batch dimension stays static.

    `batch_size=0` selects bucket-aware auto batching: prompts partition by
    token length at the DECODE_BUCKET_BATCH bounds and each partition runs
    at its bucket's measured --llm_batch working point (groups never pad
    across a bucket boundary).

    Returns `generate_batch(prompts) -> continuations` (order-preserving).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spn4cir_tpu.models.llama import _embed_rows, llama_generate

    eos = tokenizer.eos_token_id
    rng_holder = {"rng": jax.random.PRNGKey(seed)}
    jit_cache: dict = {}
    cache_sharding = _tp_cache_sharding(cfg, mesh)
    quant_kernel = False if mesh is not None else None

    def _groups(order, enc):
        if batch_size:
            return [(order[lo:lo + batch_size], batch_size)
                    for lo in range(0, len(order), batch_size)]
        groups, i = [], 0
        while i < len(order):
            first_len = len(enc[order[i]])
            bound = next(bd for bd, _, _ in DECODE_BUCKET_BATCH
                         if first_len <= bd)
            bb = recommended_llm_batch(first_len, cache_dtype)
            g = []
            while (i < len(order) and len(g) < bb
                   and len(enc[order[i]]) <= bound):
                g.append(order[i])
                i += 1
            groups.append((g, bb))
        return groups

    def generate_batch(prompts: Sequence[str]) -> list:
        enc = [tokenizer.encode(p) for p in prompts]
        order = sorted(range(len(enc)), key=lambda i: len(enc[i]))
        results = [""] * len(enc)
        for idxs, group_batch in _groups(order, enc):
            longest = max(len(enc[i]) for i in idxs)
            plen = -(-longest // len_bucket) * len_bucket
            # a lone prompt runs as a true B=1 program instead of being
            # padded to the full batch (batch_size x the device work)
            bs = group_batch if len(idxs) > 1 else 1
            # repeat rows to the static batch size (outputs discarded)
            rows = idxs + [idxs[-1]] * (bs - len(idxs))
            ids = np.full((bs, plen), eos, np.int32)
            mask = np.zeros((bs, plen), np.int32)
            for r, i in enumerate(rows):
                ids[r, plen - len(enc[i]):] = enc[i]
                mask[r, plen - len(enc[i]):] = 1
            key = (bs, plen)
            if key not in jit_cache:
                jit_cache[key] = jax.jit(lambda p, e, m, r: llama_generate(
                    p, cfg, e, eos_id=eos, pad_id=eos,
                    max_new_tokens=max_new_tokens, do_sample=True,
                    temperature=1.0, top_p=1.0, top_k=top_k, rng=r,
                    attention_mask=m, cache_sharding=cache_sharding,
                    quant_kernel=quant_kernel, prefill_chunk=prefill_chunk,
                    attn_kernel=attn_kernel,
                    **({} if cache_dtype is None
                       else {"cache_dtype": cache_dtype})))
            embeds = _embed_rows(params["embed_tokens"],
                                 jnp.asarray(ids, jnp.int32))
            rng_holder["rng"], sub = jax.random.split(rng_holder["rng"])
            out = np.asarray(jit_cache[key](params, embeds,
                                            jnp.asarray(mask), sub))
            for r, i in enumerate(idxs):
                toks = []
                for t in out[r].tolist():
                    if t == eos:
                        break
                    toks.append(t)
                results[i] = tokenizer.decode(toks)
        return results

    return generate_batch


def make_llm_batch_rewriter(generate_batch_fn, data: str = "fiq",
                            mod_type: int = 0, llm_type: int = 1):
    """Batched counterpart of `make_llm_rewriter`: the returned callable has
    the same (caption1, caption2) -> llm_caption signature, plus a
    `.rewrite_batch(pairs)` method that `generate_extended_triplets` uses to
    rewrite the whole triplet list in large device batches."""

    def rewrite_batch(pairs: Sequence[tuple]) -> list:
        prompts = [build_rewrite_prompt(c1, c2, data, mod_type, llm_type)
                   for c1, c2 in pairs]
        outs = generate_batch_fn(prompts)
        return [post_process(o) or c2 for o, (c1, c2) in zip(outs, pairs)]

    def rewrite(caption1: str, caption2: str) -> str:
        return rewrite_batch([(caption1, caption2)])[0]

    rewrite.rewrite_batch = rewrite_batch
    return rewrite


def load_jax_rewriter(ckpt_path: str = "", tokenizer=None, *,
                      data: str = "fiq", mod_type: int = 0,
                      llm_type: int = 1, tiny: bool = False, seed: int = 0,
                      quantize_weights: bool = False, batch_size: int = 1,
                      cache_dtype=None, mesh=None, prefill_chunk=None,
                      attn_kernel=None):
    """End-to-end TPU-native rewriter: JAX LLaMA-2 decoder + the byte-exact
    prompt contract. `ckpt_path` is an HF LlamaForCausalLM state dict
    (torch); empty => random init (smoke runs). `tokenizer` defaults to the
    byte-level stub when `tiny` (tests; real runs pass the HF LLaMA
    tokenizer). `batch_size != 1` rewrites in left-padded device batches
    (`make_jax_batch_generate_fn`) instead of the reference's one-prompt-
    per-call loop; 0 = bucket-aware auto batching (DECODE_BUCKET_BATCH)."""
    import jax

    from spn4cir_tpu.models.llama import LlamaConfig, LlamaLM

    if tokenizer is None:
        if not tiny:
            raise ValueError("load_jax_rewriter needs a tokenizer for "
                             "non-tiny configs")
        from spn4cir_tpu.tokenizer.bytelevel import ByteTokenizer
        tokenizer = ByteTokenizer()
    cfg = (LlamaConfig.tiny(vocab_size=max(
               int(getattr(tokenizer, "vocab_size", 128)), 128))
           if tiny else LlamaConfig.llama2_7b_chat())
    if ckpt_path:
        from spn4cir_tpu.models.convert import (
            convert_llama_state_dict, has_quantized_leaves,
            is_converted_checkpoint, load_converted_params,
            load_torch_state_dict, quantize_llama_weights_host)
        if is_converted_checkpoint(ckpt_path):
            # tools/convert_ckpt.py --backbone llama output (possibly
            # already --quantize_int8'd)
            params = load_converted_params(ckpt_path)["params"]
        else:
            params = convert_llama_state_dict(
                load_torch_state_dict(ckpt_path), cfg.num_layers)["params"]
        if quantize_weights and not has_quantized_leaves(params):
            params = quantize_llama_weights_host(params)
        # one transfer now — numpy jit args would re-upload the whole
        # weight tree on every rewrite call
        params = _place_llm_params(params, mesh)
    elif not tiny:
        # a random-init 7B would silently write garbage rewrites into the
        # generated dataset (and ~27 GB of f32 would not even fit)
        raise ValueError("load_jax_rewriter needs ckpt_path for non-tiny "
                         "configs (random weights would produce nonsense "
                         "rewrites)")
    else:
        import jax.numpy as jnp
        params = LlamaLM(cfg).init(
            jax.random.PRNGKey(0),
            input_ids=jnp.zeros((1, 4), jnp.int32))["params"]
        if quantize_weights:
            from spn4cir_tpu.models.llama import quantize_llama_weights
            params = jax.jit(quantize_llama_weights)(params)
        params = _place_llm_params(params, mesh)
    if cache_dtype is None and not tiny:
        # 7B production default: bf16 KV cache — halves cache HBM (the
        # BENCHMARKS.md rewriter numbers are measured in this config, and
        # the reference's own pipeline runs fp16 on GPU). Tiny test configs
        # keep f32 so the HF-exactness tests stay bit-deterministic.
        import jax.numpy as jnp
        cache_dtype = jnp.bfloat16
    if batch_size != 1:  # 0 = bucket-aware auto, >1 = fixed device batches
        gen = make_jax_batch_generate_fn(
            params, cfg, tokenizer, max_new_tokens=max_new_tokens_for(data),
            seed=seed, batch_size=batch_size, cache_dtype=cache_dtype,
            mesh=mesh, prefill_chunk=prefill_chunk, attn_kernel=attn_kernel)
        return make_llm_batch_rewriter(gen, data, mod_type, llm_type)
    gen = make_jax_generate_fn(params, cfg, tokenizer,
                               max_new_tokens=max_new_tokens_for(data),
                               seed=seed, cache_dtype=cache_dtype, mesh=mesh,
                               prefill_chunk=prefill_chunk,
                               attn_kernel=attn_kernel)
    return make_llm_rewriter(gen, data, mod_type, llm_type)


def load_hf_rewriter(model_name: str = "meta-llama/Llama-2-7b-chat-hf",
                     data: str = "fiq", mod_type: int = 0, llm_type: int = 1):
    """HF-pipeline rewriter matching the reference's sampling setup
    (zscir/llama_generate.py:34-70: do_sample, top_k=10, eos as pad).
    Requires the model weights locally; this environment has no egress."""
    from transformers import pipeline  # lazy; heavy

    pipe = pipeline("text-generation", model=model_name,
                    max_new_tokens=max_new_tokens_for(data),
                    do_sample=True, top_k=10)

    def generate(prompt: str) -> str:
        out = pipe(prompt)[0]["generated_text"]
        return out[len(prompt):]

    return make_llm_rewriter(generate, data, mod_type, llm_type)
