"""MLLM captioning stage (pluggable).

Parity target: `zscir/captioner_llava.py` / `zscir/captioner_blip.py` —
caption every train image with an MLLM ("please briefly describe the
{category} in {k} words"), writing `mm_data/{ds}/..._it_{mllm}_{k}.json`
entries of the form {"image_id": name, "caption": text}.

The reference vendors full LLaVA/LAVIS stacks for this; here the captioner is
a pluggable callable (any JAX/HF vision-language model, or an external
service), because the pipeline's functional contract is the it-list JSON
(SURVEY.md §7 build step 8). A deterministic fallback captioner is provided
so the downstream pipeline is runnable end-to-end without MLLM weights."""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np

CAPTION_PROMPT = "please briefly describe the {category} in {num_words} words"


def caption_prompt(category: str, num_words: int = 10) -> str:
    """The reference's instruction template (ref captioner_llava.py:32-62)."""
    return CAPTION_PROMPT.format(category=category, num_words=num_words)


def caption_images(
    names_and_images: Iterable,
    caption_fn: Callable[[np.ndarray, str], str],
    category: str = "image",
    num_words: int = 10,
) -> List[dict]:
    """Run `caption_fn(image, prompt)` over (name, image) pairs -> it-list."""
    prompt = caption_prompt(category, num_words)
    return [{"image_id": name, "caption": caption_fn(image, prompt)}
            for name, image in names_and_images]


def write_it_list(it_list: List[dict], data_name: str, mllm: str,
                  word_num: int, out_root: str = "mm_data",
                  prefix: Optional[str] = None,
                  filename: Optional[str] = None) -> str:
    """Reference filename contract: mm_data/{ds}/{ds}_it_{mllm}_{k}.json
    (ref captioner_llava.py:173-205 / get_cir_data.py:35,110); `filename`
    overrides for the CC shard shape mm_data/zs/cc_it_{id}_{mllm}_{k}.json
    (captioner_llava.py:204)."""
    prefix = prefix or {"fiq": "fashioniq", "cirr": "cirr"}.get(data_name, data_name)
    folder = os.path.join(out_root, data_name)
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(
        folder, filename or f"{prefix}_it_{mllm}_{word_num}.json")
    with open(path, "w") as f:
        json.dump(it_list, f)
    return path


def load_cc_shard(path: str) -> List[dict]:
    """A CC3M shard (`part_{id}.data`, one JSON per line: url / image path /
    per-language captions — ref data_process.py:42-54 get_cc_it) ->
    it-list entries {"image_id": url, "image_path": path, "caption": en}."""
    out: List[dict] = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            out.append({"image_id": d["url"], "image_path": d["image"],
                        "caption": d["caption"]["en"]})
    return out


def make_blip_captioner(params, *, blip_size: str = "base",
                        bert_vocab_path: Optional[str] = None,
                        use_nucleus_sampling: bool = False,
                        num_beams: int = 3, max_length: int = 30,
                        min_length: int = 10, batch_size: int = 32):
    """Real MLLM captioning via the JAX BLIP captioner (ViT + MED LM decoder,
    models/blip_caption.py) — the reference's `blip` captioner path
    (zscir/captioner_blip.py:35-37 loading LAVIS "blip_caption"; generation
    defaults blip_caption.py:136-145).

    Returns (captioner, transform, batched_fn): `batched_fn(images)` captions
    a list of preprocessed (H, W, 3) arrays in fixed-size device batches (the
    generation program compiles once per batch geometry); `transform` is the
    LAVIS eval preprocess (square bicubic resize + CLIP normalize)."""
    import jax

    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.models.blip_caption import BlipCaptioner

    cap = BlipCaptioner(blip_size=blip_size, bert_vocab_path=bert_vocab_path)
    transform = ImageTransform("blip_eval", cap.input_dim)
    if params is None or params == "":
        # random init: smoke-running the pipeline without weights (captions
        # will be garbage; real runs pass a blip_caption checkpoint)
        params = cap.init_params(jax.random.PRNGKey(0))
    elif isinstance(params, str):
        # a torch BLIP captioner checkpoint -> converted flax params
        from spn4cir_tpu.models.convert import (convert_blip_caption,
                                                load_torch_state_dict)
        params = convert_blip_caption(load_torch_state_dict(params),
                                      cap.vit_cfg.layers, cap.med_cfg.num_layers,
                                      num_tokens=cap.vit_cfg.num_tokens)

    def batched_fn(images: List[np.ndarray], rng=None) -> List[str]:
        out: List[str] = []
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        for lo in range(0, len(images), batch_size):
            chunk = images[lo: lo + batch_size]
            pad = batch_size - len(chunk)
            batch = np.stack(list(chunk) + [chunk[-1]] * pad)
            rng, sub = jax.random.split(rng)
            caps = cap.caption(params, batch,
                               use_nucleus_sampling=use_nucleus_sampling,
                               num_beams=num_beams, max_length=max_length,
                               min_length=min_length, rng=sub)
            out.extend(caps[: len(chunk)])
        return out

    return cap, transform, batched_fn


def make_llava_captioner(params, *, tokenizer=None, tokenizer_path: str = "",
                         llava_size: str = "7b", category: str = "image",
                         word_num: int = 10, max_new_tokens: int = 64,
                         batch_size: int = 0, dtype=None,
                         quantize_weights: bool = False, mesh=None,
                         cache_dtype=None, attn_kernel=None):
    """The reference's CANONICAL captioning path — LLaVA-v1
    (zscir/captioner_llava.py:147-205 captions every published dataset with
    it) on the JAX CLIP-L tower + LLaMA decoder (models/llava.py).

    `params`: a LLaVA torch checkpoint path (LlavaLlamaForCausalLM state
    dict), a converted params tree, or None/"" for random-init smoke runs.
    `tokenizer`: any HF-LLaMA-compatible tokenizer (encode/decode/
    bos_token_id/eos_token_id) — or `tokenizer_path` to AutoTokenizer-load
    one. Sampling matches the reference exactly: do_sample, T=0.01,
    top_p=0.01 (captioner_llava.py:51-59).

    Returns (captioner, transform, batched_fn) like make_blip_captioner."""
    import jax
    import jax.numpy as jnp

    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.models.llava import LlavaCaptioner, LlavaConfig

    if tokenizer is None:
        if tokenizer_path:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(tokenizer_path)
        elif llava_size == "tiny":
            # smoke/test path without sentencepiece assets
            from spn4cir_tpu.tokenizer.bytelevel import ByteTokenizer
            tokenizer = ByteTokenizer()
        else:
            raise ValueError("make_llava_captioner needs tokenizer= or "
                             "tokenizer_path= (the LLaMA sentencepiece "
                             "assets; none ship with this environment)")

    cfg = (LlavaConfig.tiny(vocab_size=max(
               int(getattr(tokenizer, "vocab_size", 128)), 128))
           if llava_size == "tiny" else LlavaConfig.v1_7b())
    cap = LlavaCaptioner(cfg, tokenizer,
                         dtype=dtype if dtype is not None else jnp.float32,
                         mesh=mesh)
    transform = ImageTransform("clip", cfg.vision.image_size)
    if params is None or params == "":
        params = cap.init_params(jax.random.PRNGKey(0))
    elif isinstance(params, str):
        from spn4cir_tpu.models.convert import (convert_llava_state_dict,
                                                is_converted_checkpoint,
                                                load_converted_params,
                                                load_torch_state_dict)
        if is_converted_checkpoint(params):
            # tools/convert_ckpt.py --backbone llava output
            params = load_converted_params(params)
        else:
            params = convert_llava_state_dict(
                load_torch_state_dict(params), cfg.llama.num_layers,
                cfg.vision.effective_layers)

    from spn4cir_tpu.models.convert import has_quantized_leaves
    if quantize_weights and not has_quantized_leaves(params):
        # weight-only int8 LM (models/llama.py): halves weight HBM; greedy
        # token streams match the full-precision model at tiny geometry.
        # Host numpy trees quantize HOST-side (device quantization needs
        # both precisions resident — ~20 GB transient at 7B).
        lm = params["params"]["language_model"]
        host_tree = any(isinstance(leaf, np.ndarray)
                        for leaf in jax.tree_util.tree_leaves(lm))
        if host_tree:
            from spn4cir_tpu.models.convert import \
                quantize_llama_weights_host

            lm = quantize_llama_weights_host(lm)
        else:
            from spn4cir_tpu.models.llama import quantize_llama_weights

            lm = jax.jit(quantize_llama_weights)(lm)
        params = dict(params)
        params["params"] = dict(params["params"])
        params["params"]["language_model"] = lm

    # one transfer at load time: converted checkpoints are host numpy, and
    # numpy jit arguments re-upload the full weight tree EVERY call.
    # With a mesh, the tree lands tensor-parallel-sharded instead (bf16 7B
    # fits from 2×16 GB chips; decode weight reads ride N×HBM).
    if mesh is not None:
        from spn4cir_tpu.parallel.tp import shard_llava_params
        params = shard_llava_params(params, mesh)
    else:
        params = jax.device_put(params)

    if batch_size == 0:
        # auto: the measured 7B working point for the cache precision (the
        # llava_v1 prompt + max_new pads into the <=448-token bucket) — 16
        # @ float KV, 32 @ int8 KV per the round-5 A/B (BENCHMARKS.md).
        # Tiny (test) geometry keeps batches small: the working point is a
        # 7B HBM-bandwidth fact, not a property of the model class.
        from spn4cir_tpu.datagen.llm_rewrite import recommended_llm_batch
        batch_size = (recommended_llm_batch(448, cache_dtype)
                      if llava_size != "tiny" else 2)

    default_prompt = caption_prompt(category, word_num)

    def batched_fn(images: List[np.ndarray], rng=None,
                   prompt: Optional[str] = None) -> List[str]:
        """`prompt` overrides the construction-time default — reuse ONE
        loaded model across per-category prompt loops (the 7B checkpoint
        load/convert is multi-GB; never repeat it per dress type)."""
        out: List[str] = []
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        use_prompt = prompt if prompt is not None else default_prompt
        for lo in range(0, len(images), batch_size):
            chunk = images[lo: lo + batch_size]
            pad = batch_size - len(chunk)
            batch = np.stack(list(chunk) + [chunk[-1]] * pad)
            rng, sub = jax.random.split(rng)
            caps = cap.caption(params, batch, use_prompt,
                               max_new_tokens=max_new_tokens, rng=sub,
                               cache_dtype=cache_dtype,
                               attn_kernel=attn_kernel)
            out.extend(caps[: len(chunk)])
        return out

    return cap, transform, batched_fn


def load_caption_checkpoint(path: str) -> Dict[str, str]:
    """Partial-progress sidecar (one JSON per line: {"image_id", "caption"})
    -> {image_id: caption}. Tolerates a torn final line (the process died
    mid-write)."""
    done: Dict[str, str] = {}
    if not path or not os.path.exists(path):
        return done
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn tail from a kill mid-write
            done[d["image_id"]] = d["caption"]
    return done


def caption_images_batched(names_and_images: Iterable, batched_fn,
                           batch_size: int = 32,
                           checkpoint_path: str = "",
                           already: Optional[Dict[str, str]] = None
                           ) -> List[dict]:
    """Batched it-list builder (device-efficient variant of caption_images;
    same output contract).

    Preemption resume for the long 7B jobs (captioning all ~46k train
    images is an hour-plus of device time; the reference restarts from
    zero): with `checkpoint_path`, every finished batch is appended to a
    jsonl sidecar immediately, and `already` (from
    `load_caption_checkpoint`) seeds the output — pass it AND filter the
    input iterator by its keys so skipped images are never decoded."""
    it_list = [{"image_id": n, "caption": c}
               for n, c in (already or {}).items()]
    ckpt = open(checkpoint_path, "a") if checkpoint_path else None

    def flush(names, images):
        for n, c in zip(names, batched_fn(images)):
            entry = {"image_id": n, "caption": c}
            it_list.append(entry)
            if ckpt is not None:
                ckpt.write(json.dumps(entry) + "\n")
        if ckpt is not None:
            ckpt.flush()
            os.fsync(ckpt.fileno())

    names, images = [], []
    try:
        for name, image in names_and_images:
            names.append(name)
            images.append(np.asarray(image))
            if len(images) == batch_size:
                flush(names, images)
                names, images = [], []
        if images:
            flush(names, images)
    finally:
        if ckpt is not None:
            ckpt.close()
    return it_list


def stub_captioner(image: np.ndarray, prompt: str) -> str:
    """Deterministic model-free fallback: a coarse color/brightness phrase.
    Lets the full datagen pipeline run without MLLM weights; swap in a real
    captioner for quality."""
    arr = np.asarray(image, np.float32)
    if arr.max() > 2.0:
        arr = arr / 255.0
    mean = arr.reshape(-1, arr.shape[-1]).mean(axis=0)
    channel = ["red", "green", "blue"][int(np.argmax(mean[:3]))]
    tone = "bright" if mean.mean() > 0.5 else "dark"
    return f"a {tone} {channel} toned item"
