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
from typing import Callable, Iterable, List, Optional

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
                  prefix: Optional[str] = None) -> str:
    """Reference filename contract: mm_data/{ds}/{ds}_it_{mllm}_{k}.json
    (ref captioner_llava.py:173-205 / get_cir_data.py:35,110)."""
    prefix = prefix or {"fiq": "fashioniq", "cirr": "cirr"}.get(data_name, data_name)
    folder = os.path.join(out_root, data_name)
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, f"{prefix}_it_{mllm}_{word_num}.json")
    with open(path, "w") as f:
        json.dump(it_list, f)
    return path


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
