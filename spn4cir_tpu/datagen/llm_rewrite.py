"""LLM rewriting of template-composed modification texts.

Parity target: `zscir/llama_generate.py:29-96` (LLaMA-2-7b-chat pipeline over
few-shot prompts from `zscir/prompt.py:41-115`) and the CC paraphrase prompts
(`zscir/prompts.py:1-66`).

The model is a pluggable text-generation callable (HF pipeline, JAX LM, or a
service); weights are external assets. `build_rewrite_prompt` reproduces the
task framing: given two image captions, produce one natural modification
sentence turning image-1 into image-2."""

from __future__ import annotations

from typing import Callable

FEW_SHOT_EXAMPLES = {
    # (caption1, caption2) -> modification text; the reference's few-shot
    # blocks follow this exact task shape (zscir/prompt.py:41-115).
    "fiq": [
        ("a red sleeveless dress", "a blue dress with long sleeves",
         "make it blue and add long sleeves"),
        ("a plain white shirt", "a white shirt with a floral print",
         "add a floral print"),
        ("a long black gown", "a short black cocktail dress",
         "make it shorter and more casual"),
    ],
    "cirr": [
        ("a dog lying on grass", "two dogs running on a beach",
         "show two of them running on a beach instead"),
        ("a red car parked on a street", "a red car driving in the rain",
         "show it driving in the rain"),
        ("a bowl of salad", "a plate of pasta",
         "replace the salad with pasta on a plate"),
    ],
}

SYSTEM_INSTRUCTION = (
    "You are given captions of two images. Write ONE short sentence that "
    "tells how to modify the first image so it becomes the second image. "
    "Answer with the modification sentence only."
)

PARAPHRASE_PROMPTS = [
    "Rewrite the following image-editing request in different words: {0}",
    "Paraphrase this modification instruction: {0}",
    "Say the same editing request another way: {0}",
]


def build_rewrite_prompt(caption1: str, caption2: str, data: str = "fiq",
                         n_shots: int = 3) -> str:
    shots = FEW_SHOT_EXAMPLES.get(data, FEW_SHOT_EXAMPLES["fiq"])[:n_shots]
    lines = [SYSTEM_INSTRUCTION, ""]
    for c1, c2, mod in shots:
        lines += [f"Image 1: {c1}", f"Image 2: {c2}", f"Modification: {mod}", ""]
    lines += [f"Image 1: {caption1}", f"Image 2: {caption2}", "Modification:"]
    return "\n".join(lines)


def make_llm_rewriter(generate_fn: Callable[[str], str], data: str = "fiq"
                      ) -> Callable[[str, str], str]:
    """Wrap a text-generation callable into the (caption1, caption2) ->
    llm_caption signature `generate_extended_triplets` expects. Output is
    cleaned to the first line (the reference strips the prompt echo +
    truncates, llama_generate.py:73-96)."""

    def rewrite(caption1: str, caption2: str) -> str:
        raw = generate_fn(build_rewrite_prompt(caption1, caption2, data))
        line = raw.strip().split("\n")[0].strip()
        return line if line else caption2

    return rewrite


def load_hf_rewriter(model_name: str = "meta-llama/Llama-2-7b-chat-hf",
                     data: str = "fiq", max_new_tokens: int = 40):
    """HF-pipeline rewriter (requires the model weights locally; the
    environment has no network egress, so this is gated)."""
    from transformers import pipeline  # lazy; heavy

    pipe = pipeline("text-generation", model=model_name,
                    max_new_tokens=max_new_tokens, do_sample=False)

    def generate(prompt: str) -> str:
        out = pipe(prompt)[0]["generated_text"]
        return out[len(prompt):]

    return make_llm_rewriter(generate, data)
