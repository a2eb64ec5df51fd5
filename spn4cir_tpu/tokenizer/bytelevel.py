"""A minimal byte-level tokenizer satisfying the LLaMA-tokenizer protocol
(encode/decode/bos_token_id/eos_token_id).

Used for smoke-running and testing the LLaVA captioner / LLaMA rewriter
without sentencepiece assets (this environment ships none — zero egress).
Real runs pass an HF LLaMA tokenizer, which satisfies the same protocol
directly. NOT a reproduction of LLaMA's sentencepiece segmentation; token
parity with the reference requires the real tokenizer assets."""

from __future__ import annotations

from typing import List


class ByteTokenizer:
    """bytes 0..255 are themselves; 256 = BOS, 257 = EOS."""

    vocab_size = 258
    bos_token_id = 256
    eos_token_id = 257

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = list(text.encode("utf-8"))
        return ([self.bos_token_id] + ids) if add_bos else ids

    def decode(self, ids: List[int]) -> str:
        data = bytes(t for t in ids
                     if 0 <= t < 256)
        return data.decode("utf-8", errors="replace")
