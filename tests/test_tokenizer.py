"""CLIP BPE tokenizer tests (golden values recorded from the reference
tokenizer — `clip4cir/clip/simple_tokenizer.py` — run offline)."""

import numpy as np
import pytest

from spn4cir_tpu.tokenizer import fits_context, get_tokenizer, tokenize


@pytest.fixture(scope="module")
def tok():
    try:
        return get_tokenizer()
    except FileNotFoundError:
        pytest.skip("BPE merges file not available")


def test_vocab_layout(tok):
    assert tok.vocab_size == 49408
    assert tok.sot_id == 49406
    assert tok.eot_id == 49407


def test_golden_encodings(tok):
    # Golden ids produced by the reference SimpleTokenizer on these inputs.
    golden = {
        "a photo of a dog": [320, 1125, 539, 320, 1929],
        "is shorter and more revealing": [533, 20350, 537, 750, 21321],
        "it's a cat's toy": [585, 568, 320, 2368, 568, 5988],
    }
    for text, ids in golden.items():
        assert tok.encode(text) == ids, text


def test_tokenize_shape_and_padding(tok):
    arr = tokenize(["a dog", "a longer caption about a blue dress"], tokenizer=tok)
    assert arr.shape == (2, 77)
    assert arr.dtype == np.int32
    assert arr[0, 0] == tok.sot_id
    row = arr[0]
    eot_pos = int(np.argmax(row == tok.eot_id))
    assert (row[eot_pos + 1 :] == 0).all()


def test_tokenize_case_and_whitespace_invariance(tok):
    a = tokenize("A  Blue   DRESS", tokenizer=tok)
    b = tokenize("a blue dress", tokenizer=tok)
    np.testing.assert_array_equal(a, b)


def test_truncation(tok):
    long_text = "very " * 200 + "long"
    with pytest.raises(RuntimeError):
        tokenize(long_text, tokenizer=tok)
    arr = tokenize(long_text, truncate=True, tokenizer=tok)
    assert arr.shape == (1, 77)
    assert arr[0, -1] == tok.eot_id
    assert not fits_context(long_text, tokenizer=tok)
    assert fits_context("short text", tokenizer=tok)


def test_roundtrip(tok):
    # BPE decode re-inserts a space after every word-end marker, so
    # punctuation detaches — compare token streams, not raw strings
    # (same behavior as the reference decoder's `</w>` -> ' ').
    text = "unlike the shirt, i want a blue dress with floral print!"
    assert tok.encode(tok.decode(tok.encode(text))) == tok.encode(text)
