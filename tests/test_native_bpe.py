"""Native (C++) BPE fast path vs the Python tokenizer — exact parity."""

import random
import string

import numpy as np
import pytest

from spn4cir_tpu.tokenizer import native_bpe
from spn4cir_tpu.tokenizer.bpe import get_tokenizer, tokenize

pytestmark = pytest.mark.skipif(not native_bpe.native_available(),
                                reason="no native toolchain")


@pytest.fixture(scope="module")
def tok():
    return get_tokenizer()


@pytest.fixture(scope="module")
def native(tok):
    nb = native_bpe.get_native(tok)
    assert nb is not None
    return nb


CAPTIONS = [
    "is shorter and has a floral pattern",
    "The dress is  BLUE   with   white dots!!",
    "it's got 3 buttons, isn't it? they're #1 (no. 42)",
    "a-line; v-neck... 100% cotton's 'look'",
    "I'll we've you're can't don'T O'Brien's",
    "",
    "   ",
    "word",
    "x",
    "9",
    "don't---stop; 'tis ok",
    "semi--colons;;; and 'quotes' \"here\"",
    "tabs\tand\nnewlines\r\nmixed   spaces",
]


def test_known_captions_match_python(tok, native, ):
    for cap in CAPTIONS:
        got = native.encode(cap)
        assert got is not None, cap
        assert got == tok._encode_py(cap), cap


def test_fuzz_ascii_matches_python(tok, native):
    rnd = random.Random(0)
    alphabet = string.ascii_letters + string.digits + string.punctuation + "  '"
    # exclude the fallback triggers from the fuzz alphabet
    alphabet = alphabet.replace("&", "")
    for _ in range(400):
        n = rnd.randint(0, 40)
        s = "".join(rnd.choice(alphabet) for _ in range(n))
        if "<|" in s:
            continue
        got = native.encode(s)
        assert got is not None, repr(s)
        assert got == tok._encode_py(s), repr(s)


def test_fallback_cases(tok, native):
    for s in ["café au lait", "&amp; escaped", "<|startoftext|> hi",
              "emoji 🙂 here", "nul\x00byte"]:
        assert native.encode(s) is None, s
        # and the public encode still produces the Python result
        assert tok.encode(s) == tok._encode_py(s)


def test_tokenize_array_uses_fast_path(tok):
    caps = ["make it blue with short sleeves", "café"]  # fast + fallback
    arr = tokenize(caps)
    assert arr.shape == (2, 77) and arr.dtype == np.int32
    want0 = [tok.sot_id] + tok._encode_py(caps[0]) + [tok.eot_id]
    assert list(arr[0][: len(want0)]) == want0
    want1 = [tok.sot_id] + tok._encode_py(caps[1]) + [tok.eot_id]
    assert list(arr[1][: len(want1)]) == want1


def test_long_text_total_count(tok, native):
    s = "very " * 700 + "long caption"
    got = native.encode(s)
    assert got == tok._encode_py(s)
    assert len(got) > 512  # exercised the grow-and-retry path


def test_encode_batch_matches_per_text(tok, native):
    """One-FFI-call batch path: exact per-row parity with the Python path,
    None exactly where the contract demands fallback (non-ASCII, NUL,
    rows longer than max_ids)."""
    texts = CAPTIONS + ["café au lait", "nul\x00byte", "&amp;",
                        "make the dress red", "x " * 300]
    got = native.encode_batch(texts, max_ids=256)
    assert len(got) == len(texts)
    for s, ids in zip(texts, got):
        if ids is None:
            # fallback rows: non-ASCII contract or overflow
            assert (native.encode(s) is None
                    or len(tok._encode_py(s)) > 256), repr(s)
        else:
            assert ids == tok._encode_py(s), repr(s)


def test_encode_batch_threads_deterministic(tok, native):
    rnd = random.Random(3)
    alphabet = string.ascii_letters + string.digits + " '"
    texts = ["".join(rnd.choice(alphabet) for _ in range(rnd.randint(0, 60)))
             for _ in range(257)]
    want = [tok._encode_py(s) for s in texts]
    for threads in (1, 4):
        got = native.encode_batch(texts, threads=threads)
        assert got == want


def test_tokenizer_encode_batch_public(tok):
    """ClipTokenizer.encode_batch == [encode(t) ...] including fallbacks."""
    texts = ["blue dress", "café", "is longer", "", "<|endoftext|> x"]
    assert tok.encode_batch(texts) == [tok.encode(t) for t in texts]


def test_stale_so_recovery(tok, tmp_path):
    """A pre-batch-API _bpe.so whose mtime defeats the rebuild guard must be
    rebuilt AND reloaded in-process (glibc dlopen dedupes by pathname, so the
    reload has to go through a unique path)."""
    import os
    import shutil
    import subprocess
    import sys
    import textwrap

    so = native_bpe._SO
    backup = str(tmp_path / "bpe_backup.so")
    shutil.copyfile(so, backup)

    def install(src):
        # NEVER rewrite the .so in place: this pytest process (and any
        # concurrent one) has it mmap'd via CDLL, and shutil.copyfile's
        # O_TRUNC rewrite invalidates the mapped executable pages -> later
        # native calls die with SIGBUS (this exact bug killed whole suite
        # runs). os.replace swaps the directory entry to a NEW inode; the
        # old mapping keeps the old inode alive and stays valid.
        tmp = so + ".swap"
        shutil.copyfile(src, tmp)
        os.replace(tmp, so)
    stub_c = tmp_path / "stub.c"
    stub_c.write_text(
        "void* bpe_create(const char* a, const char* b) { return (void*)1; }\n"
        "void bpe_destroy(void* h) {}\n"
        "int bpe_encode(void* h, const char* t, int* out, int cap)"
        " { return -1; }\n")
    stub_so = str(tmp_path / "stub.so")
    subprocess.run(["gcc", "-shared", "-fPIC", str(stub_c), "-o", stub_so],
                   check=True)
    try:
        install(stub_so)
        # mtime newer than the source: the plain rebuild guard won't fire
        os.utime(so, (os.path.getmtime(native_bpe._SRC) + 10,) * 2)
        probe = textwrap.dedent("""
            import sys
            sys.path.insert(0, %r)
            from spn4cir_tpu.tokenizer import native_bpe
            from spn4cir_tpu.tokenizer.bpe import get_tokenizer
            tok = get_tokenizer()
            nb = native_bpe.get_native(tok)
            assert nb is not None, native_bpe._build_error
            ids = nb.encode("a blue dress")
            assert ids == tok._encode_py("a blue dress"), ids
            print("RECOVERED")
        """) % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        out = subprocess.run([sys.executable, "-c", probe],
                             capture_output=True, text=True, timeout=300)
        assert "RECOVERED" in out.stdout, (out.stdout, out.stderr[-2000:])
    finally:
        install(backup)
