"""Prepared-layout bank sidecar cache (bank.py:save/load_prepared_target):
round-trips the post-quantize, post-relayout target bank so later runs skip
the per-run relayout (VERDICT r3 next-#7; deferred from round 3)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spn4cir_tpu.bank.bank import (load_prepared_target,
                                   prepared_cache_file,
                                   save_prepared_target)
from spn4cir_tpu.ops.bank_kernels import prepare_bank, quantize_bank
from spn4cir_tpu.ops.maxquery_kernels import prepare_max_query_bank


def _flat(rng, m=37, d=16, dtype=np.float32):
    return jnp.asarray(rng.randn(m, d).astype(np.float32)).astype(dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flat_dense_roundtrip(rng, tmp_path, dtype):
    bank = _flat(rng, dtype=dtype)
    prep = prepare_bank(bank, block_m=32)
    path = str(tmp_path / "bank.npz")
    save_prepared_target(path, "x", prep)
    got = load_prepared_target(path, "x", tuple(bank.shape))
    assert got is not None
    assert got.m_actual == prep.m_actual
    assert got.values.dtype == prep.values.dtype
    assert got.scales is None
    np.testing.assert_array_equal(np.asarray(got.values, np.float32),
                                  np.asarray(prep.values, np.float32))


def test_flat_int8_roundtrip(rng, tmp_path):
    bank = _flat(rng)
    prep = prepare_bank(quantize_bank(bank), block_m=32)
    path = str(tmp_path / "bank.npz")
    save_prepared_target(path, "int8", prep)
    got = load_prepared_target(path, "int8", tuple(bank.shape))
    assert got is not None and got.scales is not None
    np.testing.assert_array_equal(np.asarray(got.values),
                                  np.asarray(prep.values))
    np.testing.assert_array_equal(np.asarray(got.scales),
                                  np.asarray(prep.scales))
    np.testing.assert_allclose(np.asarray(got.dequantize()),
                               np.asarray(prep.dequantize()))


@pytest.mark.parametrize("int8", [False, True])
def test_maxq_roundtrip(rng, tmp_path, int8):
    bank = jnp.asarray(rng.randn(21, 4, 8).astype(np.float32))
    src = quantize_bank(bank) if int8 else bank
    prep = prepare_max_query_bank(src, block_m=16)
    path = str(tmp_path / "bank.npz")
    save_prepared_target(path, "t", prep)
    got = load_prepared_target(path, "t", tuple(bank.shape))
    assert got is not None
    assert got.m_actual == 21 and tuple(got.shape) == (21, 4, 8)
    np.testing.assert_array_equal(np.asarray(got.qmd, np.float32),
                                  np.asarray(prep.qmd, np.float32))
    np.testing.assert_allclose(np.asarray(got.dense()),
                               np.asarray(prep.dense()))


def test_spec_skew_misses(rng, tmp_path):
    """A --bank_dtype flip or a backbone bank-spec change must MISS the
    sidecar (VERDICT r4 next-#6): the tag keys the filename, the spec
    string keys the content."""
    bank = _flat(rng)
    prep = prepare_bank(quantize_bank(bank), block_m=32)
    path = str(tmp_path / "bank.npz")
    spec_int8 = "int8|target(16,)|float32"
    save_prepared_target(path, "int8", prep, spec=spec_int8)
    # same config -> hit
    assert load_prepared_target(path, "int8", tuple(bank.shape),
                                spec=spec_int8) is not None
    # a dtype flip changes the tag -> different filename -> miss
    assert load_prepared_target(path, "bfloat16", tuple(bank.shape),
                                spec="bfloat16|target(16,)|float32") is None
    # same tag, different producer spec (backbone swap onto the same
    # --bank_path with the same target shape) -> content-keyed miss
    assert load_prepared_target(path, "int8", tuple(bank.shape),
                                spec="int8|target(16,)|bfloat16") is None
    # pre-spec cache files (format v1) carry no spec key -> stale, a miss
    import numpy as onp

    f = prepared_cache_file(path, "int8")
    data = dict(onp.load(f))
    del data["spec"]
    data["version"] = onp.asarray(1)
    onp.savez(f, **data)
    assert load_prepared_target(path, "int8", tuple(bank.shape),
                                spec=spec_int8) is None


def test_cli_prepared_spec_distinguishes_configs():
    """cli/train.py:_prepared_spec separates dtypes and backbones."""
    import argparse

    from spn4cir_tpu.cli.train import _prepared_spec
    from spn4cir_tpu.models.api import BankSpec

    class _BB:
        def __init__(self, spec):
            self._spec = spec

        def bank_spec(self):
            return self._spec

    a8 = argparse.Namespace(bank_dtype="int8")
    abf = argparse.Namespace(bank_dtype="bfloat16")
    clip_bb = _BB(BankSpec(refer_shape=(16,), target_shape=(16,)))
    blip2_bb = _BB(BankSpec(refer_shape=(32, 768), target_shape=(32, 256)))
    assert _prepared_spec(clip_bb, a8) != _prepared_spec(clip_bb, abf)
    assert _prepared_spec(clip_bb, a8) != _prepared_spec(blip2_bb, a8)
    assert _prepared_spec(clip_bb, a8) == _prepared_spec(clip_bb, a8)


def test_stale_and_missing(rng, tmp_path):
    bank = _flat(rng)
    prep = prepare_bank(bank, block_m=32)
    path = str(tmp_path / "bank.npz")
    assert load_prepared_target(path, "x", tuple(bank.shape)) is None  # miss
    save_prepared_target(path, "x", prep)
    # shape mismatch (re-extracted / differently extended bank) -> stale
    assert load_prepared_target(path, "x", (99, 16)) is None
    # different tag -> its own sidecar, a miss
    assert load_prepared_target(path, "other", tuple(bank.shape)) is None
    # corrupt file -> treated as a miss, not an exception
    with open(prepared_cache_file(path, "x"), "wb") as f:
        f.write(b"not an npz")
    assert load_prepared_target(path, "x", tuple(bank.shape)) is None
