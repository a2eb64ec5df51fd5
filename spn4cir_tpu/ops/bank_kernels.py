"""Blocked Pallas bank-InfoNCE kernel (the stage-2 "scaling negatives" loss).

Semantics match `spn4cir_tpu.ops.infonce.bank_infonce` (the XLA ground
truth; reference behavior: `clip4cir/models.py:130-144,163-167`):

    logits = (Q @ bankᵀ) / tau          # (B, M), M = all train images
    loss   = mean_i [ logsumexp_j logits[i, j] - logits[i, labels[i]] ]

Instead of materializing the (B, M) logits matrix in HBM (M is 16k-60k for
FashionIQ/CIRR and larger with unlabeled negatives), the kernel sweeps bank
blocks through VMEM with a flash-attention-style online softmax, emitting
per-row (running-max, normalized sum-exp, positive-logit, E_p[logit])
statistics. The backward pass is a second blocked sweep accumulating
dQ = P @ bank (P recomputed from the saved statistics), so peak memory is
O(B·D + block) instead of O(B·M).

Gradients: dquery and dtau are exact; the bank is a frozen feature cache in
stage-2 (ref freezes the image tower, `clip4cir/models.py:31-33`) so its
gradient is returned as zeros (DCE'd when unused). Integer labels carry no
gradient.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _interpret() -> bool:
    # Pallas TPU kernels run in interpreter mode on non-TPU backends (tests).
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


# --------------------------------------------------------------------------
# Forward: per-row softmax statistics
# --------------------------------------------------------------------------

def _fwd_kernel(labels_ref, q_ref, bank_ref, tau_ref,
                mx_ref, se_ref, pos_ref, el_ref, *, m_actual: int, block_m: int):
    m_idx = pl.program_id(1)
    tau = tau_ref[0]

    q = q_ref[:].astype(jnp.float32)
    b = bank_ref[:].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) / tau  # (TB, TM)

    col0 = m_idx * block_m
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col_ids < m_actual
    logits = jnp.where(valid, logits, -jnp.inf)

    blk_max = jnp.max(logits, axis=1, keepdims=True)            # (TB, 1)
    blk_se = jnp.sum(jnp.exp(logits - blk_max), axis=1, keepdims=True)

    # positive logit for rows whose label falls in this block
    lab = labels_ref[:, :1]                                      # (TB, 1) VMEM
    is_pos = col_ids == lab
    blk_pos = jnp.sum(jnp.where(is_pos, jnp.where(valid, logits, 0.0), 0.0),
                      axis=1, keepdims=True)
    # sum of exp-weighted logits for the dtau term (un-normalized; rescaled
    # by the running max like the sum-exp)
    blk_el = jnp.sum(jnp.where(valid, jnp.exp(logits - blk_max) * logits, 0.0),
                     axis=1, keepdims=True)

    @pl.when(m_idx == 0)
    def _init():
        mx_ref[:] = jnp.broadcast_to(blk_max, mx_ref.shape)
        se_ref[:] = jnp.broadcast_to(blk_se, se_ref.shape)
        pos_ref[:] = jnp.broadcast_to(blk_pos, pos_ref.shape)
        el_ref[:] = jnp.broadcast_to(blk_el, el_ref.shape)

    @pl.when(m_idx > 0)
    def _update():
        run_max = mx_ref[:, :1]
        new_max = jnp.maximum(run_max, blk_max)
        old_scale = jnp.exp(run_max - new_max)
        blk_scale = jnp.exp(blk_max - new_max)
        mx_ref[:] = jnp.broadcast_to(new_max, mx_ref.shape)
        se_ref[:] = jnp.broadcast_to(
            se_ref[:, :1] * old_scale + blk_se * blk_scale, se_ref.shape)
        el_ref[:] = jnp.broadcast_to(
            el_ref[:, :1] * old_scale + blk_el * blk_scale, el_ref.shape)
        pos_ref[:] = jnp.broadcast_to(pos_ref[:, :1] + blk_pos, pos_ref.shape)


def _run_forward(query, bank, labels, tau, *, block_b: int, block_m: int):
    b_actual, d = query.shape
    bp = _round_up(b_actual, block_b)
    bk, m_actual = _padded_bank(bank, block_m)
    mp = bk.shape[0]

    q = jnp.pad(query, ((0, bp - b_actual), (0, 0)))
    lab = jnp.pad(labels.astype(jnp.int32), (0, bp - b_actual), constant_values=-1)
    lab = jnp.broadcast_to(lab[:, None], (bp, LANES))
    tau_arr = jnp.asarray(tau, jnp.float32).reshape(1)

    grid = (bp // block_b, mp // block_m)
    kernel = functools.partial(_fwd_kernel, m_actual=m_actual, block_m=block_m)
    stat_shape = jax.ShapeDtypeStruct((bp, LANES), jnp.float32)
    stat_spec = pl.BlockSpec((block_b, LANES), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=[stat_spec] * 4,
    )
    mx, se, pos, el = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[stat_shape] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(lab, q, bk, tau_arr)
    return (mx[:b_actual, 0], se[:b_actual, 0], pos[:b_actual, 0],
            el[:b_actual, 0])


# --------------------------------------------------------------------------
# Backward: dQ = (P - onehot(labels)) @ bank / (tau * B)
# --------------------------------------------------------------------------

def _bwd_kernel(labels_ref, q_ref, bank_ref, tau_ref, mx_ref, se_ref, g_ref,
                dq_ref, *, m_actual: int, block_m: int):
    m_idx = pl.program_id(1)
    tau = tau_ref[0]

    q = q_ref[:].astype(jnp.float32)
    bk = bank_ref[:].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, bk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) / tau

    col0 = m_idx * block_m
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col_ids < m_actual

    mx = mx_ref[:, :1]
    se = se_ref[:, :1]
    p = jnp.where(valid, jnp.exp(logits - mx) / se, 0.0)          # softmax block
    lab = labels_ref[:, :1]
    p = p - jnp.where(col_ids == lab, 1.0, 0.0)

    # per-example gradient scale g_i already includes 1/tau
    contrib = jax.lax.dot_general(
        p * g_ref[:, :1], bk, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(m_idx == 0)
    def _init():
        dq_ref[:] = contrib

    @pl.when(m_idx > 0)
    def _update():
        dq_ref[:] = dq_ref[:] + contrib


def _run_backward(query, bank, labels, tau, mx, se, g, *, block_b: int, block_m: int):
    b_actual, d = query.shape
    bp = _round_up(b_actual, block_b)
    bk, m_actual = _padded_bank(bank, block_m)
    mp = bk.shape[0]

    q = jnp.pad(query, ((0, bp - b_actual), (0, 0)))
    lab = jnp.pad(labels.astype(jnp.int32), (0, bp - b_actual), constant_values=-1)
    lab = jnp.broadcast_to(lab[:, None], (bp, LANES))
    tau_arr = jnp.asarray(tau, jnp.float32).reshape(1)

    def pad_stat(x, fill):
        x = jnp.pad(x, (0, bp - b_actual), constant_values=fill)
        return jnp.broadcast_to(x[:, None], (bp, LANES))

    mx_p = pad_stat(mx, 0.0)
    se_p = pad_stat(se, 1.0)  # avoid 0/0 in padded rows
    g_p = pad_stat(g, 0.0)

    grid = (bp // block_b, mp // block_m)
    kernel = functools.partial(_bwd_kernel, m_actual=m_actual, block_m=block_m)
    stat_spec = pl.BlockSpec((block_b, LANES), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            stat_spec, stat_spec, stat_spec,
        ],
        out_specs=[pl.BlockSpec((block_b, d), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)],
    )
    (dq,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bp, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(lab, q, bk, tau_arr, mx_p, se_p, g_p)
    return dq[:b_actual]


# --------------------------------------------------------------------------
# Public op with custom VJP
# --------------------------------------------------------------------------

DEFAULT_BLOCK_B = 128
DEFAULT_BLOCK_M = 1024


@jax.tree_util.register_pytree_node_class
class PreparedBank:
    """A frozen (M, D) bank pre-padded ONCE to the kernel's block_m
    multiple, so the jitted train step contains no per-step bank pad (the
    bank never changes during stage 2 — ~150 MB copied per step at CIRR
    flat scale otherwise). `scales` non-None marks the int8 layout (padded
    (Mp,) f32 row scales). Built by `prepare_bank`; m_actual masks pads."""

    def __init__(self, values, scales, m_actual):
        self.values = values
        self.scales = scales
        self.m_actual = int(m_actual)

    @property
    def shape(self):  # Bank.num_images / dispatch compatibility
        return (self.m_actual,) + tuple(self.values.shape[1:])

    @property
    def ndim(self):
        return self.values.ndim

    @property
    def dtype(self):
        return self.values.dtype

    def dequantize(self):
        vals = self.values[: self.m_actual].astype(jnp.float32)
        if self.scales is None:
            return vals
        return vals * self.scales[: self.m_actual, None]

    def tree_flatten(self):
        if self.scales is None:
            return (self.values,), (self.m_actual, True)
        return (self.values, self.scales), (self.m_actual, False)

    @classmethod
    def tree_unflatten(cls, aux, children):
        m_actual, dense = aux
        return cls(children[0], None if dense else children[1], m_actual)


def prepare_bank(bank, block_m: int = DEFAULT_BLOCK_M):
    """One-time kernel relayout of a frozen 2-D bank (dense or QuantBank).
    Idempotent. Do this at bank build/load time (cli/train.py) — NOT inside
    the step — so the relayout leaves the per-step graph entirely."""
    if isinstance(bank, PreparedBank):
        return bank
    if isinstance(bank, QuantBank):
        m = bank.values.shape[0]
        mp = _round_up(m, block_m)
        return PreparedBank(
            jnp.pad(bank.values, ((0, mp - m), (0, 0))),
            jnp.pad(bank.scales.astype(jnp.float32), (0, mp - m)), m)
    m = bank.shape[0]
    mp = _round_up(m, block_m)
    return PreparedBank(jnp.pad(bank, ((0, mp - m), (0, 0))), None, m)


def _padded_bank(bank, block_m):
    """(padded_values, m_actual) for dense or prepared banks."""
    if isinstance(bank, PreparedBank):
        assert bank.values.shape[0] % block_m == 0, (
            bank.values.shape, block_m, "prepared with a different block_m")
        return bank.values, bank.m_actual
    m_actual = bank.shape[0]
    mp = _round_up(m_actual, block_m)
    return jnp.pad(bank, ((0, mp - m_actual), (0, 0))), m_actual


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def bank_infonce_pallas(query, bank, labels, tau,
                        block_b: int = DEFAULT_BLOCK_B,
                        block_m: int = DEFAULT_BLOCK_M):
    """Full-bank InfoNCE via the blocked Pallas kernel. See module docstring."""
    loss, _ = _fwd_for_vjp(query, bank, labels, tau, block_b, block_m)
    return loss


def _fwd_for_vjp(query, bank, labels, tau, block_b, block_m):
    bb = min(block_b, _round_up(query.shape[0], 8))
    mx, se, pos, el = _run_forward(query, bank, labels, tau,
                                   block_b=bb, block_m=block_m)
    lse = jnp.log(se) + mx
    loss = jnp.mean(lse - pos)
    residuals = (query, bank, labels, jnp.asarray(tau, jnp.float32),
                 mx, se, pos, el)
    return loss, residuals


def _bwd_for_vjp(block_b, block_m, residuals, g):
    query, bank, labels, tau, mx, se, pos, el = residuals
    b = query.shape[0]
    bb = min(block_b, _round_up(b, 8))
    # per-example chain scale: d(mean CE)/dlogits rowwise factor, incl. 1/tau
    g_rows = jnp.full((b,), g / (b * tau), jnp.float32)
    dq = _run_backward(query, bank, labels, tau, mx, se, g_rows,
                       block_b=bb, block_m=block_m)
    # dtau: loss_i = lse_i - pos_i; dlse/dtau = -E_p[logit]/tau; dpos/dtau = -pos/tau
    e_logit = el / se
    dtau = g * jnp.mean((pos - e_logit) / tau)
    # bank is frozen: zero cotangent matching its pytree (dense or Prepared)
    dbank = jax.tree_util.tree_map(jnp.zeros_like, bank)
    return (dq.astype(query.dtype), dbank, None,
            dtau.astype(jnp.float32))


bank_infonce_pallas.defvjp(_fwd_for_vjp, _bwd_for_vjp)


# --------------------------------------------------------------------------
# int8-quantized bank (per-row absmax scales)
# --------------------------------------------------------------------------
#
# For CIRR-scale banks (60k rows) the bank read is the loss's HBM traffic;
# int8 halves it again vs bf16. Dequantization happens AFTER the block
# matmul — logits = (Q @ i8ᵀ) · s — so the MXU consumes the narrow data and
# the per-row scale applies to the (TB, TM) logits block as a (1, TM)
# broadcast (no reshape, Mosaic-friendly). The bank is a frozen feature
# cache (zero grad), exactly like the unquantized kernel.

class QuantBank(NamedTuple):
    """Per-row absmax-quantized feature bank: values int8, scales f32.

    2-D banks (flat backbones): values (M, D), scales (M,).
    3-D fusion banks (blip2): values (M, Q, D), scales (M, Q) — one scale
    per (target, query-token) feature row."""

    values: jnp.ndarray  # (M, D) or (M, Q, D) int8
    scales: jnp.ndarray  # (M,) or (M, Q) f32 — row absmax / 127

    @property
    def shape(self):
        return self.values.shape

    @property
    def ndim(self):
        return self.values.ndim

    @property
    def dtype(self):
        return self.values.dtype

    def dequantize(self) -> jnp.ndarray:
        return self.values.astype(jnp.float32) * self.scales[..., None]


def quantize_bank(bank) -> QuantBank:
    """Per-feature-row absmax int8 quantization (last axis is the feature
    axis; every leading axis keeps its own scale)."""
    bank = jnp.asarray(bank, jnp.float32)
    absmax = jnp.max(jnp.abs(bank), axis=-1)
    scales = jnp.maximum(absmax, 1e-12) / 127.0
    vals = jnp.clip(jnp.round(bank / scales[..., None]),
                    -127, 127).astype(jnp.int8)
    return QuantBank(vals, scales)


def _q8_fwd_kernel(labels_ref, q_ref, bank_ref, scales_ref, tau_ref,
                   mx_ref, se_ref, pos_ref, el_ref, *, m_actual, block_m):
    m_idx = pl.program_id(1)
    tau = tau_ref[0]
    q = q_ref[:].astype(jnp.float32)
    b = bank_ref[:].astype(jnp.float32)
    s = scales_ref[:]  # (1, TM)
    logits = jax.lax.dot_general(
        q, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * s / tau

    col0 = m_idx * block_m
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col_ids < m_actual
    logits = jnp.where(valid, logits, -jnp.inf)

    blk_max = jnp.max(logits, axis=1, keepdims=True)
    blk_se = jnp.sum(jnp.exp(logits - blk_max), axis=1, keepdims=True)
    lab = labels_ref[:, :1]
    blk_pos = jnp.sum(jnp.where(col_ids == lab,
                                jnp.where(valid, logits, 0.0), 0.0),
                      axis=1, keepdims=True)
    blk_el = jnp.sum(jnp.where(valid, jnp.exp(logits - blk_max) * logits, 0.0),
                     axis=1, keepdims=True)

    @pl.when(m_idx == 0)
    def _init():
        mx_ref[:] = jnp.broadcast_to(blk_max, mx_ref.shape)
        se_ref[:] = jnp.broadcast_to(blk_se, se_ref.shape)
        pos_ref[:] = jnp.broadcast_to(blk_pos, pos_ref.shape)
        el_ref[:] = jnp.broadcast_to(blk_el, el_ref.shape)

    @pl.when(m_idx > 0)
    def _update():
        run_max = mx_ref[:, :1]
        new_max = jnp.maximum(run_max, blk_max)
        old_s = jnp.exp(run_max - new_max)
        blk_s = jnp.exp(blk_max - new_max)
        mx_ref[:] = jnp.broadcast_to(new_max, mx_ref.shape)
        se_ref[:] = jnp.broadcast_to(se_ref[:, :1] * old_s + blk_se * blk_s,
                                     se_ref.shape)
        el_ref[:] = jnp.broadcast_to(el_ref[:, :1] * old_s + blk_el * blk_s,
                                     el_ref.shape)
        pos_ref[:] = jnp.broadcast_to(pos_ref[:, :1] + blk_pos, pos_ref.shape)


def _q8_bwd_kernel(labels_ref, q_ref, bank_ref, scales_ref, tau_ref,
                   mx_ref, se_ref, g_ref, dq_ref, *, m_actual, block_m):
    m_idx = pl.program_id(1)
    tau = tau_ref[0]
    q = q_ref[:].astype(jnp.float32)
    b = bank_ref[:].astype(jnp.float32)
    s = scales_ref[:]  # (1, TM)
    logits = jax.lax.dot_general(
        q, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * s / tau

    col0 = m_idx * block_m
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col_ids < m_actual

    p = jnp.where(valid, jnp.exp(logits - mx_ref[:, :1]) / se_ref[:, :1], 0.0)
    p = p - jnp.where(col_ids == labels_ref[:, :1], 1.0, 0.0)
    # dQ = P̃ @ (i8 · s_row) = (P̃ · s over columns) @ i8
    contrib = jax.lax.dot_general(
        p * g_ref[:, :1] * s, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(m_idx == 0)
    def _init():
        dq_ref[:] = contrib

    @pl.when(m_idx > 0)
    def _update():
        dq_ref[:] = dq_ref[:] + contrib


def _q8_prep(query, qbank, labels, block_b, block_m):
    b_actual, d = query.shape
    bp = _round_up(b_actual, block_b)
    if isinstance(qbank, PreparedBank):
        assert qbank.values.shape[0] % block_m == 0
        m_actual = qbank.m_actual
        vals = qbank.values
        scales = qbank.scales[None]  # (1, Mp)
        mp = vals.shape[0]
    else:
        m_actual = qbank.values.shape[0]
        mp = _round_up(m_actual, block_m)
        vals = jnp.pad(qbank.values, ((0, mp - m_actual), (0, 0)))
        scales = jnp.pad(qbank.scales.astype(jnp.float32),
                         (0, mp - m_actual))[None]  # (1, Mp)
    q = jnp.pad(query, ((0, bp - b_actual), (0, 0)))
    lab = jnp.pad(labels.astype(jnp.int32), (0, bp - b_actual),
                  constant_values=-1)
    lab = jnp.broadcast_to(lab[:, None], (bp, LANES))
    return q, vals, scales, lab, b_actual, m_actual, bp, mp, d


def _q8_run_forward(query, qbank, labels, tau, *, block_b, block_m):
    q, vals, scales, lab, b_actual, m_actual, bp, mp, d = _q8_prep(
        query, qbank, labels, block_b, block_m)
    tau_arr = jnp.asarray(tau, jnp.float32).reshape(1)
    grid = (bp // block_b, mp // block_m)
    kernel = functools.partial(_q8_fwd_kernel, m_actual=m_actual,
                               block_m=block_m)
    stat_shape = jax.ShapeDtypeStruct((bp, LANES), jnp.float32)
    stat_spec = pl.BlockSpec((block_b, LANES), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=[stat_spec] * 4,
    )
    mx, se, pos, el = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=[stat_shape] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(lab, q, vals, scales, tau_arr)
    return (mx[:b_actual, 0], se[:b_actual, 0], pos[:b_actual, 0],
            el[:b_actual, 0])


def _q8_run_backward(query, qbank, labels, tau, mx, se, g, *, block_b, block_m):
    q, vals, scales, lab, b_actual, m_actual, bp, mp, d = _q8_prep(
        query, qbank, labels, block_b, block_m)
    tau_arr = jnp.asarray(tau, jnp.float32).reshape(1)

    def pad_stat(x, fill):
        x = jnp.pad(x, (0, bp - b_actual), constant_values=fill)
        return jnp.broadcast_to(x[:, None], (bp, LANES))

    grid = (bp // block_b, mp // block_m)
    kernel = functools.partial(_q8_bwd_kernel, m_actual=m_actual,
                               block_m=block_m)
    stat_spec = pl.BlockSpec((block_b, LANES), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i, j: (0,), memory_space=pltpu.SMEM),
            stat_spec, stat_spec, stat_spec,
        ],
        out_specs=[pl.BlockSpec((block_b, d), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)],
    )
    (dq,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bp, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(lab, q, vals, scales, tau_arr, pad_stat(mx, 0.0), pad_stat(se, 1.0),
      pad_stat(g, 0.0))
    return dq[:b_actual]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def bank_infonce_q8_pallas(query, qbank, labels, tau,
                           block_b: int = DEFAULT_BLOCK_B,
                           block_m: int = DEFAULT_BLOCK_M):
    """Full-bank InfoNCE over an int8 QuantBank (see module section above)."""
    loss, _ = _q8_fwd_for_vjp(query, qbank, labels, tau, block_b, block_m)
    return loss


def _q8_fwd_for_vjp(query, qbank, labels, tau, block_b, block_m):
    bb = min(block_b, _round_up(query.shape[0], 8))
    mx, se, pos, el = _q8_run_forward(query, qbank, labels, tau,
                                      block_b=bb, block_m=block_m)
    loss = jnp.mean(jnp.log(se) + mx - pos)
    return loss, (query, qbank, labels, jnp.asarray(tau, jnp.float32),
                  mx, se, pos, el)


def _q8_bwd_for_vjp(block_b, block_m, residuals, g):
    query, qbank, labels, tau, mx, se, pos, el = residuals
    b = query.shape[0]
    bb = min(block_b, _round_up(b, 8))
    g_rows = jnp.full((b,), g / (b * tau), jnp.float32)
    dq = _q8_run_backward(query, qbank, labels, tau, mx, se, g_rows,
                          block_b=bb, block_m=block_m)
    dtau = g * jnp.mean((pos - el / se) / tau)
    return (dq.astype(query.dtype),
            jax.tree_util.tree_map(jnp.zeros_like, qbank),
            None, dtau.astype(jnp.float32))


bank_infonce_q8_pallas.defvjp(_q8_fwd_for_vjp, _q8_bwd_for_vjp)


# --------------------------------------------------------------------------
# Dispatch
# --------------------------------------------------------------------------

def bank_infonce(query, bank, labels, tau, impl: str = "auto"):
    """Dispatch between the Pallas kernel (TPU) and the XLA reference impl.
    `bank` may be a dense (M, D) array, an int8 `QuantBank`, or a
    `PreparedBank` (pre-padded kernel layout, dense or int8)."""
    from spn4cir_tpu.ops import infonce as _ref

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if isinstance(bank, PreparedBank):
        if impl == "pallas":
            import math

            # block_m must divide the prepared pad (gcd keeps the default
            # block when the bank was prepared with it — the normal case)
            bm = math.gcd(DEFAULT_BLOCK_M, bank.values.shape[0])
            if bank.scales is not None:
                return bank_infonce_q8_pallas(query, bank, labels, tau,
                                              block_m=bm)
            return bank_infonce_pallas(query, bank, labels, tau, block_m=bm)
        return _ref.bank_infonce(query, bank.dequantize(), labels, tau)
    if isinstance(bank, QuantBank):
        if impl == "pallas":
            return bank_infonce_q8_pallas(query, bank, labels, tau)
        return _ref.bank_infonce(query, bank.dequantize(), labels, tau)
    if impl == "pallas":
        return bank_infonce_pallas(query, bank, labels, tau)
    return _ref.bank_infonce(query, bank, labels, tau)
