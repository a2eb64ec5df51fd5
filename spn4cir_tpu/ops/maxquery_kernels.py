"""Blocked Pallas max-over-query bank InfoNCE (the BLIP-2 stage-2 loss).

Semantics match `spn4cir_tpu.ops.infonce.max_query_infonce` (reference
behavior: `blip2_qformer_cir_align_prompt.py:226-268`):

    sims   = einsum('bd,mqd->bmq', feats, bank)   # Q = 32 query tokens
    logits = max_q(sims) / tau                    # (B, M)
    loss   = mean CE(logits, labels)

For CIRR-scale banks the XLA path materializes the (B, M, Q) sims tensor
(e.g. 128 x 60k x 32 x 4B = 1 GB); this kernel sweeps (Q, TM, D) bank blocks
through VMEM (query axis leading/untiled so a fori_loop can index it —
Mosaic rejects both the 2D->3D reshape a fused matmul would need and large
unrolled bodies). Per block: a fori_loop of Q MXU matmuls folded with a
running elementwise max, then the same flash-style online-softmax statistics
as `ops/bank_kernels`. The backward pass recomputes per-q sims, routes each
(b, m) weight to its first argmax query, and accumulates dfeats with Q MXU
calls per block.

Gradients: dfeats and dtau exact; the bank is a frozen cache (zero grad,
DCE'd); labels carry none.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _q_sim(q, bank_ref, qq, scales_ref=None):
    """(TB, D) x bank_ref[qq] (TM, D) -> (TB, TM) f32 sims. The bank block is
    laid out (Q, TM, D): the query-token axis leads so dynamic indexing hits
    an untiled dimension. With `scales_ref` (int8 bank), the MXU consumes
    the narrow data and the (TM,) per-row scales apply to the sims block —
    dequantization AFTER the contraction, as in ops/bank_kernels' q8
    kernel."""
    bk = bank_ref[qq].astype(jnp.float32)
    sims = jax.lax.dot_general(
        q, bk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if scales_ref is not None:
        sims = sims * scales_ref[qq][None, :]
    return sims


def _max_logits(q, bank_ref, nq, tau, scales_ref=None):
    """max over Q of per-query sims, divided by tau (max commutes with /tau)."""
    init = _q_sim(q, bank_ref, 0, scales_ref)
    acc = jax.lax.fori_loop(
        1, nq, lambda qq, a: jnp.maximum(a, _q_sim(q, bank_ref, qq,
                                                   scales_ref)), init)
    return acc / tau


def _fwd_kernel(labels_ref, q_ref, bank_ref, *rest, m_actual, block_m, nq,
                quant=False):
    scales_ref = rest[0] if quant else None
    tau_ref, mx_ref, se_ref, pos_ref, el_ref = rest[1:] if quant else rest
    m_idx = pl.program_id(1)
    tau = tau_ref[0]
    q = q_ref[:].astype(jnp.float32)
    logits = _max_logits(q, bank_ref, nq, tau, scales_ref)

    col0 = m_idx * block_m
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col_ids < m_actual
    logits = jnp.where(valid, logits, -jnp.inf)

    blk_max = jnp.max(logits, axis=1, keepdims=True)
    blk_se = jnp.sum(jnp.exp(logits - blk_max), axis=1, keepdims=True)
    lab = labels_ref[:, :1]
    is_pos = col_ids == lab
    blk_pos = jnp.sum(jnp.where(is_pos, jnp.where(valid, logits, 0.0), 0.0),
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


def _bwd_kernel(labels_ref, q_ref, bank_ref, *rest, m_actual, block_m, nq,
                quant=False):
    scales_ref = rest[0] if quant else None
    tau_ref, mx_ref, se_ref, g_ref, dq_ref = rest[1:] if quant else rest
    m_idx = pl.program_id(1)
    tau = tau_ref[0]
    q = q_ref[:].astype(jnp.float32)

    maxsim = jax.lax.fori_loop(
        1, nq, lambda qq, a: jnp.maximum(a, _q_sim(q, bank_ref, qq,
                                                   scales_ref)),
        _q_sim(q, bank_ref, 0, scales_ref))
    logits = maxsim / tau

    col0 = m_idx * block_m
    col_ids = col0 + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col_ids < m_actual

    p = jnp.where(valid, jnp.exp(logits - mx_ref[:, :1]) / se_ref[:, :1], 0.0)
    p = p - jnp.where(col_ids == labels_ref[:, :1], 1.0, 0.0)
    p = p * g_ref[:, :1]  # per-example chain scale incl. 1/tau
    p = jnp.where(valid, p, 0.0)

    # route each (b, m) weight to its FIRST argmax query (ties are
    # measure-zero with float sims; XLA's max vjp splits them instead)
    def body(qq, carry):
        contrib, taken = carry
        sim = _q_sim(q, bank_ref, qq, scales_ref)
        pick = jnp.where((sim >= maxsim) & (taken < 0.5), 1.0, 0.0)
        w = p * pick
        if scales_ref is not None:
            # fold the dequant scales into the (TB, TM) weights — the int8
            # block then feeds the MXU directly
            w = w * scales_ref[qq][None, :]
        contrib = contrib + jax.lax.dot_general(
            w, bank_ref[qq].astype(jnp.float32),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return contrib, jnp.maximum(taken, pick)

    contrib, _ = jax.lax.fori_loop(
        0, nq, body, (jnp.zeros(q.shape, jnp.float32),
                      jnp.zeros_like(maxsim)))

    @pl.when(m_idx == 0)
    def _init():
        dq_ref[:] = contrib

    @pl.when(m_idx > 0)
    def _update():
        dq_ref[:] = dq_ref[:] + contrib


@jax.tree_util.register_pytree_node_class
class PreparedMaxQueryBank:
    """A frozen (M, Q, D) fusion bank pre-transposed/padded ONCE to the
    kernel's (Q, Mp, D) layout — the per-step relayout was ~2.5 ms (5%) of
    the blip2 CIRR-scale step. `scales` non-None marks the int8 layout
    ((Q, Mp) f32 per-feature-row scales riding alongside the int8 values).
    Built by `prepare_max_query_bank`."""

    def __init__(self, qmd, m_actual, scales=None):
        self.qmd = qmd  # (Q, Mp, D)
        self.scales = scales  # (Q, Mp) f32 or None
        self.m_actual = int(m_actual)

    @property
    def shape(self):  # (M, Q, D) view for Bank.num_images / dispatch
        nq, _, d = self.qmd.shape
        return (self.m_actual, nq, d)

    @property
    def ndim(self):
        return 3

    @property
    def dtype(self):
        return self.qmd.dtype

    def dense(self):
        """Back to (M, Q, D) f32 (dequantized) — XLA fallback / tests."""
        vals = self.qmd.transpose(1, 0, 2)[: self.m_actual]
        if self.scales is None:
            return vals
        return (vals.astype(jnp.float32)
                * self.scales.T[: self.m_actual, :, None])

    def tree_flatten(self):
        if self.scales is None:
            return (self.qmd,), (self.m_actual, True)
        return (self.qmd, self.scales), (self.m_actual, False)

    @classmethod
    def tree_unflatten(cls, aux, children):
        m_actual, dense = aux
        return cls(children[0], m_actual,
                   None if dense else children[1])


def prepare_max_query_bank(bank, block_m: int = None):
    """One-time kernel relayout of a frozen (M, Q, D) fusion bank — dense
    array or int8 3-D QuantBank (values and scales transpose/pad together).
    Idempotent; do at bank build/load time, never inside the step."""
    from spn4cir_tpu.ops.bank_kernels import QuantBank

    if isinstance(bank, PreparedMaxQueryBank):
        return bank
    bm = block_m if block_m is not None else DEFAULT_BLOCK_M
    if isinstance(bank, QuantBank):
        m = bank.values.shape[0]
        mp = _round_up(m, bm)
        return PreparedMaxQueryBank(
            jnp.pad(jnp.asarray(bank.values).transpose(1, 0, 2),
                    ((0, 0), (0, mp - m), (0, 0))), m,
            jnp.pad(jnp.asarray(bank.scales, jnp.float32).T,
                    ((0, 0), (0, mp - m))))
    m = bank.shape[0]
    mp = _round_up(m, bm)
    return PreparedMaxQueryBank(
        jnp.pad(jnp.asarray(bank).transpose(1, 0, 2),
                ((0, 0), (0, mp - m), (0, 0))), m)


def _common_prep(feats, bank, labels, block_b, block_m):
    from spn4cir_tpu.ops.bank_kernels import QuantBank

    b_actual, d = feats.shape
    bp = _round_up(b_actual, block_b)
    scales = None
    if isinstance(bank, PreparedMaxQueryBank):
        assert bank.qmd.shape[1] % block_m == 0, (
            bank.qmd.shape, block_m, "prepared with a different block_m")
        bk, m_actual, scales = bank.qmd, bank.m_actual, bank.scales
        nq, mp = bk.shape[0], bk.shape[1]
    elif isinstance(bank, QuantBank):
        m_actual, nq = bank.values.shape[0], bank.values.shape[1]
        mp = _round_up(m_actual, block_m)
        bk = jnp.pad(bank.values.transpose(1, 0, 2),
                     ((0, 0), (0, mp - m_actual), (0, 0)))
        scales = jnp.pad(bank.scales.astype(jnp.float32).T,
                         ((0, 0), (0, mp - m_actual)))
    else:
        m_actual, nq = bank.shape[0], bank.shape[1]
        mp = _round_up(m_actual, block_m)
        # (M, Q, D) -> (Q, Mp, D): query axis leads (untiled, dynamically
        # indexed)
        bk = jnp.pad(bank.transpose(1, 0, 2),
                     ((0, 0), (0, mp - m_actual), (0, 0)))
    q = jnp.pad(feats, ((0, bp - b_actual), (0, 0)))
    lab = jnp.pad(labels.astype(jnp.int32), (0, bp - b_actual),
                  constant_values=-1)
    lab = jnp.broadcast_to(lab[:, None], (bp, LANES))
    return q, bk, scales, lab, b_actual, m_actual, nq, bp, mp, d


def _stat_spec(block_b):
    return pl.BlockSpec((block_b, LANES), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)


def _run_forward(feats, bank, labels, tau, *, block_b, block_m):
    q, bk, scales, lab, b_actual, m_actual, nq, bp, mp, d = _common_prep(
        feats, bank, labels, block_b, block_m)
    tau_arr = jnp.asarray(tau, jnp.float32).reshape(1)
    grid = (bp // block_b, mp // block_m)
    quant = scales is not None
    kernel = functools.partial(_fwd_kernel, m_actual=m_actual,
                               block_m=block_m, nq=nq, quant=quant)
    stat_spec = _stat_spec(block_b)
    in_specs = [
        pl.BlockSpec((block_b, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nq, block_m, d), lambda i, j: (0, j, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [lab, q, bk]
    if quant:
        in_specs.append(pl.BlockSpec((nq, block_m), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(scales)
    in_specs.append(pl.BlockSpec((1,), lambda i, j: (0,),
                                 memory_space=pltpu.SMEM))
    inputs.append(tau_arr)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=grid,
        in_specs=in_specs,
        out_specs=[stat_spec] * 4,
    )
    stat_shape = jax.ShapeDtypeStruct((bp, LANES), jnp.float32)
    mx, se, pos, el = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=[stat_shape] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(*inputs)
    return (mx[:b_actual, 0], se[:b_actual, 0], pos[:b_actual, 0],
            el[:b_actual, 0])


def _run_backward(feats, bank, labels, tau, mx, se, g, *, block_b, block_m):
    q, bk, scales, lab, b_actual, m_actual, nq, bp, mp, d = _common_prep(
        feats, bank, labels, block_b, block_m)
    tau_arr = jnp.asarray(tau, jnp.float32).reshape(1)

    def pad_stat(x, fill):
        x = jnp.pad(x, (0, bp - b_actual), constant_values=fill)
        return jnp.broadcast_to(x[:, None], (bp, LANES))

    grid = (bp // block_b, mp // block_m)
    quant = scales is not None
    kernel = functools.partial(_bwd_kernel, m_actual=m_actual,
                               block_m=block_m, nq=nq, quant=quant)
    stat_spec = _stat_spec(block_b)
    in_specs = [
        pl.BlockSpec((block_b, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((nq, block_m, d), lambda i, j: (0, j, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [lab, q, bk]
    if quant:
        in_specs.append(pl.BlockSpec((nq, block_m), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        inputs.append(scales)
    in_specs += [pl.BlockSpec((1,), lambda i, j: (0,),
                              memory_space=pltpu.SMEM),
                 stat_spec, stat_spec, stat_spec]
    inputs += [tau_arr, pad_stat(mx, 0.0), pad_stat(se, 1.0),
               pad_stat(g, 0.0)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=grid,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((block_b, d), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)],
    )
    (dq,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((bp, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(*inputs)
    return dq[:b_actual]


DEFAULT_BLOCK_B = 128
DEFAULT_BLOCK_M = 128  # bank block = (block_m, Q, D) floats in VMEM


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def max_query_infonce_pallas(feats, bank, labels, tau,
                             block_b: int = DEFAULT_BLOCK_B,
                             block_m: int = DEFAULT_BLOCK_M):
    loss, _ = _fwd_vjp(feats, bank, labels, tau, block_b, block_m)
    return loss


def _fwd_vjp(feats, bank, labels, tau, block_b, block_m):
    bb = min(block_b, _round_up(feats.shape[0], 8))
    mx, se, pos, el = _run_forward(feats, bank, labels, tau,
                                   block_b=bb, block_m=block_m)
    loss = jnp.mean(jnp.log(se) + mx - pos)
    return loss, (feats, bank, labels, jnp.asarray(tau, jnp.float32),
                  mx, se, pos, el)


def _bwd_vjp(block_b, block_m, residuals, g):
    feats, bank, labels, tau, mx, se, pos, el = residuals
    b = feats.shape[0]
    bb = min(block_b, _round_up(b, 8))
    g_rows = jnp.full((b,), g / (b * tau), jnp.float32)
    dq = _run_backward(feats, bank, labels, tau, mx, se, g_rows,
                       block_b=bb, block_m=block_m)
    dtau = g * jnp.mean((pos - el / se) / tau)
    # frozen bank: zero cotangent matching its pytree (dense or Prepared)
    dbank = jax.tree_util.tree_map(jnp.zeros_like, bank)
    return (dq.astype(feats.dtype), dbank, None,
            dtau.astype(jnp.float32))


max_query_infonce_pallas.defvjp(_fwd_vjp, _bwd_vjp)


def max_query_infonce(feats, bank, labels, tau, impl: str = "auto"):
    """Dispatch between the Pallas kernel (TPU) and the XLA reference.
    `bank` may be a dense (M, Q, D) array or an int8 3-D `QuantBank` —
    dequantization happens AFTER the contraction ((B, M, Q) sims scaled by
    the (M, Q) row scales), so the (M, Q, D) f32 bank is never
    materialized and the HBM read stays int8."""
    from spn4cir_tpu.ops import infonce as _ref
    from spn4cir_tpu.ops.bank_kernels import QuantBank

    if isinstance(bank, PreparedMaxQueryBank):
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            import math

            # block_m must divide the prepared pad (gcd keeps the default
            # block when the bank was prepared with it — the normal case)
            bm = math.gcd(DEFAULT_BLOCK_M, bank.qmd.shape[1])
            return max_query_infonce_pallas(feats, bank, labels, tau,
                                            block_m=bm)
        return _ref.max_query_infonce(feats, bank.dense(), labels, tau)
    if isinstance(bank, QuantBank):
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl == "pallas":
            return max_query_infonce_pallas(feats, bank, labels, tau)
        # XLA: dequant AFTER the contraction — the (M, Q, D) f32 bank is
        # never materialized and the HBM read stays int8
        sims = jnp.einsum("bd,mqd->bmq", feats.astype(jnp.float32),
                          bank.values.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        logits = jnp.max(sims * bank.scales[None], axis=-1) / tau
        return _ref.cross_entropy(logits, labels)
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return max_query_infonce_pallas(feats, bank, labels, tau)
    return _ref.max_query_infonce(feats, bank, labels, tau)
