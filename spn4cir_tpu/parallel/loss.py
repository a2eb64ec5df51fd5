"""Bank-sharded InfoNCE: the loss whose negatives axis spans the mesh.

The reference's "long axis" is the negative-set cardinality, not sequence
length (SURVEY.md §5): the InfoNCE denominator covers every unique train
image. When the bank outgrows one chip (or to overlap compute), its rows are
sharded over the 'bank' mesh axis; each device computes partial logits
against its shard and the softmax combines with pmax/psum — the same
stable-softmax accumulation as ring attention, expressed as XLA collectives.

Semantics identical to `spn4cir_tpu.ops.infonce.bank_infonce` (tested on the
8-device CPU mesh). Batch rows may simultaneously be sharded over 'data';
the final mean reduces over both axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from spn4cir_tpu.parallel.mesh import AXIS_BANK, AXIS_DATA


def _combine_masked_logits(logits, labels, offset, m_local):
    """Shared stable-softmax combine over the 'bank' axis for a (B_loc,
    M_loc) masked-logits block, then the global-batch mean over 'data'.
    The max shift is purely numerical — treating it as a constant leaves
    the logsumexp gradient (softmax) exact, and pmax has no diff rule."""
    local_max = jnp.max(logits, axis=1)
    gmax = jax.lax.pmax(jax.lax.stop_gradient(local_max), AXIS_BANK)
    sumexp = jnp.sum(jnp.exp(logits - gmax[:, None]), axis=1)
    gsumexp = jax.lax.psum(sumexp, AXIS_BANK)

    local_label = labels - offset
    in_range = (local_label >= 0) & (local_label < m_local)
    safe = jnp.clip(local_label, 0, m_local - 1)
    pos_here = jnp.take_along_axis(logits, safe[:, None], axis=1)[:, 0]
    gpos = jax.lax.psum(jnp.where(in_range, pos_here, 0.0), AXIS_BANK)

    per_row = jnp.log(gsumexp) + gmax - gpos  # (B_loc,)
    # mean over the global batch: sum over data shards / global count
    total = jax.lax.psum(jnp.sum(per_row), AXIS_DATA)
    count = jax.lax.psum(per_row.shape[0] * jnp.ones((), jnp.float32), AXIS_DATA)
    return total / count


def _local_bank_infonce(query, bank_shard, labels, tau, m_actual):
    """Per-shard body run under shard_map: query (B_loc, D) [data-sharded],
    bank_shard (M_loc, D) dense or int8 QuantBank [bank-sharded], labels
    (B_loc,) global image-ids. Rows at global index >= m_actual are padding
    and masked to -inf. Quantized shards dequantize AFTER the matmul (the
    (1, M_loc) scale row broadcasts over the logits block), so each device
    reads only int8 from HBM — scales travel with their rows."""
    from spn4cir_tpu.ops.bank_kernels import QuantBank

    if isinstance(bank_shard, QuantBank):
        m_local = bank_shard.values.shape[0]
        shard = jax.lax.axis_index(AXIS_BANK)
        offset = shard * m_local
        logits = jnp.dot(query.astype(jnp.float32),
                         bank_shard.values.astype(jnp.float32).T,
                         preferred_element_type=jnp.float32
                         ) * bank_shard.scales[None, :] / tau
    else:
        m_local = bank_shard.shape[0]
        shard = jax.lax.axis_index(AXIS_BANK)
        offset = shard * m_local
        logits = jnp.dot(query.astype(jnp.float32),
                         bank_shard.astype(jnp.float32).T,
                         preferred_element_type=jnp.float32) / tau
    col_ids = offset + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col_ids < m_actual, logits, -jnp.inf)
    return _combine_masked_logits(logits, labels, offset, m_local)


def pad_bank_rows(bank, parts: int):
    """Zero-pad bank rows to a multiple of `parts`; the sharded loss masks
    pads by true row count, so the fill value is irrelevant. Accepts dense
    arrays and QuantBank (values and scales pad together)."""
    from spn4cir_tpu.ops.bank_kernels import QuantBank

    if isinstance(bank, QuantBank):
        return QuantBank(pad_bank_rows(bank.values, parts),
                         pad_bank_rows(bank.scales, parts))
    rem = (-bank.shape[0]) % parts
    if rem == 0:
        return bank
    return jnp.pad(bank, ((0, rem),) + ((0, 0),) * (bank.ndim - 1))


def bank_in_spec(bank):
    """shard_map in_spec for a dense or quantized bank argument."""
    from spn4cir_tpu.ops.bank_kernels import QuantBank

    if isinstance(bank, QuantBank):
        return QuantBank(P(AXIS_BANK), P(AXIS_BANK))
    return P(AXIS_BANK)


def sharded_bank_infonce(
    query: jnp.ndarray,
    bank: jnp.ndarray,
    labels: jnp.ndarray,
    tau,
    mesh: Mesh,
    m_actual: int | None = None,
) -> jnp.ndarray:
    """Full-bank InfoNCE with bank rows sharded over 'bank' and batch rows
    over 'data'. Differentiable in `query` (psum/pmax transpose under
    shard_map). `bank` rows must divide the 'bank' axis size — use
    `pad_bank_rows` and pass the true count as `m_actual`. The global batch
    (query dim 0) must divide the 'data' axis size. `bank` may be dense or
    an int8 QuantBank (rows + scales shard together)."""
    m_actual = m_actual if m_actual is not None else bank.shape[0]
    assert bank.shape[0] % mesh.shape[AXIS_BANK] == 0, (
        bank.shape, mesh.shape, "pad with pad_bank_rows first")
    fn = jax.shard_map(
        functools.partial(_local_bank_infonce, tau=tau, m_actual=m_actual),
        mesh=mesh,
        in_specs=(P(AXIS_DATA), bank_in_spec(bank), P(AXIS_DATA)),
        out_specs=P(),
    )
    return fn(query, bank, labels)


def _local_max_query_infonce(feats, bank_shard, labels, tau, m_actual):
    """Bank-sharded blip2 loss body: feats (B_loc, D) [data-sharded],
    bank_shard (M_loc, Q, D) dense or int8 QuantBank [bank-sharded]. Same
    pmax/psum combine as `_local_bank_infonce` with a per-target max over Q
    first; quantized shards scale the (B, M_loc, Q) sims AFTER the
    contraction with their (M_loc, Q) row scales."""
    from spn4cir_tpu.ops.bank_kernels import QuantBank

    if isinstance(bank_shard, QuantBank):
        m_local = bank_shard.values.shape[0]
        shard = jax.lax.axis_index(AXIS_BANK)
        offset = shard * m_local
        sims = jnp.einsum("bd,mqd->bmq", feats.astype(jnp.float32),
                          bank_shard.values.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        logits = jnp.max(sims * bank_shard.scales[None], axis=-1) / tau
        col_ids = offset + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col_ids < m_actual, logits, -jnp.inf)
        return _combine_masked_logits(logits, labels, offset, m_local)
    m_local = bank_shard.shape[0]
    shard = jax.lax.axis_index(AXIS_BANK)
    offset = shard * m_local

    sims = jnp.einsum("bd,mqd->bmq", feats.astype(jnp.float32),
                      bank_shard.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    logits = jnp.max(sims, axis=-1) / tau
    col_ids = offset + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col_ids < m_actual, logits, -jnp.inf)
    return _combine_masked_logits(logits, labels, offset, m_local)


def sharded_max_query_infonce(
    feats: jnp.ndarray,
    bank: jnp.ndarray,
    labels: jnp.ndarray,
    tau,
    mesh: Mesh,
    m_actual: int | None = None,
) -> jnp.ndarray:
    """blip2 max-over-query InfoNCE with the (M, Q, D) target bank sharded
    over 'bank' rows and the batch over 'data' (the (M, 32, 256) bank is the
    largest device-resident tensor in blip2 stage 2 — ~2 GB at CIRR scale).
    `bank` may be dense or an int8 3-D QuantBank."""
    m_actual = m_actual if m_actual is not None else bank.shape[0]
    assert bank.shape[0] % mesh.shape[AXIS_BANK] == 0, (
        bank.shape, mesh.shape, "pad with pad_bank_rows first")
    fn = jax.shard_map(
        functools.partial(_local_max_query_infonce, tau=tau, m_actual=m_actual),
        mesh=mesh,
        in_specs=(P(AXIS_DATA), bank_in_spec(bank), P(AXIS_DATA)),
        out_specs=P(),
    )
    return fn(feats, bank, labels)
