"""Fused Pallas multi-head self-attention for the ViT encoder towers.

The XLA path in `models/layers.py:MultiHeadAttention` materializes the
(B, H, S, S) logits + softmax-weights tensors in HBM; at BLIP@384's 577
tokens that is ~1 GB per 64-image batch (f32 logits), and the softmax
read-modify-write traffic — not the MXU matmuls — bounds the tower's MFU
(BENCHMARKS.md: BLIP@384 was the only tower under the 30% target).

This kernel computes one (batch, head) attention entirely in VMEM:

    grid = (B*H,);  per step: S×S logits -> masked softmax -> P @ V

so the score matrix never touches HBM. Both our sequence lengths (577 for
BLIP@384, 257 for EVA-g@224) fit the full S×S block in VMEM (f32 640×640 =
1.6 MB; the VMEM bound is S ≲ 1.4k — beyond that a flash-style online-
softmax sweep like `ops/bank_kernels.py` would be needed, which no tower
here requires).

The backward pass is a second single-sweep kernel that recomputes P from
(q, k) in VMEM (cheaper than saving it) and emits dq/dk/dv via four MXU
matmuls — the standard softmax-attention VJP:

    dV = Pᵀ dO;  dP = dO Vᵀ;  dS = P ⊙ (dP - rowsum(dP ⊙ P));
    dQ = dS K;   dK = dSᵀ Q

Numerics match the XLA path: logits and softmax accumulate in f32, the
P @ V / dQ / dK / dV matmuls run in the input dtype (bf16 on TPU) with f32
MXU accumulation. Scale (head_dim**-0.5) is folded into q by the caller,
exactly where the XLA path applies it.

Reference behavior being accelerated: the per-tower attention of
`clip4cir/clip/model.py:171-203`, `blip4cir/vit.py` and LAVIS' EVA ViT —
all plain softmax self-attention without masks or dropout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# auto-dispatch engages the kernel only when the (padded) score matrix is
# big enough for the saved HBM traffic to beat the pad/copy overhead.
# Hardware-measured (v5e): S=197 (ViT-B/16) is break-even on the op and a
# net loss at tower level (head split/merge transposes stop fusing);
# S=257 (EVA-g) is +9% and S=577 (BLIP@384) +14% end-to-end.
MIN_FUSED_SEQ = 256
# f32 S×S block must stay VMEM-resident (~16 MB/core): S=1408 → 7.9 MB for
# the scores alone plus padded q/k/v/o; measured safe bound for this kernel.
MAX_FUSED_SEQ = 1408


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, s_actual: int):
    q = q_ref[0]
    k = k_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col_ids < s_actual, logits, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(q.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _run_forward(q, k, v, *, s_actual: int):
    bh, sp, dp = q.shape
    spec = pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, s_actual=s_actual),
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, sp, dp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(q, k, v)


# ---------------------------------------------------------------------------
# Backward: recompute P in VMEM, emit dq/dk/dv
# ---------------------------------------------------------------------------

def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, s_actual: int):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col_ids < s_actual, logits, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)          # (Sq, Sk) f32

    pb = p.astype(q.dtype)
    dv_ref[0] = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (Sq, Sk) f32
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
    dsb = ds.astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _run_backward(q, k, v, do, *, s_actual: int):
    bh, sp, dp = q.shape
    spec = pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((bh, sp, dp), q.dtype)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, s_actual=s_actual),
        grid=(bh,),
        in_specs=[spec] * 4,
        out_specs=[spec] * 3,
        out_shape=[shape] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(q, k, v, do)


# ---------------------------------------------------------------------------
# Public op with custom VJP — q is pre-scaled by the caller
# ---------------------------------------------------------------------------

def _pad_qkv(t, sp, dp):
    bh, s, d = t.shape
    return jnp.pad(t, ((0, 0), (0, sp - s), (0, dp - d)))


@jax.custom_vjp
def fused_attention_pallas(q, k, v):
    """softmax(q @ kᵀ) @ v per leading (batch·head) slice.

    q, k, v: (BH, S, D); q already scaled by head_dim**-0.5. Sequence and
    head dims are zero-padded to lane multiples inside; padded key columns
    are masked to -inf so results are exact."""
    out, _ = _fwd_vjp(q, k, v)
    return out


def _fwd_vjp(q, k, v):
    bh, s, d = q.shape
    sp = _round_up(s, LANES)
    dp = _round_up(d, LANES)
    out = _run_forward(_pad_qkv(q, sp, dp), _pad_qkv(k, sp, dp),
                       _pad_qkv(v, sp, dp), s_actual=s)
    return out[:, :s, :d], (q, k, v)


def _bwd_vjp(residuals, g):
    q, k, v = residuals
    bh, s, d = q.shape
    sp = _round_up(s, LANES)
    dp = _round_up(d, LANES)
    dq, dk, dv = _run_backward(
        _pad_qkv(q, sp, dp), _pad_qkv(k, sp, dp), _pad_qkv(v, sp, dp),
        _pad_qkv(g.astype(q.dtype), sp, dp), s_actual=s)
    return dq[:, :s, :d], dk[:, :s, :d], dv[:, :s, :d]


fused_attention_pallas.defvjp(_fwd_vjp, _bwd_vjp)


# ---------------------------------------------------------------------------
# Packed small-S attention: dense block-diagonal scores
# ---------------------------------------------------------------------------
#
# For short sequences (ViT-B/32 has S=50, the CLIP text towers S=77) the
# per-(batch·head) formulation is MXU-hostile: each score/PV matmul is a
# ~64×64×64 dot. A per-slice Pallas grid (the MIN_FUSED_SEQ kernel's shape)
# issues them serially and the systolic array's fill/drain latency dominates
# — hardware-measured ~43 ms for one ViT-B/32 layer's attention core at
# B=2048, ~20× its FLOPs. XLA's batched einsum does far better (~7.7 ms
# standalone at the same geometry) but in-model still pays (B,H,S,S) layout
# transposes and fusion breaks around the softmax.
#
# This kernel instead packs G heads' sequences along BOTH score axes and
# computes ONE dense (G·Sp)×(G·Sp) GEMM per grid step. Cross-head products
# are computed but masked to -inf before softmax (they cost FLOPs, not
# correctness), so P is exactly block-diagonal and the dense P @ V contract
# is exact — zero rows contribute nothing. The G× FLOP overhead is repaid
# by large-matmul MXU efficiency and by eliminating the layout traffic.
#
# Hardware (v5e, interleaved same-process A/B of the FULL ViT-B/32 gallery
# encode at B=8192): 7,345 -> 7,645 img/s/chip (+4.1% end-to-end).

PACK_ROWS = 512  # target dense dot size: G ≈ PACK_ROWS // Sp


def _pack_geometry(s: int, bh: int):
    """Choose (sp, g): pack g heads of sp padded tokens into R = g·sp rows.

    R must be a 16-multiple (bf16 sublane tiling). Cost model per REAL
    token: the dense score/PV dots and the softmax cost R²/(g·s), and
    sp > s additionally pays XLA pad/slice copies around the kernel —
    hardware-measured at ~15% of the op, folded in as a multiplier. For
    S=50 (ViT-B/32) this picks sp=50, g=8 → R=400: no padding at all and
    39% less softmax waste than the naive sp=64, g=8 → R=512."""
    if s > PACK_ROWS:
        raise ValueError(
            f"packed attention is for short sequences (S <= {PACK_ROWS}); "
            f"got S={s} — use fused_attention_pallas / the einsum path")
    best = None
    for sp in range(s, _round_up(s, 16) + 1):
        g = PACK_ROWS // sp
        while g > 1 and (g * sp) % 16:
            g -= 1
        if (g * sp) % 16:
            continue
        r = g * sp
        cost = (r * r / (g * s)) * (1.0 if sp == s else 1.15)
        if best is None or cost < best[0]:
            best = (cost, sp, g)
    if best is None:                           # s alone, padded (g = 1)
        sp, g = _round_up(s, 16), 1
    else:
        _, sp, g = best
    return sp, g, _round_up(bh, g)


def _packed_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, s_actual: int,
                       sp: int, causal: bool):
    q = q_ref[...]                             # (R, hd)  R = G*sp
    k = k_ref[...]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    ok = row // sp == col // sp
    if causal:                                 # within-block lower triangle
        ok &= col % sp <= row % sp
    if sp != s_actual:                         # padded tokens exist
        ok &= col % sp < s_actual
    logits = jnp.where(ok, logits, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    o_ref[...] = jax.lax.dot_general(
        p.astype(q.dtype), v_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _packed_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                       *, s_actual: int, sp: int, causal: bool):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    ok = row // sp == col // sp
    if causal:                                 # within-block lower triangle
        ok &= col % sp <= row % sp
    if sp != s_actual:                         # padded tokens exist
        ok &= col % sp < s_actual
    logits = jnp.where(ok, logits, -jnp.inf)
    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)  # block-diagonal (R, R) f32

    pb = p.astype(q.dtype)
    dv_ref[...] = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
    dsb = ds.astype(q.dtype)                   # zero off-block: dense is exact
    dq_ref[...] = jax.lax.dot_general(
        dsb, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[...] = jax.lax.dot_general(
        dsb, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _pack(t, sp, bhp):
    bh, s, d = t.shape
    if sp != s or bhp != bh:
        t = jnp.pad(t, ((0, bhp - bh), (0, sp - s), (0, 0)))
    return t.reshape(bhp * sp, d)  # sp == s, bhp == bh: a free reshape


def _packed_call(q, k, v, do=None, causal=False):
    bh, s, d = q.shape
    sp, g, bhp = _pack_geometry(s, bh)
    r = g * sp
    qp, kp, vp = (_pack(t, sp, bhp) for t in (q, k, v))
    spec = pl.BlockSpec((r, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    grid = (bhp // g,)
    params = pltpu.CompilerParams(dimension_semantics=("parallel",))
    if do is None:
        out = pl.pallas_call(
            functools.partial(_packed_fwd_kernel, s_actual=s, sp=sp,
                              causal=causal),
            grid=grid, in_specs=[spec] * 3, out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((bhp * sp, d), q.dtype),
            compiler_params=params, interpret=_interpret(),
        )(qp, kp, vp)
        return out.reshape(bhp, sp, d)[:bh, :s]
    dop = _pack(do.astype(q.dtype), sp, bhp)
    shape = jax.ShapeDtypeStruct((bhp * sp, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_kernel, s_actual=s, sp=sp,
                          causal=causal),
        grid=grid, in_specs=[spec] * 4, out_specs=[spec] * 3,
        out_shape=[shape] * 3,
        compiler_params=params, interpret=_interpret(),
    )(qp, kp, vp, dop)
    return tuple(t.reshape(bhp, sp, d)[:bh, :s] for t in (dq, dk, dv))


@jax.custom_vjp
def packed_attention_pallas(q, k, v):
    """softmax(q @ kᵀ) @ v per (batch·head) slice, for SHORT sequences.

    q, k, v: (BH, S, D) with q pre-scaled, S ≤ PACK_ROWS, D ≤ 128. G heads
    are packed into one dense (G·Sp)² score GEMM with a block-diagonal
    softmax mask — exact, at large-matmul MXU efficiency (+4.1% on the
    full ViT-B/32 encode vs the einsum path, hardware-measured)."""
    out, _ = _packed_fwd_vjp(q, k, v)
    return out


def _packed_fwd_vjp(q, k, v):
    return _packed_call(q, k, v), (q, k, v)


def _packed_bwd_vjp(residuals, g):
    q, k, v = residuals
    return _packed_call(q, k, v, do=g)


packed_attention_pallas.defvjp(_packed_fwd_vjp, _packed_bwd_vjp)


@jax.custom_vjp
def packed_causal_attention_pallas(q, k, v):
    """`packed_attention_pallas` with a causal (lower-triangular) mask per
    sequence — the CLIP text towers' S=77 attention (ref clip/model.py:
    293-298). The causal constraint folds into the same block-diagonal
    -inf mask; FLOPs and layout are unchanged."""
    out, _ = _packed_causal_fwd_vjp(q, k, v)
    return out


def _packed_causal_fwd_vjp(q, k, v):
    return _packed_call(q, k, v, causal=True), (q, k, v)


def _packed_causal_bwd_vjp(residuals, g):
    q, k, v = residuals
    return _packed_call(q, k, v, do=g, causal=True)


packed_causal_attention_pallas.defvjp(_packed_causal_fwd_vjp,
                                      _packed_causal_bwd_vjp)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

# packed path upper bound: S small enough that G ≥ 2 heads pack into one
# dense dot (beyond ~128 tokens the per-head dots are big enough for the
# MIN_FUSED_SEQ kernel / einsum path instead)
MAX_PACKED_SEQ = 128
MAX_PACKED_DIM = 128


def should_pack(seq_len: int, head_dim: int, impl: str = "auto",
                causal: bool = False) -> bool:
    """Packed-kernel dispatch: short sequences whose per-head score dots
    are too small for the MXU on their own (hardware: +4.1% on the full
    ViT-B/32 encode vs the XLA einsum path). Engages for maskless short
    self-attention (ViT-B/32 S=50) ONLY — the causal variant measured a
    LOSS on both CLIP text towers in the v5e A/B (BENCHMARKS.md round 4:
    ViT-L/14 text 5242->5163 captions/s, RN50x4 text 6670->6292; the
    in-kernel triangular mask wastes half of each packed block's MACs and
    the blocks were already MXU-shaped at S=77), so causal stays on the
    XLA einsum path under 'auto' and engages only under the explicit
    impl='packed' override. MED/BERT text carries per-example padding
    masks and was always einsum-path."""
    if seq_len > MAX_PACKED_SEQ or head_dim > MAX_PACKED_DIM:
        return False
    if impl == "packed":
        return True
    return (impl == "auto" and not causal
            and jax.default_backend() == "tpu")


def should_fuse(seq_len: int, impl: str = "auto") -> bool:
    """Dispatch policy shared with models/layers.py: the kernel wins only on
    TPU and only when the score matrix is large enough that the saved HBM
    softmax traffic beats the lane-padding overhead."""
    if seq_len > MAX_FUSED_SEQ:
        # Beyond this the S×S block (plus q/k/v) no longer fits VMEM and
        # Mosaic fails allocation; route to the XLA einsum path even under
        # impl='pallas' rather than crash.
        return False
    if impl == "pallas":
        return True
    if impl != "auto":
        return False
    return jax.default_backend() == "tpu" and seq_len >= MIN_FUSED_SEQ


def fused_attention(q, k, v, impl: str = "auto"):
    """(BH, S, D) self-attention with caller-prescaled q.

    impl='auto' picks per geometry on TPU: the packed block-diagonal kernel
    for short sequences (≤ MAX_PACKED_SEQ), the single-slice VMEM kernel for
    long ones (≥ MIN_FUSED_SEQ), the plain XLA einsum path otherwise."""
    if should_pack(q.shape[1], q.shape[2], impl):
        return packed_attention_pallas(q, k, v)
    if should_fuse(q.shape[1], impl):
        return fused_attention_pallas(q, k, v)
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jax.lax.dot_general(
        weights, v, (((2,), (1,)), ((0,), (0,))))
