"""Fused int8 weight-streaming matmul for the datagen LMs (models/llama.py).

    y = (x @ values) * scales        # values (D, F) int8, scales (F,) f32

Why this kernel was built: the hypothesis that XLA materializes a
full-precision HBM copy for the `_mm` fallback's `values.astype(x.dtype)`
on every call — turning each int8 read into read-int8 + write-bf16 +
read-bf16 at 7B decode. HARDWARE VERDICT (v5e A/Bs, BENCHMARKS.md round 4):
the hypothesis is wrong on both phases. Kernel-on prefill regressed 7B
generate 3.0→3.5 ms/position (round 3), and kernel-on DECODE regressed
llava captions 7.55→6.78/s (B=8) and rewriter prompts 2.78→2.15/s (B=1) —
XLA fuses the dequant into its MXU schedule and its pipelining beats this
kernel's. The kernel therefore defaults OFF everywhere
(models/llama.py:llama_generate) and remains available via --quant_kernel
for re-evaluation on other geometries/toolchain versions. It streams the
int8 blocks HBM→VMEM and converts in-registers: HBM weight traffic is the
int8 read alone.

Geometry: grid over F blocks only; x rides whole in VMEM (decode x is
(B≤16, D) — a few hundred KB; prefill flattens (B, P, D) to (B·P, D)).
Each output column depends only on its own weight column, so ragged F
needs no masking — Pallas clips the edge block's stores. No VJP: the LMs
are inference-only (captioner/rewriter); training never sees QuantKernel.

Reference counterpart being outperformed: the HF torch pipeline runs the
LM in fp16 with no quantization at all (zscir/llama_generate.py:34-41).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
DEFAULT_BLOCK_F = 512
DEFAULT_BLOCK_B = 128  # prefill flattens (B, P, D): block the row axis too


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)  # int8 -> compute dtype, in VMEM/registers
    acc = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def quant_matmul(x: jnp.ndarray, values: jnp.ndarray, scales: jnp.ndarray,
                 block_f: int = DEFAULT_BLOCK_F,
                 block_b: int = DEFAULT_BLOCK_B) -> jnp.ndarray:
    """(..., D) @ int8 (D, F) with per-column f32 scales -> (..., F) in
    x.dtype. Matches `(x @ values.astype(x.dtype)) * scales.astype(x.dtype)`
    (models/llama.py:_mm) with f32 accumulation.

    Grid: (row blocks, F blocks); D rides whole per block (7B worst case
    f32 x (128, 11008) + int8 w (11008, 512) ≈ 11 MB VMEM). Decode's
    (B≤16, D) x is a single row block; prefill's flattened (B·P, D) tiles."""
    d, f = values.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, d)
    b = x2.shape[0]
    bb = min(block_b, _round_up(b, SUBLANES))
    bf = min(block_f, _round_up(f, LANES))
    # VMEM guard: Mosaic double-buffers every block, so the stack is about
    # 2*(x + w + scales + out) bytes per grid step; 7B prefill geometry
    # ((128, 11008) bf16 x + (11008, 512) int8 w = 16.4 MB) exceeds the
    # 16 MB scoped limit. Shrink bf, then bb, until it fits with headroom.
    # (the estimate skips the bb*bf*4 f32 accumulator / output-cast
    # temporaries and counts the output block at x.dtype — the 13 MB budget
    # vs the 16 MB scoped limit leaves the slack that covers them)
    xb = x2.dtype.itemsize
    budget = 13 * 2 ** 20
    while 2 * (bb * d * xb + d * bf + 4 * bf + bb * bf * xb) > budget:
        if bf > LANES:
            bf = _round_up(bf // 2, LANES)
        elif bb > SUBLANES:
            bb = _round_up(bb // 2, SUBLANES)
        else:
            break  # minimal blocks; let Mosaic report if it still can't fit
    bp = _round_up(b, bb)
    if bp != b:
        x2 = jnp.pad(x2, ((0, bp - b), (0, 0)))
    # F outermost: each int8 weight block streams HBM->VMEM exactly ONCE
    # (row blocks revisit it in the inner loop); x re-reads per F block are
    # negligible next to the weights (decode x is one row block anyway)
    grid = (_cdiv(f, bf), bp // bb)

    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bf), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bf), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bb, bf), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, f), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(x2, values, scales.reshape(1, f))
    return out[:b].reshape(*lead, f)
