"""Multi-chip stage-2 training step: data-parallel text encoding + bank-
sharded InfoNCE over a (data, bank) mesh.

This is the scale-out form of `spn4cir_tpu.train.stage2.stage2_train_step`
(single-chip). Params/optimizer state are replicated; batch arrays are
sharded over 'data'; the target bank over 'bank'. XLA inserts the all-reduce
for gradients (adamw on replicated params) and the loss combines shards with
pmax/psum (see `spn4cir_tpu.parallel.loss`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from spn4cir_tpu.models.api import CIRBackbone
from spn4cir_tpu.parallel.loss import (sharded_bank_infonce,
                                       sharded_max_query_infonce)
from spn4cir_tpu.parallel.mesh import (
    bank_sharding,
    batch_sharding,
    replicated,
)
from spn4cir_tpu.train.stage2 import TrainState


def tp_state_shardings(state, mesh: Mesh):
    """TP NamedShardings for a full TrainState: param-like leaves (params
    AND their adamw mu/nu mirrors — their path tails carry the same layer
    names) get Megatron specs from parallel/tp.py; everything else
    replicates."""
    from spn4cir_tpu.parallel.tp import tp_param_shardings

    return tp_param_shardings(state, mesh)


def _state_shardings(mesh: Mesh, state_template, rep):
    """Replicated state, or TP NamedShardings when the mesh has a >1
    'model' axis (shared by the stage-1 and stage-2 step builders)."""
    if "model" in mesh.axis_names and mesh.shape["model"] > 1:
        assert state_template is not None, (
            "a 'model' mesh axis needs state_template to derive TP "
            "shardings")
        return tp_state_shardings(state_template, mesh)
    return rep


def make_sharded_stage2_step(backbone: CIRBackbone, mesh: Mesh, tau=None,
                             m_actual: int | None = None,
                             state_template=None,
                             with_dropout: bool = False):
    """Build a jitted (state, target_bank, batch) -> (state, loss) step.

    Flat backbones (clip/tgcir/blip: (B, D) query vs (M, D) bank) pair the
    fusion path with `sharded_bank_infonce`; blip2 (which exposes
    `stage2_query_feats` and a 3-D (M, Q, D) bank) pairs its training
    fusion path with `sharded_max_query_infonce`. `target_bank` rows must
    be padded to the bank-axis size (`pad_bank_rows`); `m_actual` is the
    true row count; the bank may be an int8 `QuantBank`.

    On a mesh with a 'model' axis (make_mesh(model=N)) the live tower's
    params + optimizer mirrors are tensor-sharded Megatron-style
    (`state_template` must then be the TrainState so the shardings can be
    derived) — data×bank×model in ONE step: GSPMD inserts the TP
    all-reduces inside the fusion forward/backward, the shard_map loss
    combines bank shards with pmax/psum, and the grad all-reduce over
    'data' comes from the replicated-param sum. Place the state with
    `tp_state_shardings` first.

    `with_dropout` (MED-family backbones whose fusion path takes a
    dropout_rng): batch carries a replicated 'dropout_rng' key and the
    live tower runs train-mode dropout. JAX's counter-based PRNG makes
    the mask a pure function of logical position, so the sharded loss
    matches the single-chip value for the same key."""

    def live_tau(params):
        # a learnable temperature (blip4cir's params['params']['tau'],
        # quirk SURVEY.md §8.10) must stay live — reading the static
        # backbone.tau would freeze it and drop its gradient
        if tau is not None:
            return tau
        inner = params.get("params") if isinstance(params, dict) else None
        if isinstance(inner, dict) and "tau" in inner:
            return inner["tau"]
        return backbone.tau

    max_query = (hasattr(backbone, "stage2_query_feats")
                 and len(backbone.bank_spec().target_shape) == 2)

    def step(state: TrainState, target_bank: jnp.ndarray,
             batch: Dict[str, jnp.ndarray]):
        def loss_fn(params):
            m = m_actual if m_actual is not None else target_bank.shape[0]
            kw = ({"dropout_rng": batch["dropout_rng"]} if with_dropout
                  else {})
            if max_query:
                feats = backbone.stage2_query_feats(
                    params, batch["refer_feats"], batch["text_ids"], **kw)
                return sharded_max_query_infonce(
                    feats, target_bank, batch["labels"], live_tau(params),
                    mesh, m_actual=m)
            query = backbone.fuse(params, batch["refer_feats"],
                                  batch["text_ids"], **kw)
            return sharded_bank_infonce(
                query, target_bank, batch["labels"], live_tau(params), mesh,
                m_actual=m)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    ksh = bank_sharding(mesh)
    ssh = _state_shardings(mesh, state_template, rep)
    # ksh works for QuantBank too: a single sharding acts as a pytree
    # prefix, placing values (M, D|Q,D) and scales (M[,Q]) with dim-0 rows
    # on 'bank' — scales travel with their rows.
    batch_sh = {"refer_feats": bsh, "text_ids": bsh, "labels": bsh}
    if with_dropout:
        batch_sh["dropout_rng"] = rep
    return jax.jit(
        step,
        in_shardings=(ssh, ksh, batch_sh),
        out_shardings=(ssh, rep),
    )


def make_sharded_stage1_step(backbone: CIRBackbone, mesh: Mesh,
                             state_template=None,
                             with_dropout: bool = False,
                             neg_type: int = 0,
                             raw_kind=None):
    """Build a jitted (state, batch) -> (state, loss) stage-1 step over a
    (data[, model]) mesh — the scale-out form of
    `spn4cir_tpu.train.stage1.stage1_train_step`.

    Stage 1 (`--wo_bank`, ref clip4cir/models.py:146-161) trains BOTH image
    towers live, so it is tower-compute-bound — exactly the regime where
    data parallelism pays. Batch arrays (both image stacks + text ids)
    shard over 'data'; the in-batch InfoNCE couples every query with every
    target in the GLOBAL batch (the B x B logits matmul), and GSPMD inserts
    the all-gather for the target rows plus the gradient all-reduce over
    'data' — the same math LAVIS hand-writes as `all_gather_with_grad`
    (blip24cir/lavis/models/base_model.py:220-236). There is no bank axis:
    stage-1 negatives are the batch itself.

    A 'model' mesh axis composes Megatron TP on the towers exactly as in
    `make_sharded_stage2_step` (pass `state_template`). `neg_type` routes
    to the negtype-ablation loss (ref train_negtype.py). `with_dropout`:
    batch carries a replicated 'dropout_rng' (MED-family stage-1 parity)."""

    from spn4cir_tpu.train.stage1 import stage1_loss_fn

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        # the exact single-chip loss wiring (train.stage1.stage1_loss_fn) —
        # one definition, so the mesh and single-chip paths cannot drift.
        # raw_kind: --device_preprocess RawBatch canvases shard over 'data'
        # like any batch-major leaf; the on-chip resize happens per shard.
        loss_fn = stage1_loss_fn(
            backbone, batch, neg_type,
            batch["dropout_rng"] if with_dropout else None,
            raw_kind)
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    ssh = _state_shardings(mesh, state_template, rep)
    batch_sh = {"refer_images": bsh, "target_images": bsh, "text_ids": bsh}
    if with_dropout:
        batch_sh["dropout_rng"] = rep
    jitted = jax.jit(
        step,
        in_shardings=(ssh, batch_sh),
        out_shardings=(ssh, rep),
    )

    # carry the build config so train_epoch_stage1 can refuse a
    # mismatched epoch configuration instead of silently training the
    # wrong objective (jit callables reject attributes; use a wrapper)
    def wrapped(state, batch):
        return jitted(state, batch)

    wrapped.neg_type = neg_type
    wrapped.with_dropout = with_dropout
    wrapped.raw_kind = raw_kind
    wrapped.jitted = jitted
    return wrapped


def make_sharded_gallery_encode(backbone: CIRBackbone, mesh: Mesh, params):
    """Data-parallel gallery encoding: images sharded over 'data', features
    gathered (mirrors `extract_index_features`, SURVEY.md §7 decision 5)."""
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)

    def encode(images):
        return backbone.gallery_features(params, images)

    return jax.jit(encode, in_shardings=(bsh,), out_shardings=rep)
