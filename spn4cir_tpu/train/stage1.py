"""Stage-1 trainer: end-to-end in-batch InfoNCE (the `--wo_bank` path and the
zscir stage-1 recipe).

Parity target: `clip4cir/models.py:146-161` (forward with image encoders
under torch.utils.checkpoint) + `zscir/train.py` / `zscir/models.py:145-169`.
On TPU: one jitted step with bf16 activations and optional nn.remat instead
of AMP GradScaler + checkpoint (SURVEY.md §2.9)."""

from __future__ import annotations

import functools
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import optax

from spn4cir_tpu.models.api import CIRBackbone
from spn4cir_tpu.train.stage2 import (TrainState, masked_with_frozen_zero,
                                      trainable_mask)


def create_stage1_state(backbone: CIRBackbone, params, learning_rate: float,
                        *, weight_decay: float = 1e-2, b1: float = 0.9,
                        b2: float = 0.999, eps: float = 1e-7) -> TrainState:
    """All WEIGHTS train in stage 1 (no freeze mask), but like torch AdamW
    (which skips grad-None params) the optimizer must not touch BatchNorm
    batch_stats or CLIP's loss-unused logit_scale — decaying either
    corrupts the checkpoint. BN runs with its stored running stats (the
    reference's train-mode momentum refresh of those statistics is
    deliberately not replicated; the affine scale/bias do train)."""
    tx = masked_with_frozen_zero(
        optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                    weight_decay=weight_decay),
        trainable_mask(params, lambda path: True))
    return TrainState.create(apply_fn=None, params=params, tx=tx)


def stage1_loss_fn(backbone: CIRBackbone, batch, neg_type: int = 0,
                   dropout_rng=None, raw_kind=None):
    """The ONE stage-1 loss wiring, shared by the single-chip step below and
    the mesh step (parallel.train.make_sharded_stage1_step) so the two paths
    cannot drift. neg_type > 0 selects the negtype-ablation loss (ref
    train_negtype.py); `dropout_rng` enables MED-family train-mode dropout.

    `raw_kind` (--device_preprocess): image entries arrive as RawBatch
    uint8 canvases and resize/crop/normalize run on-chip inside the same
    step. The preprocess does not depend on params, so XLA generates no
    backward pass through it despite sitting inside value_and_grad."""
    if raw_kind is not None:
        from spn4cir_tpu.ops.preprocess import preprocess_batch_dynamic

        batch = dict(
            batch,
            refer_images=preprocess_batch_dynamic(
                batch["refer_images"].canvas, batch["refer_images"].extents,
                backbone.input_dim, raw_kind),
            target_images=preprocess_batch_dynamic(
                batch["target_images"].canvas, batch["target_images"].extents,
                backbone.input_dim, raw_kind),
        )

    def loss_fn(params):
        if neg_type:
            return backbone.stage1_negtype_loss(
                params, batch["refer_images"], batch["target_images"],
                batch["text_ids"], neg_type)
        kw = {} if dropout_rng is None else {"dropout_rng": dropout_rng}
        return backbone.stage1_loss(params, batch["refer_images"],
                                    batch["target_images"],
                                    batch["text_ids"], **kw)

    return loss_fn


def stage1_takes_dropout(backbone: CIRBackbone) -> bool:
    """Whether this backbone's stage1_loss accepts a dropout rng (MED
    family). The single source for both the mesh-step builder and the
    per-epoch key derivation — the two must agree or the jitted step's
    batch pytree mismatches its in_shardings."""
    import inspect

    return (hasattr(backbone, "stage1_loss") and "dropout_rng"
            in inspect.signature(backbone.stage1_loss).parameters)


@functools.partial(jax.jit, static_argnums=(0, 3, 5))
def stage1_train_step(backbone: CIRBackbone, state: TrainState, batch,
                      neg_type: int = 0, dropout_rng=None, raw_kind=None):
    """batch: refer_images (B,H,W,3), target_images (B,H,W,3), text_ids.
    neg_type > 0 selects the negtype-ablation loss (ref train_negtype.py).
    `dropout_rng` enables train-mode dropout on MED-family backbones whose
    stage1_loss takes it (torch `train()` parity — the reference's stage-1
    regimes run with module dropout active). `raw_kind`: see stage1_loss_fn
    (--device_preprocess image entries are RawBatch canvases)."""
    loss, grads = jax.value_and_grad(
        stage1_loss_fn(backbone, batch, neg_type, dropout_rng,
                       raw_kind))(state.params)
    return state.apply_gradients(grads=grads), loss


def train_epoch_stage1(
    backbone: CIRBackbone,
    state: TrainState,
    batches: Iterator[dict],
    *,
    neg_type: int = 0,
    dropout_rng=None,
    log_every: int = 50,
    log_fn: Callable[[int, float], None] = lambda step, loss: None,
    step_hook=None,
    start_step: int = 0,
    sharded_step=None,
    mesh=None,
    raw_kind=None,
):
    """Host loop over `iter_train_images` batches (drops padded tails).
    Loss accumulates on device; host sync only every `log_every` steps.
    `dropout_rng` (split per step) enables MED-family train-mode dropout.
    `step_hook(step_in_epoch, state)` fires after every step — the live-
    encode stage-1 epochs are where mid-epoch checkpoints matter most;
    `start_step` offsets numbering on mid-epoch resume.

    `sharded_step` + `mesh` (parallel.train.make_sharded_stage1_step)
    dispatch each batch data-sharded over the mesh instead of single-chip;
    neg_type/dropout are baked into the sharded step at build time, so
    they must match what was passed to the builder."""
    from spn4cir_tpu.data.prefetch import prefetch

    loss_sum, count = None, 0
    # depth=2 overlaps the NEXT batch's decode/metadata with the device
    # step — stage-1 decodes 2B fresh images per step, so without this the
    # chip idles for the whole decode (stage-2's train_epoch already does
    # the same)
    for step, raw in enumerate(prefetch(batches, depth=2),
                               start=start_step):
        if (raw["triplet_idx"] < 0).any():
            continue  # drop_last semantics (ref clip4cir/train.py:78)
        to_dev = (jnp.asarray if raw_kind is None
                  else lambda rb: type(rb)(jnp.asarray(rb.canvas),
                                           jnp.asarray(rb.extents)))
        batch = {
            "refer_images": to_dev(raw["refer_images"]),
            "target_images": to_dev(raw["target_images"]),
            "text_ids": jnp.asarray(backbone.tokenize(raw["captions"])),
        }
        # fold_in (not sequential split) so a mid-epoch resume with
        # start_step reproduces the exact per-step rng stream
        step_rng = (None if dropout_rng is None
                    else jax.random.fold_in(dropout_rng, step))
        if sharded_step is not None:
            from spn4cir_tpu.parallel.mesh import replicate, shard_batch

            # neg_type/dropout are baked into the sharded step at build
            # time — a mismatch here would silently train the wrong
            # objective, so fail loudly instead
            built_nt = getattr(sharded_step, "neg_type", neg_type)
            built_dr = getattr(sharded_step, "with_dropout",
                               step_rng is not None)
            built_rk = getattr(sharded_step, "raw_kind", raw_kind)
            if built_nt != neg_type or built_dr != (step_rng is not None) \
                    or built_rk != raw_kind:
                raise ValueError(
                    f"sharded step built with neg_type={built_nt}, "
                    f"with_dropout={built_dr}, raw_kind={built_rk} but the "
                    f"epoch runs neg_type={neg_type}, "
                    f"dropout={step_rng is not None}, raw_kind={raw_kind}")
            batch = shard_batch(batch, mesh)
            if step_rng is not None:
                batch["dropout_rng"] = replicate(step_rng, mesh)
            state, loss = sharded_step(state, batch)
        else:
            state, loss = stage1_train_step(backbone, state, batch, neg_type,
                                            step_rng, raw_kind)
        loss_sum = loss if loss_sum is None else loss_sum + loss
        count += 1
        if log_every and step % log_every == 0:
            log_fn(step, float(loss))
        if step_hook is not None:
            step_hook(step + 1, state)
    return state, (float(loss_sum) / count if count else 0.0)
