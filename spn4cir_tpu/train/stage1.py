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


@functools.partial(jax.jit, static_argnums=(0, 3))
def stage1_train_step(backbone: CIRBackbone, state: TrainState, batch,
                      neg_type: int = 0):
    """batch: refer_images (B,H,W,3), target_images (B,H,W,3), text_ids.
    neg_type > 0 selects the negtype-ablation loss (ref train_negtype.py)."""

    def loss_fn(params):
        if neg_type:
            return backbone.stage1_negtype_loss(
                params, batch["refer_images"], batch["target_images"],
                batch["text_ids"], neg_type)
        return backbone.stage1_loss(params, batch["refer_images"],
                                    batch["target_images"], batch["text_ids"])

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), loss


def train_epoch_stage1(
    backbone: CIRBackbone,
    state: TrainState,
    batches: Iterator[dict],
    *,
    neg_type: int = 0,
    log_every: int = 50,
    log_fn: Callable[[int, float], None] = lambda step, loss: None,
):
    """Host loop over `iter_train_images` batches (drops padded tails).
    Loss accumulates on device; host sync only every `log_every` steps."""
    loss_sum, count = None, 0
    for step, raw in enumerate(batches):
        if (raw["triplet_idx"] < 0).any():
            continue  # drop_last semantics (ref clip4cir/train.py:78)
        batch = {
            "refer_images": jnp.asarray(raw["refer_images"]),
            "target_images": jnp.asarray(raw["target_images"]),
            "text_ids": jnp.asarray(backbone.tokenize(raw["captions"])),
        }
        state, loss = stage1_train_step(backbone, state, batch, neg_type)
        loss_sum = loss if loss_sum is None else loss_sum + loss
        count += 1
        if log_every and step % log_every == 0:
            log_fn(step, float(loss))
    return state, (float(loss_sum) / count if count else 0.0)
