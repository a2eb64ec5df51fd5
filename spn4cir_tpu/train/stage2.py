"""Stage-2 ("scaling negatives") trainer: frozen image tower, live text side,
full-bank InfoNCE.

Parity target: the epoch loop + bank step of `clip4cir/train.py:103-131` and
`CIRPlus.forward/bank_large_step` (`clip4cir/models.py:130-161`), with the
reference's AdamW hyperparameters (betas (0.9, 0.999), eps 1e-7,
`clip4cir/train.py:79-85`).

TPU-native shape: one jitted `train_step(state, target_bank, batch)` holding
the text encoder forward/backward and the (Pallas) bank loss; the target bank
is device-resident; refer-bank rows are gathered on host per batch (they are
the frozen cache — no gradient flows into them, matching the reference's
`.detach()`); AMP GradScaler is unnecessary in bf16 (SURVEY.md §2.9).

Simplification preserved from quirk analysis (SURVEY.md §8.3): the reference
keys the refer bank by triplet index without `--plus` and by image id with
`--plus`, but the stored vectors are identical (frozen encoder); we always
gather by reference-image id.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util
from flax.training import train_state

from spn4cir_tpu.bank.bank import Bank
from spn4cir_tpu.models.api import CIRBackbone


class TrainState(train_state.TrainState):
    pass


def trainable_mask(params, filter_fn: Callable) -> Any:
    """Besides the backbone's stage-2 freeze filter, two generic exclusions
    (matching torch AdamW, which skips params whose grad is None):
      - non-'params' collections (BatchNorm batch_stats) are statistics,
        not weights — gradient-updating or decaying them is nonsense;
      - CLIP's logit_scale never appears in a CIR loss, so its grad is
        exactly zero and unmasked weight decay would exponentially shrink
        the stored checkpoint value every step."""
    flat = traverse_util.flatten_dict(params)
    mask = {k: (k[0] == "params" and "logit_scale" not in k
                and bool(filter_fn(k))) for k in flat}
    return traverse_util.unflatten_dict(mask)


def make_optimizer(
    learning_rate: float,
    params,
    filter_fn: Callable,
    *,
    weight_decay: float = 1e-2,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-7,
) -> optax.GradientTransformation:
    """AdamW with frozen-subtree masking (stage 2 trains only the text/fusion
    side, ref clip4cir/models.py:31-33 + train.py:79-85)."""
    opt = optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                      weight_decay=weight_decay)
    return masked_with_frozen_zero(opt, trainable_mask(params, filter_fn))


def masked_with_frozen_zero(opt, mask) -> optax.GradientTransformation:
    """optax.masked PASSES THROUGH masked-out updates unchanged (so a stray
    nonzero gradient on a frozen leaf would be applied raw); explicitly zero
    the complement so frozen leaves can never move."""
    inv = jax.tree_util.tree_map(lambda m: not m, mask)
    return optax.chain(optax.masked(optax.set_to_zero(), inv),
                       optax.masked(opt, mask))


def create_train_state(backbone: CIRBackbone, params, learning_rate,
                       **opt_kw) -> TrainState:
    """learning_rate may be a float or an optax schedule. Backbone-specific
    AdamW hyperparameters apply unless overridden."""
    merged = {**backbone.optimizer_kwargs(), **opt_kw}
    tx = make_optimizer(learning_rate, params, backbone.trainable_filter,
                        **merged)
    return TrainState.create(apply_fn=None, params=params, tx=tx)


def make_lr_schedule(kind: str, base_lr: float, steps_per_epoch: int,
                     num_epochs: int, warmup_steps: int = 0,
                     min_lr: float = 0.0):
    """Optional LR schedules (the reference trains at constant LR; its
    vendored LAVIS ships warmup-cosine/linear, blip24cir/lavis/common/optims.py
    :14-117 — provided here as first-class options)."""
    total = max(steps_per_epoch * num_epochs, 1)
    if kind == "constant":
        return base_lr
    if kind == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else base_lr,
            peak_value=base_lr, warmup_steps=warmup_steps,
            decay_steps=total, end_value=min_lr)
    if kind == "linear":
        return optax.linear_schedule(base_lr, min_lr, total)
    raise ValueError(f"unknown lr schedule {kind!r}")


def sample_negatives(rng, pos_ids, num_images: int, neg_num: int) -> np.ndarray:
    """Uniform negative ids WITHOUT replacement, excluding each row's
    positive — the reference's draw distribution (`random.sample` over
    range(M) minus the positive, clip4cir/models.py:109-113).

    Implemented as first-k-distinct of an iid uniform stream over M-1
    values (distributionally identical to sampling without replacement),
    then shifted past the positive; vectorized per row."""
    if neg_num >= num_images:
        raise ValueError(f"neg_num={neg_num} must be < num_images={num_images}")
    pos_ids = np.asarray(pos_ids)
    out = np.empty((len(pos_ids), neg_num), np.int64)
    for i, pos in enumerate(pos_ids):
        vals = np.empty(0, np.int64)
        while vals.size < neg_num:
            draw = rng.randint(0, num_images - 1,
                               size=max(2 * (neg_num - vals.size), 16))
            cat = np.concatenate([vals, draw])
            _, first = np.unique(cat, return_index=True)
            vals = cat[np.sort(first)]  # distinct, first-appearance order
        row = vals[:neg_num]
        out[i] = row + (row >= pos)
    return out


@functools.partial(jax.jit, static_argnums=(0, 4))
def stage2_train_step(
    backbone: CIRBackbone,
    state: TrainState,
    target_bank: jnp.ndarray,
    batch: Dict[str, jnp.ndarray],
    impl: str = "auto",
    dropout_rng: Optional[jnp.ndarray] = None,
):
    """One optimizer step. batch: refer_feats (B, *refer_shape) gathered bank
    rows, text_ids (B, L), labels (B,) target-image ids into the bank.
    `dropout_rng` enables train-mode dropout on backbones configured with a
    nonzero dropout rate (blip/blip2 MED sides)."""

    def loss_fn(params):
        kw = {} if dropout_rng is None else {"dropout_rng": dropout_rng}
        return backbone.stage2_loss(
            params, batch["refer_feats"], batch["text_ids"], target_bank,
            batch["labels"], neg_idx=batch.get("neg_idx"), impl=impl, **kw)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), loss


def train_epoch(
    backbone: CIRBackbone,
    state: TrainState,
    bank: Bank,
    batches: Iterator[dict],
    *,
    impl: str = "auto",
    neg_num: Optional[int] = None,
    neg_rng: Optional[np.random.RandomState] = None,
    neg_seed: Optional[int] = None,
    dropout_rng: Optional[jnp.ndarray] = None,
    log_every: int = 50,
    log_fn: Callable[[int, float], None] = lambda step, loss: None,
    step_hook: Optional[Callable[[int, TrainState], None]] = None,
    start_step: int = 0,
):
    """Host epoch loop over `iter_train_bank` batches: gather refer rows,
    tokenize, dispatch the jitted step. Returns (state, mean_loss). Batches
    are prefetched on a background thread (spn4cir_tpu.data.prefetch).
    `step_hook(step_in_epoch, state)` fires after every step (step-granular
    checkpointing); `start_step` offsets the step numbering when resuming
    mid-epoch (pair with the iterator's start_step)."""
    from spn4cir_tpu.data.prefetch import prefetch

    # Loss stays on device between steps (loss_sum is a device scalar); a
    # host round-trip happens only every `log_every` steps — per-step
    # float(loss) would force a sync and defeat async dispatch.
    loss_sum, count = None, 0
    for step, raw in enumerate(prefetch(batches, depth=2), start=start_step):
        dev_batch = {
            "refer_feats": jnp.asarray(bank.gather_refer(raw)),
            "text_ids": jnp.asarray(backbone.tokenize(raw["captions"])),
            "labels": jnp.asarray(raw["target_image_id"]),
        }
        if neg_num:
            # neg_seed: STATELESS per-step draws (RandomState keyed on
            # (seed, step)) so an epoch/step resume replays the exact
            # negative sets of the uninterrupted run; neg_rng keeps the
            # legacy sequential stream for callers that manage it
            if neg_seed is not None:
                rng = np.random.RandomState(
                    (int(neg_seed) * 100_003 + step) % (2**32))
            else:
                rng = neg_rng or np.random
            dev_batch["neg_idx"] = jnp.asarray(sample_negatives(
                rng, raw["target_image_id"], bank.num_images, neg_num))
        step_rng = (None if dropout_rng is None
                    else jax.random.fold_in(dropout_rng, step))
        state, loss = stage2_train_step(backbone, state, bank.target,
                                        dev_batch, impl, step_rng)
        loss_sum = loss if loss_sum is None else loss_sum + loss
        count += 1
        if log_every and step % log_every == 0:
            log_fn(step, float(loss))
        if step_hook is not None:
            step_hook(step + 1, state)
    mean = float(loss_sum) / count if count else 0.0
    return state, mean
