"""tgcir training-STEP parity: the reference's own stage-2 training math —
`CIRPlus.forward` -> `bank_large_step` -> gated token fusion
(`/root/reference/tgcir/models.py:273-293` + `img_txt_fusion` :198-205),
torch AdamW per `tgcir/train.py:83-90` — as the oracle vs our jitted
stage2_train_step.

Beyond the clip variant this certifies:
  - the gate-fusion BACKWARD (s_remain_map MLP + blended token mean-pool),
  - the stage-2 surgery freeze set (load_ckpt(is_origin=True),
    models.py:207-221): image_backbone/tokenlearn/fc/masks frozen,
    text transformer + text_fc + tokenlearn_text/masks_text + s_remain_map
    live; the dead params (local_weight, t_remain_map, t_replace_map) are
    grad-None in torch and must not move on either side,
  - the oracle's OWN extract_bank_features runs unmodified: its hardcoded
    (N, 12, 512)/(M, 512) buffers match the test-tgcir geometry.

Both sides share the POST-surgery weights: the surgery deep-copies
tokenlearn -> tokenlearn_text, so the converter runs on the oracle's
state dict AFTER the surgery.
"""

import copy
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/tgcir"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference repo not mounted")

from tests.fixtures import make_cirr  # noqa: E402
from tests.test_parity_e2e import TorchPreprocess  # noqa: E402
from tests.test_parity_tgcir_e2e import (  # noqa: E402,F401
    ref_modules,
    shared_model,
)
from tests.test_parity_trainstep import _flat  # noqa: E402

LR = 1e-3
K_STEPS = 4
BATCH = 4


def _apply_stage2_surgery(model):
    """load_ckpt(is_origin=True) minus the state-dict load
    (tgcir/models.py:210-221)."""
    model.backbone.tokenlearn_text = copy.deepcopy(model.backbone.tokenlearn)
    model.backbone.masks_text = copy.deepcopy(model.backbone.masks)
    for group in (model.backbone.image_backbone, model.backbone.tokenlearn,
                  model.backbone.fc, model.backbone.masks):
        for param in group.parameters():
            param.requires_grad = False
    return model


def test_tgcir_stage2_trainstep_parity(ref_modules, shared_model, tmp_path):
    from spn4cir_tpu.bank.bank import Bank
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.models.clip import CLIP_CONFIGS
    from spn4cir_tpu.models.convert import convert_tgcir_state_dict
    from spn4cir_tpu.train.stage2 import (create_train_state,
                                          stage2_train_step, trainable_mask)

    bb, _params_fixture, ref_model = shared_model
    cfg = CLIP_CONFIGS["test-tgcir"]
    oracle = _apply_stage2_surgery(copy.deepcopy(ref_model))
    oracle.tau = bb.tau
    # post-surgery weights are the shared starting point on both sides
    params0 = jax.tree_util.tree_map(jnp.asarray, convert_tgcir_state_dict(
        oracle.state_dict(), cfg.vision_layers, cfg.transformer_layers))

    root = make_cirr(str(tmp_path / "cirr_dataset"), n_images=16, n_train=8,
                     extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)
    ds = ref_modules["data_utils"].CIRDataset(
        "cirr", "train", "relative", TorchPreprocess(tf), root, ["dress"])
    bank_path = str(tmp_path / "bank.pth")
    # the reference's own extractor, unmodified (shapes match test-tgcir)
    oracle.extract_bank_features(ds, torch.device("cpu"), bank_path)
    ds.use_bank = True

    loader = torch.utils.data.DataLoader(
        ds, batch_size=BATCH, shuffle=False, drop_last=True,
        collate_fn=ref_modules["utils"].collate_fn)
    epoch = list(loader)
    batches = [epoch[i % len(epoch)] for i in range(K_STEPS)]

    # ---- oracle: K torch AdamW steps (train.py:83-90)
    opt = torch.optim.AdamW([
        {"params": [p for p in oracle.parameters() if p.requires_grad],
         "lr": LR, "betas": (0.9, 0.999), "eps": 1e-7}])
    ref_losses, grads_sd0 = [], None
    for k, (captions, indexs, _t, target_index_all, reference_index_all) \
            in enumerate(batches):
        opt.zero_grad()
        loss = oracle.forward(list(captions), indexs, target_index_all,
                              reference_index_all)["bank_loss"]
        loss.backward()
        if k == 0:
            named = dict(oracle.named_parameters())
            grads_sd0 = {
                key: (named[key].grad.detach().clone()
                      if key in named and named[key].grad is not None
                      else torch.zeros_like(tensor))
                for key, tensor in oracle.state_dict().items()}
        opt.step()
        ref_losses.append(float(loss.detach()))

    # ---- ours: same batches through the jitted step
    refer_bank, target_bank = torch.load(bank_path)
    bank = Bank(refer=refer_bank.numpy(),
                target=jnp.asarray(target_bank.numpy()), refer_key="triplet")

    def our_batch(batch):
        captions, indexs, _t, target_index_all, _r = batch
        return {
            "refer_feats": jnp.asarray(bank.refer[np.asarray(indexs)]),
            "text_ids": jnp.asarray(bb.tokenize(list(captions))),
            "labels": jnp.asarray(np.asarray(target_index_all)),
        }

    state = create_train_state(bb, params0, LR)
    our_losses = []
    for batch in batches:
        state, loss = stage2_train_step(bb, state, bank.target,
                                        our_batch(batch), "xla")
        our_losses.append(float(loss))

    # rung 1: step-1 gradients on every trainable leaf
    b0 = our_batch(batches[0])

    def loss_fn(p):
        return bb.stage2_loss(p, b0["refer_feats"], b0["text_ids"],
                              bank.target, b0["labels"], impl="xla")

    our_grads = jax.grad(loss_fn)(params0)
    ref_grads = jax.tree_util.tree_map(np.asarray, convert_tgcir_state_dict(
        grads_sd0, cfg.vision_layers, cfg.transformer_layers))
    mask = _flat(trainable_mask(params0, bb.trainable_filter))
    flat_og, flat_rg = _flat(our_grads), _flat(ref_grads)
    for key, trainable in mask.items():
        if not trainable:
            continue
        np.testing.assert_allclose(
            np.asarray(flat_og[key]), flat_rg[key], atol=2e-5, rtol=2e-3,
            err_msg=f"grad mismatch at {key}")

    # rung 2: per-step losses
    np.testing.assert_allclose(our_losses, ref_losses, atol=5e-5, rtol=1e-5)

    # rung 3: post-training params — trainable leaves match; frozen leaves
    # bit-unchanged on both sides
    ref_after = jax.tree_util.tree_map(np.asarray, convert_tgcir_state_dict(
        dict(oracle.state_dict()), cfg.vision_layers, cfg.transformer_layers))
    flat_ours = _flat(jax.tree_util.tree_map(np.asarray, state.params))
    flat_ref = _flat(ref_after)
    flat_init = _flat(jax.tree_util.tree_map(np.asarray, params0))
    moved = 0.0
    for key, trainable in mask.items():
        # dead params (local_weight, t_remain_map, t_replace_map) get
        # grad=None in torch and exact-zero grads here; they must not move
        # on the oracle side regardless of our mask
        if trainable and np.any(flat_rg[key] != 0):
            np.testing.assert_allclose(
                flat_ours[key], flat_ref[key], atol=3e-5, rtol=1e-3,
                err_msg=f"trained param mismatch at {key}")
            moved = max(moved, float(np.abs(flat_ours[key]
                                            - flat_init[key]).max()))
        else:
            np.testing.assert_array_equal(
                flat_ours[key], flat_init[key],
                err_msg=f"frozen/dead leaf moved on our side: {key}")
            np.testing.assert_array_equal(
                flat_ref[key], flat_init[key],
                err_msg=f"frozen/dead leaf moved on the oracle side: {key}")
    assert moved > 50 * 3e-5, moved
