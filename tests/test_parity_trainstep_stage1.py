"""Stage-1 (`--wo_bank`) training-STEP parity: the reference's own end-to-end
in-batch InfoNCE math — torch `CIRPlus.forward` with LIVE image encoders under
torch.utils.checkpoint (`/root/reference/clip4cir/models.py:146-161`), torch
AdamW over every requires_grad param (`clip4cir/train.py:79-90`) — as the
oracle vs our jitted `stage1_train_step`.

This is the only training regime the stage-2 parity suite does not touch:
grads flow through BOTH image towers AND the text tower, nothing is frozen,
and weight decay hits every weight. It certifies:
  - the in-batch loss wiring: query = normalize(refer_feats + text_feats)
    vs targets = normalize(target_feats), positives on the diagonal,
  - our single 2B-batch tower call (refer and target concatenated,
    models/clip4cir.py stage1_loss) against the reference's two B-batch
    checkpointed calls,
  - torch-AdamW-equivalence of create_stage1_state: logit_scale gets
    grad=None in torch (unused by the loss) so AdamW skips it ENTIRELY —
    including weight decay — and it must stay bit-unchanged on both sides
    while every other leaf trains and decays.

The zscir stage-1 trainer (`zscir/models.py:145-169`, grad_ckpt branch) is
the same math on a ViT-L/14; this fixture-geometry test covers both.
"""

import copy
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/clip4cir"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference repo not mounted")

from tests.fixtures import make_cirr  # noqa: E402
from tests.test_parity_e2e import (  # noqa: E402,F401
    TorchPreprocess,
    ref_modules,
    shared_model,
)
from tests.test_parity_trainstep import (  # noqa: E402
    _convert_tree,
    _flat,
    _grads_as_state_dict,
)

LR = 1e-3
K_STEPS = 4
BATCH = 4


def _oracle_stage1(models_mod, clip_model, tau):
    """CIRPlus in the wo_bank=True regime (models.py:19-43): nothing frozen,
    element_wise_sum combiner, live encoders in forward."""
    m = models_mod.CIRPlus.__new__(models_mod.CIRPlus)
    torch.nn.Module.__init__(m)
    m.device = torch.device("cpu")
    m.clip = clip_model
    m.combining_function = m.element_wise_sum
    m.tau = tau
    m.plus = False
    m.neg_num = -1
    m.wo_bank = True
    m.output_dim = clip_model.visual.output_dim
    m.crossentropy_criterion = torch.nn.CrossEntropyLoss()
    return m


def _oracle_negtype(clip_model, tau, neg_type):
    """models_negtype.CIRPlus (the --neg_type ablation oracle,
    clip4cir/models_negtype.py:94-128 with its per-sample Python loops),
    built around an existing torch CLIP. Imported ad hoc: the ref_modules
    fixture keeps REF_DIR on sys.path while active."""
    import importlib
    import sys

    had = "models_negtype" in sys.modules
    mod = importlib.import_module("models_negtype")
    try:
        m = mod.CIRPlus.__new__(mod.CIRPlus)
        torch.nn.Module.__init__(m)
        m.device = torch.device("cpu")
        m.clip = clip_model
        m.combining_function = m.element_wise_sum
        m.tau = tau
        m.neg_type = neg_type
        m.crossentropy_criterion = torch.nn.CrossEntropyLoss()
        return m
    finally:
        if not had:
            sys.modules.pop("models_negtype", None)


def test_stage1_trainstep_parity(ref_modules, shared_model, tmp_path):
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.train.stage1 import create_stage1_state, stage1_train_step

    bb, params0, shim = shared_model
    oracle_clip = copy.deepcopy(shim.clip).train()
    oracle = _oracle_stage1(ref_modules["models"], oracle_clip, bb.tau)

    root = make_cirr(str(tmp_path / "cirr_dataset"), n_images=16, n_train=8,
                     extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)
    # relative mode WITHOUT use_bank: yields (ref_img, caption, tgt_img,
    # index, target_index, reference_index_all, target_index_all)
    ds = ref_modules["data_utils"].CIRDataset(
        "cirr", "train", "relative", TorchPreprocess(tf), root, ["dress"])
    loader = torch.utils.data.DataLoader(
        ds, batch_size=BATCH, shuffle=False, drop_last=True,
        collate_fn=ref_modules["utils"].collate_fn)
    epoch = list(loader)
    batches = [epoch[i % len(epoch)] for i in range(K_STEPS)]

    # ---- oracle: K torch AdamW steps over ALL requires_grad params
    # (train.py:79-90; on CPU autocast/GradScaler are identity)
    opt = torch.optim.AdamW([
        {"params": [p for p in oracle.parameters() if p.requires_grad],
         "lr": LR, "betas": (0.9, 0.999), "eps": 1e-7}])
    ref_losses, grads_sd0 = [], None
    for k, (refer_images, captions, target_images, indexs, _t, ref_all,
            tgt_all) in enumerate(batches):
        opt.zero_grad()
        loss = oracle.forward(list(captions), indexs, tgt_all, ref_all,
                              refer_images, target_images)["bbc_loss"]
        loss.backward()
        if k == 0:
            grads_sd0 = _grads_as_state_dict(oracle)
        opt.step()
        ref_losses.append(float(loss.detach()))

    # torch AdamW never saw logit_scale's grad (None): bit-unchanged
    assert torch.equal(oracle.clip.logit_scale,
                       shim.clip.logit_scale), "oracle logit_scale moved"

    # ---- ours: the same batches through the jitted stage-1 step
    def our_batch(batch):
        refer_images, captions, target_images, *_ = batch
        return {
            "refer_images": jnp.asarray(
                refer_images.permute(0, 2, 3, 1).numpy()),
            "target_images": jnp.asarray(
                target_images.permute(0, 2, 3, 1).numpy()),
            "text_ids": jnp.asarray(bb.tokenize(list(captions))),
        }

    state = create_stage1_state(bb, params0, LR)
    our_losses = []
    for batch in batches:
        state, loss = stage1_train_step(bb, state, our_batch(batch))
        our_losses.append(float(loss))

    # rung 1: step-1 gradients on every leaf
    b0 = our_batch(batches[0])

    def loss_fn(p):
        return bb.stage1_loss(p, b0["refer_images"], b0["target_images"],
                              b0["text_ids"])

    our_grads = jax.grad(loss_fn)(params0)
    ref_grads = _convert_tree(ref_modules, bb, grads_sd0)
    flat_og, flat_rg = _flat(our_grads), _flat(ref_grads)
    for key in flat_rg:
        if "logit_scale" in key:
            continue
        np.testing.assert_allclose(
            np.asarray(flat_og[key]), flat_rg[key], atol=2e-5, rtol=2e-3,
            err_msg=f"grad mismatch at {key}")

    # rung 2: per-step losses
    np.testing.assert_allclose(our_losses, ref_losses, atol=5e-5, rtol=2e-5)

    # rung 3: post-training params — every leaf trains (and decays) except
    # logit_scale, which must be bit-unchanged on both sides
    ref_after = _convert_tree(ref_modules, bb, dict(oracle.clip.state_dict()))
    flat_ours = _flat(jax.tree_util.tree_map(np.asarray, state.params))
    flat_ref = _flat(ref_after)
    flat_init = _flat(jax.tree_util.tree_map(np.asarray, params0))
    moved = 0.0
    for key in flat_ref:
        if "logit_scale" in key:
            np.testing.assert_array_equal(
                flat_ours[key], flat_init[key],
                err_msg="logit_scale moved on our side")
            np.testing.assert_array_equal(
                flat_ref[key], flat_init[key],
                err_msg="logit_scale moved on the oracle side")
            continue
        np.testing.assert_allclose(
            flat_ours[key], flat_ref[key], atol=5e-5, rtol=2e-3,
            err_msg=f"trained param mismatch at {key}")
        moved = max(moved,
                    float(np.abs(flat_ours[key] - flat_init[key]).max()))
    assert moved > 50 * 5e-5, moved


@pytest.mark.parametrize("neg_type", [15, 6, 9])
def test_negtype_trainstep_parity(ref_modules, shared_model, tmp_path,
                                  neg_type):
    """--neg_type ablation parity vs the reference's OWN models_negtype
    forward (the 4-flavor per-sample loops, models_negtype.py:53-128):
    identical loss and identical step-1 grads on every leaf for
    representative bitmasks (15 = all four, 6 = target+text, 9 = query+refer).
    """
    from spn4cir_tpu.data.transforms import ImageTransform

    bb, params0, shim = shared_model
    oracle_clip = copy.deepcopy(shim.clip).train()
    oracle = _oracle_negtype(oracle_clip, bb.tau, neg_type)

    root = make_cirr(str(tmp_path / "cirr_dataset"), n_images=16, n_train=8,
                     extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)
    ds = ref_modules["data_utils"].CIRDataset(
        "cirr", "train", "relative", TorchPreprocess(tf), root, ["dress"])
    loader = torch.utils.data.DataLoader(
        ds, batch_size=BATCH, shuffle=False, drop_last=True,
        collate_fn=ref_modules["utils"].collate_fn)
    refer_images, captions, target_images, indexs, _t, ref_all, tgt_all = \
        next(iter(loader))

    loss_t = oracle.forward(list(captions), indexs, tgt_all, ref_all,
                            refer_images, target_images)["bbc_loss"]
    loss_t.backward()
    grads_sd = _grads_as_state_dict(oracle)

    batch = {
        "refer_images": jnp.asarray(refer_images.permute(0, 2, 3, 1).numpy()),
        "target_images": jnp.asarray(
            target_images.permute(0, 2, 3, 1).numpy()),
        "text_ids": jnp.asarray(bb.tokenize(list(captions))),
    }

    def loss_fn(p):
        return bb.stage1_negtype_loss(p, batch["refer_images"],
                                      batch["target_images"],
                                      batch["text_ids"], neg_type)

    loss_j, our_grads = jax.value_and_grad(loss_fn)(params0)
    assert float(loss_j) == pytest.approx(float(loss_t.detach()), abs=5e-5)

    ref_grads = _convert_tree(ref_modules, bb, grads_sd)
    flat_og, flat_rg = _flat(our_grads), _flat(ref_grads)
    for key in flat_rg:
        if "logit_scale" in key:
            continue
        np.testing.assert_allclose(
            np.asarray(flat_og[key]), flat_rg[key], atol=2e-5, rtol=2e-3,
            err_msg=f"grad mismatch at {key} (neg_type={neg_type})")
