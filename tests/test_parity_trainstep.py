"""Training-STEP parity: the reference's own stage-2 training math — torch
`CIRPlus.forward` -> `bank_large_step` -> `infonce_loss` backward + torch
AdamW (`/root/reference/clip4cir/models.py:130-167`, optimizer config
`clip4cir/train.py:79-85`) — run literally as the oracle against our jitted
`stage2_train_step` + optax, with the SAME converted weights, the SAME
fixture dataset, the reference's OWN extracted banks, and identical batch
streams.

This extends the eval-side parity ladder (test_parity_e2e.py) to the
training side:
  rung 1 — identical step-1 gradients on every trainable leaf,
  rung 2 — identical per-step losses across K optimizer steps,
  rung 3 — identical post-training trainable params; frozen image tower and
           logit_scale bit-unchanged on BOTH sides (torch AdamW skips
           grad-None params; our trainable_mask must reproduce exactly that).

Also covers the `--neg_num` sampled-negative ablation
(`clip4cir/models.py:109-128` part_infonce_loss): the oracle's actual
`random.sample` draws are recorded and replayed through our
sampled_neg_infonce.
"""

import copy
import os
import sys

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
    _stub_torchvision,
    ref_modules,
    shared_model,
)

LR = 1e-3          # large enough that 4 steps move params well above fp noise
K_STEPS = 4
BATCH = 4


def _oracle_cirplus(models_mod, clip_model, tau):
    """The reference CIRPlus with its real forward/bank methods, built
    around an existing torch CLIP (bypassing clip.load's download) — the
    same surgery its own __init__ performs (models.py:19-43)."""
    m = models_mod.CIRPlus.__new__(models_mod.CIRPlus)
    torch.nn.Module.__init__(m)
    m.device = torch.device("cpu")
    m.clip = clip_model
    m.combining_function = m.element_wise_sum
    m.tau = tau
    m.plus = False
    m.neg_num = -1
    m.wo_bank = False
    m.output_dim = clip_model.visual.output_dim
    m.crossentropy_criterion = torch.nn.CrossEntropyLoss()
    for param in m.clip.visual.parameters():
        param.requires_grad = False
    return m


def _reference_adamw(oracle):
    """Exactly clip4cir/train.py:79-85 (wd = torch default 1e-2)."""
    return torch.optim.AdamW([
        {"params": [p for p in oracle.parameters() if p.requires_grad],
         "lr": LR, "betas": (0.9, 0.999), "eps": 1e-7}
    ])


def _convert_tree(ref_modules_unused, bb, torch_tree):
    """torch CLIP state-dict-shaped mapping -> our param tree (zeros filled
    for entries the converter needs but the mapping lacks)."""
    from spn4cir_tpu.models.convert import convert_clip_state_dict

    cfg = bb.cfg
    return jax.tree_util.tree_map(np.asarray, convert_clip_state_dict(
        torch_tree, num_vision_layers=cfg.vision_layers,
        num_text_layers=cfg.transformer_layers, is_vit=cfg.is_vit))


def _grads_as_state_dict(oracle):
    """Gradients keyed like the clip state dict (zeros where frozen/None)."""
    out = {}
    named = dict(oracle.clip.named_parameters())
    for key, tensor in oracle.clip.state_dict().items():
        p = named.get(key)
        g = p.grad if (p is not None and p.grad is not None) else None
        out[key] = g.detach().clone() if g is not None \
            else torch.zeros_like(tensor)
    return out


def _setup(ref_modules, shared_model, tmp_path, neg_num=-1):
    """Shared harness: fixture CIRR tree, oracle model + ITS extracted banks,
    a deterministic batch stream, and our Bank view of the same arrays."""
    from spn4cir_tpu.bank.bank import Bank
    from spn4cir_tpu.data.transforms import ImageTransform

    bb, params0, _ = shared_model
    root = make_cirr(str(tmp_path / "cirr_dataset"), n_images=16, n_train=8,
                     extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)

    oracle_clip = copy.deepcopy(shared_model[2].clip)  # don't train the shared fixture
    oracle = _oracle_cirplus(ref_modules["models"], oracle_clip, bb.tau)
    oracle.neg_num = neg_num

    ds = ref_modules["data_utils"].CIRDataset(
        "cirr", "train", "relative", TorchPreprocess(tf), root, ["dress"])
    bank_path = str(tmp_path / "bank.pth")
    oracle.extract_bank_features(ds, torch.device("cpu"), bank_path)
    ds.use_bank = True

    loader = torch.utils.data.DataLoader(
        ds, batch_size=BATCH, shuffle=False, drop_last=True,
        collate_fn=ref_modules["utils"].collate_fn)
    epoch = list(loader)
    batches = [epoch[i % len(epoch)] for i in range(K_STEPS)]

    refer_bank, target_bank = torch.load(bank_path)
    bank = Bank(refer=refer_bank.numpy(),
                target=jnp.asarray(target_bank.numpy()), refer_key="triplet")
    return bb, params0, oracle, batches, bank


def _our_batch(bb, bank, batch, neg_idx=None):
    captions, indexs, _tgt, target_index_all, _ref = batch
    dev = {
        "refer_feats": jnp.asarray(bank.refer[np.asarray(indexs)]),
        "text_ids": jnp.asarray(bb.tokenize(list(captions))),
        "labels": jnp.asarray(np.asarray(target_index_all)),
    }
    if neg_idx is not None:
        dev["neg_idx"] = jnp.asarray(neg_idx)
    return dev


def _flat(tree):
    from flax import traverse_util
    return traverse_util.flatten_dict(tree)


def test_stage2_full_bank_trainstep_parity(ref_modules, shared_model,
                                           tmp_path):
    from spn4cir_tpu.train.stage2 import (create_train_state,
                                          stage2_train_step, trainable_mask)

    bb, params0, oracle, batches, bank = _setup(ref_modules, shared_model,
                                                tmp_path)

    # ---- oracle: K torch AdamW steps through the reference's own forward
    opt = _reference_adamw(oracle)
    ref_losses, ref_grads_sd = [], None
    for k, (captions, indexs, _t, target_index_all, reference_index_all) \
            in enumerate(batches):
        opt.zero_grad()
        loss = oracle.forward(list(captions), indexs, target_index_all,
                              reference_index_all)["bank_loss"]
        loss.backward()
        if k == 0:
            ref_grads_sd = _grads_as_state_dict(oracle)
        opt.step()
        ref_losses.append(float(loss))

    # ---- ours: same batches through the jitted step
    state = create_train_state(bb, params0, LR)
    our_losses = []
    for batch in batches:
        state, loss = stage2_train_step(bb, state, bank.target,
                                        _our_batch(bb, bank, batch), "xla")
        our_losses.append(float(loss))

    # rung 1: step-1 gradients, every trainable leaf
    b0 = _our_batch(bb, bank, batches[0])

    def loss_fn(p):
        return bb.stage2_loss(p, b0["refer_feats"], b0["text_ids"],
                              bank.target, b0["labels"], impl="xla")

    our_grads = jax.grad(loss_fn)(params0)
    ref_grads = _convert_tree(ref_modules, bb, ref_grads_sd)
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

    # rung 3: post-training params — trainable leaves match the oracle's,
    # frozen leaves (visual tower, logit_scale) bit-unchanged on both sides
    ref_after = _convert_tree(ref_modules, bb,
                              {k: v for k, v in oracle.clip.state_dict().items()})
    flat_ours = _flat(jax.tree_util.tree_map(np.asarray, state.params))
    flat_ref = _flat(ref_after)
    flat_init = _flat(jax.tree_util.tree_map(np.asarray, params0))
    moved = 0.0
    for key, trainable in mask.items():
        if trainable:
            np.testing.assert_allclose(
                flat_ours[key], flat_ref[key], atol=3e-5, rtol=1e-3,
                err_msg=f"trained param mismatch at {key}")
            moved = max(moved, float(np.abs(flat_ours[key]
                                            - flat_init[key]).max()))
        else:
            np.testing.assert_array_equal(
                flat_ours[key], flat_init[key],
                err_msg=f"frozen leaf moved on our side: {key}")
            np.testing.assert_array_equal(
                flat_ref[key], flat_init[key],
                err_msg=f"frozen leaf moved on the oracle side: {key}")
    # the comparison is meaningful only if training actually moved params
    # far above the tolerance (AdamW step size ~ LR per coordinate)
    assert moved > 50 * 3e-5, moved


def test_stage2_sampled_neg_parity(ref_modules, shared_model, tmp_path):
    """--neg_num ablation: replay the oracle's actual random.sample negative
    draws (part_infonce_loss, clip4cir/models.py:109-128) through our
    sampled_neg_infonce path; per-step losses and final params must match."""
    from spn4cir_tpu.train.stage2 import (create_train_state,
                                          stage2_train_step, trainable_mask)

    NEG = 5
    bb, params0, oracle, batches, bank = _setup(ref_modules, shared_model,
                                                tmp_path, neg_num=NEG)

    drawn_per_step = []
    orig_get_neg_id = oracle.get_neg_id

    def recording(i, N, k):
        out = orig_get_neg_id(i, N, k)
        drawn_per_step[-1].append(out)
        return out

    oracle.get_neg_id = recording

    import random
    random.seed(1234)
    opt = _reference_adamw(oracle)
    ref_losses = []
    for captions, indexs, _t, target_index_all, reference_index_all in batches:
        drawn_per_step.append([])
        opt.zero_grad()
        loss = oracle.forward(list(captions), indexs, target_index_all,
                              reference_index_all)["bank_loss"]
        loss.backward()
        opt.step()
        ref_losses.append(float(loss))

    state = create_train_state(bb, params0, LR)
    our_losses = []
    for batch, drawn in zip(batches, drawn_per_step):
        neg_idx = np.asarray(drawn, np.int64)
        assert neg_idx.shape == (BATCH, NEG)
        state, loss = stage2_train_step(
            bb, state, bank.target, _our_batch(bb, bank, batch, neg_idx),
            "xla")
        our_losses.append(float(loss))

    np.testing.assert_allclose(our_losses, ref_losses, atol=5e-5, rtol=1e-5)

    ref_after = _convert_tree(ref_modules, bb, oracle.clip.state_dict())
    mask = _flat(trainable_mask(params0, bb.trainable_filter))
    flat_ours = _flat(jax.tree_util.tree_map(np.asarray, state.params))
    flat_ref = _flat(ref_after)
    for key, trainable in mask.items():
        if trainable:
            np.testing.assert_allclose(
                flat_ours[key], flat_ref[key], atol=3e-5, rtol=1e-3,
                err_msg=f"trained param mismatch at {key}")
