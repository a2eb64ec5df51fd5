"""blip4cir training-STEP parity: the reference's own stage-2 training math
(`/root/reference/blip4cir/models.py:95-121` CIRPlus.forward ->
bank_large_step -> infonce_loss with the LEARNABLE nn.Parameter tau, torch
AdamW per `blip4cir/train.py:80-89`) as the oracle vs our jitted
stage2_train_step, on shared converted weights and identical batch streams.

Beyond the clip variant (test_parity_trainstep.py) this certifies:
  - the learnable-tau gradient path (quirk SURVEY.md §8.10) and its weight
    decay on both sides,
  - MED cross-attention fusion BACKWARD parity,
  - the freeze-by-graph-topology semantics: the reference's blip4cir
    train.py never calls init_stage2 — the ViT/vision_proj/temp simply get
    grad=None (absent from the fusion graph) and torch AdamW skips them;
    our trainable_filter must reproduce exactly that (frozen leaves
    bit-unchanged on both sides).

The oracle banks are built with the reference's extraction SEMANTICS
(models.py:45-67) but size-generic buffers — its own extract_bank_features
hardcodes (577, 768), which cannot hold the tiny test geometry (same seam
as test_parity_blip_e2e._ref_extract_index).
"""

import copy
import importlib
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/blip4cir"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference repo not mounted")

from tests.fixtures import make_cirr  # noqa: E402
from tests.test_parity_e2e import TorchPreprocess  # noqa: E402
from tests.test_parity_blip_e2e import (  # noqa: E402,F401
    ref_modules,
    shared_model,
)

LR = 1e-3
K_STEPS = 4
BATCH = 4
TAU0 = 0.03


@pytest.fixture()
def ref_cirplus_cls(ref_modules):
    """blip4cir/models.py imported flat (the blip ref_modules fixture leaves
    REF_DIR on sys.path while active but does not import 'models'; another
    suite's clip4cir 'models' may be cached — import fresh, then restore)."""
    saved = sys.modules.pop("models", None)
    try:
        yield importlib.import_module("models").CIRPlus
    finally:
        sys.modules.pop("models", None)
        if saved is not None:
            sys.modules["models"] = saved


def _oracle_cirplus(cirplus_cls, blip_model):
    """The reference CIRPlus around an existing torch BLIP_Retrieval
    (bypassing blip_cir's checkpoint download — models.py:16-36)."""
    m = cirplus_cls.__new__(cirplus_cls)
    torch.nn.Module.__init__(m)
    m.device = torch.device("cpu")
    m.plus = False
    m.blip = blip_model
    m.tau = torch.nn.Parameter(TAU0 * torch.ones([]))
    m.output_dim = blip_model.text_proj.out_features
    m.crossentropy_criterion = torch.nn.CrossEntropyLoss()
    return m


def _extract_banks_like_reference(oracle, ds, utils_mod):
    """models.py:45-67 semantics with size-generic buffers: refer bank =
    raw ViT tokens by triplet index; target bank = pooled-normalized feats
    for every unique train image (refer rows via vision_proj on CLS)."""
    import torch.nn.functional as F
    from torch.utils.data import DataLoader

    blip = oracle.blip.eval().float()
    refer_rows, target_rows = {}, {}
    loader = DataLoader(ds, batch_size=8, num_workers=0,
                        collate_fn=utils_mod.collate_fn)
    for (reference_image, _cap, target_image, index, _t,
         reference_index_all, target_index_all) in loader:
        with torch.no_grad():
            refer_raw = blip.img_embed(reference_image)
            refer_p = F.normalize(blip.vision_proj(refer_raw[:, 0, :]))
            target_p = blip.img_embed(
                target_image, return_pool_and_normalized=True)[-1]
        for i, idx in enumerate(index.tolist()):
            refer_rows[idx] = refer_raw[i]
        for i, gid in enumerate(reference_index_all.tolist()):
            target_rows[gid] = refer_p[i]
        for i, gid in enumerate(target_index_all.tolist()):
            target_rows[gid] = target_p[i]
    refer_bank = torch.stack([refer_rows[i] for i in range(len(refer_rows))])
    target_bank = torch.stack(
        [target_rows[i] for i in range(ds.image_id)])
    return refer_bank, target_bank


def _flat(tree):
    from flax import traverse_util
    return traverse_util.flatten_dict(tree)


def test_blip_stage2_trainstep_parity(ref_modules, shared_model,
                                      ref_cirplus_cls, tmp_path):
    from spn4cir_tpu.bank.bank import Bank
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.models.convert import convert_blip_retrieval
    from spn4cir_tpu.train.stage2 import (create_train_state,
                                          stage2_train_step, trainable_mask)

    bb, params0, ref_model = shared_model
    params0 = dict(params0, params=dict(params0["params"],
                                        tau=jnp.asarray(np.float32(TAU0))))
    root = make_cirr(str(tmp_path / "cirr_dataset"), n_images=16, n_train=8,
                     extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)

    oracle = _oracle_cirplus(ref_cirplus_cls, copy.deepcopy(ref_model))
    ds = ref_modules["data_utils"].CIRDataset(
        "cirr", "train", "relative", TorchPreprocess(tf), root, ["dress"])
    refer_bank, target_bank = _extract_banks_like_reference(
        oracle, ds, ref_modules["utils"])
    oracle.refer_bank, oracle.target_bank = refer_bank, target_bank
    ds.use_bank = True

    loader = torch.utils.data.DataLoader(
        ds, batch_size=BATCH, shuffle=False, drop_last=True,
        collate_fn=ref_modules["utils"].collate_fn)
    epoch = list(loader)
    batches = [epoch[i % len(epoch)] for i in range(K_STEPS)]

    # ---- oracle: K torch AdamW steps (train.py:80-89 param group; only
    # requires_grad params enter, grad-None params are skipped by torch)
    opt = torch.optim.AdamW([
        {"params": [p for p in oracle.parameters() if p.requires_grad],
         "lr": LR, "betas": (0.9, 0.999), "eps": 1e-7}])
    ref_losses = []
    tau_grad0 = None
    grads_sd0 = None
    for k, (captions, indexs, _t, target_index_all, reference_index_all) \
            in enumerate(batches):
        opt.zero_grad()
        loss = oracle.forward(list(captions), indexs, target_index_all,
                              reference_index_all)["bank_loss"]
        loss.backward()
        if k == 0:
            tau_grad0 = float(oracle.tau.grad)
            named = dict(oracle.blip.named_parameters())
            grads_sd0 = {
                key: (named[key].grad.detach().clone()
                      if key in named and named[key].grad is not None
                      else torch.zeros_like(tensor))
                for key, tensor in oracle.blip.state_dict().items()}
            grads_sd0["tau"] = oracle.tau.grad.detach().clone()
        opt.step()
        ref_losses.append(float(loss.detach()))

    # ---- ours: same batches through the jitted step
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

    # rung 1: step-1 gradients — every trainable leaf incl. the learnable tau
    b0 = our_batch(batches[0])

    def loss_fn(p):
        return bb.stage2_loss(p, b0["refer_feats"], b0["text_ids"],
                              bank.target, b0["labels"], impl="xla")

    our_grads = jax.grad(loss_fn)(params0)
    cfg_v, cfg_m = bb.vit_cfg, bb.med_cfg
    ref_grads = jax.tree_util.tree_map(np.asarray, convert_blip_retrieval(
        grads_sd0, cfg_v.layers, cfg_m.num_layers))
    mask = _flat(trainable_mask(params0, bb.trainable_filter))
    flat_og, flat_rg = _flat(our_grads), _flat(ref_grads)
    np.testing.assert_allclose(np.asarray(flat_og[("params", "tau")]),
                               tau_grad0, atol=1e-5, rtol=1e-3)
    for key, trainable in mask.items():
        if not trainable:
            continue
        np.testing.assert_allclose(
            np.asarray(flat_og[key]), flat_rg[key], atol=2e-5, rtol=2e-3,
            err_msg=f"grad mismatch at {key}")

    # rung 2: per-step losses
    np.testing.assert_allclose(our_losses, ref_losses, atol=5e-5, rtol=1e-5)

    # rung 3: post-training params — trainable leaves (incl. tau) match;
    # frozen leaves bit-unchanged on both sides (torch skipped them because
    # their grads stayed None; our mask must have excluded exactly those)
    after_sd = dict(oracle.blip.state_dict())
    after_sd["tau"] = oracle.tau.detach()
    ref_after = jax.tree_util.tree_map(np.asarray, convert_blip_retrieval(
        after_sd, cfg_v.layers, cfg_m.num_layers))
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
    assert moved > 50 * 3e-5, moved
    # tau actually trained (learnable temperature, quirk §8.10)
    assert abs(float(flat_ours[("params", "tau")]) - TAU0) > 1e-5
