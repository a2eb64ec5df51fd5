"""blip24cir (BLIP-2 / SPRC) training-STEP parity: the reference's own
stage-2 training math — `CIRPlus.forward` -> `forward_stage2`'s per-sample
max-over-32-queries loop (`blip2_qformer_cir_align_prompt.py:226-268`) with
the learnable `temp` Parameter, torch AdamW per `blip24cir/train.py:78-80`
(betas (0.9, 0.98), wd 0.05) — as the oracle vs our jitted stage2_train_step
whose loss is the einsum/Pallas max-query kernel.

Beyond the clip/blip variants this certifies:
  - the max-over-query loss BACKWARD (gradient routes only through each
    target's argmax query row),
  - init_stage2's freeze surgery: torch trains Qformer_query + text_proj_q
    + temp and skips everything else INCLUDING Qformer_query's own
    cross-attention and LM-head params (grad=None — the text re-read path
    never touches them); our qformer_query tree must contain exactly the
    leaves that actually train,
  - blip2's own AdamW hyperparameters through optimizer_kwargs.

The oracle banks are built with the reference's get_bank_feats (its own
code) into size-generic buffers keyed the way `forward_stage2` consumes
them — target rows (M, 32, 256). NOTE the reference's own
`extract_bank_features` allocates `torch.zeros((image_id, 256))`
(blip24cir/models.py:52) and then assigns the (B, 32, 256) query feats into
it, which raises a shape mismatch when the cache is actually rebuilt — the
published runs must have consumed pre-built .pth caches; the consuming code
(forward_stage2:256-265, inference) requires (M, 32, 256), which is what we
build here and in bank.extract_fusion_banks.
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

REF_DIR = "/root/reference/blip24cir"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_DIR),
                                reason="reference repo not mounted")

from tests.test_parity_trainstep import _flat  # noqa: E402
from tests.fixtures import make_cirr  # noqa: E402
from tests.test_parity_e2e import TorchPreprocess  # noqa: E402
from tests.test_parity_blip2_e2e import (  # noqa: E402,F401
    ref_modules,
    shared_model,
)

LR = 1e-3
K_STEPS = 4
BATCH = 4


@pytest.fixture()
def ref_cirplus_cls(ref_modules):
    """The REAL blip24cir/models.py (the e2e fixture stubs it because its
    module-level `from lavis.models import load_model_and_preprocess` pulls
    the full config machinery) — satisfy that one symbol on the synthetic
    lavis.models package, import fresh, restore the stub after."""
    lavis_models = sys.modules["lavis.models"]
    had = hasattr(lavis_models, "load_model_and_preprocess")
    lavis_models.load_model_and_preprocess = lambda *a, **k: (None, None,
                                                              None)
    saved = sys.modules.pop("models", None)
    try:
        yield importlib.import_module("models").CIRPlus
    finally:
        sys.modules.pop("models", None)
        if saved is not None:
            sys.modules["models"] = saved
        if not had:
            del lavis_models.load_model_and_preprocess


def _oracle_cirplus(cirplus_cls, blip_model, txt_processors, tau):
    m = cirplus_cls.__new__(cirplus_cls)
    torch.nn.Module.__init__(m)
    m.device = torch.device("cpu")
    m.blip_model = blip_model
    m.txt_processors = txt_processors
    m.tau = tau
    m.plus = False
    m.crossentropy_criterion = torch.nn.CrossEntropyLoss()
    return m


def _extract_banks_like_reference(oracle, ds, utils_mod):
    """models.py:49-81 semantics (its own get_bank_feats calls) with the
    target buffer at the (M, 32, 256) shape forward_stage2 consumes — see
    module docstring for the reference's (M, 256) allocation bug."""
    from torch.utils.data import DataLoader

    blip = oracle.blip_model.eval().float()
    refer_chunks = []
    target_rows = {}
    loader = DataLoader(ds, batch_size=8, num_workers=0,
                        collate_fn=utils_mod.collate_fn)
    for (reference_image, captions, target_image, _index, _t,
         reference_index_all, target_index_all) in loader:
        text = [oracle.txt_processors["eval"](c) for c in captions]
        with torch.no_grad():
            fusion_hidden, target_feats, refer_feats, _fusion = \
                blip.get_bank_feats(reference_image, text, target_image)
        refer_chunks.append(fusion_hidden)
        for i, gid in enumerate(target_index_all.tolist()):
            target_rows[gid] = target_feats[i]
        for i, gid in enumerate(reference_index_all.tolist()):
            target_rows[gid] = refer_feats[i]
    refer_bank = torch.cat(refer_chunks)  # (N, 32, H) by triplet index
    target_bank = torch.stack([target_rows[i] for i in range(ds.image_id)])
    return refer_bank, target_bank


def test_blip2_stage2_trainstep_parity(ref_modules, shared_model,
                                       ref_cirplus_cls, tmp_path):
    from spn4cir_tpu.bank.bank import Bank
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.models.convert import convert_blip2_cir
    from spn4cir_tpu.train.stage2 import (create_train_state,
                                          stage2_train_step, trainable_mask)

    bb, params0, wrapper = shared_model
    root = make_cirr(str(tmp_path / "cirr_dataset"), n_images=16, n_train=8,
                     extended=False)
    tf = ImageTransform("targetpad", bb.input_dim)

    blip_model = copy.deepcopy(wrapper.blip_model)
    # determinism: CIRPlus.forward flips train() mode every step
    # (models.py:117); zero every dropout so train-mode math is exact
    for mod in blip_model.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0
    oracle = _oracle_cirplus(ref_cirplus_cls, blip_model,
                             wrapper.txt_processors, tau=0.05)
    # both sides must start from the same temperature
    assert float(blip_model.temp) == pytest.approx(
        float(np.asarray(params0["params"]["tau"])))

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

    # ---- oracle: K torch AdamW steps (train.py:78-80: blip2's own betas
    # (0.9, 0.98), eps 1e-7, weight_decay 0.05, requires_grad filter)
    opt = torch.optim.AdamW([
        {"params": [p for p in blip_model.parameters() if p.requires_grad],
         "lr": LR, "betas": (0.9, 0.98), "eps": 1e-7,
         "weight_decay": 0.05}])
    ref_losses, grads_sd0 = [], None
    for k, (captions, indexs, _t, target_index_all, reference_index_all) \
            in enumerate(batches):
        opt.zero_grad()
        loss = oracle.forward(list(captions), indexs, target_index_all,
                              reference_index_all)["loss_qtc"]
        loss.backward()
        if k == 0:
            named = dict(blip_model.named_parameters())
            grads_sd0 = {
                key: (named[key].grad.detach().clone()
                      if key in named and named[key].grad is not None
                      else torch.zeros_like(tensor))
                for key, tensor in blip_model.state_dict().items()}
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

    # rung 1: step-1 gradients on every trainable leaf (incl. tau/temp)
    b0 = our_batch(batches[0])

    def loss_fn(p):
        return bb.stage2_loss(p, b0["refer_feats"], b0["text_ids"],
                              bank.target, b0["labels"], impl="xla")

    our_grads = jax.grad(loss_fn)(params0)
    ref_grads = jax.tree_util.tree_map(np.asarray, convert_blip2_cir(
        grads_sd0, num_vit_layers=bb.vit_cfg.layers,
        num_q_layers=bb.q_cfg.num_layers))
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

    # rung 3: post-training params — trainable leaves match (Qformer_query,
    # text_proj_q, temp); frozen leaves bit-unchanged on both sides
    ref_after = jax.tree_util.tree_map(np.asarray, convert_blip2_cir(
        dict(blip_model.state_dict()), num_vit_layers=bb.vit_cfg.layers,
        num_q_layers=bb.q_cfg.num_layers))
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
    # the learnable temperature actually trained (quirk SURVEY.md §8.10)
    assert abs(float(flat_ours[("params", "tau")]) - 0.05) > 1e-5
