"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY.md §4: this is how "multi-node" is tested without a TPU pod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.models.api import build_backbone
from spn4cir_tpu.ops import bank_infonce as xla_bank_infonce
from spn4cir_tpu.parallel.loss import pad_bank_rows, sharded_bank_infonce
from spn4cir_tpu.parallel.mesh import (
    AXIS_BANK,
    AXIS_DATA,
    make_mesh,
    put_bank,
    replicate,
    shard_batch,
)
from spn4cir_tpu.parallel.train import make_sharded_stage2_step
from spn4cir_tpu.train.stage2 import create_train_state


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.mark.parametrize("data,bank", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_loss_matches_xla(rng, data, bank):
    mesh = make_mesh(data=data, bank=bank)
    b, m, d = 16, 100, 32
    q = jnp.array(_norm(rng.randn(b, d)).astype(np.float32))
    bk = jnp.array(_norm(rng.randn(m, d)).astype(np.float32))
    labels = jnp.array(rng.randint(0, m, size=b))
    tau = 0.05
    padded = pad_bank_rows(bk, bank)
    got = float(sharded_bank_infonce(q, padded, labels, tau, mesh, m_actual=m))
    want = float(xla_bank_infonce(q, bk, labels, tau))
    assert abs(got - want) < 1e-5


def test_sharded_loss_grad_matches(rng):
    mesh = make_mesh(data=4, bank=2)
    b, m, d = 8, 64, 16
    q = jnp.array(_norm(rng.randn(b, d)).astype(np.float32))
    bk = jnp.array(_norm(rng.randn(m, d)).astype(np.float32))
    labels = jnp.array(rng.randint(0, m, size=b))

    g_sh = jax.grad(lambda q_: sharded_bank_infonce(q_, bk, labels, 0.05, mesh))(q)
    g_ref = jax.grad(lambda q_: xla_bank_infonce(q_, bk, labels, 0.05))(q)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-4)


def test_sharded_stage2_step_runs_and_matches_single(rng):
    backbone = build_backbone("clip", clip_model_name="test-tiny", tau=0.05)
    params = backbone.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(data=4, bank=2)

    b, m = 8, 40
    refer = jnp.array(rng.randn(b, backbone.embed_dim).astype(np.float32))
    text_ids = jnp.asarray(backbone.tokenize(["caption %d" % i for i in range(b)]))
    bank = jnp.array(_norm(rng.randn(m, backbone.embed_dim)).astype(np.float32))
    labels = jnp.array(rng.randint(0, m, size=b))

    state = create_train_state(backbone, params, learning_rate=1e-3)
    step = make_sharded_stage2_step(backbone, mesh, m_actual=m)

    state_r = replicate(state, mesh)
    batch = shard_batch(
        {"refer_feats": refer, "text_ids": text_ids, "labels": labels}, mesh)
    bank_sh = put_bank(pad_bank_rows(bank, 2), mesh)

    new_state, loss = step(state_r, bank_sh, batch)
    # compare against the single-device loss at the same params
    from spn4cir_tpu.train.stage2 import stage2_train_step

    state1 = create_train_state(backbone, params, learning_rate=1e-3)
    _, loss1 = stage2_train_step(
        backbone, state1,
        bank, {"refer_feats": refer, "text_ids": text_ids, "labels": labels},
        "xla")
    assert abs(float(loss) - float(loss1)) < 1e-5
    assert int(new_state.step) == 1


def test_mesh_helpers():
    mesh = make_mesh(data=2, bank=4)
    assert mesh.shape[AXIS_DATA] == 2 and mesh.shape[AXIS_BANK] == 4
    x = jnp.zeros((8, 4))
    sharded = shard_batch(x, mesh)
    assert sharded.sharding.spec == jax.sharding.PartitionSpec(AXIS_DATA)


@pytest.mark.parametrize("data,bank", [(4, 2), (2, 4)])
def test_sharded_max_query_matches_xla(rng, data, bank):
    from spn4cir_tpu.ops.infonce import max_query_infonce as xla_mq
    from spn4cir_tpu.parallel.loss import sharded_max_query_infonce

    mesh = make_mesh(data=data, bank=bank)
    b, m, nq, d = 8, 30, 4, 16
    feats = jnp.asarray(_norm(rng.randn(b, d)).astype(np.float32))
    bk = jnp.asarray(_norm(rng.randn(m, nq, d)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, m, size=b))
    tau = 0.05
    padded = pad_bank_rows(bk, bank)
    got = float(sharded_max_query_infonce(feats, padded, labels, tau, mesh,
                                          m_actual=m))
    want = float(xla_mq(feats, bk, labels, tau))
    assert abs(got - want) < 1e-5
    # grads
    g_sh = jax.grad(lambda f: sharded_max_query_infonce(
        f, padded, labels, tau, mesh, m_actual=m))(feats)
    g_ref = jax.grad(lambda f: xla_mq(f, bk, labels, tau))(feats)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-4)


def test_sharded_gallery_indexing(rng, tmp_path):
    """extract_index_features with a mesh shards the encode over 'data' and
    matches the single-device result."""
    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.eval.retrieval import extract_index_features
    from tests.fixtures import make_fiq

    bb = build_backbone("clip", clip_model_name="test-tiny")
    params = bb.init_params(jax.random.PRNGKey(0))
    root = make_fiq(str(tmp_path / "fiq"))
    ds = CIRDataset("fiq", "val", "classic", ImageTransform("targetpad", 32),
                    root, ["dress"])
    mesh = make_mesh(data=4, bank=2)
    sharded = extract_index_features(bb, params, ds, batch_size=4,
                                     num_workers=0, mesh=mesh)
    plain = extract_index_features(bb, params, ds, batch_size=4, num_workers=0)
    np.testing.assert_allclose(np.asarray(sharded.target),
                               np.asarray(plain.target), atol=1e-5)


def test_sharded_step_trains_blip4cir_tau():
    """The sharded stage-2 step must read blip4cir's LIVE learnable tau from
    params (quirk SURVEY.md §8.10) — not freeze the static init value."""
    import numpy as np

    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.parallel.train import make_sharded_stage2_step
    from spn4cir_tpu.train.stage2 import create_train_state

    bb = build_backbone("blip", blip_size="test-tiny", tau=0.05)
    params = bb.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(data=2, bank=2, devices=jax.devices()[:4])
    rng = np.random.RandomState(0)
    b, m = 4, 9
    refer = jnp.asarray(rng.randn(b, *bb.bank_spec().refer_shape).astype(np.float32))
    bank = rng.randn(m, bb.embed_dim).astype(np.float32)
    bank = jnp.asarray(bank / np.linalg.norm(bank, axis=-1, keepdims=True))
    text = jnp.asarray(bb.tokenize([f"caption {i}" for i in range(b)]))
    labels = jnp.asarray(rng.randint(0, m, b))

    state = replicate(create_train_state(bb, params, 1e-2), mesh)
    batch = shard_batch({"refer_feats": refer, "text_ids": text,
                         "labels": labels}, mesh)
    bank_p = put_bank(pad_bank_rows(bank, 2), mesh)
    step = make_sharded_stage2_step(bb, mesh, m_actual=m)
    new_state, loss = step(state, bank_p, batch)
    tau0 = float(state.params["params"]["tau"])
    tau1 = float(new_state.params["params"]["tau"])
    assert np.isfinite(float(loss))
    assert tau1 != tau0, "learnable tau did not receive a gradient"


def test_sharded_step_blip2_matches_single_chip():
    """The blip2 sharded step (max-over-query loss over a bank-sharded
    (M, Q, D) bank) must equal the single-chip stage2_loss."""
    import numpy as np

    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.parallel.train import make_sharded_stage2_step
    from spn4cir_tpu.train.stage2 import create_train_state

    bb = build_backbone("blip2", blip2_size="test-tiny")
    params = bb.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(data=2, bank=2, devices=jax.devices()[:4])
    rng = np.random.RandomState(0)
    b, m = 4, 7
    spec = bb.bank_spec()
    refer = jnp.asarray(rng.randn(b, *spec.refer_shape).astype(np.float32))
    bank = rng.randn(m, *spec.target_shape).astype(np.float32)
    bank = jnp.asarray(bank / np.linalg.norm(bank, axis=-1, keepdims=True))
    text = jnp.asarray(bb.tokenize([f"caption {i}" for i in range(b)]))
    labels = jnp.asarray(rng.randint(0, m, b))

    want = float(bb.stage2_loss(params, refer, text, bank, labels,
                                impl="xla"))

    state = replicate(create_train_state(bb, params, 1e-3), mesh)
    batch = shard_batch({"refer_feats": refer, "text_ids": text,
                         "labels": labels}, mesh)
    bank_p = put_bank(pad_bank_rows(bank, 2), mesh)
    step = make_sharded_stage2_step(bb, mesh, m_actual=m)
    new_state, loss = step(state, bank_p, batch)
    assert abs(float(loss) - want) < 1e-5, (float(loss), want)
    assert int(new_state.step) == 1


def test_sharded_int8_bank_loss_matches_dequant_oracle(rng):
    """2-D QuantBank sharded over 'bank': loss equals the XLA loss on the
    dequantized bank (scales travel with their row shards)."""
    from spn4cir_tpu.ops.bank_kernels import quantize_bank

    q = jnp.asarray(rng.randn(8, 16).astype(np.float32))
    bank = rng.randn(50, 16).astype(np.float32)
    labels = jnp.asarray(rng.randint(0, 50, (8,)), jnp.int32)
    qb = quantize_bank(bank)
    mesh = make_mesh(data=2, bank=4)
    got = float(sharded_bank_infonce(q, pad_bank_rows(qb, 4), labels, 0.05,
                                     mesh, m_actual=50))
    want = float(xla_bank_infonce(
        q, jnp.asarray(np.asarray(qb.dequantize())), labels, 0.05))
    assert abs(got - want) < 1e-5, (got, want)


def test_sharded_int8_max_query_matches_dequant_oracle(rng):
    """3-D QuantBank (blip2 fusion bank) sharded over 'bank'."""
    from spn4cir_tpu.ops import infonce as ref_ops
    from spn4cir_tpu.ops.bank_kernels import quantize_bank
    from spn4cir_tpu.parallel.loss import sharded_max_query_infonce

    feats = jnp.asarray(rng.randn(8, 12).astype(np.float32))
    bank3 = rng.randn(30, 4, 12).astype(np.float32)
    labels = jnp.asarray(rng.randint(0, 30, (8,)), jnp.int32)
    qb3 = quantize_bank(bank3)
    mesh = make_mesh(data=2, bank=4)
    got = float(sharded_max_query_infonce(
        feats, pad_bank_rows(qb3, 4), labels, 0.05, mesh, m_actual=30))
    want = float(ref_ops.max_query_infonce(
        feats, jnp.asarray(np.asarray(qb3.dequantize())), labels, 0.05))
    assert abs(got - want) < 1e-5, (got, want)


def test_int8_max_query_single_chip_dispatch(rng):
    """blip2 single-chip int8: max_query_infonce accepts a 3-D QuantBank
    and dequantizes AFTER the contraction."""
    from spn4cir_tpu.ops import infonce as ref_ops
    from spn4cir_tpu.ops.bank_kernels import quantize_bank
    from spn4cir_tpu.ops.maxquery_kernels import max_query_infonce

    feats = jnp.asarray(rng.randn(6, 12).astype(np.float32))
    bank3 = rng.randn(20, 4, 12).astype(np.float32)
    labels = jnp.asarray(rng.randint(0, 20, (6,)), jnp.int32)
    qb3 = quantize_bank(bank3)
    got = float(max_query_infonce(feats, qb3, labels, 0.05))
    want = float(ref_ops.max_query_infonce(
        feats, jnp.asarray(np.asarray(qb3.dequantize())), labels, 0.05))
    # scale-after-max vs scale-before-max round differently; relative check
    assert abs(got - want) < 1e-6 * max(1.0, abs(want))


def test_three_axis_blip2_step_matches_single_chip():
    """The VERDICT round-3 deliverable: blip2 stage-2 on a (2, 2, 2)
    data x bank x model mesh — TP-sharded live tower (GSPMD) composed with
    the bank-sharded max-query loss (shard_map) in ONE jitted step —
    matches the single-chip loss, fp32 AND int8."""
    from spn4cir_tpu.ops.bank_kernels import quantize_bank
    from spn4cir_tpu.parallel.train import tp_state_shardings

    bb = build_backbone("blip2", blip2_size="test-tiny")
    params = bb.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(data=2, bank=2, model=2)
    rng = np.random.RandomState(0)
    b, m = 4, 7
    spec = bb.bank_spec()
    refer = jnp.asarray(rng.randn(b, *spec.refer_shape).astype(np.float32))
    bank = rng.randn(m, *spec.target_shape).astype(np.float32)
    bank = jnp.asarray(bank / np.linalg.norm(bank, axis=-1, keepdims=True))
    text = jnp.asarray(bb.tokenize([f"caption {i}" for i in range(b)]))
    labels = jnp.asarray(rng.randint(0, m, b))
    want = float(bb.stage2_loss(params, refer, text, bank, labels,
                                impl="xla"))

    state = create_train_state(bb, params, 1e-3)
    sharded_state = jax.device_put(state, tp_state_shardings(state, mesh))
    assert any("model" in str(getattr(leaf.sharding, "spec", ""))
               for leaf in jax.tree_util.tree_leaves(sharded_state)
               if hasattr(leaf, "sharding")), "nothing TP-sharded"
    batch = shard_batch({"refer_feats": refer, "text_ids": text,
                         "labels": labels}, mesh)
    step = make_sharded_stage2_step(bb, mesh, m_actual=m,
                                    state_template=state)
    new_state, loss = step(sharded_state, put_bank(pad_bank_rows(bank, 2),
                                                   mesh), batch)
    assert abs(float(loss) - want) < 1e-5, (float(loss), want)
    assert int(new_state.step) == 1

    qb = quantize_bank(np.asarray(bank))
    want_q = float(bb.stage2_loss(
        params, refer, text, jnp.asarray(np.asarray(qb.dequantize())),
        labels, impl="xla"))
    _, loss_q = step(sharded_state, put_bank(pad_bank_rows(qb, 2), mesh),
                     batch)
    assert abs(float(loss_q) - want_q) < 1e-5, (float(loss_q), want_q)


def test_sharded_step_dropout_matches_single_chip():
    """--dropout on a mesh (MED-family): the sharded step with a replicated
    dropout_rng must reproduce the single-chip train-mode loss for the same
    key (JAX's counter-based PRNG makes the mask sharding-invariant), and
    differ from the no-dropout loss."""
    bb = build_backbone("blip", blip_size="test-tiny", tau=0.05,
                        dropout=0.1)
    params = bb.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(data=2, bank=2, devices=jax.devices()[:4])
    rng = np.random.RandomState(0)
    b, m = 4, 9
    refer = jnp.asarray(
        rng.randn(b, *bb.bank_spec().refer_shape).astype(np.float32))
    bank = rng.randn(m, bb.embed_dim).astype(np.float32)
    bank = jnp.asarray(bank / np.linalg.norm(bank, axis=-1, keepdims=True))
    text = jnp.asarray(bb.tokenize([f"caption {i}" for i in range(b)]))
    labels = jnp.asarray(rng.randint(0, m, b))
    key = jax.random.PRNGKey(7)

    want = float(bb.stage2_loss(params, refer, text, bank, labels,
                                impl="xla", dropout_rng=key))
    want_nodrop = float(bb.stage2_loss(params, refer, text, bank, labels,
                                       impl="xla"))
    assert abs(want - want_nodrop) > 1e-6, "dropout had no effect"

    state = replicate(create_train_state(bb, params, 1e-3), mesh)
    batch = shard_batch({"refer_feats": refer, "text_ids": text,
                         "labels": labels}, mesh)
    batch["dropout_rng"] = replicate(key, mesh)
    step = make_sharded_stage2_step(bb, mesh, m_actual=m, with_dropout=True)
    new_state, loss = step(state, put_bank(pad_bank_rows(bank, 2), mesh),
                           batch)
    assert abs(float(loss) - want) < 1e-5, (float(loss), want)
    assert int(new_state.step) == 1


# ---------------------------------------------------------------------------
# Stage-1 (--wo_bank) over the mesh
# ---------------------------------------------------------------------------

def _stage1_inputs(bb, rng, b=8):
    refer = jnp.asarray(
        rng.randn(b, bb.input_dim, bb.input_dim, 3).astype(np.float32))
    target = jnp.asarray(
        rng.randn(b, bb.input_dim, bb.input_dim, 3).astype(np.float32))
    text = jnp.asarray(bb.tokenize([f"caption {i}" for i in range(b)]))
    return {"refer_images": refer, "target_images": target, "text_ids": text}


@pytest.mark.parametrize("data,model", [(8, 1), (4, 2)])
def test_sharded_stage1_step_matches_single(rng, data, model):
    """Data-parallel (and data x TP) stage-1: the in-batch InfoNCE couples
    every query with the GLOBAL batch, so K sharded steps must reproduce
    the single-chip losses and final params exactly."""
    from spn4cir_tpu.parallel.train import (make_sharded_stage1_step,
                                            tp_state_shardings)
    from spn4cir_tpu.train.stage1 import create_stage1_state, stage1_train_step

    bb = build_backbone("clip", clip_model_name="test-tiny", tau=0.05)
    params = bb.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(data=data, model=model)
    batches = [_stage1_inputs(bb, rng) for _ in range(3)]

    state1 = create_stage1_state(bb, params, 1e-3)
    single_losses = []
    for batch in batches:
        state1, loss = stage1_train_step(bb, state1, batch)
        single_losses.append(float(loss))

    state_m = create_stage1_state(bb, params, 1e-3)
    if model > 1:
        template = state_m
        state_m = jax.device_put(state_m, tp_state_shardings(state_m, mesh))
        step = make_sharded_stage1_step(bb, mesh, state_template=template)
    else:
        state_m = replicate(state_m, mesh)
        step = make_sharded_stage1_step(bb, mesh)
    mesh_losses = []
    for batch in batches:
        state_m, loss = step(state_m, shard_batch(batch, mesh))
        mesh_losses.append(float(loss))

    np.testing.assert_allclose(mesh_losses, single_losses, atol=2e-5,
                               rtol=1e-5)
    # params: AdamW normalizes by sqrt(v)+eps, so a ~1e-7 reduction-order
    # difference in a near-zero gradient flips an O(lr) update — exact
    # equality is unattainable across collective orders. Losses matching
    # at steps 2-3 already prove step-1/2 params were equivalent; this
    # bound catches structural divergence (a missing all-gather shifts
    # params by O(lr * K)).
    flat1 = jax.tree_util.tree_map(np.asarray, state1.params)
    flatm = jax.tree_util.tree_map(np.asarray, state_m.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-3),
        flat1, flatm)


def test_sharded_stage1_negtype_matches_single(rng):
    """--neg_type composes with the mesh: the 4-flavor ablation losses are
    batch-global matmuls; the sharded value must equal single-chip."""
    from spn4cir_tpu.parallel.train import make_sharded_stage1_step
    from spn4cir_tpu.train.stage1 import create_stage1_state, stage1_train_step

    bb = build_backbone("clip", clip_model_name="test-tiny", tau=0.05)
    params = bb.init_params(jax.random.PRNGKey(1))
    mesh = make_mesh(data=8)
    batch = _stage1_inputs(bb, rng)

    state1 = create_stage1_state(bb, params, 1e-3)
    _, want = stage1_train_step(bb, state1, batch, 6)

    state_m = replicate(create_stage1_state(bb, params, 1e-3), mesh)
    step = make_sharded_stage1_step(bb, mesh, neg_type=6)
    _, got = step(state_m, shard_batch(batch, mesh))
    assert float(got) == pytest.approx(float(want), abs=2e-5)


def test_sharded_stage1_dropout_matches_single_chip(rng):
    """MED-family stage-1 dropout on the mesh: replicated key, counter-based
    PRNG -> the sharded train-mode loss equals single-chip for the same key
    and differs from the no-dropout loss."""
    from spn4cir_tpu.parallel.train import make_sharded_stage1_step
    from spn4cir_tpu.train.stage1 import create_stage1_state, stage1_train_step

    bb = build_backbone("blip", blip_size="test-tiny", tau=0.05, dropout=0.1)
    params = bb.init_params(jax.random.PRNGKey(2))
    mesh = make_mesh(data=4, devices=jax.devices()[:4])
    batch = _stage1_inputs(bb, rng, b=4)
    key = jax.random.PRNGKey(7)

    want = float(bb.stage1_loss(params, batch["refer_images"],
                                batch["target_images"], batch["text_ids"],
                                dropout_rng=key))
    want_nodrop = float(bb.stage1_loss(params, batch["refer_images"],
                                       batch["target_images"],
                                       batch["text_ids"]))
    assert abs(want - want_nodrop) > 1e-6, "dropout had no effect"

    state_m = replicate(create_stage1_state(bb, params, 1e-3), mesh)
    step = make_sharded_stage1_step(bb, mesh, with_dropout=True)
    sbatch = shard_batch(batch, mesh)
    sbatch["dropout_rng"] = replicate(key, mesh)
    _, got = step(state_m, sbatch)
    assert float(got) == pytest.approx(want, abs=2e-5)
