"""Subprocess body for the multi-host smoke test (tests/test_distributed.py).

Runs one of N processes, each with 4 virtual CPU devices, initializes
jax.distributed through `initialize_distributed`'s env-var gate
(SPN4CIR_DIST_*), then executes the production sharded stage-2 train step
(`make_sharded_stage2_step`) over the 8-device global mesh and checks the
loss against the single-device XLA value computed locally.

This is the TPU-native equivalent of the reference's NCCL multi-process
bring-up (`blip24cir/lavis/common/dist_utils.py:57-91`), exercised for real:
two OS processes, cross-process collectives (Gloo on CPU; ICI/DCN on TPU).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    from spn4cir_tpu.parallel.mesh import initialize_distributed

    assert initialize_distributed(), "env-var gate should trigger init"
    assert jax.process_count() == int(os.environ["SPN4CIR_DIST_NPROCS"])
    assert jax.device_count() == 8, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.ops import bank_infonce
    from spn4cir_tpu.parallel.loss import pad_bank_rows
    from spn4cir_tpu.parallel.mesh import (
        bank_sharding,
        batch_sharding,
        make_mesh,
        replicated,
    )
    from spn4cir_tpu.parallel.train import make_sharded_stage2_step
    from spn4cir_tpu.train.stage2 import create_train_state

    backbone = build_backbone("clip", clip_model_name="test-tiny", tau=0.05)
    params = backbone.init_params(jax.random.PRNGKey(0))
    mesh = make_mesh(data=4, bank=2)

    rng = np.random.RandomState(0)
    b, m = 8, 40
    refer = rng.randn(b, backbone.embed_dim).astype(np.float32)
    text_ids = np.asarray(backbone.tokenize([f"caption {i}" for i in range(b)]))
    bank = rng.randn(m, backbone.embed_dim).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    labels = rng.randint(0, m, size=b)

    def put(full, sharding):
        return jax.make_array_from_callback(
            full.shape, sharding, lambda idx: full[idx])

    bsh, ksh, rep = batch_sharding(mesh), bank_sharding(mesh), replicated(mesh)
    batch = {
        "refer_feats": put(refer, bsh),
        "text_ids": put(text_ids, bsh),
        "labels": put(labels, bsh),
    }
    bank_padded = put(np.asarray(pad_bank_rows(jnp.asarray(bank), 2)), ksh)
    state = create_train_state(backbone, params, learning_rate=1e-3)
    state = jax.tree_util.tree_map(
        lambda x: put(np.asarray(x), rep) if hasattr(x, "shape") else x, state)

    step = make_sharded_stage2_step(backbone, mesh, m_actual=m)
    new_state, loss = step(state, bank_padded, batch)
    got = float(loss)

    # single-device oracle, computed locally on this process
    query = backbone.fuse(params, jnp.asarray(refer), jnp.asarray(text_ids))
    want = float(bank_infonce(query, jnp.asarray(bank), jnp.asarray(labels), 0.05))
    assert abs(got - want) < 1e-5, (got, want)
    assert int(new_state.step) == 1

    # 3-axis multi-host: TP (model) + bank intra-"slice", data across the
    # two processes — the full composed production step with cross-process
    # collectives, on the SAME make_hybrid_mesh code path the CLI runs on
    # real pods (each process is the DCN granule here; the data axis spans
    # processes, bank and model stay within one)
    from spn4cir_tpu.parallel.mesh import make_hybrid_mesh
    from spn4cir_tpu.parallel.train import tp_state_shardings

    bb2 = build_backbone("blip2", blip2_size="test-tiny")
    p2 = bb2.init_params(jax.random.PRNGKey(0))
    mesh3 = make_hybrid_mesh(bank=2, model=2)
    assert dict(mesh3.shape) == {"data": 2, "bank": 2, "model": 2}, mesh3
    spec2 = bb2.bank_spec()
    b2, m2 = 4, 9
    refer2 = rng.randn(b2, *spec2.refer_shape).astype(np.float32)
    bank2 = rng.randn(m2, *spec2.target_shape).astype(np.float32)
    bank2 /= np.linalg.norm(bank2, axis=-1, keepdims=True)
    text2 = np.asarray(bb2.tokenize([f"cap {i}" for i in range(b2)]))
    labels2 = rng.randint(0, m2, size=b2)

    state2 = create_train_state(bb2, p2, 1e-3)
    shardings2 = tp_state_shardings(state2, mesh3)

    def put_tree(tree, shardings):
        return jax.tree_util.tree_map(
            lambda x, sh: (jax.make_array_from_callback(
                np.asarray(x).shape, sh,
                lambda idx, a=np.asarray(x): a[idx])
                if hasattr(x, "shape") else x),
            tree, shardings)

    sharded_state2 = put_tree(state2, shardings2)
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch2 = {
        "refer_feats": put(refer2, NamedSharding(mesh3, P("data"))),
        "text_ids": put(text2, NamedSharding(mesh3, P("data"))),
        "labels": put(labels2, NamedSharding(mesh3, P("data"))),
    }
    bank2_p = put(np.asarray(pad_bank_rows(jnp.asarray(bank2), 2)),
                  NamedSharding(mesh3, P("bank")))
    step3 = make_sharded_stage2_step(bb2, mesh3, m_actual=m2,
                                     state_template=state2)
    new_state2, loss3 = step3(sharded_state2, bank2_p, batch2)
    got3 = float(loss3)
    want3 = float(bb2.stage2_loss(p2, jnp.asarray(refer2), jnp.asarray(text2),
                                  jnp.asarray(bank2), jnp.asarray(labels2),
                                  impl="xla"))
    assert abs(got3 - want3) < 1e-5, (got3, want3)
    assert int(new_state2.step) == 1

    # stage-1 (--wo_bank) multi-host: live towers + global-batch in-batch
    # InfoNCE, data axis spanning the two processes, TP intra-process —
    # the mesh the CLI builds for --wo_bank --distributed --mesh_model
    from spn4cir_tpu.parallel.train import make_sharded_stage1_step
    from spn4cir_tpu.train.stage1 import create_stage1_state

    mesh1 = make_hybrid_mesh(bank=1, model=2)
    assert dict(mesh1.shape) == {"data": 4, "bank": 1, "model": 2}, mesh1
    b1 = 8
    refer_im = rng.randn(b1, backbone.input_dim, backbone.input_dim,
                         3).astype(np.float32)
    target_im = rng.randn(b1, backbone.input_dim, backbone.input_dim,
                          3).astype(np.float32)
    text1 = np.asarray(backbone.tokenize([f"mod {i}" for i in range(b1)]))
    s1_state = create_stage1_state(backbone, params, 1e-3)
    s1_shardings = tp_state_shardings(s1_state, mesh1)
    s1_sharded = put_tree(s1_state, s1_shardings)
    dsh1 = NamedSharding(mesh1, P("data"))
    batch1 = {
        "refer_images": put(refer_im, dsh1),
        "target_images": put(target_im, dsh1),
        "text_ids": put(text1, dsh1),
    }
    s1_step = make_sharded_stage1_step(backbone, mesh1,
                                       state_template=s1_state)
    s1_new, s1_loss = s1_step(s1_sharded, batch1)
    got1 = float(s1_loss)
    want1 = float(backbone.stage1_loss(params, jnp.asarray(refer_im),
                                       jnp.asarray(target_im),
                                       jnp.asarray(text1)))
    assert abs(got1 - want1) < 2e-5, (got1, want1)
    assert int(s1_new.step) == 1

    print(f"OK process={jax.process_index()} loss={got:.6f} "
          f"loss3axis={got3:.6f} loss_s1={got1:.6f}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
