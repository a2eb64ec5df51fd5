"""Utility-layer tests: checkpointing, logging, seeding, optimizer config."""

import io
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spn4cir_tpu.utils.checkpoint import CheckpointManager, load_model, save_model
from spn4cir_tpu.utils.logging import MetricLogger, RunningAverage, StepTimer
from spn4cir_tpu.utils.seeding import seed_everything


def test_save_load_model_roundtrip(tmp_path):
    params = {"params": {"w": jnp.arange(6.0).reshape(2, 3),
                         "b": jnp.zeros(3)}}
    path = str(tmp_path / "best.msgpack")
    save_model(path, params, epoch=3, extra={"score": 42.5})
    loaded, meta = load_model(path, params)
    np.testing.assert_array_equal(np.asarray(loaded["params"]["w"]),
                                  np.asarray(params["params"]["w"]))
    assert meta["epoch"] == 3 and meta["score"] == 42.5


def test_checkpoint_manager_resume(tmp_path):
    from spn4cir_tpu.models.api import build_backbone
    from spn4cir_tpu.train.stage2 import create_train_state

    bb = build_backbone("clip", clip_model_name="test-tiny")
    params = bb.init_params(jax.random.PRNGKey(0))
    state = create_train_state(bb, params, 1e-3)
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(2, state)
    mgr.wait()
    assert mgr.latest_step() == 2
    restored, step = mgr.restore(state)
    assert step == 2
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]))


def test_running_average():
    avg = RunningAverage()
    for v in (1.0, 2.0, 3.0):
        avg.update(v)
    assert avg() == 2.0


def test_metric_logger_json_lines():
    buf = io.StringIO()
    logger = MetricLogger(stream=buf, prefix="test")
    logger.log(0, loss=1.5)
    logger.log(1, loss=1.2, lr=1e-4)
    lines = [json.loads(l) for l in buf.getvalue().strip().split("\n")]
    assert lines[0]["step"] == 0 and lines[0]["loss"] == 1.5
    assert lines[1]["lr"] == 1e-4 and lines[1]["tag"] == "test"


def test_step_timer():
    import time

    t = StepTimer(warmup=1)
    for _ in range(4):
        t.start()
        time.sleep(0.01)
        t.stop(items=10)
    assert t.mean_step_s > 0.005
    assert t.items_per_s > 100


def test_seed_everything_deterministic():
    import random

    k1 = seed_everything(7)
    a = (random.random(), np.random.rand(), jax.random.uniform(k1, ()))
    k2 = seed_everything(7)
    b = (random.random(), np.random.rand(), jax.random.uniform(k2, ()))
    assert a[0] == b[0] and a[1] == b[1] and float(a[2]) == float(b[2])


def test_backbone_optimizer_kwargs():
    from spn4cir_tpu.models.api import build_backbone

    clip = build_backbone("clip", clip_model_name="test-tiny")
    assert clip.optimizer_kwargs()["b2"] == 0.999
    blip2 = build_backbone("blip2", blip2_size="test-tiny")
    kw = blip2.optimizer_kwargs()
    assert kw["b2"] == 0.98 and kw["weight_decay"] == 0.05


def test_lr_schedules():
    from spn4cir_tpu.train.stage2 import make_lr_schedule

    s = make_lr_schedule("cosine", 1e-3, steps_per_epoch=10, num_epochs=2,
                         warmup_steps=5)
    assert float(s(0)) == 0.0
    assert abs(float(s(5)) - 1e-3) < 1e-9
    assert float(s(20)) < 1e-4
    assert make_lr_schedule("constant", 1e-3, 10, 2) == 1e-3
    lin = make_lr_schedule("linear", 1e-3, 10, 2)
    assert abs(float(lin(0)) - 1e-3) < 1e-9
    with pytest.raises(ValueError):
        make_lr_schedule("nope", 1e-3, 10, 2)


def test_bert_vocab_from_file(tmp_path):
    from spn4cir_tpu.tokenizer.wordpiece import BertTokenizer, tiny_test_vocab

    path = str(tmp_path / "vocab.txt")
    with open(path, "w") as f:
        f.write("\n".join(tiny_test_vocab()))
    tok = BertTokenizer(vocab_path=path)
    assert tok.encode("a dress") == [tok.vocab["a"], tok.vocab["dress"]]
    # env-var resolution
    os.environ["SPN4CIR_BERT_VOCAB"] = path
    try:
        tok2 = BertTokenizer()
        assert tok2.vocab_size == tok.vocab_size
    finally:
        del os.environ["SPN4CIR_BERT_VOCAB"]


def test_use_cc_dataset(tmp_path):
    """zscir --use_cc consumes cap.cc.train.json (FIQ) / cap.rc2.train.cc
    .json; CC triplets carry full external image PATHS (the reference skips
    the name join for them, zscir/data_utils.py:159) and REPLACE the human
    triplets under the zs loader semantics."""
    import json as _json

    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from tests.fixtures import make_fiq

    root = make_fiq(str(tmp_path / "fiq"), extended=False)
    base = CIRDataset("fiq", "train", "relative",
                      ImageTransform("targetpad", 32), root, ["dress"])
    # external CC images: paths live OUTSIDE the dataset image dir
    cc = [{"reference": os.path.join(root, "images",
                                     f"{base.imagenames[0]}.png"),
           "reference_name": "http://cc/0",
           "target": os.path.join(root, "images",
                                  f"{base.imagenames[1]}.png"),
           "target_name": "http://cc/1",
           "captions": ["cc style caption"]}]
    with open(os.path.join(root, "captions", "cap.cc.train.json"), "w") as f:
        _json.dump(cc, f)
    ds = CIRDataset("fiq", "train", "relative",
                    ImageTransform("targetpad", 32), root, ["dress"],
                    plus=True, use_cc=True)
    assert len(ds) == len(base) + 1  # non-zs: appended
    assert ds.triplets[-1]["captions"] == ["cc style caption"]
    # CC names resolve to their carried paths in the id maps
    assert ds.imagepaths[ds.imagename2id["http://cc/0"]] == cc[0]["reference"]

    zs = CIRDataset("fiq", "train", "relative",
                    ImageTransform("targetpad", 32), root, ["dress"],
                    use_cc=True, replace_extended=True)
    assert len(zs) == 1  # zs: generated-only train set
    assert zs.N == 0  # cc captions pick by random.choice
    assert zs.triplets[0]["reference"] == cc[0]["reference"]


def test_optimizer_never_touches_stats_or_logit_scale():
    """torch AdamW skips grad-None params; our masked optimizers must
    likewise leave BatchNorm batch_stats and CLIP's loss-unused logit_scale
    untouched (unmasked weight decay would shrink them every step)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spn4cir_tpu.models.clip import CLIP, CLIPConfig
    from spn4cir_tpu.train.stage1 import create_stage1_state
    from spn4cir_tpu.train.stage2 import create_train_state

    cfg = CLIPConfig(16, 64, (1, 1, 1, 1), 8, None, context_length=77,
                     transformer_width=16, transformer_heads=2,
                     transformer_layers=1)
    model = CLIP(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)),
                           jnp.zeros((1, 77), jnp.int32))
    assert "batch_stats" in variables  # ResNet tower

    class FakeBackbone:
        trainable_filter = staticmethod(lambda path: True)
        optimizer_kwargs = staticmethod(lambda: {})

    for make in (lambda: create_stage1_state(FakeBackbone(), variables, 1e-2),
                 lambda: create_train_state(FakeBackbone(), variables, 1e-2)):
        state = make()
        # grads: ones on everything — stats/logit_scale must still not move
        grads = jax.tree_util.tree_map(jnp.ones_like, variables)
        new_state = state.apply_gradients(grads=grads)
        np.testing.assert_array_equal(
            np.asarray(new_state.params["params"]["logit_scale"]),
            np.asarray(variables["params"]["logit_scale"]))
        old_bs = jax.tree_util.tree_leaves(variables["batch_stats"])
        new_bs = jax.tree_util.tree_leaves(new_state.params["batch_stats"])
        for a, b in zip(old_bs, new_bs):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and ordinary weights DID move
        assert not np.allclose(
            np.asarray(new_state.params["params"]["text"]["token_embedding"]),
            np.asarray(variables["params"]["text"]["token_embedding"]))


def test_use_cc_with_dedup_map_and_llmcap(tmp_path):
    """Two review regressions: (a) optimized_images.json must not wipe CC
    names out of the id maps; (b) --llmcap substitutes llm_caption for CC
    triplets like the in-domain extended files."""
    import json as _json

    from spn4cir_tpu.data.datasets import CIRDataset
    from spn4cir_tpu.data.transforms import ImageTransform
    from spn4cir_tpu.datagen.dedup import deduplicate
    from tests.fixtures import make_fiq

    root = make_fiq(str(tmp_path / "fiq"), extended=False)
    base = CIRDataset("fiq", "train", "relative",
                      ImageTransform("targetpad", 32), root, ["dress"])
    deduplicate(base, root)  # writes optimized_images.json
    cc = [{"reference": base.imagepaths[0], "reference_name": "http://cc/0",
           "target": base.imagepaths[1], "target_name": "http://cc/1",
           "captions": ["template cap"], "llm_caption": "LLM REWRITTEN"}]
    with open(os.path.join(root, "captions", "cap.cc.train.json"), "w") as f:
        _json.dump(cc, f)
    ds = CIRDataset("fiq", "train", "relative",
                    ImageTransform("targetpad", 32), root, ["dress"],
                    use_cc=True, llmcap=True, replace_extended=True)
    # (a) id maps resolve the CC names even with the dedup override loaded
    assert ds.imagepaths[ds.imagename2id["http://cc/0"]] == base.imagepaths[0]
    row = ds[0]  # train relative getitem: must not KeyError
    # (b) llm_caption substituted
    assert ds.triplets[0]["captions"] == ["LLM REWRITTEN"]
    assert row[0] is not None


def test_env_jax_platforms_outranks_plugin_override():
    """spn4cir_tpu import puts an explicitly-set JAX_PLATFORMS env var back
    in charge when a plugin sitecustomize config.update()'d it away (the
    axon TPU plugin does; CLIs were un-forceable to CPU and hung on a dead
    tunnel)."""
    import subprocess
    import sys

    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'tpu')  # plugin-style override\n"
        "import spn4cir_tpu\n"
        "assert jax.config.jax_platforms == 'cpu', jax.config.jax_platforms\n"
        "print('restored')\n")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=120,
                       cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert r.returncode == 0, r.stderr[-1000:]
    assert "restored" in r.stdout
