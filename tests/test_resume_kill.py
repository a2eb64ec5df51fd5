"""Kill/restart resume proof (VERDICT next #9): SIGKILL the training process
mid-run, restart with --resume, and verify the final parameters are
IDENTICAL to an uninterrupted run. Exercises the real CLI in subprocesses
with the orbax CheckpointManager doing per-epoch full-state saves."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import jax
import pytest

from tests.fixtures import make_fiq

WORKER = os.path.join(os.path.dirname(__file__), "resume_worker.py")
EPOCHS = 3
STEPS_PER_EPOCH = 2  # n_train=8 / batch 4 (checkpoint keys are global steps)


def _run(root, out, extra=(), wait=True):
    cmd = [sys.executable, WORKER, "--dataset", "fiq",
           "--clip-model-name", "test-tiny", "--dress_types", "dress",
           "--data_path", root, "--num-epochs", str(EPOCHS),
           "--batch-size", "4", "--seed", "7", "--resume",
           "--validation-frequency", str(EPOCHS + 99),  # skip val for speed
           "--output_path", out, *extra]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    if not wait:
        return proc
    out_text, _ = proc.communicate(timeout=900)
    assert proc.returncode == 0, out_text[-3000:]
    return out_text


def _final_state(backbone, out, expect_step=EPOCHS * STEPS_PER_EPOCH):
    """Restore the last full training state saved by the CLI."""
    from spn4cir_tpu.train.stage2 import create_train_state
    from spn4cir_tpu.utils.checkpoint import CheckpointManager

    params = backbone.init_params(jax.random.PRNGKey(0))
    template = create_train_state(backbone, params, 2e-4)
    mgr = CheckpointManager(os.path.join(out, "resume"))
    state, step = mgr.restore(template)
    assert step == expect_step, step
    return state


@pytest.mark.slow
def test_sigkill_mid_training_resumes_to_identical_params(tmp_path):
    root = make_fiq(str(tmp_path / "fashionIQ_dataset"), n_images=12,
                    n_train=8, extended=False)
    out_a = str(tmp_path / "runA")
    out_b = str(tmp_path / "runB")

    # uninterrupted run
    _run(root, out_a)

    # interrupted run: SIGKILL once the epoch-1 checkpoint lands — the
    # process then still has ALL of epoch 2 (the final epoch) ahead, so the
    # kill always strikes mid-training (waiting for the LAST checkpoint
    # raced the process's exit and was flaky on the contended 1-core host)
    proc = _run(root, out_b, wait=False)
    ckpt1 = os.path.join(out_b, "resume", str(STEPS_PER_EPOCH))  # epoch 1
    deadline = time.time() + 600
    try:
        while not os.path.isdir(ckpt1):
            if proc.poll() is not None:
                pytest.fail("training exited before the kill point:\n"
                            + proc.stdout.read()[-2000:])
            if time.time() > deadline:
                pytest.fail("timed out waiting for the epoch-1 checkpoint")
            time.sleep(0.1)
        time.sleep(0.5)  # let the async orbax save commit
        os.kill(proc.pid, signal.SIGKILL)
    finally:
        proc.wait()
    assert proc.returncode == -signal.SIGKILL, proc.returncode

    # restart: resumes from the last committed checkpoint and finishes
    text = _run(root, out_b)
    assert "resumed from epoch" in text

    from spn4cir_tpu.models.api import build_backbone

    bb = build_backbone("clip", clip_model_name="test-tiny")
    state_a = _final_state(bb, out_a)
    state_b = _final_state(bb, out_b)
    mism = []

    def cmp(path, a, b):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            mism.append(path)

    flat_a = jax.tree_util.tree_leaves_with_path(state_a.params)
    flat_b = jax.tree_util.tree_leaves_with_path(state_b.params)
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        cmp(pa, a, b)
    assert not mism, f"{len(mism)} param leaves differ, e.g. {mism[:3]}"
    # optimizer state converges identically too
    for a, b in zip(jax.tree_util.tree_leaves(state_a.opt_state),
                    jax.tree_util.tree_leaves(state_b.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sigkill_mid_epoch_step_resume_identical_params(tmp_path):
    """VERDICT round-3 #6: --ckpt_every_steps saves INSIDE the epoch; a
    SIGKILL between steps resumes mid-epoch (same shuffle via epoch seed +
    start_step skip) and still converges to bit-identical final params."""
    root = make_fiq(str(tmp_path / "fashionIQ_dataset"), n_images=12,
                    n_train=8, extended=False)
    out_a = str(tmp_path / "runA")
    out_b = str(tmp_path / "runB")

    _run(root, out_a)  # uninterrupted baseline (epoch-boundary ckpts only)

    # interrupted: step checkpoints every optimizer step; kill after the
    # FIRST one (global step 1 = epoch 0, step 1 of 2 — mid-epoch)
    proc = _run(root, out_b, extra=("--ckpt_every_steps", "1"), wait=False)
    ckpt = os.path.join(out_b, "resume", "1")
    deadline = time.time() + 600
    try:
        while not os.path.isdir(ckpt):
            if proc.poll() is not None:
                pytest.fail("training exited before the kill point:\n"
                            + proc.stdout.read()[-2000:])
            if time.time() > deadline:
                pytest.fail("timed out waiting for the step-1 checkpoint")
            time.sleep(0.1)
        time.sleep(0.5)
    finally:
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait()
    assert proc.returncode == -signal.SIGKILL, proc.returncode

    text = _run(root, out_b, extra=("--ckpt_every_steps", "1"))
    assert "resumed from epoch" in text

    from spn4cir_tpu.models.api import build_backbone

    bb = build_backbone("clip", clip_model_name="test-tiny")
    state_a = _final_state(bb, out_a)
    state_b = _final_state(bb, out_b)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(state_a.params),
            jax.tree_util.tree_leaves_with_path(state_b.params)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), pa
    for a, b in zip(jax.tree_util.tree_leaves(state_a.opt_state),
                    jax.tree_util.tree_leaves(state_b.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
