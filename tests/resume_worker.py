"""Subprocess body for the kill/restart resume test (tests/test_resume_kill.py):
forces the CPU backend (the axon sitecustomize would otherwise route to the
shared dev TPU) and runs the production clip4cir training CLI."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spn4cir_tpu.cli.train import train_main  # noqa: E402

if __name__ == "__main__":
    train_main("clip", argv=sys.argv[1:], default_model="test-tiny",
               default_tau=0.02, default_lr=2e-4, default_bs=4,
               default_epochs=3)
