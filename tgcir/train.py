"""Thin CLI wrapper over the shared core (reference-parity flags and
recipe defaults; see BASELINE.md stage-2 recipes and SURVEY.md §1-L4).
Reference counterpart: tgcir/train.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spn4cir_tpu.cli.train import train_main

if __name__ == "__main__":
    train_main("tgcir", default_model="ViT-B/16", default_tau=0.02, default_lr=2e-05, default_bs=256, default_epochs=5)
