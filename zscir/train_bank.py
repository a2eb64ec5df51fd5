"""Thin CLI wrapper over the shared core. Reference counterpart: zscir/train_bank.py (stage-2 bank fine-tune)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spn4cir_tpu.cli.train import train_main

if __name__ == "__main__":
    train_main("zs", default_model="ViT-L/14", default_tau=0.02,
               default_lr=2e-6, default_bs=128, default_epochs=5)
