"""Thin CLI wrapper over the shared core. Reference counterpart: zscir/train.py (stage-1 on generated triplets)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spn4cir_tpu.cli.train import train_main

if __name__ == "__main__":
    import sys as _sys

    argv = _sys.argv[1:]
    if "--wo_bank" not in argv:
        argv.append("--wo_bank")  # zscir stage 1 trains in-batch end to end
    train_main("zs", argv, default_model="ViT-L/14", default_tau=0.01,
               default_lr=2e-6, default_bs=48, default_epochs=10)
