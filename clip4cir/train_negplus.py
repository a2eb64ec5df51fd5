"""Thin CLI wrapper over the shared core. Reference counterpart: clip4cir/train_negplus.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spn4cir_tpu.cli.train import train_main

if __name__ == "__main__":
    import sys as _sys

    argv = _sys.argv[1:]
    if "--unlabeled" not in argv:
        argv.append("--unlabeled")
    train_main("clip", argv, default_model="RN50x4", default_tau=0.02,
               default_lr=2e-5, default_bs=256, default_epochs=3)
