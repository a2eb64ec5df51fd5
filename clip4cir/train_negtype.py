"""Thin CLI wrapper over the shared core. Reference counterpart: clip4cir/train_negtype.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spn4cir_tpu.cli.train import train_main

if __name__ == "__main__":
    # stage-1 trainer with the 4-flavor negative bitmask (--neg_type 1..15)
    import sys as _sys

    argv = _sys.argv[1:]
    if "--wo_bank" not in argv:
        argv.append("--wo_bank")
    if "--neg_type" not in argv:
        argv += ["--neg_type", "15"]
    train_main("clip", argv, default_model="RN50x4", default_tau=0.02,
               default_lr=2e-5, default_bs=256, default_epochs=3)
