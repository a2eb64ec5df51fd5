"""Thin CLI wrapper over the shared core. Reference counterpart: zscir/cirr_test_submission.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spn4cir_tpu.cli.submission import submission_main

if __name__ == "__main__":
    submission_main("zs", default_model="ViT-L/14", default_tau=0.01,
                    default_lr=2e-6, default_bs=48, default_epochs=10)
