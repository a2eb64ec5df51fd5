"""Thin CLI wrapper over the shared core (reference-parity flags and
recipe defaults; see BASELINE.md stage-2 recipes and SURVEY.md §1-L4).
Reference counterpart: blip4cir/validate.py."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spn4cir_tpu.cli.validate import validate_main

if __name__ == "__main__":
    validate_main("blip", default_model="RN50x4", default_tau=0.03, default_lr=5e-06, default_bs=128, default_epochs=10)
