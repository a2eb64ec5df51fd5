"""Thin CLI wrapper over the shared core: stand up the retrieval HTTP
service for this backbone (TPU-native addition; the reference has no CIR
serving entry point -- SURVEY.md par.5)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spn4cir_tpu.cli.serve import serve_main

if __name__ == "__main__":
    serve_main("blip2", default_model="RN50x4", default_tau=0.05, default_lr=1e-05, default_bs=32, default_epochs=3)
