"""Thin CLI wrapper over the shared core: stand up the retrieval HTTP
service for this backbone (TPU-native addition; the reference has no CIR
serving entry point -- SURVEY.md par.5)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spn4cir_tpu.cli.serve import serve_main

if __name__ == "__main__":
    serve_main("zs", default_model="ViT-L/14", default_tau=0.01, default_lr=2e-06, default_bs=48, default_epochs=10)
