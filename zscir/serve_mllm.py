"""MLLM captioning service. Reference counterpart: the vendored LLaVA REST
serving stack (zscir/llava/serve/{controller,model_worker}.py) — replaced
by the framework's single-process micro-batching service (serve/mllm.py;
multi-chip via --mesh_model, multi-worker fan-out is a load-balancer
concern)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from spn4cir_tpu.cli.serve_mllm import main

if __name__ == "__main__":
    main()
