"""The reference's canonical captioner entry point (README.md:168-183 runs
`zscir/captioner_llava.py --cir_data {fiq,cirr,cc}` for every published
dataset). Forwards to the shared captioner CLI with the LLaVA backend
forced; all reference flags (--cir_data, --k, --cc_id) parse there."""

import os
import subprocess
import sys

if __name__ == "__main__":
    sys.exit(subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "captioner.py"),
         "--mllm", "llava", *sys.argv[1:]]))
