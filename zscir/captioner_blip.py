"""The reference's alternative BLIP captioner entry point
(zscir/captioner_blip.py). Forwards to the shared captioner CLI with the
BLIP backend forced."""

import os
import subprocess
import sys

if __name__ == "__main__":
    sys.exit(subprocess.call(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "captioner.py"),
         "--mllm", "blip", *sys.argv[1:]]))
