"""Every command in the reference README must port verbatim (SURVEY.md §7
decision 2: preserve the public CLI surface). This test parses every
`python3 <script> --flags` block out of /root/reference/README.md and
asserts (a) the script has a counterpart here and (b) every flag it uses is
defined by that counterpart's argparse surface (wrapper source + the shared
cli modules it delegates to)."""

import os
import re

import pytest

REF_README = "/root/reference/README.md"
REPO = os.path.join(os.path.dirname(__file__), "..")

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_README),
    reason="reference checkout not mounted")

# wrapper script -> additional sources whose add_argument definitions count
SHARED = {
    "train.py": ["spn4cir_tpu/cli/common.py", "spn4cir_tpu/cli/train.py"],
    "train_bank.py": ["spn4cir_tpu/cli/common.py", "spn4cir_tpu/cli/train.py"],
    "train_negtype.py": ["spn4cir_tpu/cli/common.py",
                         "spn4cir_tpu/cli/train.py"],
    "train_negplus.py": ["spn4cir_tpu/cli/common.py",
                         "spn4cir_tpu/cli/train.py"],
    "validate.py": ["spn4cir_tpu/cli/common.py", "spn4cir_tpu/cli/validate.py"],
    "cirr_test_submission.py": ["spn4cir_tpu/cli/common.py",
                                "spn4cir_tpu/cli/submission.py"],
    "serve.py": ["spn4cir_tpu/cli/common.py", "spn4cir_tpu/cli/serve.py"],
    "captioner_llava.py": ["zscir/captioner.py"],
}


def _commands():
    if not os.path.exists(REF_README):
        return []  # the module-level skipif handles reporting
    with open(REF_README) as f:
        text = f.read()
    # join shell line continuations, then take python3 invocations
    text = text.replace("\\\n", " ")
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("python3 ") or line.startswith("python "):
            parts = line.split()
            script = parts[1]
            flags = [p for p in parts[2:] if p.startswith("--")]
            out.append((script, flags))
    return out


COMMANDS = _commands()


def test_readme_has_commands():
    assert len(COMMANDS) >= 40  # the README is recipe-dense


@pytest.mark.parametrize("script,flags", COMMANDS,
                         ids=[f"{s}:{i}" for i, (s, _) in enumerate(COMMANDS)])
def test_readme_command_ports_verbatim(script, flags):
    local = os.path.join(REPO, script)
    assert os.path.exists(local), f"no counterpart for {script}"
    sources = [local]
    base = os.path.basename(script)
    for extra in SHARED.get(base, []):
        sources.append(os.path.join(REPO, extra))
    defined = set()
    for src in sources:
        body = open(src).read()
        # argparse option strings: add_argument("--x", "--alias", ...)
        for m in re.finditer(r"add_argument\(\s*((?:\"--[^\"]+\"|'--[^']+')"
                             r"(?:\s*,\s*(?:\"--[^\"]+\"|'--[^']+'))*)", body):
            for tok in re.findall(r"--[\w-]+", m.group(1)):
                defined.add(tok)
                # argparse accepts either separator spelling at the CLI
                defined.add(tok.replace("-", "_").replace("__", "--", 1))
                defined.add(tok.replace("_", "-").replace("--", "--", 1))
    missing = [f for f in flags
               if f not in defined
               and f.replace("-", "_").replace("__", "--", 1) not in defined]
    assert not missing, (f"{script} is missing flags {missing}; "
                         f"searched {sources}")
