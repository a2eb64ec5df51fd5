"""Flat-module bookkeeping for the reference-in-the-loop parity suites.

Each reference backbone dir (clip4cir/, tgcir/, blip4cir/, blip24cir/,
zscir/) is imported with flat module names (`clip`, `models`, `data_utils`,
...) that COLLIDE across suites — five different `clip` packages exist. The
fixtures must therefore save and clear sys.modules around their imports.

Crucially the bookkeeping must cover SUBMODULES too, not just the base
names: a stranded `clip.model` cached from another suite's vendored tree
makes a later fresh `import clip` appear to work — `from .model import ...`
inside it resolves through the sys.modules cache — while the fresh parent
package never gets its `.model` attribute set (the import system only sets
the parent attribute at initial load). The next `ref_modules["clip"].model`
then raises AttributeError, but only in full-suite runs where another
parity suite ran first (observed: test_parity_e2e after
test_parity_datagen_e2e).
"""

import sys


def _matches(name, bases):
    return any(name == b or name.startswith(b + ".") for b in bases)


def save_and_clear(names):
    """Snapshot and remove `names` and all their submodules from
    sys.modules. Returns the snapshot for `restore`."""
    saved = {n: m for n, m in sys.modules.items() if _matches(n, names)}
    for n in saved:
        sys.modules.pop(n, None)
    return saved


def restore(names, saved):
    """Remove everything this suite imported under `names` (including
    submodules it created), then put the snapshot back."""
    for n in list(sys.modules):
        if _matches(n, names):
            sys.modules.pop(n, None)
    sys.modules.update(saved)
