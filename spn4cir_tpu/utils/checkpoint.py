"""Checkpointing: best-model saves + full resume state.

Parity target: `save_model` (`clip4cir/utils.py:53-67`, schema
`{epoch, state_dict}` -> `<output>/best.pt`) and the reference's (defined but
unused) full-resume checkpoint (`blip24cir/utils.py:88-118`). The reference
has no mid-training resume (SURVEY.md §5); here full resume is first-class
via orbax (fixes that gap by design, SURVEY.md §7 decision 6).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_model(path: str, params: Any, epoch: int = 0, extra: Optional[dict] = None):
    """Best-checkpoint save (msgpack params + sidecar metadata JSON)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    meta = {"epoch": epoch, **(extra or {})}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_model(path: str, params_template: Any) -> tuple[Any, dict]:
    """Load params saved by `save_model` into the template's structure."""
    with open(path, "rb") as f:
        params = serialization.from_bytes(params_template, f.read())
    meta_path = path + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return params, meta


class CheckpointManager:
    """Async orbax-backed full training state (params + optimizer + step) for
    preemption resume; falls back to msgpack when orbax is unavailable."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if _HAS_ORBAX:
            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
            )
        else:  # pragma: no cover
            self._mgr = None

    def save(self, step: int, state: Any):
        if self._mgr is not None:
            self._mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        else:  # pragma: no cover
            save_model(os.path.join(self.directory, f"state_{step}.msgpack"),
                       state, epoch=step)

    def restore(self, state_template: Any, step: Optional[int] = None) -> tuple[Any, int]:
        if self._mgr is not None:
            step = step if step is not None else self._mgr.latest_step()
            if step is None:
                return state_template, 0
            abstract = jax.tree_util.tree_map(np.asarray,
                                              jax.device_get(state_template))
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract))
            return restored, step
        return state_template, 0  # pragma: no cover

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step() if self._mgr is not None else None

    def wait(self):
        if self._mgr is not None:
            self._mgr.wait_until_finished()
