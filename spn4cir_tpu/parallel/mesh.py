"""Device mesh + sharding helpers (axes: 'data' for batch DP, 'bank' for
negative-bank rows — SURVEY.md §2.7/§7 decision 5).

The reference trains single-GPU; its vendored stacks use NCCL DDP
(`blip24cir/lavis/common/dist_utils.py:57-91`). Here scale-out is native:
one `jax.sharding.Mesh`, named-axis shardings, XLA collectives over ICI.
This module also mirrors the reference's rank helpers
(`is_main_process`/`get_world_size`, dist_utils.py:41-54).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_BANK = "bank"


def make_mesh(
    data: Optional[int] = None,
    bank: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, bank) mesh. Defaults: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % bank == 0, (n, bank)
        data = n // bank
    assert data * bank == n, (data, bank, n)
    arr = np.asarray(devices).reshape(data, bank)
    return Mesh(arr, (AXIS_DATA, AXIS_BANK))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-major arrays: shard dim 0 over 'data', replicate over 'bank'."""
    return NamedSharding(mesh, P(AXIS_DATA))


def bank_sharding(mesh: Mesh) -> NamedSharding:
    """Bank arrays: shard rows over 'bank', replicate over 'data'."""
    return NamedSharding(mesh, P(AXIS_BANK))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place batch-major arrays with dim-0 'data' sharding (pads are the
    caller's responsibility: dim 0 must divide by mesh 'data' size)."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def put_bank(bank_array, mesh: Mesh):
    return jax.device_put(bank_array, bank_sharding(mesh))


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def process_is_main() -> bool:
    return jax.process_index() == 0


def world_size() -> int:
    return jax.device_count()


def initialize_distributed():
    """Multi-host init (no-op single-process; mirrors the reference's
    env-var rank discovery responsibilities, dist_utils.py:57-71)."""
    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-process / already initialized
