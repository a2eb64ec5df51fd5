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
AXIS_MODEL = "model"


def make_mesh(
    data: Optional[int] = None,
    bank: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, bank[, model]) mesh. Defaults: all devices on the
    data axis. `model > 1` adds the tensor-parallel axis (parallel/tp.py
    param shardings compose with the bank-sharded loss — the 3-axis
    composed stage-2 step for big-tower training on small-HBM chips).
    The model axis is innermost so TP collectives ride the fastest ICI
    hops."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % (bank * model) == 0, (n, bank, model)
        data = n // (bank * model)
    assert data * bank * model == n, (data, bank, model, n)
    if model > 1:
        arr = np.asarray(devices).reshape(data, bank, model)
        return Mesh(arr, (AXIS_DATA, AXIS_BANK, AXIS_MODEL))
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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host init (mirrors the reference's env-var rank discovery
    responsibilities, dist_utils.py:57-71 — there it is NCCL
    init_process_group; here jax.distributed over the TPU runtime).

    Must run before any other JAX API touches the backend. Gating: explicit
    arguments, or the SPN4CIR_DIST_* env vars; on TPU pods with no explicit
    config, `jax.distributed.initialize()` auto-discovers from the
    environment. Returns True iff distributed mode was initialized.
    Exceptions propagate — a mis-configured multi-host launch must fail
    loudly, not silently fall back to single-host."""
    import os

    env_addr = os.environ.get("SPN4CIR_DIST_COORDINATOR", "")
    coordinator_address = coordinator_address or (env_addr or None)
    if num_processes is None and os.environ.get("SPN4CIR_DIST_NPROCS"):
        num_processes = int(os.environ["SPN4CIR_DIST_NPROCS"])
    if process_id is None and os.environ.get("SPN4CIR_DIST_PROC_ID"):
        process_id = int(os.environ["SPN4CIR_DIST_PROC_ID"])
    explicit = coordinator_address is not None or num_processes is not None
    auto = os.environ.get("SPN4CIR_DISTRIBUTED", "") not in ("", "0", "false")
    if not (explicit or auto):
        return False
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)
    return True


def make_hybrid_mesh(
    data_per_slice: Optional[int] = None,
    bank: int = 1,
    model: int = 1,
    num_slices: Optional[int] = None,
) -> Mesh:
    """DCN-aware (data, bank[, model]) mesh for multi-slice / multi-host
    topologies: the data axis spans slices (gradient all-reduce rides DCN,
    which tolerates the lower bandwidth — it moves only parameter-sized
    traffic once per step), while the bank axis — and the tensor-parallel
    model axis, whose per-layer all-reduces are latency-critical — stay
    inside a slice so their collectives ride ICI.

    The granule is the TPU slice when devices carry `slice_index`;
    otherwise (multi-host CPU/GPU — the 2-process smoke test) each host
    process is the granule. Falls back to `make_mesh` on a single
    slice/process."""
    from jax.experimental import mesh_utils

    devices = jax.devices()
    has_slice = all(hasattr(d, "slice_index") for d in devices)
    if has_slice:
        granules = {d.slice_index for d in devices}
    else:
        granules = {d.process_index for d in devices}
    n_slices = num_slices if num_slices is not None else len(granules)
    if n_slices <= 1:
        return make_mesh(data=data_per_slice, bank=bank, model=model)
    per_slice = len(devices) // n_slices
    if data_per_slice is None:
        assert per_slice % (bank * model) == 0, (per_slice, bank, model)
        data_per_slice = per_slice // (bank * model)
    assert data_per_slice * bank * model == per_slice, (
        data_per_slice, bank, model, per_slice)
    extra = (model,) if model > 1 else ()
    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(data_per_slice, bank) + extra,
        dcn_mesh_shape=(n_slices, 1) + (1,) * len(extra),
        devices=devices,
        process_is_granule=not has_slice,
    )
    names = (AXIS_DATA, AXIS_BANK) + ((AXIS_MODEL,) if extra else ())
    return Mesh(arr, names)  # data axis = n_slices * data_per_slice
