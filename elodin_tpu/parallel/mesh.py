"""Device-mesh sharding for entity and Monte Carlo sample axes.

The reference's two scale axes — entity count (vmapped per system,
libs/nox-py/src/query.rs:526) and MC samples (process-per-sample,
libs/monte-carlo/src/lib.rs:1193) — map onto a ``jax.sharding.Mesh`` here:

* ``dp``  — the sample axis of a batched campaign (pure data parallel,
  no collectives; scales linearly over ICI and DCN),
* ``ep``  — the entity axis within one world (gathers across shards, e.g.
  n-body edge folds, become XLA collectives over ICI).

Columns whose entity count doesn't divide the mesh (the Globals singleton,
small worlds) stay replicated; XLA inserts the broadcasts.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None,
                   local_device_count: int | None = None) -> None:
    """Join a multi-host (DCN) mesh via ``jax.distributed.initialize``.

    Args fall back to the ``ELODIN_COORDINATOR`` / ``ELODIN_NUM_PROCESSES``
    / ``ELODIN_PROCESS_ID`` env vars (and to jax's own cluster
    auto-detection on TPU pods, where ``initialize()`` needs no args).
    Idempotent: a second call is a no-op.  After it returns,
    ``jax.devices()`` is the GLOBAL device list and ``make_mesh`` builds a
    mesh spanning hosts — lay dp over DCN and ep over ICI (SCALING.md).
    """
    # idempotency check must not touch jax.process_count(): that would
    # initialize the XLA backend, after which initialize() refuses to run
    if jax.distributed.is_initialized():
        return
    coordinator_address = coordinator_address or os.environ.get(
        "ELODIN_COORDINATOR"
    )
    if num_processes is None and os.environ.get("ELODIN_NUM_PROCESSES"):
        num_processes = int(os.environ["ELODIN_NUM_PROCESSES"])
    if process_id is None and os.environ.get("ELODIN_PROCESS_ID"):
        process_id = int(os.environ["ELODIN_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=(
            list(range(local_device_count)) if local_device_count else None
        ),
    )


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              ep: int | None = None) -> Mesh:
    """Build a (dp, ep) device mesh.

    Default is dp-only (``ep=1``): sample parallelism is collective-free
    and always load-balanced, while an unrequested entity slice silently
    wastes half the mesh whenever the entity count doesn't divide it
    (rows replicate and the ep dimension idles).  Pass ``ep=`` explicitly
    when the per-sample world is large enough to shard.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if dp is None and ep is None:
        dp, ep = n, 1
    elif dp is None:
        dp = n // ep
    elif ep is None:
        ep = n // dp
    if dp * ep != n:
        raise ValueError(f"mesh {dp}x{ep} != {n} devices")
    return Mesh(devices.reshape(dp, ep), ("dp", "ep"))


def entity_sharding(mesh: Mesh, rows: int, ndim: int,
                    sample_axis: bool = False) -> NamedSharding:
    """Sharding for one component column.

    Without a sample axis the column is (rows, *shape): shard rows over
    'ep' when divisible, else replicate.  With a sample axis the column is
    (samples, rows, *shape): samples over 'dp', rows over 'ep'.
    """
    # meshes without an 'ep' axis (pure sample-parallel, any axis name —
    # BatchedCampaign accepts them) replicate the entity rows
    ep = mesh.shape.get("ep", 1)
    row_spec = "ep" if "ep" in mesh.shape and rows > 1 and rows % ep == 0 \
        else None
    if sample_axis:
        sample_spec = "dp" if "dp" in mesh.shape else mesh.axis_names[0]
        spec = P(sample_spec, row_spec, *([None] * (ndim - 2)))
    else:
        spec = P(row_spec, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def put_global(sharding: NamedSharding, arr) -> jax.Array:
    """Place a GLOBAL (host-replicated) array onto a sharding that may span
    processes.  Single-process this is a plain device_put; multi-host each
    process materializes only its addressable shards (the callback slices
    the global array per shard index)."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def shard_cols(mesh: Mesh, cols: dict, sample_axis: bool = False) -> dict:
    """Place a column dict onto the mesh with per-column shardings."""
    out = {}
    for name, v in cols.items():
        rows = v.shape[1] if sample_axis else v.shape[0]
        s = entity_sharding(mesh, rows, v.ndim, sample_axis)
        out[name] = put_global(s, v)
    return out


def sharded_step(step_fn, mesh: Mesh, cols: dict, sample_axis: bool = False):
    """jit ``step_fn`` with input/output shardings matching ``cols``.

    Returns (compiled_fn, placed_cols).  XLA propagates the shardings
    through the whole tick and inserts ICI collectives only where entity
    rows actually cross shard boundaries (edge folds, reductions).
    """
    placed = shard_cols(mesh, cols, sample_axis)
    shardings = {k: v.sharding for k, v in placed.items()}
    fn = jax.jit(step_fn, in_shardings=(shardings,), out_shardings=shardings)
    return fn, placed
