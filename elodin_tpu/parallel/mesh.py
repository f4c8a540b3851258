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

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              ep: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if dp is None and ep is None:
        # favor sample parallelism; give entities a 2-way slice when possible
        ep = 2 if n % 2 == 0 and n >= 4 else 1
        dp = n // ep
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


def shard_cols(mesh: Mesh, cols: dict, sample_axis: bool = False) -> dict:
    """Place a column dict onto the mesh with per-column shardings."""
    out = {}
    for name, v in cols.items():
        rows = v.shape[1] if sample_axis else v.shape[0]
        s = entity_sharding(mesh, rows, v.ndim, sample_axis)
        out[name] = jax.device_put(v, s)
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
