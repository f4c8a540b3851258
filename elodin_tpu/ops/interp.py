"""Gather-free interpolation for small lookup tables.

``jnp.interp`` / ``map_coordinates`` lower to dynamic gathers, which
serialize badly on TPU (a batched scalar interp over a 10-point thrust curve
measured ~0.3 ms per invocation on v5e — dominating the batched-rocket
profile).  For the small tables sims actually use (thrust curves, ISA
atmosphere, aero-coefficient grids — reference examples/rocket/main.py,
nox-py's map_coordinates-based aero lookup), dense formulations are far
faster: every table entry participates in a hat-function weighted sum, which
XLA fuses into vector/matrix ops with no data-dependent addressing.

Cost is O(table size) per query instead of O(log n) — the right trade for
tables up to a few thousand entries when batched over many entities.
"""

from __future__ import annotations

import jax.numpy as jnp


def interp(x, xp, fp):
    """Piecewise-linear interpolation, semantics of ``jnp.interp`` for
    sorted ``xp`` (clamped at both ends), without gathers.

    Uses the telescoping form  f(x) = fp[0] + Σ_k s_k · clamp(x − xp[k],
    0, xp[k+1] − xp[k])  over segments k, where s_k is the segment slope:
    below a segment the clamp gives 0, above it the full segment rise, and
    inside it the partial rise — summing to exactly the piecewise-linear
    value.  ``x`` may have any shape; broadcasting over the last axis.
    """
    xp = jnp.asarray(xp)
    fp = jnp.asarray(fp)
    x = jnp.asarray(x)
    if xp.shape[-1] == 1:
        # single-point table: jnp.interp returns the constant fp[0]
        return jnp.broadcast_to(fp[0], x.shape)
    x_e = jnp.expand_dims(x, -1)
    dx = xp[1:] - xp[:-1]
    jump = fp[1:] - fp[:-1]
    slopes = jump / jnp.where(dx > 0, dx, 1.0)
    rise = jnp.clip(x_e - xp[:-1], 0.0, dx)
    # duplicate knots (dx == 0) encode a step: jnp.interp lands on the last
    # duplicate's value once x reaches the knot, so add the full jump there
    seg = jnp.where(dx > 0, slopes * rise, jump * (x_e >= xp[:-1]))
    # accumulate segments with a FIXED-SHAPE pairwise tree rather than
    # jnp.sum: reduction trees are reassociated differently per backend,
    # and that tiny cross-backend drift gets amplified through control
    # feedback loops (measured 5.8e-6 TPU-vs-CPU after 100 rocket ticks
    # with jnp.sum vs 3e-10 with a fixed order).  An explicit tree keeps
    # the same deterministic order on every backend at log depth, so big
    # tables don't pay an O(n)-deep serial chain
    parts = [seg[..., k] for k in range(seg.shape[-1])]
    while len(parts) > 1:
        nxt = [
            parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)
        ]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return fp[0] + parts[0]


def _hat_weights(coord, n: int, dtype):
    """Linear-interp weights over ``n`` grid indices for fractional index
    ``coord`` (clamped — matches map_coordinates order=1, mode='nearest')."""
    c = jnp.clip(coord, 0.0, n - 1.0)
    idx = jnp.arange(n, dtype=dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(c - idx))


def lerp_nd(table, coords):
    """Multilinear table lookup at fractional index coordinates, without
    gathers — equivalent to ``map_coordinates(table, coords, order=1,
    mode='nearest')`` for in-range-clamped scalar coords, evaluated as a
    dense tensor contraction of per-axis hat weights against the table.

    ``table``: array of shape ``dims``; ``coords``: sequence of scalars,
    one fractional index per axis.  Leading batch axes may be added by
    ``vmap``.  Returns a scalar.
    """
    out = jnp.asarray(table)
    for c in coords:
        w = _hat_weights(c, out.shape[0], out.dtype)
        out = jnp.tensordot(w, out, axes=(0, 0))  # consume the leading axis
    return out
