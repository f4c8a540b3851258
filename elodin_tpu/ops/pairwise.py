"""Tiled pairwise N-body gravity — the TotalEdge hot op as a Pallas kernel.

The reference computes all-pairs interactions by folding per-edge
expressions (libs/nox-py/src/graph.rs edge_fold over a complete digraph) —
O(N^2) sequential work per entity.  On TPU the right shape is a tiled dense
sweep like flash-attention: each (TILE_I) block of bodies accumulates force
contributions from (TILE_J) blocks streamed through VMEM, so HBM traffic is
O(N^2 / TILE) instead of O(N^2), and the inner math vectorizes on the VPU.

``pairwise_gravity`` dispatches to the Pallas kernel on TPU (f32; Mosaic has
no f64) and to the broadcast XLA reference elsewhere or for f64.

An MXU (matmul-form) distance computation was tried and measured
(``pairwise_gravity_mxu`` + scripts/profile_pairwise.py, v5e, 16k bodies,
f32): throughput is within noise of the displacement forms (~60-67G pairs/s
standalone for every variant — the kernel is VPU-bound on the N^2 rsqrt, so
moving the 12-of-~25 FLOPs/pair of contraction work to the MXU buys
nothing), while accuracy collapses: the default TPU f32 matmul runs bf16
passes (max rel err ~7e2 vs f64 even on a unit cloud) and even
precision=HIGHEST leaves 7.5e-4 (cloud) / 1e-1 (orbital shell, where
|x|^2+|y|^2-2x.y cancels catastrophically) against ~1e-5 for the
displacement forms.  The displacement forms therefore remain the defaults.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE_I = 512
TILE_J = 512


def pairwise_gravity_reference(pos, mass, g: float = 6.6743e-11,
                               eps: float = 0.0):
    """Dense broadcast O(N^2) accelerations; any dtype/backend.

    a_i = sum_j G m_j (x_j - x_i) / (|x_j - x_i|^2 + eps^2)^{3/2}"""
    r = pos[None, :, :] - pos[:, None, :]  # (i, j, 3): vector i -> j
    d2 = jnp.sum(r * r, axis=-1) + eps * eps
    d2 = jnp.where(d2 == 0.0, 1.0, d2)  # self-interaction guard
    inv_d3 = d2 ** (-1.5)
    eye = jnp.eye(pos.shape[0], dtype=bool)
    inv_d3 = jnp.where(eye, 0.0, inv_d3)
    return g * jnp.einsum("ij,j,ijk->ik", inv_d3, mass, r)


def _pallas_kernel(n: int, g: float, eps: float):
    import jax.experimental.pallas as pl

    n_i = -(-n // TILE_I)
    n_j = -(-n // TILE_J)

    def kernel(pos_i_ref, pos_t_j_ref, mass_j_ref, out_ref):
        # pos_i: (TILE_I, 3) column vectors; pos_t_j: (3, TILE_J) row
        # vectors — dual layouts so every (I, J) term is a plain broadcast
        # of (I, 1) against (1, J), which Mosaic lowers directly.
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        mass_j = mass_j_ref[:]  # (1, TILE_J)

        dx = [
            pos_t_j_ref[k : k + 1, :] - pos_i_ref[:, k : k + 1]
            for k in range(3)
        ]  # 3 x (TILE_I, TILE_J)
        d2 = dx[0] * dx[0] + dx[1] * dx[1] + dx[2] * dx[2] + eps * eps
        # self-pairs and zero-padded bodies need no index masks: remapping
        # EXACT d2 == 0 to 1 keeps w finite, and their contribution then
        # vanishes exactly because dx = 0 for a self-pair and mass = 0 for
        # padding — saving the two iota + compare + select ops per tile
        # the masked form paid.  The comparison must be == 0.0, matching
        # pairwise_gravity_reference: a 1e-18 threshold silently ZEROED
        # forces between real, distinct, ultra-close bodies where the
        # reference (the CPU verify side) computes a huge force
        d2 = jnp.where(d2 == 0.0, 1.0, d2)
        inv = jax.lax.rsqrt(d2)
        w = (inv * inv * inv) * mass_j  # (TILE_I, TILE_J)
        for k in range(3):
            out_ref[:, k : k + 1] += g * jnp.sum(
                w * dx[k], axis=1, keepdims=True
            )

    return kernel, n_i, n_j


@functools.partial(jax.jit, static_argnames=("g", "eps"))
def _pairwise_gravity_pallas(pos, mass, g: float, eps: float):
    import jax.experimental.pallas as pl

    n = pos.shape[0]
    pad = (-n) % TILE_I
    pos_p = jnp.pad(pos.astype(jnp.float32), ((0, pad), (0, 0)))
    pos_t = pos_p.T  # (3, N) for the j-side row vectors
    mass_t = jnp.pad(mass.astype(jnp.float32), (0, pad))[None, :]
    kernel, n_i, n_j = _pallas_kernel(n, g, eps)
    # trace the kernel call with x64 semantics off: under jax_enable_x64 the
    # grid index maps emit int64, which Mosaic cannot compile (probe-verified
    # crash in the TPU compiler); all operands here are explicit f32 anyway
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(pos_p.shape, jnp.float32),
            grid=(n_i, n_j),
            in_specs=[
                pl.BlockSpec((TILE_I, 3), lambda i, j: (i, 0)),
                pl.BlockSpec((3, TILE_J), lambda i, j: (0, j)),
                pl.BlockSpec((1, TILE_J), lambda i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((TILE_I, 3), lambda i, j: (i, 0)),
        )(pos_p, pos_t, mass_t)
    return out[:n]


def pairwise_gravity_mxu(pos, mass, g: float = 6.6743e-11, eps: float = 0.0,
                         precision=None):
    """Matmul-form all-pairs gravity: distances via the Gram matrix so the
    O(N^2) contractions run on the MXU instead of the VPU.

        d2_ij = |x_i|^2 + |x_j|^2 - 2 x_i.x_j         (Gram: P @ P.T)
        a_i   = G [ (W @ P)_i - rowsum(W)_i * x_i ],  W_ij = m_j d2_ij^{-3/2}

    Two (N,N) matmuls replace the (N,N,3) broadcast tensor; XLA fuses the
    elementwise w computation into the second matmul's operand.

    ACCURACY CAVEAT (measured, scripts/profile_pairwise.py): the Gram
    expansion cancels catastrophically when separations are small relative
    to coordinate magnitudes — |x| ~ 7e6 m orbits with ~1e3 m separations
    lose ALL significant digits of d2 in f32 (absolute error of |x|^2 is
    ~5e6 > d2 itself).  The displacement-first forms (broadcast / Pallas)
    subtract positions BEFORE squaring and do not suffer this.  Use only
    for clouds whose extent is comparable to their coordinate scale.
    """
    x = jnp.asarray(pos)
    m = jnp.asarray(mass)
    n = x.shape[0]
    sq = jnp.sum(x * x, axis=-1)
    # NOTE: on TPU the default f32 matmul runs reduced-precision bf16
    # passes on the MXU, which destroys the Gram cancellation entirely
    # (measured rel err ~7e2 even on a benign unit cloud); precision=
    # 'highest' restores f32-accurate matmul at ~half the matmul rate.
    gram = jnp.matmul(x, x.T, precision=precision)  # (N, N) on the MXU
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram + eps * eps
    # cancellation can leave small negatives; clamp before the rsqrt
    d2 = jnp.maximum(d2, 0.0)
    d2 = jnp.where(d2 == 0.0, 1.0, d2)
    inv = jax.lax.rsqrt(d2)
    w = inv * inv * inv * m[None, :]
    # unlike the displacement forms, the self-term does not vanish through a
    # zero numerator here — mask the diagonal explicitly
    w = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1),
        jnp.zeros((), w.dtype),
        w,
    )
    return g * (jnp.matmul(w, x, precision=precision)
                - jnp.sum(w, axis=1, keepdims=True) * x)


def pairwise_gravity_sharded(pos, mass, mesh, axis: str | None = None,
                             g: float = 6.6743e-11, eps: float = 0.0):
    """All-pairs gravity with the body axis sharded over a device mesh.

    Each device holds a row block of bodies, all-gathers the full
    position/mass set over ICI (one collective per step; O(N) bytes), and
    computes its block's interactions locally — the standard TPU recipe
    for N^2 interactions (row-block x replicated columns).  Self-pairs
    vanish through the zero numerator (r = 0), so no index masking is
    needed across blocks.
    """
    import functools as _ft

    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = axis or mesh.axis_names[0]
    spec = P(axis)

    def local(pos_blk, mass_blk, pos_all, mass_all):
        # accelerations on this device's rows from ALL bodies: reuse the
        # dense machinery with an (i-block, j-all) formulation
        r = pos_all[None, :, :] - pos_blk[:, None, :]
        d2 = jnp.sum(r * r, axis=-1) + eps * eps
        d2 = jnp.where(d2 == 0.0, 1.0, d2)
        inv = jax.lax.rsqrt(d2)
        inv_d3 = inv * inv * inv
        # self-pair: the zero-distance guard above sets d2=1 for the
        # (i == j) entry, but r is exactly 0 there so the term vanishes
        return g * jnp.einsum("ij,j,ijk->ik", inv_d3, mass_all, r)

    @_ft.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
    )
    def run(pos_blk, mass_blk):
        pos_all = jax.lax.all_gather(pos_blk, axis, tiled=True)
        mass_all = jax.lax.all_gather(mass_blk, axis, tiled=True)
        return local(pos_blk, mass_blk, pos_all, mass_all)

    sharding = NamedSharding(mesh, spec)
    pos = jax.device_put(jnp.asarray(pos), sharding)
    mass = jax.device_put(jnp.asarray(mass), sharding)
    return run(pos, mass)


def pairwise_gravity(pos, mass, g: float = 6.6743e-11, eps: float = 0.0,
                     use_pallas: bool | None = None):
    """All-pairs gravitational acceleration (N, 3).

    Chooses the Pallas TPU kernel for f32 on TPU, the XLA broadcast
    reference otherwise."""
    import os

    pos = jnp.asarray(pos)
    mass = jnp.asarray(mass)
    if use_pallas is None:
        # default ON for f32 inputs on TPU above the tile size (Mosaic has
        # no f64; below one tile the XLA broadcast form wins on padding);
        # ELODIN_PAIRWISE_PALLAS=0/1 overrides
        env = os.environ.get("ELODIN_PAIRWISE_PALLAS")
        if env is not None:
            use_pallas = env != "0"
        else:
            use_pallas = (
                jax.default_backend() == "tpu"
                and pos.dtype == jnp.float32
                and pos.shape[0] >= TILE_I
            )
    if use_pallas:
        return _pairwise_gravity_pallas(pos, mass, float(g), float(eps))
    return pairwise_gravity_reference(pos, mass, g, eps)
