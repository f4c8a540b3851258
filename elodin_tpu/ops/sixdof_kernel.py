"""Whole-rollout batched 6-dof RK4 as ONE Pallas kernel — VMEM-resident state.

The flagship batched 6-dof benchmark (models/sixdof_batch.py) is bound
neither by FLOPs nor by HBM on the XLA path: at 32k f32 bodies the capture
shows ~11% VPU and ~11% HBM utilization, because every `lax.fori_loop` trip
re-dispatches the tick's fused kernels and re-touches state in HBM.  This
kernel runs the ENTIRE tick loop inside one `pallas_call`: state loads into
VMEM once, every RK4 stage is pure VPU work on (rows, 128) vregs, and HBM
is touched exactly twice per rollout (initial load + final store).

Semantics replicate the production path structurally: the RK4 stage
sequence of `six_dof._SixDofSystem._rk4` (reference:
libs/nox-py/src/integrator/rk4.rs:79-126), the effector of
`models/sixdof_batch._gravity_thrust_drag`, and the `sixdof_accel` /
`stf_add_motion` algebra of `spatial.py` (reference:
libs/nox-py/src/six_dof.rs:137-150, libs/nox/src/spatial.rs:530-550),
written in per-channel scalar form so Mosaic sees only (rows, 128)
elementwise vector ops.  Equivalence to the XLA path is asserted in
tests/test_sixdof_kernel.py (interpret mode) and by bench.py's pallas
stage on real hardware.  f32 only — Mosaic has no f64.

Layout: bodies are padded to a multiple of 128*block_rows and each state
channel (qx..qw, px..pz, wx..wz, vx..vz) becomes one (rows, 128) plane of
a (13, rows, 128) array; parameters (inverse inertia diagonal + inverse
mass) are a (4, rows, 128) array.  The tick count is a runtime scalar in
SMEM, so ONE compiled executable serves any rollout length (the same
dynamic-trip property the XLA headline stages rely on — see
docs/PERFORMANCE.md "Static vs dynamic trip count").
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def _x64_off():
    """Trace the kernel with x64 disabled: the repo enables jax_enable_x64
    globally, under which BlockSpec index maps (including the SMEM spec's
    implicit one) trace their returns as i64 — which Mosaic cannot
    legalize (`func.return (i64, i64)`, bisected 2026-08-19).  Every array
    in this kernel is explicitly f32/i32, so the setting changes nothing
    else.  Not thread-safe (flips global config around the trace); the
    framework never traces concurrently."""
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", prev)

MU = 3.986004418e14  # Earth GM, m^3/s^2 (models/sixdof_batch.py)

N_STATE = 13  # qx qy qz qw | px py pz | wx wy wz | vx vy vz
N_PARAM = 4  # 1/ixx 1/iyy 1/izz 1/m


def _accel(q, p, v, par):
    """world_accel of the flagship effector stack: central gravity +
    body-frame thrust/torque + quadratic drag, then sixdof_accel's
    R(q)((R(q)^-1 f)/I) with the |q|^2 factors shared (spatial.py:218-237).
    All args are tuples of (rows, 128) arrays; returns (aw, av) tuples."""
    qx, qy, qz, qw = q
    px, py, pz = p
    vx, vy, vz = v
    inv_ixx, inv_iyy, inv_izz, inv_m = par
    m = 1.0 / inv_m

    # homogeneous rotation matrix rows (spatial._quat_homog_mat)
    xx, yy, zz, ww = qx * qx, qy * qy, qz * qz, qw * qw
    xy, xz, xw = qx * qy, qx * qz, qx * qw
    yz, yw, zw = qy * qz, qy * qw, qz * qw
    m00, m01, m02 = ww + xx - yy - zz, 2 * (xy - zw), 2 * (xz + yw)
    m10, m11, m12 = 2 * (xy + zw), ww - xx + yy - zz, 2 * (yz - xw)
    m20, m21, m22 = 2 * (xz - yw), 2 * (yz + xw), ww - xx - yy + zz
    inv_n2 = 1.0 / (xx + yy + zz + ww)

    # central gravity: -MU m r / |r|^3 via one rsqrt
    inv_rn = jax.lax.rsqrt(px * px + py * py + pz * pz)
    g = (-MU) * m * (inv_rn * inv_rn * inv_rn)
    # body +x thrust / +z torque: scaled rotation-matrix columns
    sx = 25.0 * m * inv_n2
    sz = 1e-3 * m * inv_n2
    # quadratic drag
    d = -0.02 * jnp.sqrt(vx * vx + vy * vy + vz * vz)

    fx = g * px + m00 * sx + d * vx
    fy = g * py + m10 * sx + d * vy
    fz = g * pz + m20 * sx + d * vz
    taux, tauy, tauz = m02 * sz, m12 * sz, m22 * sz

    # sixdof_accel: body torque/force (M^T rotate), divide by inertia, back
    btx = (m00 * taux + m10 * tauy + m20 * tauz) * inv_n2
    bty = (m01 * taux + m11 * tauy + m21 * tauz) * inv_n2
    btz = (m02 * taux + m12 * tauy + m22 * tauz) * inv_n2
    angx, angy, angz = btx * inv_ixx, bty * inv_iyy, btz * inv_izz
    awx = (m00 * angx + m01 * angy + m02 * angz) * inv_n2
    awy = (m10 * angx + m11 * angy + m12 * angz) * inv_n2
    awz = (m20 * angx + m21 * angy + m22 * angz) * inv_n2

    bfx = (m00 * fx + m10 * fy + m20 * fz) * inv_n2
    bfy = (m01 * fx + m11 * fy + m21 * fz) * inv_n2
    bfz = (m02 * fx + m12 * fy + m22 * fz) * inv_n2
    linx, liny, linz = bfx * inv_m, bfy * inv_m, bfz * inv_m
    avx = (m00 * linx + m01 * liny + m02 * linz) * inv_n2
    avy = (m10 * linx + m11 * liny + m12 * linz) * inv_n2
    avz = (m20 * linx + m21 * liny + m22 * linz) * inv_n2
    return (awx, awy, awz), (avx, avy, avz)


def _quat_add_norm(q, hx, hy, hz):
    """normalize(q + quat_mul((h, 0), q)) — stf_add_motion's world-frame
    angular update (spatial.py:175-187), h = angular_delta / 2."""
    qx, qy, qz, qw = q
    nx = qx + (hx * qw + hy * qz - hz * qy)
    ny = qy + (-hx * qz + hy * qw + hz * qx)
    nz = qz + (hx * qy - hy * qx + hz * qw)
    nw = qw + (-hx * qx - hy * qy - hz * qz)
    inv_n = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + nw * nw)
    return nx * inv_n, ny * inv_n, nz * inv_n, nw * inv_n


def _rk4_tick(dt, state, par):
    """One tick, the exact stage sequence of six_dof._rk4: for factor in
    (0, 1/2, 1/2, 1): u := u0 (+) dt*factor*du_prev; pipe; k_i := (vel,
    accel); then u := u0 (+) (dt/6)(k1 + 2k2 + 2k3 + k4)."""
    q0 = state[0:4]
    p0 = state[4:7]
    w0 = state[7:10]
    v0 = state[10:13]

    def set_u(f, dv_w, dv_v, da_w, da_v):
        # u0 (+) f*(dv, da): stf_add_motion on pos, plain add on vel
        h = 0.5 * f
        q = _quat_add_norm(q0, h * dv_w[0], h * dv_w[1], h * dv_w[2])
        p = tuple(p0[i] + f * dv_v[i] for i in range(3))
        w = tuple(w0[i] + f * da_w[i] for i in range(3))
        v = tuple(v0[i] + f * da_v[i] for i in range(3))
        return q, p, w, v

    # stage 0: u0 (+) 0 is exactly [normalize(q), lin]
    inv_n = jax.lax.rsqrt(
        q0[0] * q0[0] + q0[1] * q0[1] + q0[2] * q0[2] + q0[3] * q0[3]
    )
    qn = tuple(c * inv_n for c in q0)
    k1_w, k1_v = w0, v0
    k1_aw, k1_av = _accel(qn, p0, v0, par)

    q, p, w, v = set_u(0.5 * dt, k1_w, k1_v, k1_aw, k1_av)
    k2_w, k2_v = w, v
    k2_aw, k2_av = _accel(q, p, v, par)

    q, p, w, v = set_u(0.5 * dt, k2_w, k2_v, k2_aw, k2_av)
    k3_w, k3_v = w, v
    k3_aw, k3_av = _accel(q, p, v, par)

    q, p, w, v = set_u(dt, k3_w, k3_v, k3_aw, k3_av)
    k4_w, k4_v = w, v
    k4_aw, k4_av = _accel(q, p, v, par)

    sixth = 1.0 / 6.0

    def avg(a, b, c, d):
        return tuple(
            (a[i] + 2 * b[i] + 2 * c[i] + d[i]) * sixth for i in range(3)
        )

    dv_w, dv_v = avg(k1_w, k2_w, k3_w, k4_w), avg(k1_v, k2_v, k3_v, k4_v)
    da_w, da_v = avg(k1_aw, k2_aw, k3_aw, k4_aw), avg(k1_av, k2_av, k3_av, k4_av)
    q, p, w, v = set_u(dt, dv_w, dv_v, da_w, da_v)
    return q + p + w + v


def _kernel(dt, nticks_ref, u_ref, par_ref, out_ref):
    par = par_ref[:]
    params = tuple(par[k] for k in range(N_PARAM))
    u = u_ref[:]
    carry = tuple(u[k] for k in range(N_STATE))

    def body(_i, c):
        return _rk4_tick(dt, c, params)

    # i32 bounds: the repo enables x64, so a python-int 0 would promote the
    # loop counter to i64, which Mosaic cannot legalize
    final = jax.lax.fori_loop(
        jnp.asarray(0, jnp.int32), nticks_ref[0, 0], body, carry
    )
    out_ref[:] = jnp.stack(final)


@functools.partial(jax.jit, static_argnames=("dt", "block_rows", "interpret"))
def _rollout(u, par, nticks, *, dt, block_rows, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = u.shape[1]
    grid = rows // block_rows
    return pl.pallas_call(
        functools.partial(_kernel, dt),
        out_shape=jax.ShapeDtypeStruct(u.shape, jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((N_STATE, block_rows, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((N_PARAM, block_rows, 128), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec(
            (N_STATE, block_rows, 128), lambda i: (0, i, 0)
        ),
        interpret=interpret,
    )(nticks, u, par)


def pack_state(pos, vel, inertia, block_rows: int = 8):
    """(N,7)/(N,6)/(N,7) component columns -> ((13,R,128) state,
    (4,R,128) params, N).  Bodies pad to a multiple of 128*block_rows with
    a safe dummy orbit (unit quat, 400 km circular radius, zero rates)."""
    if block_rows % 8:
        # Mosaic requires the block's last two dims divisible by (8, 128)
        # for f32; interpret mode would silently accept what TPU rejects
        raise ValueError(f"block_rows must be a multiple of 8: {block_rows}")
    pos = np.asarray(pos, np.float32)
    vel = np.asarray(vel, np.float32)
    inertia = np.asarray(inertia, np.float32)
    n = pos.shape[0]
    tile = 128 * block_rows
    n_pad = -(-n // tile) * tile

    chans = np.empty((N_STATE, n_pad), np.float32)
    fill = np.array([0, 0, 0, 1, 6.771e6, 0, 0, 0, 0, 0, 0, 0, 0],
                    np.float32)
    chans[:] = fill[:, None]
    chans[0:4, :n] = pos[:, 0:4].T
    chans[4:7, :n] = pos[:, 4:7].T
    chans[7:10, :n] = vel[:, 0:3].T
    chans[10:13, :n] = vel[:, 3:6].T

    pars = np.ones((N_PARAM, n_pad), np.float32)
    pars[0:3, :n] = (1.0 / inertia[:, 0:3]).T
    pars[3, :n] = 1.0 / inertia[:, 6]

    rows = n_pad // 128
    return (
        chans.reshape(N_STATE, rows, 128),
        pars.reshape(N_PARAM, rows, 128),
        n,
    )


def unpack_state(u, n):
    """(13,R,128) -> (pos (N,7), vel (N,6)) numpy arrays."""
    flat = np.asarray(u).reshape(N_STATE, -1)[:, :n]
    pos = np.concatenate([flat[0:4].T, flat[4:7].T], axis=-1)
    vel = np.concatenate([flat[7:10].T, flat[10:13].T], axis=-1)
    return pos, vel


def sixdof_rollout_sharded(pos, vel, inertia, dt: float, ticks,
                           mesh, axis: str = "dp", block_rows: int = 8,
                           interpret: bool | None = None):
    """Multi-chip `sixdof_rollout`: the padded row axis shards over
    ``mesh[axis]`` with ``shard_map`` and each device runs the SAME
    whole-rollout kernel on its slice — bodies are independent, so there
    are zero collectives and scaling is linear over ICI (the dp axis of
    parallel/mesh.py; SURVEY 2 parallelism item 1).  Returns the same
    (pos (N,7), vel (N,6)) numpy arrays as the single-chip path."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_shards = mesh.shape[axis]
    # every shard needs whole (block_rows, 128) tiles: pad to the lcm
    u, par, n = pack_state(pos, vel, inertia, block_rows * n_shards)
    spec = P(None, axis, None)

    with _x64_off():
        nticks = jnp.asarray([[ticks]], jnp.int32)
        shard_fn = shard_map(
            functools.partial(_rollout, dt=float(dt),
                              block_rows=block_rows, interpret=interpret),
            mesh=mesh,
            in_specs=(spec, spec, P(None, None)),
            out_specs=spec,
            check_vma=False,  # pallas_call has no vma rule; rows shard 1:1
        )
        sharding = NamedSharding(mesh, spec)
        out = jax.jit(shard_fn)(
            jax.device_put(jnp.asarray(u), sharding),
            jax.device_put(jnp.asarray(par), sharding),
            jnp.asarray(nticks),
        )
    return unpack_state(out, n)


def sixdof_rollout(pos, vel, inertia, dt: float, ticks,
                   block_rows: int = 8, interpret: bool | None = None):
    """Run `ticks` RK4 ticks of the flagship batched 6-dof model in one
    kernel launch.  Returns (pos (N,7), vel (N,6)) as numpy arrays.

    `ticks` is a runtime argument (one executable per shape, any length).
    `interpret=None` auto-selects the Mosaic path on TPU and the Pallas
    interpreter elsewhere (tests)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    u, par, n = pack_state(pos, vel, inertia, block_rows)
    with _x64_off():
        nticks = jnp.asarray([[ticks]], jnp.int32)
        out = _rollout(jnp.asarray(u), jnp.asarray(par), nticks,
                       dt=float(dt), block_rows=block_rows,
                       interpret=interpret)
    return unpack_state(out, n)
