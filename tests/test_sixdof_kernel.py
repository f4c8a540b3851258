"""Equivalence of the whole-rollout Pallas 6-dof kernel vs the XLA path.

The kernel (ops/sixdof_kernel.py) re-implements the production tick —
six_dof._rk4 stage sequence + models/sixdof_batch._gravity_thrust_drag +
spatial.sixdof_accel/stf_add_motion (reference:
libs/nox-py/src/integrator/rk4.rs:79-126, libs/nox-py/src/six_dof.rs:137) —
in per-channel scalar form.  These tests run it through the Pallas
interpreter on CPU and require its trajectory to track the f64 XLA truth
as closely as the f32 XLA path does: both are f32 programs of the same
math, so neither may drift past the other by more than rounding-order
factors.  Hardware-path timing equivalence is bench.py's `pallas` stage.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import elodin_tpu as el
from elodin_tpu import _config
from elodin_tpu.ops import sixdof_kernel as sk


def _xla_rollout(policy: str, n: int, ticks: int):
    """Run the production XLA path for `ticks` and return (initial cols,
    final pos (N,7), final vel (N,6)) at the given float policy."""
    from elodin_tpu.models import build_batched_sixdof
    from elodin_tpu.six_dof import increment_sim_tick_system
    from elodin_tpu.system import Pipe, SystemBuilder, as_system

    prev = _config._FLOAT_POLICY
    el.set_float_policy(policy)
    try:
        world, system = build_batched_sixdof(n)
        meta, cols = world.snapshot()
        cols = _config.apply_float_policy(meta, cols)
        full = Pipe(increment_sim_tick_system, as_system(system))
        state = {k: jnp.asarray(v) for k, v in cols.items()}
        init = {k: np.asarray(v) for k, v in state.items()}
        for _ in range(ticks):
            b = SystemBuilder(meta, dict(state))
            full.call(b)
            state = b.cols
        return init, np.asarray(state["world_pos"]), np.asarray(
            state["world_vel"])
    finally:
        el.set_float_policy(prev)


N, TICKS, DT = 192, 100, 1.0 / 120.0


@pytest.fixture(scope="module")
def trajectories():
    init64, pos64, vel64 = _xla_rollout("f64", N, TICKS)
    init32, pos32, vel32 = _xla_rollout("f32", N, TICKS)
    ppos, pvel = sk.sixdof_rollout(
        init32["world_pos"], init32["world_vel"], init32["inertia"],
        dt=DT, ticks=TICKS, block_rows=8,
    )
    return {
        "truth": (pos64, vel64),
        "xla32": (pos32, vel32),
        "pallas": (ppos, pvel),
    }


def _rel_err(a, truth):
    return np.abs(a.astype(np.float64) - truth).max() / np.abs(truth).max()


def test_pallas_tracks_f64_truth(trajectories):
    """The kernel's f32 trajectory lands within rounding-order distance of
    the f64 XLA truth — and no further from it than the f32 XLA path is
    (x4 headroom for op-ordering differences)."""
    pos64, vel64 = trajectories["truth"]
    pos32, vel32 = trajectories["xla32"]
    ppos, pvel = trajectories["pallas"]

    for ours, ref, truth in (
        (ppos[:, 4:], pos32[:, 4:], pos64[:, 4:]),   # position, ~6.8e6 m
        (ppos[:, :4], pos32[:, :4], pos64[:, :4]),   # quaternion
        (pvel[:, 3:], vel32[:, 3:], vel64[:, 3:]),   # linear vel
        (pvel[:, :3], vel32[:, :3], vel64[:, :3]),   # angular vel
    ):
        ours_err = _rel_err(ours, truth)
        ref_err = _rel_err(ref, truth)
        assert ours_err < max(4 * ref_err, 1e-5), (ours_err, ref_err)


def test_pallas_matches_xla_f32_closely(trajectories):
    """Direct f32-vs-f32: same math, same dtype — only op-ordering rounding
    differs, so the two f32 trajectories agree to ~1e-5 relative."""
    pos32, vel32 = trajectories["xla32"]
    ppos, pvel = trajectories["pallas"]
    assert _rel_err(ppos, pos32.astype(np.float64)) < 1e-4
    assert _rel_err(pvel, vel32.astype(np.float64)) < 1e-4


def test_pack_unpack_roundtrip():
    """Padding to the 128*block_rows tile and back is exact, for a body
    count that is NOT a multiple of the tile."""
    rng = np.random.default_rng(3)
    n = 77
    pos = rng.normal(size=(n, 7)).astype(np.float32)
    vel = rng.normal(size=(n, 6)).astype(np.float32)
    inertia = rng.uniform(1.0, 2.0, (n, 7)).astype(np.float32)
    u, par, n_out = sk.pack_state(pos, vel, inertia, block_rows=8)
    assert n_out == n
    assert u.shape == (sk.N_STATE, 8, 128)  # 77 -> 1024 slot pad
    p2, v2 = sk.unpack_state(u, n)
    np.testing.assert_array_equal(p2, pos)
    np.testing.assert_array_equal(v2, vel)
    # params: inverse inertia diag + inverse mass
    flat = par.reshape(sk.N_PARAM, -1)[:, :n]
    np.testing.assert_allclose(flat[0:3].T, 1.0 / inertia[:, 0:3], rtol=1e-6)
    np.testing.assert_allclose(flat[3], 1.0 / inertia[:, 6], rtol=1e-6)


def test_zero_ticks_is_identity():
    """ticks is a RUNTIME argument; 0 trips returns the input unchanged
    (the dynamic-trip contract the bench's differential timing relies on)."""
    rng = np.random.default_rng(5)
    n = 64
    pos = rng.normal(size=(n, 7)).astype(np.float32)
    pos[:, 4:] += np.array([7e6, 0, 0], np.float32)
    vel = rng.normal(size=(n, 6)).astype(np.float32)
    inertia = np.ones((n, 7), np.float32)
    ppos, pvel = sk.sixdof_rollout(pos, vel, inertia, dt=DT, ticks=0,
                                   block_rows=8)
    np.testing.assert_array_equal(ppos, pos)
    np.testing.assert_array_equal(pvel, vel)


def test_sharded_rollout_matches_unsharded():
    """shard_map over the row axis (8-device CPU mesh from conftest) is
    bitwise the single-device rollout: bodies are independent, so the
    sharded kernel runs the identical program per slice with zero
    collectives (SURVEY 2 parallelism item 1)."""
    from elodin_tpu.parallel import make_mesh

    mesh = make_mesh(8, dp=8)
    rng = np.random.default_rng(11)
    n = 500  # NOT a multiple of the 8-shard tile: exercises padding
    pos = np.empty((n, 7), np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    pos[:, 0:4] = q / np.linalg.norm(q, axis=1, keepdims=True)
    pos[:, 4:] = rng.normal(0, 1e4, (n, 3)) + np.array([6.771e6, 0, 0])
    vel = rng.normal(0, 10.0, (n, 6)).astype(np.float32)
    vel[:, 0:3] *= 1e-3
    inertia = rng.uniform(1.0, 3.0, (n, 7)).astype(np.float32)

    single = sk.sixdof_rollout(pos, vel, inertia, dt=DT, ticks=25,
                               block_rows=8)
    shard = sk.sixdof_rollout_sharded(pos, vel, inertia, dt=DT, ticks=25,
                                      mesh=mesh, block_rows=8)
    np.testing.assert_array_equal(shard[0], single[0])
    np.testing.assert_array_equal(shard[1], single[1])


def test_padding_bodies_stay_finite():
    """The pad-slot dummy orbit must survive long rollouts (a NaN in a pad
    lane would poison nothing today, but the bench asserts global
    finiteness on the packed array)."""
    n = 10  # pads to 1024 with block_rows=8
    pos = np.zeros((n, 7), np.float32)
    pos[:, 3] = 1.0
    pos[:, 4] = 6.771e6
    vel = np.zeros((n, 6), np.float32)
    vel[:, 4] = np.sqrt(sk.MU / 6.771e6)
    inertia = np.ones((n, 7), np.float32)
    u, par, _ = sk.pack_state(pos, vel, inertia, block_rows=8)
    with sk._x64_off():
        out = sk._rollout(jnp.asarray(u), jnp.asarray(par),
                          jnp.asarray([[50]], jnp.int32),
                          dt=DT, block_rows=8, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
