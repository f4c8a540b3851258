"""Differentiable-simulation layer (elodin_tpu/diff.py): gradients through
whole rollouts, rematerialization, trajectory recording, batched candidates.
Beyond-reference capability — the reference's exec backends
(cranelift_exec.rs / jax_exec.rs) have no adjoint path."""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


def load_orbit():
    path = os.path.join(EXAMPLES, "orbit-retarget", "main.py")
    sys.path.insert(0, os.path.join(EXAMPLES, "orbit-retarget"))
    try:
        spec = importlib.util.spec_from_file_location("orbit_retarget_main", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.pop(0)


def _make_rollout(mod, ticks=60, **kw):
    import elodin as el

    w = mod.build_world()
    return el.rollout(
        w,
        el.six_dof(sys=mod.gravity),
        ticks,
        simulation_rate=1.0 / mod.SIM_TIME_STEP,
        **kw,
    )


def test_grad_matches_finite_difference():
    from elodin_tpu.diff import entity_row

    mod = load_orbit()
    roll = _make_rollout(mod, ticks=60, outputs=("world_pos",))
    row = entity_row(roll.meta, "world_pos", "craft")
    v_col0 = roll.initial_state["world_vel"]

    def loss(v0):
        final = roll({"world_vel": v_col0.at[row, 3:].set(v0)})
        return jnp.sum(final["world_pos"][row, 4:] ** 2)

    v0 = jnp.array([0.1, 1.0, 0.05])
    g = jax.grad(loss)(v0)
    eps = 1e-6
    for i in range(3):
        e = jnp.zeros(3).at[i].set(eps)
        fd = (loss(v0 + e) - loss(v0 - e)) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), float(fd), rtol=1e-5, atol=1e-8)


def test_remat_matches_plain_value_and_grad():
    from elodin_tpu.diff import entity_row

    mod = load_orbit()
    plain = _make_rollout(mod, ticks=60, outputs=("world_pos",))
    remat = _make_rollout(
        mod, ticks=60, outputs=("world_pos",), remat_segments=6
    )
    row = entity_row(plain.meta, "world_pos", "craft")
    v_col0 = plain.initial_state["world_vel"]

    def mk_loss(roll):
        def loss(v0):
            final = roll({"world_vel": v_col0.at[row, 3:].set(v0)})
            return jnp.sum(final["world_pos"][row, 4:] ** 2)

        return loss

    v0 = jnp.array([0.2, 0.9, 0.0])
    va, ga = jax.value_and_grad(mk_loss(plain))(v0)
    vb, gb = jax.value_and_grad(mk_loss(remat))(v0)
    np.testing.assert_allclose(float(va), float(vb), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-9)


def test_recorded_trajectory_matches_final_state_and_remat_order():
    mod = load_orbit()
    rec = _make_rollout(mod, ticks=48, outputs=("world_pos",), record=True)
    fin = _make_rollout(mod, ticks=48, outputs=("world_pos",))
    rec_remat = _make_rollout(
        mod, ticks=48, outputs=("world_pos",), record=True, remat_segments=4
    )
    traj = rec(None)["world_pos"]
    assert traj.shape[0] == 48
    final = fin(None)["world_pos"]
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(final))
    # remat reshape must preserve tick ordering exactly
    traj2 = rec_remat(None)["world_pos"]
    np.testing.assert_allclose(np.asarray(traj2), np.asarray(traj))


def test_vmap_over_candidate_batch():
    from elodin_tpu.diff import entity_row

    mod = load_orbit()
    roll = _make_rollout(mod, ticks=30, outputs=("world_pos",))
    row = entity_row(roll.meta, "world_pos", "craft")
    v_col0 = roll.initial_state["world_vel"]

    def final_pos(v0):
        return roll({"world_vel": v_col0.at[row, 3:].set(v0)})["world_pos"][row, 4:]

    v0s = jnp.array([[0.0, 1.0, 0.0], [0.1, 0.9, 0.0], [0.3, 1.1, 0.0]])
    batched = jax.vmap(final_pos)(v0s)
    assert batched.shape == (3, 3)
    single = final_pos(v0s[1])
    np.testing.assert_allclose(np.asarray(batched[1]), np.asarray(single),
                               rtol=1e-12)


def test_optimization_converges():
    mod = load_orbit()
    _, miss = mod.solve(iters=120, verbose=False)
    assert miss < 2e-2, miss


def test_rollout_argument_errors():
    import elodin as el

    mod = load_orbit()
    w = mod.build_world()
    sys_ = el.six_dof(sys=mod.gravity)
    with pytest.raises(ValueError):
        el.rollout(w, sys_, 50, remat_segments=7)  # 50 % 7 != 0
    with pytest.raises(ValueError):
        el.rollout(w, sys_, 50, record=True)  # record needs outputs
    with pytest.raises(KeyError):
        el.rollout(w, sys_, 50, outputs=("nope",))
    roll = el.rollout(w, sys_, 10)
    with pytest.raises(KeyError):
        roll({"nope": jnp.zeros(3)})


def test_neural_hover_trains():
    """Analytic policy gradients through the sim: a few dozen optimizer
    steps must already fly the held-out start much closer to the target
    than its ~2.4 m initial distance."""
    path = os.path.join(EXAMPLES, "neural-hover", "main.py")
    sys.path.insert(0, os.path.join(EXAMPLES, "neural-hover"))
    try:
        spec = importlib.util.spec_from_file_location("neural_hover_main", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.pop(0)
    params, _ = mod.train(iters=80, batch=8, verbose=False)
    miss, speed = mod.evaluate(params)
    assert miss < 0.6, miss
    assert speed < 2.0, speed


def test_system_identification_gravity_parameter():
    """Parameter gradients through physics: recover the central body's
    gravitational parameter (an INERTIA column override) from an observed
    trajectory by gradient descent — the system-identification use case."""
    import elodin as el
    import optax

    from elodin_tpu.diff import entity_row

    mod = load_orbit()
    w = mod.build_world()
    roll = el.rollout(
        w, el.six_dof(sys=mod.gravity), 120,
        outputs=("world_pos",), record=True,
        simulation_rate=1.0 / mod.SIM_TIME_STEP,
    )
    crow = entity_row(roll.meta, "inertia", "center")
    prow = entity_row(roll.meta, "world_pos", "craft")
    inertia0 = roll.initial_state["inertia"]

    def traj(mu):
        # spatial-inertia column layout [ixx,iyy,izz, px,py,pz, m]:
        # mass is element 6
        col = inertia0.at[crow, 6].set(mu)
        return roll({"inertia": col})["world_pos"][:, prow, 4:]

    observed = traj(jnp.float64(1.0))  # ground truth mu = 1

    def loss(mu):
        return jnp.mean((traj(mu) - observed) ** 2)

    mu = jnp.float64(0.7)  # 30% wrong initial guess
    opt = optax.adam(2e-2)
    state = opt.init(mu)
    vg = jax.jit(jax.value_and_grad(loss))
    for _ in range(120):
        _, g = vg(mu)
        updates, state = opt.update(g, state)
        mu = optax.apply_updates(mu, updates)
    assert abs(float(mu) - 1.0) < 1e-3, float(mu)
