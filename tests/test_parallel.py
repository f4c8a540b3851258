"""Mesh-sharding tests on the virtual 8-device CPU mesh: entity-axis
sharding with cross-shard interactions, sample-axis campaigns."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import elodin_tpu as el
from elodin_tpu.parallel import make_mesh, sharded_step, shard_cols
from elodin_tpu.models import build_batched_sixdof
from elodin_tpu.six_dof import increment_sim_tick_system
from elodin_tpu.system import Pipe, SystemBuilder, as_system


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    # explicit ep=2: these tests exercise the entity-sharding collectives
    return make_mesh(8, ep=2)


def test_make_mesh_defaults_to_dp_only():
    """Default mesh is pure sample-parallel: an unrequested ep slice wastes
    half the mesh when the entity count doesn't divide it (VERDICT r3 w7)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    m = make_mesh(8)
    assert m.shape["dp"] == 8 and m.shape["ep"] == 1
    m = make_mesh(8, ep=2)
    assert m.shape["dp"] == 4 and m.shape["ep"] == 2
    m = make_mesh(8, dp=2)
    assert m.shape["dp"] == 2 and m.shape["ep"] == 4


def _step_fn(meta, system):
    full = Pipe(increment_sim_tick_system, as_system(system))

    def step(state):
        b = SystemBuilder(meta, dict(state))
        full.call(b)
        return b.cols

    return step


def test_entity_sharded_step_matches_single_device(mesh):
    """Sharding the entity axis over ep must not change the physics."""
    world, system = build_batched_sixdof(64)
    meta, cols = world.snapshot()
    step = _step_fn(meta, system)

    # single device
    ref = jax.jit(step)({k: jnp.asarray(v) for k, v in cols.items()})

    fn, placed = sharded_step(step, mesh, cols)
    out = fn(placed)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-12, atol=1e-12,
            err_msg=k,
        )
    # body columns really are distributed over the ep axis
    ws = out["world_pos"].sharding
    assert len(ws.device_set) >= 2, "entity axis not distributed"


def test_sample_sharded_campaign_matches_single_device(mesh):
    """dp-sharded Monte Carlo equals the unsharded vmap computation."""
    world, system = build_batched_sixdof(8)
    meta, cols = world.snapshot()
    step = _step_fn(meta, system)
    vstep = jax.vmap(step)

    n_samples = 16
    batched = {
        k: jnp.asarray(np.broadcast_to(v, (n_samples,) + v.shape).copy())
        for k, v in cols.items()
    }
    ref = jax.jit(vstep)(batched)

    fn, placed = sharded_step(vstep, mesh, batched, sample_axis=True)
    out = fn(placed)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(ref[k]), rtol=1e-12, atol=1e-12,
            err_msg=k,
        )


def test_edge_fold_under_entity_sharding(mesh):
    """TotalEdge n-body forces need cross-shard gathers; XLA inserts the
    collectives and the result matches the unsharded run."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "n-body"))
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "nbody_main_shard",
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "examples", "n-body", "main.py"),
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.pop(0)

    w = mod.build_world(n_asteroids=14, seed=3)  # 16 bodies + globals
    meta, cols = w.snapshot()
    step = _step_fn(meta, mod.build_system())
    ref = jax.jit(step)({k: jnp.asarray(v) for k, v in cols.items()})
    fn, placed = sharded_step(step, mesh, cols)
    out = fn(placed)
    np.testing.assert_allclose(
        np.asarray(out["force"]), np.asarray(ref["force"]), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out["world_pos"]), np.asarray(ref["world_pos"]), rtol=1e-12
    )


def test_falcon9_campaign_sharded_matches_unsharded(mesh):
    """The flagship falcon9 dispersed campaign produces identical touchdown
    metrics when its sample axis is sharded over the 8-device mesh."""
    import importlib.util
    import os
    import sys

    examples = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
    )
    saved = sys.modules.pop("sim", None)
    sys.path.insert(0, os.path.join(examples, "falcon9"))
    try:
        spec = importlib.util.spec_from_file_location(
            "falcon9_batched_shard", os.path.join(examples, "falcon9", "batched.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        # short horizon: through MECO + boostback start (full mission takes
        # minutes on the CPU mesh; determinism is what's under test)
        ticks = 18_000  # 180 s
        plain = mod.run_campaign(16, ticks=ticks, seed=3)
        sharded = mod.run_campaign(16, ticks=ticks, seed=3, mesh=mesh)
    finally:
        sys.path.pop(0)
        sys.modules.pop("sim", None)
        if saved is not None:
            sys.modules["sim"] = saved
    assert sharded["landed_frac"] == plain["landed_frac"]
    assert sharded["soft_landing_frac"] == plain["soft_landing_frac"]


def test_pairwise_gravity_sharded_matches_single(mesh):
    """N^2 gravity sharded over the body axis (row-block x all-gather)
    matches the single-device broadcast form."""
    import numpy as np

    from elodin_tpu.ops.pairwise import (
        pairwise_gravity_reference,
        pairwise_gravity_sharded,
    )

    rng = np.random.default_rng(4)
    n = 64  # divisible by every axis size of the 8-device mesh
    pos = rng.normal(size=(n, 3)) * 1e3
    mass = np.abs(rng.normal(size=(n,))) * 1e9

    want = np.asarray(
        pairwise_gravity_reference(jnp.asarray(pos), jnp.asarray(mass), eps=1.0)
    )
    got = np.asarray(
        pairwise_gravity_sharded(pos, mass, mesh, eps=1.0)
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_entity_sharding_mesh_without_ep_axis():
    """Regression: pure sample-parallel meshes (no 'ep' axis) crashed with
    KeyError('ep') in entity_sharding."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from elodin_tpu.parallel.mesh import entity_sharding, shard_cols

    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices, ("samples",))
    s = entity_sharding(mesh, rows=8, ndim=2, sample_axis=False)
    assert s is not None
    cols = {"x": jax.numpy.zeros((4, 8, 3))}
    placed = shard_cols(mesh, cols, sample_axis=True)
    assert placed["x"].shape == (4, 8, 3)


def test_until_early_stop_sharded_matches_unsharded(mesh, monkeypatch):
    """run(until=) latches across shards: the all-samples-terminal
    reduction is a cross-shard jnp.all over the dp axis, and the sharded
    campaign must stop at the same segment boundary with identical state."""
    import typing as ty
    from dataclasses import dataclass, field

    from elodin_tpu.monte_carlo import BatchedCampaign

    Count = ty.Annotated[jax.Array, el.Component("count", el.ComponentType.F64)]

    @dataclass
    class A(el.Archetype):
        count: Count = field(default_factory=lambda: jnp.float64(0.0))

    @el.map
    def inc(c: Count) -> Count:
        return jnp.minimum(c + 1.0, 5.0)

    def mk(use_mesh):
        w = el.World()
        w.spawn(A(), name="e")
        # staggered starts: shards latch at different ticks, so the
        # all-reduce really has to see every shard before stopping
        starts = np.arange(16) % 3
        return BatchedCampaign(w, inc, 16, {"e.count": starts},
                               simulation_rate=10.0,
                               mesh=mesh if use_mesh else None)

    monkeypatch.setenv("ELODIN_MC_SEGMENT_TICKS", "3")
    until = lambda cols: cols["count"] >= 5.0  # noqa: E731

    plain = mk(False).run(20, until=until)
    shard = mk(True).run(20, until=until)
    assert shard.ticks == plain.ticks
    np.testing.assert_array_equal(shard.component("e.count"),
                                  plain.component("e.count"))

    # history path: emits recorded up to the same early-stop boundary
    ph = mk(False).run(20, history_every=2, history_components=["e.count"],
                       until=until)
    sh = mk(True).run(20, history_every=2, history_components=["e.count"],
                      until=until)
    assert sh.ticks == ph.ticks
    np.testing.assert_array_equal(np.asarray(sh.history["count"]),
                                  np.asarray(ph.history["count"]))


def test_every_sharded_matches_unsharded(mesh):
    """el.every rate groups under dp sharding: the lifted scalar gate (and
    the full_rate_when any()-reduction, a cross-shard collective) schedule
    identically to the unsharded campaign."""
    import typing as ty
    from dataclasses import dataclass, field

    from elodin_tpu.monte_carlo import BatchedCampaign

    Runs = ty.Annotated[jax.Array, el.Component("gnc_runs", el.ComponentType.F64)]
    Fast = ty.Annotated[jax.Array, el.Component("fast_runs", el.ComponentType.F64)]

    @dataclass
    class A(el.Archetype):
        gnc_runs: Runs = field(default_factory=lambda: jnp.float64(0.0))
        fast_runs: Fast = field(default_factory=lambda: jnp.float64(0.0))

    @el.map
    def gnc(r: Runs) -> Runs:
        return r + 1.0

    @el.map
    def fast(f: Fast) -> Fast:
        return f + 1.0

    def mk(use_mesh, system):
        w = el.World()
        w.spawn(A(), name="e")
        return BatchedCampaign(w, system, 16, {"e.gnc_runs": np.zeros(16)},
                               simulation_rate=10.0,
                               mesh=mesh if use_mesh else None)

    sys_ = el.every(3, gnc) | fast
    plain = mk(False, sys_).run(9)
    shard = mk(True, sys_).run(9)
    np.testing.assert_array_equal(shard.component("e.gnc_runs"),
                                  plain.component("e.gnc_runs"))
    np.testing.assert_array_equal(shard.component("e.fast_runs"),
                                  plain.component("e.fast_runs"))

    # full_rate_when: only SOME samples (on some shards) satisfy the
    # predicate — the any()-reduce must escalate every shard identically
    esc = el.every(4, gnc, full_rate_when=lambda cols: cols["fast_runs"] >= 6.0)
    plain = mk(False, esc | fast).run(10)
    shard = mk(True, esc | fast).run(10)
    np.testing.assert_array_equal(shard.component("e.gnc_runs"),
                                  plain.component("e.gnc_runs"))


def test_mixed_float_policy_sharded_matches_unsharded(mesh):
    """The per-component mixed float policy composes with dp sharding:
    policy-cast columns shard cleanly and the physics is bit-identical to
    the unsharded mixed run."""
    from elodin_tpu import _config
    from elodin_tpu.monte_carlo import BatchedCampaign

    prev = _config._FLOAT_POLICY
    _config.set_float_policy("mixed")
    try:
        world, system = build_batched_sixdof(8)
        plain = BatchedCampaign(world, system, 16, simulation_rate=120.0)
        r_plain = plain.run(50)
        world2, system2 = build_batched_sixdof(8)
        shard = BatchedCampaign(world2, system2, 16, simulation_rate=120.0,
                                mesh=mesh)
        r_shard = shard.run(50)
    finally:
        _config.set_float_policy(prev)
    for k in r_plain.final:
        np.testing.assert_array_equal(
            np.asarray(r_shard.final[k]), np.asarray(r_plain.final[k]),
            err_msg=k,
        )
