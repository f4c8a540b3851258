"""Batched Monte-Carlo campaign artifacts and in-graph trajectory emit
(reference libs/monte-carlo/src/lib.rs:103-117 output contract)."""

import os

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)


def test_batched_history_and_artifacts(tmp_path):
    """In-graph decimated trajectory emit + the process-mode artifact set
    from the batched path (reference libs/monte-carlo/src/lib.rs:103-117):
    results/plan/perf/summary plus trajectories.npz, with the last emit
    bitwise-equal to the final state."""
    import json
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(EXAMPLES, "falcon9"))
    saved = sys.modules.pop("sim", None)
    try:
        import importlib.util as ilu

        spec = ilu.spec_from_file_location(
            "f9_batched_hist", os.path.join(EXAMPLES, "falcon9", "batched.py")
        )
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        out = mod.run_campaign(
            4, ticks=3000, seed=3, out_dir=tmp_path, history_every=500
        )
    finally:
        sys.path.pop(0)
        sys.modules.pop("sim", None)
        if saved is not None:
            sys.modules["sim"] = saved

    for name in ("plan.csv", "results.csv", "perf.csv", "summary.json",
                 "trajectories.npz"):
        assert (tmp_path / name).exists(), name

    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["total"] == 4 and summary["mode"] == "batched"
    assert "world_pos" in summary["history_components"]

    npz = np.load(tmp_path / "trajectories.npz")
    pos = npz["world_pos"]  # (n_emits, n_samples, n_entities, 7)
    assert pos.shape[0] == 6 and pos.shape[1] == 4
    times = npz["times"]
    assert times.shape == (6,) and abs(times[0] - 5.0) < 1e-9  # 500 ticks @ 100 Hz
    # trajectories diverge across dispersed samples but stay finite
    assert np.isfinite(pos).all()
    spread = np.abs(pos[-1, :, 0, 4:] - pos[-1, :1, 0, 4:]).max()
    assert spread > 1.0  # dispersion visible in position

    # results.csv carries params + scores per sample
    rows = (tmp_path / "results.csv").read_text().splitlines()
    assert len(rows) == 5 and "param.thrust_eff" in rows[0]
    assert "miss_distance" in rows[0] and rows[0].endswith("valid")


def test_history_path_honors_segment_ticks(monkeypatch):
    """ELODIN_MC_SEGMENT_TICKS must bound device-launch size on the
    trajectory-recording path too (it silently compiled the whole run into
    one launch before); segmented and monolithic runs produce identical
    histories and final state."""
    import numpy as np

    from elodin_tpu.models import build_batched_sixdof
    from elodin_tpu.monte_carlo import BatchedCampaign

    def run_one(seg):
        monkeypatch.setenv("ELODIN_MC_SEGMENT_TICKS", str(seg))
        world, system = build_batched_sixdof(3)
        c = BatchedCampaign(world, system, n_samples=4)
        r = c.run(ticks=70, history_every=10,
                  history_components=["world_pos"])
        return r

    a = run_one(25)   # 2 emits/launch -> launches of 20/20/20 + 10 ticks
    b = run_one(100_000)  # effectively one launch
    assert a.history["world_pos"].shape == b.history["world_pos"].shape == (
        7, 4, 3, 7)
    np.testing.assert_array_equal(a.history["world_pos"],
                                  b.history["world_pos"])
    np.testing.assert_array_equal(np.asarray(a.final["world_pos"]),
                                  np.asarray(b.final["world_pos"]))
    np.testing.assert_allclose(a.history_times, b.history_times)


def test_history_every_exceeding_ticks_rejected():
    import pytest

    from elodin_tpu.models import build_batched_sixdof
    from elodin_tpu.monte_carlo import BatchedCampaign

    world, system = build_batched_sixdof(2)
    c = BatchedCampaign(world, system, n_samples=2)
    with pytest.raises(ValueError, match="history_every"):
        c.run(ticks=5, history_every=10)


def test_until_early_stop_both_paths(monkeypatch):
    """Terminal early-stop (BatchedCampaign.run(until=...)): once every
    sample satisfies the in-graph predicate at a segment boundary the
    remaining segments are skipped.  The sim latches (min with 5), so the
    early-stopped result is bit-identical to the full run — the soundness
    condition documented on run().  Covers the no-history and history
    paths plus ticks/history_times accounting."""
    import typing as ty
    from dataclasses import dataclass, field

    import jax
    import jax.numpy as jnp
    import numpy as np

    import elodin_tpu as el
    from elodin_tpu.monte_carlo import BatchedCampaign

    Count = ty.Annotated[jax.Array, el.Component("count", el.ComponentType.F64)]

    @dataclass
    class A(el.Archetype):
        count: Count = field(default_factory=lambda: jnp.float64(0.0))

    @el.map
    def inc(c: Count) -> Count:
        return jnp.minimum(c + 1.0, 5.0)

    def mk():
        w = el.World()
        w.spawn(A(), name="e")
        return BatchedCampaign(w, inc, 4, {"e.count": np.zeros(4)},
                               simulation_rate=10.0)

    monkeypatch.setenv("ELODIN_MC_SEGMENT_TICKS", "3")
    until = lambda cols: cols["count"] >= 5.0  # noqa: E731

    r = mk().run(20, until=until)
    assert r.ticks == 6  # latched at tick 5; first all-done boundary = 6
    np.testing.assert_array_equal(r.component("e.count"), np.full(4, 5.0))
    full = mk().run(20)
    assert full.ticks == 20
    np.testing.assert_array_equal(  # latching makes early-stop exact
        np.asarray(r.final["count"]), np.asarray(full.final["count"]))

    rh = mk().run(20, history_every=2, history_components=["e.count"],
                  until=until)
    assert rh.ticks == 6
    assert rh.history["count"].shape[0] == 3  # emits actually recorded
    np.testing.assert_allclose(rh.history_times, [0.2, 0.4, 0.6])


def test_until_cache_hits_across_fresh_lambdas(monkeypatch):
    """The AOT-compile cache must key on the predicate's code+closure, not
    callable identity: the natural usage passes a fresh lambda to each
    run() call (examples/falcon9/batched.py does), and an identity key
    re-lowers + re-compiles every time — the exact cost the cache exists
    to avoid (round-4 advisor finding)."""
    import typing as ty
    from dataclasses import dataclass, field

    import jax
    import jax.numpy as jnp
    import numpy as np

    import elodin_tpu as el
    from elodin_tpu.monte_carlo import BatchedCampaign

    Count = ty.Annotated[jax.Array, el.Component("cnt", el.ComponentType.F64)]

    @dataclass
    class A(el.Archetype):
        cnt: Count = field(default_factory=lambda: jnp.float64(0.0))

    @el.map
    def inc(c: Count) -> Count:
        return jnp.minimum(c + 1.0, 5.0)

    w = el.World()
    w.spawn(A(), name="e")
    c = BatchedCampaign(w, inc, 4, {"e.cnt": np.zeros(4)},
                        simulation_rate=10.0)

    def make_until(lim):
        return lambda cols: cols["cnt"] >= lim

    c.run(8, until=make_until(5.0))
    n_compiled = len(c._jit_cache)
    c.run(8, until=make_until(5.0))  # fresh lambda, same code+closure
    assert len(c._jit_cache) == n_compiled, "fresh identical lambda missed"
    # a DIFFERENT closure value must NOT collide
    c.run(8, until=make_until(3.0))
    assert len(c._jit_cache) == n_compiled + 1
