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
