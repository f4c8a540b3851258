"""CRS-12 truth reference profile from the vendored public-domain webcast
telemetry (data/crs12/, Unlicense).

Parity target: reference examples/falcon9/reference.py — load the raw
stage-1 telemetry, clean it (uniform resample, median despike,
moving-average smooth), and expose the speed/altitude scoring channels plus
the recorded event times.  Implementation is original; stdlib-only so the
tests and tooling can use it without jax.
"""

from __future__ import annotations

import json
import statistics
from pathlib import Path

DATA_DIR = Path(__file__).parent / "data"
GRID_DT_S = 0.5


def _resample(ts, ys, dt):
    """Linear interpolation onto a uniform grid."""
    out_t, out_y = [], []
    t = ts[0]
    i = 0
    while t <= ts[-1]:
        while i + 1 < len(ts) and ts[i + 1] < t:
            i += 1
        if i + 1 >= len(ts):
            out_t.append(t)
            out_y.append(ys[-1])
        else:
            span = ts[i + 1] - ts[i]
            f = (t - ts[i]) / span if span > 0 else 0.0
            out_t.append(t)
            out_y.append(ys[i] + f * (ys[i + 1] - ys[i]))
        t += dt
    return out_t, out_y


def _median_despike(ys, window: int = 5):
    half = window // 2
    out = []
    for i in range(len(ys)):
        lo, hi = max(0, i - half), min(len(ys), i + half + 1)
        med = statistics.median(ys[lo:hi])
        # replace only genuine spikes, keep real dynamics
        out.append(med if abs(ys[i] - med) > 3.0 * (abs(med) * 0.05 + 5.0)
                   else ys[i])
    return out


def _smooth(ys, window: int = 5):
    half = window // 2
    out = []
    for i in range(len(ys)):
        lo, hi = max(0, i - half), min(len(ys), i + half + 1)
        out.append(sum(ys[lo:hi]) / (hi - lo))
    return out


def load_profile(mission: str = "crs12", grid_dt: float = GRID_DT_S) -> dict:
    """Cleaned truth profile: dict(time_s, speed_mps, altitude_m)."""
    raw = json.loads((DATA_DIR / mission / "stage1_raw.json").read_text())
    t, v = _resample(raw["time"], raw["velocity"], grid_dt)
    _, alt_km = _resample(raw["time"], raw["altitude"], grid_dt)
    v = _smooth(_median_despike(v))
    alt = [a * 1000.0 for a in _smooth(_median_despike(alt_km))]
    return {"time_s": t, "speed_mps": v, "altitude_m": alt}


def events(mission: str = "crs12") -> dict:
    """Recorded event times (s): maxq, meco, boostback, entry, landing."""
    return json.loads((DATA_DIR / mission / "events.json").read_text())


def value_at(profile: dict, t: float, channel: str) -> float:
    ts = profile["time_s"]
    ys = profile[channel]
    if t <= ts[0]:
        return ys[0]
    if t >= ts[-1]:
        return ys[-1]
    import bisect

    i = bisect.bisect_right(ts, t) - 1
    f = (t - ts[i]) / (ts[i + 1] - ts[i])
    return ys[i] + f * (ys[i + 1] - ys[i])


def sanity_check() -> None:
    p = load_profile()
    ev = events()
    assert p["time_s"][-1] > 400.0
    assert max(p["speed_mps"]) > 1500.0
    assert max(p["altitude_m"]) > 100_000.0
    assert 100.0 < ev["meco"] < 200.0


if __name__ == "__main__":
    sanity_check()
    p = load_profile()
    ev = events()
    print(f"profile: {len(p['time_s'])} pts to t={p['time_s'][-1]:.0f}s, "
          f"vmax={max(p['speed_mps']):.0f} m/s, "
          f"apogee={max(p['altitude_m'])/1000:.1f} km")
    print("events:", {k: v for k, v in ev.items() if v is not None})
