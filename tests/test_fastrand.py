"""Counter-hash noise generator (ops/fastrand): determinism, distribution
quality sufficient for sensor noise, and stream separation.

The module exists because threefry costs ~120 HLO ops per draw and the
interactive 1-entity regime is dispatch-bound (docs/PERFORMANCE.md); these
gates pin the statistical contract the drone's IMU relies on.
"""

import jax
import jax.numpy as jnp
import numpy as np

from elodin_tpu.ops import fastrand


def test_deterministic_and_tick_separated():
    a = fastrand.normal(jnp.int32(7), 450, (4, 3))
    b = fastrand.normal(jnp.int32(7), 450, (4, 3))
    c = fastrand.normal(jnp.int32(8), 450, (4, 3))
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))
    # float ticks (the ECS carries sensor_tick as f64) hit the same stream
    d = fastrand.normal(jnp.float64(7.0), 450, (4, 3))
    assert np.array_equal(np.asarray(a), np.asarray(d))


def test_salt_separates_streams():
    a = np.asarray(fastrand.normal(jnp.int32(3), 1, (64,)))
    b = np.asarray(fastrand.normal(jnp.int32(3), 2, (64,)))
    assert not np.array_equal(a, b)
    # streams from different salts must be uncorrelated
    r = np.corrcoef(a, b)[0, 1]
    assert abs(r) < 0.35


def test_normal_moments_and_range():
    # Pool draws across many ticks — exactly how a sim consumes them.
    zs = np.concatenate(
        [np.asarray(fastrand.normal(jnp.int32(t), 450, (12,))) for t in range(500)]
    )
    assert abs(zs.mean()) < 0.02, zs.mean()
    assert abs(zs.std() - 1.0) < 0.02, zs.std()
    assert np.isfinite(zs).all()
    assert np.abs(zs).max() < 6.5  # no Box-Muller log(0) blowup
    # tails exist (it's actually a normal, not clipped uniform)
    assert (np.abs(zs) > 2.0).mean() > 0.02


def test_uniform_open_at_zero():
    u = np.asarray(fastrand.uniform(jnp.int32(0), 0, (4096,)))
    assert (u > 0.0).all() and (u <= 1.0).all()
    assert abs(u.mean() - 0.5) < 0.02


def test_consecutive_tick_lanes_uncorrelated():
    # lag-1 autocorrelation per lane across ticks — the failure mode of a
    # weak counter mix is visible structure between adjacent ticks.
    rows = np.stack(
        [np.asarray(fastrand.normal(jnp.int32(t), 450, (12,))) for t in range(400)]
    )
    for lane in range(12):
        x = rows[:, lane]
        r = np.corrcoef(x[:-1], x[1:])[0, 1]
        assert abs(r) < 0.2, (lane, r)


def test_jit_and_scan_safe():
    def body(c, t):
        z = fastrand.normal(t, 9, (4, 3))
        return c + z.sum(), None

    total, _ = jax.lax.scan(body, jnp.float64(0.0), jnp.arange(100, dtype=jnp.int32))
    assert np.isfinite(float(total))
