"""Gather-free interpolation ops (elodin_tpu/ops/interp.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.ndimage import map_coordinates

from elodin_tpu.ops.interp import interp, lerp_nd


def test_interp_matches_jnp_interp():
    xp = jnp.asarray([0.01, 0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 24.0, 32.0, 32.15])
    fp = jnp.asarray([322.0, 180.0, 120.0, 95.0, 88.4, 88.4, 88.4, 88.4, 88.4, 0.0])
    # interior, on-knot, below-range, above-range points
    x = jnp.asarray([-1.0, 0.01, 0.3, 0.5, 3.0, 17.5, 32.07, 32.15, 100.0])
    np.testing.assert_allclose(
        interp(x, xp, fp), jnp.interp(x, xp, fp), rtol=1e-12, atol=1e-12
    )
    # scalar input keeps scalar shape
    assert interp(jnp.float64(3.0), xp, fp).shape == ()
    # non-uniform grid, random queries, under vmap + jit
    rng = np.random.default_rng(0)
    xp2 = jnp.asarray(np.sort(rng.uniform(-5, 5, 17)))
    fp2 = jnp.asarray(rng.normal(size=17))
    xs = jnp.asarray(rng.uniform(-7, 7, 256))
    got = jax.jit(jax.vmap(lambda v: interp(v, xp2, fp2)))(xs)
    np.testing.assert_allclose(got, jnp.interp(xs, xp2, fp2),
                               rtol=1e-10, atol=1e-10)


def test_lerp_nd_matches_map_coordinates():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(3, 5, 4)))

    def ref(coords):
        return map_coordinates(table, [c for c in coords], 1, mode="nearest")

    # in-range + out-of-range fractional coords (clamped edge semantics)
    for coords in ([0.5, 2.25, 1.9], [0.0, 0.0, 0.0], [2.0, 4.0, 3.0],
                   [-1.2, 5.7, 0.4], [2.9, -0.5, 9.0]):
        c = [jnp.float64(v) for v in coords]
        np.testing.assert_allclose(
            lerp_nd(table, c), ref(c), rtol=1e-12, atol=1e-12,
            err_msg=str(coords),
        )
    # batched via vmap
    coords = jnp.asarray(rng.uniform(-1, 6, size=(64, 3)))
    got = jax.vmap(lambda c: lerp_nd(table, [c[0], c[1], c[2]]))(coords)
    want = jax.vmap(lambda c: ref([c[0], c[1], c[2]]))(coords)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_rocket_example_still_matches_reference_filter():
    """The rocket example's dense butterworth weights + interp swaps keep
    the sim physics identical (regression guard for the TPU-friendly
    rewrites)."""
    import importlib.util as ilu
    import os
    import sys

    os.environ["ELODIN_SKIP_RUN"] = "1"
    path = os.path.join(os.path.dirname(__file__), "..", "examples", "rocket")
    sys.path.insert(0, path)
    try:
        spec = ilu.spec_from_file_location(
            "rocket_interp_test", os.path.join(path, "main.py"))
        m = ilu.module_from_spec(spec)
        spec.loader.exec_module(m)
    finally:
        sys.path.remove(path)
    rng = np.random.default_rng(2)
    s = rng.normal(size=(m.lp_buffer_size, 3))
    ref = np.asarray(
        m.second_order_butterworth(s, m.lp_sample_freq, m.lp_cutoff_freq)
    )[-1]
    np.testing.assert_allclose(m._BUTTER_LAST_W @ s, ref, atol=1e-12)


def test_interp_duplicate_knots_step():
    """Duplicate knots encode a step; match jnp.interp's semantics."""
    xp = jnp.asarray([0.0, 1.0, 1.0, 2.0])
    fp = jnp.asarray([0.0, 1.0, 2.0, 3.0])
    xs = jnp.asarray([0.0, 0.5, 0.999, 1.0, 1.5, 2.0, 3.0])
    np.testing.assert_allclose(
        interp(xs, xp, fp), jnp.interp(xs, xp, fp), rtol=1e-12, atol=1e-12
    )
