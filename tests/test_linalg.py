"""TPU-safe general linalg (el.linalg): unrolled pivoted LU vs numpy.

The fallback path (ops/smallalg.lu_factor and friends) must match
numpy.linalg bit-for-tolerance on CPU, batched and under vmap — it is what
runs for f64 on TPU, where the native LU custom call crashes the remote
compiler (reference runs these through faer: libs/nox/src/array/mod.rs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import elodin as el
from elodin_tpu.ops import smallalg as sa


def _mats(n, batch=(), seed=0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal(batch + (n, n))
    # keep comfortably nonsingular
    a = a + np.eye(n) * n
    return a


@pytest.mark.parametrize("n", [1, 2, 3, 4, 6, 9])
def test_lu_solve_matches_numpy(n):
    a = _mats(n, seed=n)
    b = np.arange(float(n)) + 1.0
    x = el.linalg.solve(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b),
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("n", [2, 4, 6])
def test_fallback_path_matches_native(n):
    """Force the unrolled path (what TPU executes) and diff it vs native."""
    a = jnp.asarray(_mats(n, seed=10 + n))
    lu, perm, sign = sa.lu_factor(a)
    eye = jnp.eye(n, dtype=a.dtype)
    inv = sa.lu_solve(lu, perm, eye)
    np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(np.asarray(a)),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(float(sa.lu_det(lu, sign)),
                               float(np.linalg.det(np.asarray(a))),
                               rtol=1e-9)


def test_lu_pivoting_actually_pivots():
    """A matrix with a zero leading pivot: unpivoted LU would NaN out."""
    a = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
    lu, perm, sign = sa.lu_factor(a)
    assert float(sign) == -1.0
    x = sa.lu_solve(lu, perm, jnp.asarray([[2.0], [3.0]]))
    np.testing.assert_allclose(np.asarray(x)[:, 0], [3.0, 2.0], atol=1e-12)


def test_batched_and_vmap():
    a = jnp.asarray(_mats(4, batch=(5,), seed=3))
    b = jnp.asarray(np.random.default_rng(4).standard_normal((5, 4)))
    lu, perm, sign = sa.lu_factor(a)
    det_b = sa.lu_det(lu, sign)
    x_b = sa.lu_solve(lu, perm, b[..., None])[..., 0]
    # vmap over the same inputs must agree with the batched call
    det_v = jax.vmap(lambda m: sa.lu_det(*sa.lu_factor(m)[::2]))(a)
    np.testing.assert_allclose(np.asarray(det_b),
                               np.linalg.det(np.asarray(a)), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(det_v), np.asarray(det_b),
                               rtol=1e-12)
    x_np = np.linalg.solve(np.asarray(a), np.asarray(b)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x_b), x_np, rtol=1e-8, atol=1e-9)


def test_dispatch_native_off_tpu():
    """On CPU the dispatcher must return the native results (and dtypes)."""
    a = jnp.asarray(_mats(3, seed=7))
    np.testing.assert_allclose(np.asarray(el.linalg.inv(a)),
                               np.asarray(jnp.linalg.inv(a)), rtol=1e-12)
    np.testing.assert_allclose(float(el.linalg.det(a)),
                               float(jnp.linalg.det(a)), rtol=1e-12)


def test_solve_matrix_rhs_and_f32():
    a = jnp.asarray(_mats(4, seed=9), dtype=jnp.float32)
    b = jnp.asarray(np.random.default_rng(2).standard_normal((4, 2)),
                    dtype=jnp.float32)
    x = el.linalg.solve(a, b)
    assert x.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(a @ x), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_det_singular_is_zero_not_nan():
    """A zero pivot in the unrolled LU must yield det == 0 (matching
    jnp.linalg.det) — not 0/0 = NaN propagating into the diagonal product
    (backend-divergent behavior on the TPU f64 fallback path)."""
    import jax.numpy as jnp
    import numpy as np

    from elodin_tpu.ops import smallalg as sa

    for a in (
        jnp.zeros((4, 4), dtype=jnp.float64),
        jnp.asarray(np.array([[1.0, 2.0], [2.0, 4.0]])),  # rank 1
        jnp.asarray(np.outer(np.arange(1.0, 6.0), np.arange(1.0, 6.0))),
    ):
        lu, _, sign = sa.lu_factor(a)
        d = float(sa.lu_det(lu, sign))
        assert d == 0.0, f"singular det should be 0, got {d}"
