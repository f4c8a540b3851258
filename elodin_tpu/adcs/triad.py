"""TRIAD deterministic attitude solution
(parity: fsw/roci/adcs/src/triad.rs:3-19)."""

from __future__ import annotations

import jax.numpy as jnp


def _normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def triad(body_1, body_2, ref_1, ref_2) -> jnp.ndarray:
    """DCM mapping reference-frame vectors into the body frame from two
    vector observations; batched over leading axes."""
    body_1, body_2 = jnp.asarray(body_1), jnp.asarray(body_2)
    ref_1, ref_2 = jnp.asarray(ref_1), jnp.asarray(ref_2)
    r_r = _normalize(jnp.cross(ref_1, ref_2))
    q_r = _normalize(ref_1)  # raw sensor vectors (nT-scale mags) must not
    s_r = jnp.cross(q_r, r_r)  # scale the DCM rows
    m_r = jnp.stack([q_r, r_r, s_r], axis=-2)  # rows
    r_b = _normalize(jnp.cross(body_1, body_2))
    q_b = _normalize(body_1)
    s_b = jnp.cross(q_b, r_b)
    m_b = jnp.stack([q_b, r_b, s_b], axis=-1)  # columns (transpose of rows)
    return m_b @ m_r
