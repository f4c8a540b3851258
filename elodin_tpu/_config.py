"""Global numeric configuration for the TPU-native engine.

The reference SDK enables float64 globally on import
(libs/nox-py/python/elodin/__init__.py:45).  We keep that default for
source compatibility and for the 1e-6 CPU-match target, but expose a
policy hook so benchmarks and large production runs can drop to f32 /
bf16 where the physics tolerates it (TPU f64 is emulated and slow).
"""

from __future__ import annotations

import os

import jax

jax.config.update("jax_enable_x64", True)

# The axon TPU plugin ignores the JAX_PLATFORMS env var; honor it explicitly
# so tests can pin the virtual CPU mesh.
_platforms = os.environ.get("JAX_PLATFORMS")
if _platforms:
    try:
        jax.config.update("jax_platforms", _platforms)
    except Exception:
        pass

# Default element dtype for floating-point components.  "f64" matches the
# reference; set ELODIN_FLOAT_POLICY=f32 to trade accuracy for TPU speed.
_FLOAT_POLICY = os.environ.get("ELODIN_FLOAT_POLICY", "f64")


def default_float():
    import jax.numpy as jnp

    return jnp.float32 if _FLOAT_POLICY == "f32" else jnp.float64


def effector_compute_dtype():
    """Under the 'mixed' policy the six-dof effector pipeline computes in
    f32 while the integrator state (world_pos/world_vel) and the
    u' = u + dt*du update stay f64 — the SURVEY §7(e) per-component policy:
    forces tolerate f32 (~1e-7 relative), trajectory accumulation does not.
    Returns None when effectors run at full precision."""
    if _FLOAT_POLICY != "mixed":
        return None
    import jax.numpy as jnp

    return jnp.float32


def set_float_policy(policy: str) -> None:
    global _FLOAT_POLICY
    if policy not in ("f64", "f32", "mixed"):
        raise ValueError("float policy must be 'f64', 'f32' or 'mixed'")
    _FLOAT_POLICY = policy


# Components whose columns stay f64 under the 'mixed' policy DEFAULT
# mapping: the integrator state (trajectory accumulation does not tolerate
# f32) and the time step (an f32 dt puts a 6e-8 relative bias on EVERY
# increment; SURVEY §7e).  Per-component ``precision=`` declarations
# override.
_MIXED_KEEP_F64 = ("world_pos", "world_vel", "simulation_time_step")


def column_dtype(name: str, metadata: dict | None, declared):
    """The dtype a FLOAT column should carry under the active policy.

    Per-component ``Component(..., precision="f64"|"f32")`` declarations win
    over the global policy; the policy supplies the default mapping
    (SURVEY §7e): 'f64' keeps the declared dtype, 'f32' downcasts
    everything, 'mixed' keeps the integrator state (world_pos/world_vel)
    f64 and downcasts the rest."""
    import jax.numpy as jnp

    prec = (metadata or {}).get("precision")
    if prec == "f64":
        return jnp.float64
    if prec == "f32":
        return jnp.float32
    if _FLOAT_POLICY == "f32":
        return jnp.float32
    if _FLOAT_POLICY == "mixed":
        return jnp.float64 if name in _MIXED_KEEP_F64 else jnp.float32
    return declared


def apply_float_policy(meta, cols: dict) -> dict:
    """Cast a column dict per the active policy + per-component metadata.
    Non-float columns pass through untouched."""
    import numpy as np

    out = {}
    for name, v in cols.items():
        if np.dtype(v.dtype).kind != "f":
            out[name] = v
            continue
        comp = meta.components.get(name)
        dt = column_dtype(name, comp.metadata if comp else None, v.dtype)
        out[name] = v if v.dtype == dt else v.astype(dt)
    return out


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (repeat `python sim.py run` builds
    drop from seconds to ~ms).  Default on; ELODIN_XLA_CACHE=0 disables,
    and an explicit JAX_COMPILATION_CACHE_DIR wins."""
    if os.environ.get("ELODIN_XLA_CACHE", "1") == "0":
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        path = os.path.join(_get_cache_dir(), "xla")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def _get_cache_dir() -> str:
    """Cache directory for downloaded assets (EGM08 coefficients etc.),
    mirroring el._get_cache_dir (libs/nox-py/src/lib.rs:129-141)."""
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    path = os.path.join(base, "elodin")
    os.makedirs(path, exist_ok=True)
    return path


_enable_compile_cache()
