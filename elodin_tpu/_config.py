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
