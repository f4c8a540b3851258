"""ZEM/ZEV terminal landing guidance (Guo/Hawkins/Wie class).

Parity target: reference examples/falcon9/test_zem_zev.py (E1.1) — the
accel-vector law with hoverslam-consistent time-to-go, a 150 m slow-down
waypoint, tilt-capped lateral divert, and a terminal vertical-only commit.

Everything is pure jnp with `where`-selected branches, so the same function
drives the in-graph landing burn of the batched campaign AND the offline
replay used by the tests.

Local frame convention: `up` is the unit vertical, r is position relative to
the target pad, v is velocity; returns the commanded *thrust* acceleration
(gravity-compensated), to be capped by engine authority downstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

G = 9.81
WAYPOINT_ALT_M = 150.0
WAYPOINT_VDOWN_MPS = 25.0
V_TD_MPS = 1.2  # target touchdown sink rate (reference main.rs ZEM_V_TD_MPS)
TILT_CAP_RAD = 0.25
A_LAND_MPS2 = 12.0  # single-engine-class net vertical accel for t_go
A_THRUST_MAX = 35.0  # 3-engine thrust-acceleration ceiling
COMMIT_ALT_M = 50.0
COMMIT_TGO_S = 5.0


def t_go_hoverslam(alt_m, vdown_mps, a_land=A_LAND_MPS2):
    """(clipped t_go, raw t_go) consistent with a feasible hoverslam.

    The braking accel that stops v_down at V_TD over the remaining altitude,
    clamped into the single-engine class, converts to a time-to-go; the raw
    (unclipped) value drives the commit decision so a soft-rate coast at
    altitude does not freeze the lateral channels early.
    """
    h = jnp.maximum(alt_m, 0.5)
    vd = jnp.maximum(vdown_mps, 0.1)
    a_req = jnp.maximum(vd * vd - V_TD_MPS * V_TD_MPS, 0.0) / (2.0 * h)
    a_use = jnp.clip(a_req, 0.5, a_land)
    t_raw = (vd - V_TD_MPS) / a_use
    return jnp.clip(t_raw, 0.5, 80.0), t_raw


def commit_flag(alt_m, t_raw):
    """Vertical-only commit: near the deck, or t_go collapsing close to it."""
    return (alt_m < COMMIT_ALT_M) | ((t_raw > 0.0) & (t_raw < COMMIT_TGO_S) & (alt_m < 200.0))


def accel_cmd(r, v, up, t_go, commit):
    """Commanded thrust acceleration for the landing burn (local frame).

    Before commit: the optimal-rendezvous accel 6 ZEM/t_go^2 - 2 ZEV/t_go
    minus gravity, steered at the 150 m waypoint above the pad until below
    it, with the lateral component capped at tan(TILT_CAP) of the vertical.
    After commit: pure vertical — cancel gravity and brake the sink rate
    toward V_TD with a 3 1/s rate gain.
    """
    alt = jnp.dot(r, up)
    g_vec = -G * up
    vdown = -jnp.dot(v, up)

    high = alt > WAYPOINT_ALT_M
    r_tgt = jnp.where(high, WAYPOINT_ALT_M, 0.0) * up
    v_tgt = jnp.where(high, -WAYPOINT_VDOWN_MPS, -V_TD_MPS) * up

    zem = r_tgt - (r + v * t_go + 0.5 * g_vec * t_go**2)
    zev = v_tgt - (v + g_vec * t_go)
    a = 6.0 * zem / t_go**2 - 2.0 * zev / t_go - g_vec

    # Tilt cap on the lateral component.
    a_up = jnp.dot(a, up)
    a_lat = a - a_up * up
    lat = jnp.linalg.norm(a_lat)
    lat_max = jnp.where(a_up > 1.0, jnp.abs(a_up) * jnp.tan(TILT_CAP_RAD), 0.0)
    scale = jnp.where(lat > jnp.maximum(lat_max, 1e-6), lat_max / jnp.maximum(lat, 1e-6), 1.0)
    a_guided = a_up * up + scale * a_lat

    a_commit = (G + 3.0 * (vdown - V_TD_MPS)) * up
    return jnp.where(commit, a_commit, a_guided)


def step(r, v, up, dt, a_max=A_THRUST_MAX):
    """One closed-loop guidance+dynamics step (for offline replay/tests)."""
    alt = jnp.dot(r, up)
    t_go, t_raw = t_go_hoverslam(alt, -jnp.dot(v, up))
    a = accel_cmd(r, v, up, t_go, commit_flag(alt, t_raw))
    mag = jnp.linalg.norm(a)
    a = a * jnp.minimum(1.0, a_max / jnp.maximum(mag, 1e-9))
    v_new = v + (a - G * up) * dt
    return r + v_new * dt, v_new


@jax.jit
def replay(r0, v0, n_steps: int = 20_000, dt: float = 0.05):
    """Integrate from a landing-burn ignition state until touchdown.

    Returns (r, v) at ground contact (interpolated onto alt = 0).  Used by
    the ZEM/ZEV gate tests; the in-sim landing burn uses accel_cmd directly.
    """
    up = jnp.asarray([0.0, 0.0, 1.0])

    def body(carry, _):
        r, v, done = carry
        r_n, v_n = step(r, v, up, dt)
        # Freeze once below ground; interpolate the crossing step.
        crossing = (~done) & (r_n[2] <= 0.0)
        frac = jnp.where(crossing, r_n[2] / jnp.minimum(v_n[2] * dt, -1e-12), 0.0)
        r_c = r_n - v_n * dt * frac
        r_c = r_c.at[2].set(jnp.maximum(r_c[2], 0.0))
        r_out = jnp.where(done, r, jnp.where(crossing, r_c, r_n))
        v_out = jnp.where(done, v, v_n)
        return (r_out, v_out, done | crossing), None

    (r, v, _), _ = jax.lax.scan(body, (r0, v0, jnp.asarray(False)), None, length=n_steps)
    return r, v


def ignition_state(
    miss_m=391.0, vlat_mps=46.9, vdown_mps=271.0, alt_m=3000.0, toward=0.16
):
    """The recorded bad ignition state used by the gate tests: `toward` is
    the fraction of lateral speed pointed at the target."""
    r = jnp.asarray([-miss_m, 0.0, alt_m])
    cross = jnp.sqrt(jnp.maximum(1.0 - toward**2, 0.0))
    v = jnp.asarray([vlat_mps * toward, vlat_mps * cross, -vdown_mps])
    return r, v
