"""Spatial (Featherstone) algebra as JAX pytrees, batched over leading axes.

TPU-first re-design of the reference's spatial types
(/root/reference/libs/nox/src/spatial.rs, quaternion.rs): instead of a Rust
tensor IR with a lazy ``Noxpr`` graph, every type here is a thin pytree
wrapper around one ``jnp`` array, and all math is written batched so the same
code path serves a single body, a vmapped entity column, or a sharded Monte
Carlo axis without re-tracing.

Array layouts (trailing axis; any number of leading batch axes):

* ``Quaternion``       -- ``(..., 4)`` as ``[x, y, z, w]`` (scalar last)
* ``SpatialTransform`` -- ``(..., 7)`` as ``[qx, qy, qz, qw, x, y, z]``
* ``SpatialMotion``    -- ``(..., 6)`` as ``[wx, wy, wz, vx, vy, vz]``
* ``SpatialForce``     -- ``(..., 6)`` as ``[tx, ty, tz, fx, fy, fz]``
* ``SpatialInertia``   -- ``(..., 7)`` as ``[ixx, iyy, izz, px, py, pz, m]``

Semantics match the reference (cited per function) so trajectories agree to
float64 round-off with the CPU implementation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from . import _config  # noqa: F401  (enables x64)

Array = jax.Array


def _as_f(x: Any) -> Array:
    return jnp.asarray(x, dtype=_config.default_float())


# ---------------------------------------------------------------------------
# Raw batched quaternion math (x, y, z, w layout)
# ---------------------------------------------------------------------------


def quat_identity(shape=()) -> Array:
    q = jnp.zeros(shape + (4,), dtype=_config.default_float())
    return q.at[..., 3].set(1.0)


def quat_mul(a: Array, b: Array) -> Array:
    """Hamilton product, matching nox::Quaternion Mul
    (libs/nox/src/quaternion.rs:270-281)."""
    ax, ay, az, aw = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bx, by, bz, bw = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    x = aw * bx + ax * bw + ay * bz - az * by
    y = aw * by - ax * bz + ay * bw + az * bx
    z = aw * bz + ax * by - ay * bx + az * bw
    w = aw * bw - ax * bx - ay * by - az * bz
    return jnp.stack([x, y, z, w], axis=-1)


def quat_conj(q: Array) -> Array:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_norm_sq(q: Array) -> Array:
    return jnp.sum(q * q, axis=-1, keepdims=True)


def quat_inverse(q: Array) -> Array:
    """conjugate / |q|^2 (libs/nox/src/quaternion.rs:155-158)."""
    return quat_conj(q) / quat_norm_sq(q)


def quat_normalize(q: Array) -> Array:
    # rsqrt keeps the hot path division-free (f64 divides are emulated and
    # expensive on v5e); differs from q/|q| only in the last ulp
    return q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True))


def _quat_sandwich(q: Array, v: Array) -> Array:
    """(q * (v,0) * conj(q)).xyz — rotation without the |q|^2 division."""
    vq = jnp.concatenate([v, jnp.zeros(v.shape[:-1] + (1,), dtype=v.dtype)], axis=-1)
    return quat_mul(quat_mul(q, vq), quat_conj(q))[..., :3]


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate 3-vector(s): (q * (v,0) * q^-1).xyz
    (libs/nox/src/quaternion.rs:285-295).  Uses the general (non-unit-safe)
    form so non-normalized quaternions behave exactly like the reference;
    algebraically refactored as (q (v,0) q̄)/|q|^2 so only one reciprocal is
    emitted — f64 divides are emulated and expensive on TPU."""
    return _quat_sandwich(q, v) * (1.0 / quat_norm_sq(q))


def quat_from_axis_angle(axis: Array, angle: Array) -> Array:
    axis = jnp.asarray(axis, dtype=_config.default_float())
    angle = jnp.asarray(angle, dtype=_config.default_float())
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = angle / 2.0
    s = jnp.sin(half)[..., None]
    c = jnp.cos(half)[..., None]
    return jnp.concatenate([axis * s, c], axis=-1)


def quat_from_euler(angles: Array) -> Array:
    """Roll/pitch/yaw (XYZ intrinsic) to quaternion
    (libs/nox/src/quaternion.rs:106-126)."""
    angles = _as_f(angles)
    roll, pitch, yaw = angles[..., 0], angles[..., 1], angles[..., 2]
    cr, sr = jnp.cos(roll / 2), jnp.sin(roll / 2)
    cp, sp = jnp.cos(pitch / 2), jnp.sin(pitch / 2)
    cy, sy = jnp.cos(yaw / 2), jnp.sin(yaw / 2)
    w = cr * cp * cy + sr * sp * sy
    x = sr * cp * cy - cr * sp * sy
    y = cr * sp * cy + sr * cp * sy
    z = cr * cp * sy - sr * sp * cy
    return jnp.stack([x, y, z, w], axis=-1)


def quat_integrate_body(q: Array, body_delta: Array) -> Array:
    """q' = normalize(q + q*(delta/2, 0)) -- body-frame angular increment
    (libs/nox/src/quaternion.rs:175-181)."""
    half = body_delta / 2.0
    hq = jnp.concatenate(
        [half, jnp.zeros(half.shape[:-1] + (1,), dtype=half.dtype)], axis=-1
    )
    return quat_normalize(q + quat_mul(q, hq))


def quat_to_mat3(q: Array) -> Array:
    """Rotation matrix (..., 3, 3) for a unit quaternion."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def quat_from_mat3(m: Array) -> Array:
    """Branch-free rotation-matrix -> quaternion using copysign, matching
    nox::Quaternion::from_rot_mat (libs/nox/src/quaternion.rs:196-218)."""
    m = _as_f(m)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    w = jnp.sqrt(jnp.maximum(1.0 + m00 + m11 + m22, 0.0)) / 2.0
    x = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2.0
    y = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2.0
    z = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2.0
    x = jnp.copysign(x, m21 - m12)
    y = jnp.copysign(y, m02 - m20)
    z = jnp.copysign(z, m10 - m01)
    return jnp.stack([x, y, z, w], axis=-1)


def skew(v: Array) -> Array:
    """Skew-symmetric (cross-product) matrix of a 3-vector; batched."""
    v = jnp.asarray(v)
    zero = jnp.zeros_like(v[..., 0])
    row0 = jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1)
    row1 = jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1)
    row2 = jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


# ---------------------------------------------------------------------------
# Raw batched spatial ops used by the fused six-dof step
# ---------------------------------------------------------------------------


def stf_add_motion(transform: Array, motion: Array) -> Array:
    """SpatialTransform + SpatialMotion: first-order quaternion update with a
    *world-frame* angular delta, then renormalize; linear parts add.
    (libs/nox/src/spatial.rs:530-550)."""
    q = transform[..., :4]
    half = motion[..., :3] / 2.0
    hq = jnp.concatenate(
        [half, jnp.zeros(half.shape[:-1] + (1,), dtype=half.dtype)], axis=-1
    )
    angular = quat_normalize(q + quat_mul(hq, q))
    linear = transform[..., 4:] + motion[..., 3:]
    return jnp.concatenate([angular, linear], axis=-1)


def _quat_homog_mat(q: Array):
    """Rows of the homogeneous rotation matrix M with
    ``_quat_sandwich(q, v) == M @ v`` exactly (no |q|^2 normalization) —
    the standard q(0,v)q̄ expansion.  Building M once and reusing it beats
    the sandwich whenever >=2 vectors rotate through the same quaternion,
    which matters on TPU where every f64 op is emulated."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz, ww = x * x, y * y, z * z, w * w
    xy, xz, xw = x * y, x * z, x * w
    yz, yw, zw = y * z, y * w, z * w
    return (
        (ww + xx - yy - zz, 2 * (xy - zw), 2 * (xz + yw)),
        (2 * (xy + zw), ww - xx + yy - zz, 2 * (yz - xw)),
        (2 * (xz - yw), 2 * (yz + xw), ww - xx - yy + zz),
    )


def _mat_vec(m, v: Array, transpose: bool = False) -> Array:
    v0, v1, v2 = v[..., 0], v[..., 1], v[..., 2]
    if transpose:
        rows = ((m[0][0], m[1][0], m[2][0]), (m[0][1], m[1][1], m[2][1]),
                (m[0][2], m[1][2], m[2][2]))
    else:
        rows = m
    return jnp.stack(
        [r[0] * v0 + r[1] * v1 + r[2] * v2 for r in rows], axis=-1
    )


def sixdof_accel(force: Array, inertia: Array, pos: Array) -> Array:
    """World-frame spatial acceleration from force/inertia/attitude, matching
    nox-py calc_accel (libs/nox-py/src/six_dof.rs:137-146): rotate the force
    into the body frame, divide by the diagonalized inertia, rotate back.

    Algebraically identical to the reference chain
    ``R(q) * ((R(q)^-1 f) / I)`` but with the |q|^2 factors shared:
    with qi = q̄/|q|², rotate(qi, f) = (q̄ f q)/|q|² and rotate(q, x) =
    (q x q̄)/|q|², so the whole pipeline needs ONE reciprocal of |q|²
    instead of four emulated f64 quaternion inversions."""
    q = pos[..., :4]
    m = _quat_homog_mat(q)
    inv_n2 = 1.0 / quat_norm_sq(q)
    body_torque = _mat_vec(m, force[..., :3], transpose=True) * inv_n2
    body_force = _mat_vec(m, force[..., 3:], transpose=True) * inv_n2
    ang = body_torque * (1.0 / inertia[..., :3])
    lin = body_force * (1.0 / inertia[..., 6:7])
    return jnp.concatenate(
        [_mat_vec(m, ang), _mat_vec(m, lin)], axis=-1
    ) * inv_n2


# ---------------------------------------------------------------------------
# Pytree wrapper classes (source-compatible with the reference pyo3 classes:
# libs/nox-py/src/spatial.rs)
# ---------------------------------------------------------------------------


class _SpatialBase:
    """Common pytree/array plumbing.  ``inner`` is the raw jnp array."""

    __slots__ = ("inner",)
    _width: int = 0

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)
        jax.tree_util.register_pytree_node(cls, cls.flatten, cls.unflatten)

    def flatten(self):
        return (self.inner,), None

    @classmethod
    def unflatten(cls, _aux, children):
        if isinstance(children, tuple | list):
            children = children[0]
        return cls.from_array(children)

    @classmethod
    def from_array(cls, arr):
        obj = object.__new__(cls)
        obj.inner = jnp.asarray(arr)
        return obj

    def asarray(self) -> Array:
        return self.inner

    def __repr__(self):
        return f"{type(self).__name__}({self.inner})"


class Quaternion(_SpatialBase):
    """[x, y, z, w] quaternion (libs/nox-py/src/spatial.rs:264-379)."""

    _width = 4

    def __init__(self, arr):
        self.inner = _as_f(arr)

    @staticmethod
    def identity() -> "Quaternion":
        return Quaternion.from_array(quat_identity())

    @staticmethod
    def from_axis_angle(axis, angle) -> "Quaternion":
        return Quaternion.from_array(quat_from_axis_angle(_as_f(axis), _as_f(angle)))

    @staticmethod
    def from_euler(angles) -> "Quaternion":
        return Quaternion.from_array(quat_from_euler(angles))

    @staticmethod
    def from_rot_mat(mat) -> "Quaternion":
        return Quaternion.from_array(quat_from_mat3(mat))

    def vector(self) -> Array:
        return self.inner

    def normalize(self) -> "Quaternion":
        return Quaternion.from_array(quat_normalize(self.inner))

    def inverse(self) -> "Quaternion":
        return Quaternion.from_array(quat_inverse(self.inner))

    def conjugate(self) -> "Quaternion":
        return Quaternion.from_array(quat_conj(self.inner))

    def integrate_body(self, body_delta) -> "Quaternion":
        return Quaternion.from_array(
            quat_integrate_body(self.inner, jnp.asarray(body_delta))
        )

    def angular_distance(self, other: "Quaternion") -> Array:
        dot = jnp.sum(self.inner * other.inner, axis=-1)
        # |dot| rounds above 1.0 for ~a quarter of normalized quaternion
        # pairs (rsqrt-normalized), and arccos(1 + 1ulp) is NaN — clamp
        return 2.0 * jnp.arccos(jnp.clip(jnp.abs(dot), 0.0, 1.0))

    def to_mat3(self) -> Array:
        return quat_to_mat3(self.inner)

    def __mul__(self, rhs: "Quaternion") -> "Quaternion":
        return Quaternion.from_array(quat_mul(self.inner, rhs.inner))

    def __add__(self, rhs: "Quaternion") -> "Quaternion":
        return Quaternion.from_array(self.inner + rhs.inner)

    def __matmul__(self, rhs):
        if isinstance(rhs, SpatialTransform):
            return SpatialTransform.from_array(
                jnp.concatenate(
                    [
                        quat_mul(self.inner, rhs.inner[..., :4]),
                        quat_rotate(self.inner, rhs.inner[..., 4:]),
                    ],
                    axis=-1,
                )
            )
        if isinstance(rhs, SpatialMotion):
            return SpatialMotion.from_array(
                jnp.concatenate(
                    [
                        quat_rotate(self.inner, rhs.inner[..., :3]),
                        quat_rotate(self.inner, rhs.inner[..., 3:]),
                    ],
                    axis=-1,
                )
            )
        if isinstance(rhs, SpatialForce):
            return SpatialForce.from_array(
                jnp.concatenate(
                    [
                        quat_rotate(self.inner, rhs.inner[..., :3]),
                        quat_rotate(self.inner, rhs.inner[..., 3:]),
                    ],
                    axis=-1,
                )
            )
        return quat_rotate(self.inner, jnp.asarray(rhs))


class SpatialTransform(_SpatialBase):
    """[qx,qy,qz,qw, x,y,z] rigid transform
    (libs/nox-py/src/spatial.rs:9-107)."""

    _width = 7

    def __init__(self, arr=None, angular=None, linear=None):
        if arr is not None:
            if angular is not None or linear is not None:
                raise ValueError("Cannot specify both array and linear/angular")
            self.inner = _as_f(arr)
            return
        if angular is None:
            q = quat_identity()
        elif isinstance(angular, Quaternion):
            q = angular.inner
        else:
            q = _as_f(angular)
        lin = jnp.zeros(3, dtype=_config.default_float()) if linear is None else _as_f(linear)
        self.inner = _concat_bcast(q, lin)

    def linear(self) -> Array:
        return self.inner[..., 4:]

    def angular(self) -> Quaternion:
        return Quaternion.from_array(self.inner[..., :4])

    @staticmethod
    def from_axis_angle(axis, angle) -> "SpatialTransform":
        return SpatialTransform(angular=Quaternion.from_axis_angle(axis, angle))

    @staticmethod
    def zero() -> "SpatialTransform":
        return SpatialTransform()

    def __add__(self, rhs):
        if isinstance(rhs, SpatialTransform):
            return SpatialTransform.from_array(self.inner + rhs.inner)
        if isinstance(rhs, SpatialMotion):
            return SpatialTransform.from_array(stf_add_motion(self.inner, rhs.inner))
        raise TypeError("Unsupported type for addition")

    def __mul__(self, rhs: "SpatialTransform") -> "SpatialTransform":
        """Transform composition (libs/nox/src/spatial.rs:129-137)."""
        q = self.inner[..., :4]
        angular = quat_mul(q, rhs.inner[..., :4])
        linear = self.inner[..., 4:] + quat_rotate(q, rhs.inner[..., 4:])
        return SpatialTransform.from_array(jnp.concatenate([angular, linear], axis=-1))


def _concat_bcast(q: Array, lin: Array) -> Array:
    """Concatenate quaternion (...,4) and linear (...,3) with leading-dim
    broadcasting."""
    batch = jnp.broadcast_shapes(q.shape[:-1], lin.shape[:-1])
    q = jnp.broadcast_to(q, batch + (q.shape[-1],))
    lin = jnp.broadcast_to(lin, batch + (lin.shape[-1],))
    return jnp.concatenate([q, lin], axis=-1)


class SpatialMotion(_SpatialBase):
    """[wx,wy,wz, vx,vy,vz] velocity twist
    (libs/nox-py/src/spatial.rs:109-176)."""

    _width = 6

    def __init__(self, angular=None, linear=None):
        ang = jnp.zeros(3, dtype=_config.default_float()) if angular is None else _as_f(angular)
        lin = jnp.zeros(3, dtype=_config.default_float()) if linear is None else _as_f(linear)
        self.inner = _concat_bcast(ang, lin)

    def linear(self) -> Array:
        return self.inner[..., 3:]

    def angular(self) -> Array:
        return self.inner[..., :3]

    def __add__(self, rhs: "SpatialMotion") -> "SpatialMotion":
        return SpatialMotion.from_array(self.inner + rhs.inner)

    def __sub__(self, rhs: "SpatialMotion") -> "SpatialMotion":
        return SpatialMotion.from_array(self.inner - rhs.inner)

    def __mul__(self, scale) -> "SpatialMotion":
        return SpatialMotion.from_array(self.inner * scale)

    __rmul__ = __mul__

    def cross(self, other: "SpatialMotion") -> "SpatialMotion":
        """Spatial-motion cross product (libs/nox/src/spatial.rs:468-473)."""
        w, v = self.inner[..., :3], self.inner[..., 3:]
        ow, ov = other.inner[..., :3], other.inner[..., 3:]
        ang = jnp.cross(w, ow)
        lin = jnp.cross(w, ov) + jnp.cross(v, ow)
        return SpatialMotion.from_array(jnp.concatenate([ang, lin], axis=-1))

    def cross_dual(self, other: "SpatialForce") -> "SpatialForce":
        """Motion x* force (libs/nox/src/spatial.rs:477-483)."""
        w, v = self.inner[..., :3], self.inner[..., 3:]
        t, f = other.inner[..., :3], other.inner[..., 3:]
        force = jnp.cross(w, t) + jnp.cross(v, f)
        torque = jnp.cross(w, f)
        return SpatialForce.from_array(jnp.concatenate([torque, force], axis=-1))

    def offset(self, pos: "SpatialTransform") -> "SpatialMotion":
        """Re-express through a transform (libs/nox/src/spatial.rs:459-464)."""
        q = pos.inner[..., :4]
        ang = quat_rotate(q, self.inner[..., :3])
        vel = quat_rotate(q, self.inner[..., 3:]) + jnp.cross(ang, pos.inner[..., 4:])
        return SpatialMotion.from_array(jnp.concatenate([ang, vel], axis=-1))


class SpatialForce(_SpatialBase):
    """[tx,ty,tz, fx,fy,fz] wrench (libs/nox-py/src/spatial.rs:178-262)."""

    _width = 6

    def __init__(self, arr=None, torque=None, linear=None):
        if arr is not None:
            if torque is not None or linear is not None:
                raise ValueError("Cannot specify both array and linear/torque")
            self.inner = _as_f(arr)
            return
        t = jnp.zeros(3, dtype=_config.default_float()) if torque is None else _as_f(torque)
        f = jnp.zeros(3, dtype=_config.default_float()) if linear is None else _as_f(linear)
        self.inner = _concat_bcast(t, f)

    def force(self) -> Array:
        return self.inner[..., 3:]

    linear = force

    def torque(self) -> Array:
        return self.inner[..., :3]

    def __add__(self, rhs: "SpatialForce") -> "SpatialForce":
        return SpatialForce.from_array(self.inner + rhs.inner)

    def __sub__(self, rhs: "SpatialForce") -> "SpatialForce":
        return SpatialForce.from_array(self.inner - rhs.inner)

    def __mul__(self, scale) -> "SpatialForce":
        return SpatialForce.from_array(self.inner * scale)

    __rmul__ = __mul__

    def __truediv__(self, rhs: "SpatialInertia") -> "SpatialMotion":
        """Force / inertia -> acceleration (libs/nox/src/spatial.rs:353-361)."""
        accel = self.force() / rhs.mass()[..., None]
        ang = self.torque() / rhs.inertia_diag()
        return SpatialMotion.from_array(jnp.concatenate([ang, accel], axis=-1))


class SpatialInertia(_SpatialBase):
    """[ixx,iyy,izz, px,py,pz, m] diagonalized inertia
    (libs/nox-py/src/spatial.rs:381-449)."""

    _width = 7

    def __init__(self, mass, inertia=None, momentum=None):
        m = _as_f(mass)
        i = m[..., None] * jnp.ones(3, dtype=m.dtype) if inertia is None else _as_f(inertia)
        p = jnp.zeros(3, dtype=m.dtype) if momentum is None else _as_f(momentum)
        batch = jnp.broadcast_shapes(m.shape, i.shape[:-1], p.shape[:-1])
        i = jnp.broadcast_to(i, batch + (3,))
        p = jnp.broadcast_to(p, batch + (3,))
        m = jnp.broadcast_to(m, batch)[..., None]
        self.inner = jnp.concatenate([i, p, m], axis=-1)

    def mass(self) -> Array:
        return self.inner[..., 6]

    def inertia_diag(self) -> Array:
        return self.inner[..., :3]

    def momentum(self) -> Array:
        return self.inner[..., 3:6]

    def __mul__(self, rhs: SpatialMotion) -> SpatialForce:
        """Inertia * motion -> momentum wrench
        (libs/nox/src/spatial.rs:364-372)."""
        force = self.mass()[..., None] * rhs.linear() - jnp.cross(
            self.momentum(), rhs.angular()
        )
        torque = self.inertia_diag() * rhs.angular() + jnp.cross(
            self.momentum(), rhs.linear()
        )
        return SpatialForce.from_array(jnp.concatenate([torque, force], axis=-1))


# ---------------------------------------------------------------------------
# Default component descriptors (classattr metadata), matching the reference's
# PyComponent::from_component names (libs/impeller2/src/nox_impls.rs:106-145)
# ---------------------------------------------------------------------------

from .component import Component as _Component, ComponentType as _ComponentType  # noqa: E402

for _cls, _name, _ty in (
    (Quaternion, "quaternion_f64", _ComponentType.Quaternion),
    (SpatialTransform, "spatial_transform_f64", _ComponentType.SpatialPosF64),
    (SpatialMotion, "spatial_motion_f64", _ComponentType.SpatialMotionF64),
    (SpatialForce, "spatial_force_f64", _ComponentType.SpatialMotionF64),
    (SpatialInertia, "spatial_inertia_f64", _ComponentType.SpatialPosF64),
):
    _cls.metadata = _Component(_name, _ty)
    _cls.__metadata__ = (_cls.metadata,)
del _cls, _name, _ty


class MRP(_SpatialBase):
    """Modified Rodrigues Parameters (libs/nox/src/mrp.rs)."""

    _width = 3

    def __init__(self, arr=None):
        self.inner = (
            jnp.zeros(3, dtype=_config.default_float())
            if arr is None
            else _as_f(arr)
        )

    @staticmethod
    def from_quaternion(q) -> "MRP":
        qv = q.inner if isinstance(q, Quaternion) else jnp.asarray(q)
        return MRP.from_array(qv[..., :3] / (qv[..., 3:4] + 1.0))

    def to_quaternion(self) -> Quaternion:
        m = self.inner
        mag2 = jnp.sum(m * m, axis=-1, keepdims=True)
        q = jnp.concatenate([2.0 * m, 1.0 - mag2], axis=-1) / (mag2 + 1.0)
        return Quaternion.from_array(q)

    def __add__(self, rhs: "MRP") -> "MRP":
        return MRP.from_array(self.inner + rhs.inner)


MRP.metadata = _Component("mrp_f64", _ComponentType(
    __import__("elodin_tpu.component", fromlist=["PrimitiveType"]).PrimitiveType.F64, (3,)
))
MRP.__metadata__ = (MRP.metadata,)


def _stf_mrp(self) -> MRP:
    return MRP.from_quaternion(self.angular())


SpatialTransform.mrp = _stf_mrp
Quaternion.mrp = lambda self: MRP.from_quaternion(self)
