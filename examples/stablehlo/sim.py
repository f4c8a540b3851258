"""Op-coverage validation sim (parity: examples/stablehlo/sim.py).

The reference runs a sim whose systems exercise every StableHLO/CHLO op its
Cranelift backend implements, validating the JAX -> StableHLO -> JIT path.
Here XLA *is* the backend, so this example instead validates that the same op
categories all trace and compile inside an ECS tick (one jitted program):

  1. math_step     -- unary/binary transcendental math
  2. sort_step     -- jnp.sort / argsort (stablehlo.sort with comparator)
  3. shape_step    -- broadcast/reduce/concat/slice/reshape/transpose/gather
  4. control_step  -- lax.while_loop + lax.switch
  5. bitwise_step  -- xor/or/and/shifts on integer columns
  6. linalg_step   -- dot_general, reductions
  7. convert_step  -- dtype converts, select, compare, clamp, pad-like ops
"""

import typing as ty

import elodin as el
import jax
import jax.numpy as jnp
from jax import lax

SIMULATION_RATE = 120.0

VecF = ty.Annotated[
    jax.Array, el.Component("hlo_vec", el.ComponentType(el.PrimitiveType.F64, (8,)))
]
MatF = ty.Annotated[
    jax.Array, el.Component("hlo_mat", el.ComponentType(el.PrimitiveType.F64, (3, 3)))
]
BitsU = ty.Annotated[
    jax.Array, el.Component("hlo_bits", el.ComponentType(el.PrimitiveType.U32, (4,)))
]
Scalar = ty.Annotated[
    jax.Array, el.Component("hlo_scalar", el.ComponentType(el.PrimitiveType.F64, ()))
]


@el.dataclass
class Probe(el.Archetype):
    hlo_vec: VecF
    hlo_mat: MatF
    hlo_bits: BitsU
    hlo_scalar: Scalar


@el.map
def math_step(v: VecF) -> VecF:
    x = jnp.clip(v, -0.9, 0.9)
    y = (
        jnp.sin(x) + jnp.cos(x) + jnp.tanh(x) + jnp.arcsin(x)
        + jnp.arctan2(x, 1.0 + x * x) + jnp.sinh(x) + jnp.expm1(x)
        + jnp.log1p(jnp.abs(x)) + jnp.cbrt(x) + jax.scipy.special.erfc(x)
    )
    return y / 10.0


@el.map
def sort_step(v: VecF) -> VecF:
    s = jnp.sort(v)
    order = jnp.argsort(-v)
    return s + v[order] * 1e-3


@el.map
def shape_step(v: VecF, m: MatF) -> MatF:
    col = v[:3].reshape(3, 1)
    b = jnp.broadcast_to(col, (3, 3))
    cat = jnp.concatenate([m[:, :2], b[:, :1]], axis=1)
    t = jnp.transpose(cat)
    rev = t[::-1]
    g = rev[jnp.array([2, 0, 1])]
    d = lax.dynamic_slice(g, (0, 0), (3, 3))
    return lax.dynamic_update_slice(d, jnp.ones((1, 3)) * v[3], (1, 0)) * 0.5


@el.map
def control_step(s: Scalar) -> Scalar:
    def body(x):
        return x * 0.5

    def cond(x):
        return x > 1.0

    shrunk = lax.while_loop(cond, body, jnp.abs(s) + 2.0)
    branch = lax.switch(
        jnp.int32(jnp.abs(s)) % 3,
        [lambda x: x + 1.0, lambda x: x * 2.0, lambda x: -x],
        shrunk,
    )
    return branch


@el.map
def bitwise_step(b: BitsU) -> BitsU:
    x = b ^ jnp.uint32(0xDEADBEEF)
    y = (x | jnp.uint32(0x0F0F0F0F)) & jnp.uint32(0x7FFFFFFF)
    return (y << 1) >> 1 ^ (~y & jnp.uint32(0xFF))


@el.map
def linalg_step(m: MatF, v: VecF) -> VecF:
    mv = m @ v[:3]
    gram = m.T @ m
    red = jnp.stack(
        [
            jnp.sum(mv), jnp.max(gram), jnp.min(gram),
            jnp.prod(jnp.diagonal(gram) + 1.0),
            jnp.trace(gram), jnp.sum(gram ** 2) ** 0.5,
            jnp.mean(m), jnp.var(m),
        ]
    )
    return jnp.tanh(red)


@el.map
def convert_step(v: VecF, s: Scalar) -> Scalar:
    as_f32 = v.astype(jnp.float32)
    as_i32 = jnp.clip(as_f32 * 10, -100, 100).astype(jnp.int32)
    sel = jnp.where(as_i32 > 0, as_f32, -as_f32)
    cmp = jnp.sum((v > 0.0).astype(jnp.float64))
    padded = jnp.pad(sel, (1, 1), constant_values=1.0)
    return jnp.clip(jnp.sum(padded).astype(jnp.float64) + cmp + s * 0.0, -1e6, 1e6)


def world() -> el.World:
    w = el.World()
    w.spawn(
        Probe(
            hlo_vec=jnp.linspace(-1.0, 1.0, 8),
            hlo_mat=jnp.eye(3) + 0.1,
            hlo_bits=jnp.arange(4, dtype=jnp.uint32),
            hlo_scalar=jnp.float64(0.5),
        ),
        name="probe",
    )
    return w


def system() -> el.System:
    return (
        math_step | sort_step | shape_step | control_step
        | bitwise_step | linalg_step | convert_step
    )
