"""Linear-algebra op-coverage sim (parity target: reference
examples/linalg — SVD/LU/QR/Cholesky/eigendecomposition inside systems,
used as the backend op-coverage regression)."""

import typing as ty
from dataclasses import field

import elodin as el
import jax
import jax.numpy as jnp
from jax.numpy import linalg as la

SIM_TIME_STEP = 1.0 / 120.0

MatA = ty.Annotated[
    jax.Array, el.Component("mat_a", el.ComponentType(el.PrimitiveType.F64, (4, 4)))
]
CholOut = ty.Annotated[
    jax.Array, el.Component("chol_out", el.ComponentType(el.PrimitiveType.F64, (4, 4)))
]
QrQ = ty.Annotated[
    jax.Array, el.Component("qr_q", el.ComponentType(el.PrimitiveType.F64, (4, 4)))
]
SvdS = ty.Annotated[
    jax.Array, el.Component("svd_s", el.ComponentType(el.PrimitiveType.F64, (4,)))
]
InvOut = ty.Annotated[
    jax.Array, el.Component("inv_out", el.ComponentType(el.PrimitiveType.F64, (4, 4)))
]
SolveOut = ty.Annotated[
    jax.Array, el.Component("solve_out", el.ComponentType(el.PrimitiveType.F64, (4,)))
]
EigVals = ty.Annotated[
    jax.Array, el.Component("eig_vals", el.ComponentType(el.PrimitiveType.F64, (4,)))
]
Det = ty.Annotated[jax.Array, el.Component("det", el.ComponentType.F64)]


def _spd_seed() -> jnp.ndarray:
    a = jnp.arange(16.0).reshape(4, 4) / 7.0 + jnp.eye(4) * 2.0
    return a @ a.T + jnp.eye(4)


@el.dataclass
class Linalg(el.Archetype):
    mat_a: MatA = field(default_factory=_spd_seed)
    chol_out: CholOut = field(default_factory=lambda: jnp.zeros((4, 4)))
    qr_q: QrQ = field(default_factory=lambda: jnp.zeros((4, 4)))
    svd_s: SvdS = field(default_factory=lambda: jnp.zeros(4))
    inv_out: InvOut = field(default_factory=lambda: jnp.zeros((4, 4)))
    solve_out: SolveOut = field(default_factory=lambda: jnp.zeros(4))
    eig_vals: EigVals = field(default_factory=lambda: jnp.zeros(4))
    det: Det = field(default_factory=lambda: jnp.float64(0.0))


@el.map
def rotate_matrix(a: MatA) -> MatA:
    """Slowly rotate the test matrix so every tick exercises fresh values
    while staying SPD."""
    c, s = jnp.cos(0.01), jnp.sin(0.01)
    r = jnp.eye(4).at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
    return r @ a @ r.T


@el.map
def decompose(a: MatA) -> tuple[CholOut, QrQ, SvdS, InvOut, SolveOut, EigVals, Det]:
    chol = la.cholesky(a)
    q, _r = jnp.linalg.qr(a)
    s = la.svd(a, compute_uv=False)
    # el.linalg == jnp.linalg off-TPU; on TPU it routes f64 inv/solve/det
    # around the remote compiler's broken f64 LU custom call.
    inv = el.linalg.inv(a)
    b = jnp.arange(4.0) + 1.0
    x = el.linalg.solve(a, b)
    w = la.eigvalsh(a)
    d = el.linalg.det(a)
    return chol, q, s, inv, x, w, d


def build_world() -> el.World:
    w = el.World()
    w.spawn(Linalg(), name="linalg")
    return w


def build_system() -> el.System:
    return rotate_matrix | decompose


if __name__ == "__main__":
    w = build_world()
    w.run(build_system(), simulation_rate=1.0 / SIM_TIME_STEP, max_ticks=1200)
