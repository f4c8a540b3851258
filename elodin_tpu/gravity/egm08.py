"""EGM2008 spherical-harmonic gravity, Pines formulation, batched.

Parity target: python/elodin/egm08.py in the reference (normalized C/S
coefficients, Pines' singularity-free algorithm, force =
m*(a1+s*a4, a2+t*a4, a3+u*a4)).  Differences, all TPU-motivated:

* the sectorial phase terms R_m, I_m use the closed form
  (s+it)^m = rho^m (cos m*phi, sin m*phi) instead of a sequential scan,
  so they vectorize over both degree and batch;
* the Helmholtz polynomial recursion runs as ONE ``lax.scan`` over degree
  carrying whole rows (vectorized over order and over the position batch),
  instead of per-(l,m) scalar scans;
* recursion constants n1/n2/nq1/nq2 are precomputed with numpy at
  construction (they are static), leaving only the u-dependent scan in the
  traced graph.

Coefficients: loads ``C_normal.npy``/``S_normal.npy`` from ``cache_directory``
(the reference downloads them from assets.elodin.systems; this environment
has no egress).  Without files it uses the VENDORED real EGM2008 low-degree
set (complete through degree/order 4 plus zonals to 8; see egm08_coeffs.py
for provenance and golden anchors); pass ``synthetic_extension=True`` to
fill higher degrees with Kaula-rule synthetic values for recursion
numerics/benchmarks.  ``field_provenance`` records the active source.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from . import egm08_coeffs


def _k(m: np.ndarray) -> np.ndarray:
    """Kronecker factor: 1 for m==0 else 2."""
    return np.where(m == 0, 1.0, 2.0)


class EGM08:
    def __init__(
        self,
        max_degree: int,
        cache_directory: str = "",
        synthetic_extension: bool = False,
    ):
        self.r_ref = 6.378e6
        self.mu_earth = 3.986004418e14
        self.max_degree = int(max_degree)
        L = self.max_degree

        c_path = os.path.join(cache_directory, "C_normal.npy")
        s_path = os.path.join(cache_directory, "S_normal.npy")
        if os.path.isfile(c_path) and os.path.isfile(s_path):
            c = np.load(c_path)[: L + 1, : L + 1].astype(np.float64)
            s = np.load(s_path)[: L + 1, : L + 1].astype(np.float64)
            self.field_provenance = "file"
        else:
            c, s = egm08_coeffs.vendored(L)
            self.field_provenance = "vendored-low-degree"
            if synthetic_extension and L > egm08_coeffs.VENDORED_MAX_DEGREE:
                c, s = egm08_coeffs.kaula_extend(c, s)
                self.field_provenance = "vendored+kaula-synthetic"
        self.c_bar = jnp.asarray(c)
        self.s_bar = jnp.asarray(s)

        # -- static recursion constants (numpy) ---------------------------
        # The Pines a4 term needs A[l+1, m+1] up to l = L, so the Helmholtz
        # table is built to degree L+1 (the reference truncates its top
        # degree row to zero here; we keep it exact).
        lg = np.arange(L + 2, dtype=np.float64)[:, None]
        mg = np.arange(L + 2, dtype=np.float64)[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            n1 = np.sqrt((2 * lg + 1) * (2 * lg - 1) / ((lg + mg) * (lg - mg)))
            n2 = np.sqrt(
                (lg + mg - 1)
                * (lg - mg - 1)
                * (2 * lg + 1)
                / ((2 * lg - 3) * (lg + mg) * (lg - mg))
            )
            nq1 = np.sqrt((lg - mg) * _k(mg) * (lg + mg + 1) / _k(mg + 1))
            nq2 = np.sqrt(
                (lg + mg + 2)
                * (lg + mg + 1)
                * (2 * lg + 1)
                * _k(mg)
                / ((2 * lg + 3) * _k(mg + 1))
            )
        valid = lg >= mg + 2
        self._n1 = jnp.asarray(np.where(valid, np.nan_to_num(n1), 0.0))
        self._n2 = jnp.asarray(np.where(valid, np.nan_to_num(n2), 0.0))
        self._nq1 = jnp.asarray(
            np.nan_to_num(np.where((lg - mg) >= 0, nq1, 0.0))[: L + 1, : L + 1]
        )
        self._nq2 = jnp.asarray(np.nan_to_num(nq2)[: L + 1, : L + 1])

        # diagonal A[l,l] constants: A[0,0]=1,
        # A[l,l] = A[l-1,l-1]*sqrt((2l+1)k(l)/(2l k(l-1))), k(0)=1 else 2
        diag = np.ones(L + 2)
        for l in range(1, L + 2):
            kl = 2.0
            klm1 = 1.0 if l - 1 == 0 else 2.0
            diag[l] = diag[l - 1] * np.sqrt((2 * l + 1) * kl / (2 * l * klm1))
        self._diag = jnp.asarray(diag)
        # subdiagonal factor: A[l, l-1] = u * A[l,l] * sqrt(2l k(l-1)/k(l))
        sub = np.zeros(L + 2)
        for l in range(1, L + 2):
            klm1 = 1.0 if l - 1 == 0 else 2.0
            sub[l] = diag[l] * np.sqrt(2 * l * klm1 / 2.0)
        self._sub = jnp.asarray(sub)

    # -- core -------------------------------------------------------------

    def _a_bar(self, u: jnp.ndarray) -> jnp.ndarray:
        """Normalized Helmholtz polynomials A[l, m](u), batched over u.

        Returns shape u.shape + (L+2, L+2) (one extra degree for a4)."""
        L = self.max_degree
        batch = u.shape
        m_idx = jnp.arange(L + 2)

        def row(l, prev, prev2):
            # recursion for l >= m+2
            rec = u[..., None] * self._n1[l] * prev - self._n2[l] * prev2
            # diagonal and subdiagonal overrides
            rec = jnp.where(m_idx == l, self._diag[l], rec)
            if_sub = u[..., None] * self._sub[l]
            rec = jnp.where(m_idx == l - 1, if_sub, rec)
            # zero above the diagonal
            rec = jnp.where(m_idx > l, 0.0, rec)
            return rec

        def body(carry, l):
            prev, prev2 = carry
            new = row(l, prev, prev2)
            return (new, prev), new

        z = jnp.zeros(batch + (L + 2,), dtype=u.dtype)
        _, rows = jax.lax.scan(body, (z, z), jnp.arange(L + 2))
        # rows: (L+1, *batch, L+1) -> (*batch, L+1, L+1)
        return jnp.moveaxis(rows, 0, -2)

    def acceleration(self, r_vec: jnp.ndarray) -> jnp.ndarray:
        """Specific gravity acceleration at ECEF position(s) (..., 3)."""
        L = self.max_degree
        x, y, z = r_vec[..., 0], r_vec[..., 1], r_vec[..., 2]
        r = jnp.sqrt(x * x + y * y + z * z)
        s, t, u = x / r, y / r, z / r

        A_full = self._a_bar(u)  # (..., L+2, L+2)
        A = A_full[..., : L + 1, : L + 1]

        # sectorial phases: R_m + i I_m = (s + i t)^m, closed form
        m_idx = jnp.arange(L + 1, dtype=r.dtype)
        rho_xy = jnp.sqrt(s * s + t * t)
        phi = jnp.arctan2(t, s)
        # TPU lowers pow via exp(m*log(x)), so 0**0 is NaN there (fine on
        # CPU): the m=0 sectorial amplitude is identically 1 — pin it, or
        # any position on the z-axis (polar crossings) NaNs the whole field
        amp = jnp.where(
            m_idx == 0, 1.0, rho_xy[..., None] ** m_idx
        )
        R = amp * jnp.cos(phi[..., None] * m_idx)
        I = amp * jnp.sin(phi[..., None] * m_idx)
        # R_{m-1}, I_{m-1} shifted; R_{-1} treated as 0
        Rm1 = jnp.concatenate([jnp.zeros_like(R[..., :1]), R[..., :-1]], axis=-1)
        Im1 = jnp.concatenate([jnp.zeros_like(I[..., :1]), I[..., :-1]], axis=-1)

        # rho_{l+1}/r_ref
        ratio = self.r_ref / r
        l_idx = jnp.arange(L + 1, dtype=r.dtype)
        rho = (self.mu_earth / r)[..., None] * ratio[..., None] ** (l_idx + 1)
        w = rho / self.r_ref  # (..., L+1) over degree l

        C, S = self.c_bar, self.s_bar
        E = C * Rm1[..., None, :] + S * Im1[..., None, :]
        F = S * Rm1[..., None, :] - C * Im1[..., None, :]
        D = C * R[..., None, :] + S * I[..., None, :]

        mw = m_idx  # order weights
        a1 = jnp.sum(w[..., :, None] * A * mw * E, axis=(-2, -1))
        a2 = jnp.sum(w[..., :, None] * A * mw * F, axis=(-2, -1))

        # A[l, m+1] and A[l+1, m+1] windows from the (L+2)-degree table
        A_m1 = A_full[..., : L + 1, 1 : L + 2]
        A_l1m1 = A_full[..., 1 : L + 2, 1 : L + 2]
        a3 = jnp.sum(w[..., :, None] * A_m1 * self._nq1 * D, axis=(-2, -1))
        a4 = -jnp.sum(w[..., :, None] * A_l1m1 * self._nq2 * D, axis=(-2, -1))

        return jnp.stack(
            [a1 + s * a4, a2 + t * a4, a3 + u * a4], axis=-1
        )

    def compute_field(self, x, y, z, mass):
        """Force on ``mass`` at (x,y,z); reference-compatible signature
        (python/elodin/egm08.py:198-216)."""
        r = jnp.stack([jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)], axis=-1)
        return jnp.asarray(mass) * self.acceleration(r)
