"""Real PSD cone via dense linear matrix inequalities (LMIs), batched.

TPU-native re-implementation of the reference's PsdConstraint /
DenseLMIConstraint (/root/reference/conex/psd_constraint.{h,cc},
dense_lmi_constraint.{h,cc}).  One block holds B same-shape LMIs
``C_b - sum_i y_i A_{b,i} >= 0`` (PSD) over the same variable subset.

The reference's hot O(m^2 n^2) Schur panel (the SCHUR_COMPLEMENT_FUNCTION
macro, dense_lmi_constraint.cc:72-88) becomes two einsums:
    P = A @ W                      (B, m, n, n)  — m matmuls on the MXU
    G = einsum('bmik,bnki->mn', P, P)
using tr(A_m W A_n W) = tr((A_m W)(A_n W)), which avoids materializing the
W A_m W panel.  The eigenvalue estimates use the asymmetric-Lanczos scan and
the geodesic step uses the Pade exponential (algebra/sym.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..algebra import sym
from .base import SchurOut, SlackStats


class PSDStepCache(NamedTuple):
    WS: jnp.ndarray  # (B, n, n) the product W * minus_s


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseLMICone:
    """A batch of B LMIs: C_b - sum_i y_i A_{b,i} PSD, over v variables."""

    A: jnp.ndarray  # (B, v, n, n) symmetric constraint matrices
    C: jnp.ndarray  # (B, n, n) symmetric affine term
    vars_: Optional[Tuple[int, ...]] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    supports_line_search = False
    dual_scale = 1.0

    @property
    def batch(self) -> int:
        return self.A.shape[0]

    @property
    def n(self) -> int:
        return self.A.shape[2]

    @property
    def num_vars(self) -> int:
        return self.A.shape[1]

    def rank(self) -> int:
        return self.n * self.batch

    def identity_state(self, dtype) -> jnp.ndarray:
        # reference: SetIdentity (psd_constraint.cc:92-95)
        return jnp.broadcast_to(
            jnp.eye(self.n, dtype=dtype), (self.batch, self.n, self.n)
        )

    def _minus_s(self, y, k):
        # reference: ComputeNegativeSlack (dense_lmi_constraint.cc:24-27):
        # minus_s = sum_i y_i A_i - k C
        return jnp.einsum("v,bvij->bij", y, self.A) - k * self.C

    def schur(self, w: jnp.ndarray) -> SchurOut:
        # reference: SCHUR_COMPLEMENT_FUNCTION (dense_lmi_constraint.cc:72-103)
        P = jnp.einsum("bvij,bjk->bvik", self.A, w)  # A_i W panel
        CW = self.C @ w
        G = jnp.einsum("bvik,buki->vu", P, P)  # tr(A_v W A_u W)
        AW = jnp.einsum("bvii->v", P)  # tr(A_v W)
        AQc = jnp.einsum("bik,bvki->v", CW, P)  # tr(C W A_v W)
        w_dot_c = jnp.einsum("bii->", CW)
        c_dot_Qc = jnp.einsum("bik,bki->", CW, CW)  # tr(C W C W)
        return SchurOut(G=G, AW=AW, AQc=AQc, w_dot_c=w_dot_c, c_dot_Qc=c_dot_Qc)

    def _extreme_eigs(self, WS):
        """(lam_lo, lam_hi) of WS per batch element.

        The reference estimates these with heuristically-seeded asymmetric
        Lanczos + a tridiagonal eigensolver (psd_constraint.cc:63-77).  A
        tridiagonal eigensolver is bisection — branchy sequential control
        flow that cripples XLA both at compile and run time inside the
        jitted loop — so we use the matmul-only squaring estimator, which is
        also *more* accurate than n/2 truncated Lanczos.
        """
        return sym.extreme_eigenvalues(WS)

    def prepare_step(self, w, y, c_weight, e_weight):
        # reference: PrepareStep (psd_constraint.cc:45-84)
        minus_s = self._minus_s(y, c_weight)
        WS = w @ minus_s
        lo, hi = self._extreme_eigs(WS)
        norminf = jnp.max(
            jnp.maximum(jnp.abs(e_weight + lo), jnp.abs(e_weight + hi))
        )
        # norm2 = tr(WS WS) + 2 tr(WS) + rank (psd_constraint.cc:79-80;
        # the reference assumes e_weight = 1 here).
        normsq = (
            jnp.einsum("bik,bki->", WS, WS)
            + 2.0 * jnp.einsum("bii->", WS)
            + self.rank()
        )
        return PSDStepCache(WS=WS), norminf, normsq

    def take_step(self, w, cache: PSDStepCache, step_size):
        # reference: GeodesicUpdate (psd_constraint.cc:13-28): with
        # d = WS + e I (e_weight folded in by TakeStep), compute
        # W <- expm(step * d) W, then re-symmetrize.
        n = self.n
        d = cache.WS + jnp.eye(n, dtype=w.dtype)
        d = d * step_size
        # ||d * step|| <= sqrt(2) by the step-size rule, so Taylor+squaring
        # reaches ~1e-12 — and unlike the reference's Pade solve
        # (exponential_map_pade.cc:23-32) it is matmul-only (XLA:TPU LU is
        # F32-only and serial).
        expd = sym.expm_taylor(d)
        w_new = expd @ w
        return 0.5 * (w_new + jnp.swapaxes(w_new, 1, 2))

    def affine_step(self, w, y, e_weight):
        # reference: PrepareStep(affine) + AffineUpdate
        # (psd_constraint.cc:30-43, 53-57): W <- (1 + e) W + W S W.
        minus_s = self._minus_s(y, 0.0)
        WSW = w @ minus_s @ w
        return (1.0 + e_weight) * w + WSW

    def slack_stats(self, w, y, c_weight) -> SlackStats:
        # reference: GetWeightedSlackEigenvalues (psd_constraint.cc:97-128)
        minus_s = self._minus_s(y, c_weight)
        WS = w @ minus_s
        lo, hi = self._extreme_eigs(WS)
        lam_max = -lo
        lam_min = -hi
        return SlackStats(
            lam_min=jnp.min(lam_min),
            lam_max=jnp.max(lam_max),
            frob_sq=jnp.einsum("bik,bki->", WS, WS),
            trace=-jnp.einsum("bii->", WS),
        )

    def dual_variable(self, w):
        return w
