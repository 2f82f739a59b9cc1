"""Dense KKT solvers: Cholesky (LLT), clamped LDLT, QR; iterative refinement.

Round-1 implementation factors the assembled dense KKT matrix on-device.
This replaces the reference's SupernodalKKTSolver (/root/reference/conex/
kkt_solver.{h,cc}) for dense programs; the supernodal clique-tree path for
sparse programs is layered on top later (conex_tpu/supernodal).

Mode semantics (reference kkt_solver.cc:172-199):
  LLT  — used when there are no equality-constraint duals.
  LDLT — indefinite KKT systems.  The reference uses a *fully pivoted* LDLT
         with pivots clamped to +/-1e-9 (RLDLT.h:381-393).  Pivoting is
         TPU-hostile (data-dependent permutations defeat XLA tiling), so we
         use a fixed-order LDLT with the same +/-1e-9 clamp and compensate
         with iterative refinement — the reference's own remedy
         (kkt_solver.cc:248-261).
  QR   — dense least-squares fallback for rank-deficient systems.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import KKT_SOLVER_LDLT, KKT_SOLVER_LLT, KKT_SOLVER_QR

# Pivot clamp magnitude (reference RLDLT.h:261-263, 310-318).
LDLT_PIVOT_CLAMP = 1e-9


class KKTFactor(NamedTuple):
    """Factored KKT matrix.  ``mode`` is static (baked into the trace)."""

    matrix: jnp.ndarray  # densified KKT matrix (kept for refinement / QR)
    factor: jnp.ndarray  # Cholesky L, or unit-L with d on the diagonal (LDLT)
    fail: jnp.ndarray  # scalar bool: factorization failed


def _cholesky(K):
    L = jnp.linalg.cholesky(K)
    # A non-PSD input yields NaNs in L (XLA semantics); the reference treats
    # Eigen::LLT info() != Success as failure (kkt_solver.cc:178-189).
    fail = ~jnp.all(jnp.isfinite(L))
    return L, fail


def _ldlt_clamped(K):
    """Fixed-order LDLT with pivot clamping, right-looking, via fori_loop.

    Produces M with unit-lower-triangular L strictly below the diagonal and
    d on the diagonal.  Pivots with |d| < 1e-9 are clamped to +/-1e-9
    (matching RLDLT.h:381-393) instead of failing.
    """
    n = K.shape[0]
    dtype = K.dtype

    def body(j, M):
        d = M[j, j]
        d = jnp.where(jnp.abs(d) < LDLT_PIVOT_CLAMP,
                      jnp.where(d >= 0, LDLT_PIVOT_CLAMP, -LDLT_PIVOT_CLAMP),
                      d)
        col = M[:, j]
        row_idx = jnp.arange(n)
        below = row_idx > j
        l_col = jnp.where(below, col / d, 0.0)
        # Trailing Schur update: M -= d * l l^T on rows/cols > j.
        M = M - d * jnp.outer(l_col, l_col)
        # Write the L column and the clamped pivot back.
        M = jnp.where(below[:, None] & (row_idx[None, :] == j), l_col[:, None], M)
        M = M.at[j, j].set(d)
        return M

    M = jax.lax.fori_loop(0, n, body, K.astype(dtype))
    fail = ~jnp.all(jnp.isfinite(M))
    return M, fail


def _supernodal_impl(structure):
    """Pick the unrolled (per-clique XLA ops) or scan-compiled supernodal
    implementation from the static structure type."""
    from ..supernodal.scan import ScanSupernodalStructure

    if isinstance(structure, ScanSupernodalStructure):
        from ..supernodal import scan as sn
    else:
        from ..supernodal import solver as sn
    return sn


def factor(K: jnp.ndarray, mode: int, structure=None,
           axis_name=None) -> KKTFactor:
    """``structure``: optional static SupernodalStructure — factors along
    the clique tree instead of densely (QR mode ignores it).  A
    DistributedSupernodalStructure shards the clique tree over the
    ``axis_name`` mesh axis (requires shard_map context).  With a
    CompressedSupernodalStructure, ``K`` is the flat block-compressed
    buffer (supernodal/compressed.py), not a dense matrix."""
    if structure is not None and mode in (KKT_SOLVER_LLT, KKT_SOLVER_LDLT):
        from ..supernodal.compressed import CompressedSupernodalStructure

        if isinstance(structure, CompressedSupernodalStructure):
            from ..supernodal import compressed as cn

            fn = cn.factor_llt if mode == KKT_SOLVER_LLT else cn.factor_ldlt
            fac, fail = fn(K, structure)
            return KKTFactor(matrix=K, factor=fac, fail=fail)
        from ..supernodal.dist_compressed import (
            DistributedCompressedStructure,
        )

        if isinstance(structure, DistributedCompressedStructure):
            if axis_name is None:
                raise ValueError(
                    "DistributedCompressedStructure requires axis_name"
                )
            from ..supernodal import dist_compressed as dc

            fn = dc.factor_llt if mode == KKT_SOLVER_LLT else dc.factor_ldlt
            fac, fail = fn(K, structure, axis_name)
            return KKTFactor(matrix=K, factor=fac, fail=fail)
        from ..supernodal.distributed import DistributedSupernodalStructure

        if isinstance(structure, DistributedSupernodalStructure):
            if axis_name is None:
                raise ValueError(
                    "DistributedSupernodalStructure requires axis_name"
                )
            from ..supernodal import distributed as dn

            fn = dn.factor_llt if mode == KKT_SOLVER_LLT else dn.factor_ldlt
            fac, fail = fn(K, structure, axis_name)
            return KKTFactor(matrix=K, factor=fac, fail=fail)
        sn = _supernodal_impl(structure)
        if mode == KKT_SOLVER_LLT:
            fac, fail = sn.factor_llt(K, structure)
        else:
            fac, fail = sn.factor_ldlt(K, structure)
        return KKTFactor(matrix=K, factor=fac, fail=fail)
    if mode == KKT_SOLVER_LLT:
        L, fail = _cholesky(K)
    elif mode == KKT_SOLVER_LDLT:
        L, fail = _ldlt_clamped(K)
    elif mode == KKT_SOLVER_QR:
        L, fail = K, jnp.asarray(False)
    else:
        raise ValueError(f"unknown kkt solver mode {mode}")
    return KKTFactor(matrix=K, factor=L, fail=fail)


def _solve_llt(L, b):
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def _solve_ldlt(M, b):
    n = M.shape[0]
    eye = jnp.eye(n, dtype=M.dtype)
    L = jnp.tril(M, -1) + eye
    d = jnp.diagonal(M)
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True, unit_diagonal=True)
    y = y / d
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False, unit_diagonal=True)


def _solve_qr(K, b):
    # Least-squares solve for rank-deficient KKT systems
    # (reference kkt_solver.cc:174-177, 227-231).
    q, r = jnp.linalg.qr(K)
    return jax.scipy.linalg.solve_triangular(r, q.T @ b, lower=False)


def solve(f: KKTFactor, b: jnp.ndarray, mode: int, refinement_steps: int = 0,
          structure=None, axis_name=None):
    """Solve K x = b with optional iterative refinement.

    reference: SolveInPlace + refinement loop, kkt_solver.cc:220-263.
    """

    def base_solve(rhs):
        if structure is not None and mode in (KKT_SOLVER_LLT, KKT_SOLVER_LDLT):
            from ..supernodal.compressed import CompressedSupernodalStructure

            if isinstance(structure, CompressedSupernodalStructure):
                from ..supernodal import compressed as cn

                fn = cn.solve_llt if mode == KKT_SOLVER_LLT else cn.solve_ldlt
                return fn(f.factor, structure, rhs)
            from ..supernodal.dist_compressed import (
                DistributedCompressedStructure,
            )

            if isinstance(structure, DistributedCompressedStructure):
                from ..supernodal import dist_compressed as dc

                fn = (
                    dc.solve_llt if mode == KKT_SOLVER_LLT else dc.solve_ldlt
                )
                return fn(f.factor, structure, rhs, axis_name)
            from ..supernodal.distributed import (
                DistributedSupernodalStructure,
            )

            if isinstance(structure, DistributedSupernodalStructure):
                from ..supernodal import distributed as dn

                fn = (
                    dn.solve_llt if mode == KKT_SOLVER_LLT else dn.solve_ldlt
                )
                return fn(f.factor, structure, rhs, axis_name)
            sn = _supernodal_impl(structure)
            if mode == KKT_SOLVER_LLT:
                return sn.solve_llt(f.factor, structure, rhs)
            return sn.solve_ldlt(f.factor, structure, rhs)
        if mode == KKT_SOLVER_LLT:
            return _solve_llt(f.factor, rhs)
        if mode == KKT_SOLVER_LDLT:
            return _solve_ldlt(f.factor, rhs)
        return _solve_qr(f.matrix, rhs)

    def residual_matvec(x):
        if structure is not None:
            from ..supernodal.compressed import CompressedSupernodalStructure
            from ..supernodal.dist_compressed import (
                DistributedCompressedStructure,
            )

            if isinstance(structure, CompressedSupernodalStructure):
                from ..supernodal import compressed as cn

                return cn.matvec(f.matrix, structure, x)
            if isinstance(structure, DistributedCompressedStructure):
                from ..supernodal import compressed as cn

                return cn.matvec(f.matrix, structure.base, x)
        return f.matrix @ x

    x = base_solve(b)
    for _ in range(refinement_steps):
        r = b - residual_matvec(x)
        x = x + base_solve(r)
    return x
