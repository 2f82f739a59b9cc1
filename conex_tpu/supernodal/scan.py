"""Scan-compiled supernodal factorization: O(1) compile time in clique count.

The unrolled supernodal solver (solver.py) emits one XLA block-op sequence
per clique — compile time (and program size) grows linearly with the number
of cliques.  This module compiles the *same* elimination (reference
BlockCholeskyInPlace / BlockLDLTInPlace, block_triangular_operations.cc:
184-219, 315-349) as ONE `lax.scan` over the elimination order:

- every supernode is padded to the maximum supernode size ``smax`` and
  every separator to ``pmax``;
- padded index slots point into a dummy identity block appended to the
  backing matrix (rows/cols N..N+pad-1), so the padded diagonal block is
  ``blockdiag(D, I)`` — its Cholesky/LDLT is exact and the padded rows of
  the off-diagonal block are zero, making all padded Schur/solve
  contributions exactly zero;
- the scan body does one gather, one ``smax`` Cholesky (or clamped LDLT),
  one triangular solve, and one scatter-add — all static shapes.

FLOP overhead vs the unrolled path is the padding ratio
``K*smax*(smax+pmax)^2 / sum_k s_k*(s_k+p_k)^2``; for the homogeneous
clique chains produced by block-arrow programs it is ~1.  The trade is
deliberate: the unrolled path wins for a handful of heterogeneous cliques,
the scan path wins (hugely, in compile time) for 100s..1000s of cliques.

Pivot semantics match the reference RLDLT clamp (RLDLT.h:381-393) via
``LDLT_PIVOT_CLAMP``, as in solver.py.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..solver.kkt import LDLT_PIVOT_CLAMP
from .solver import SupernodalStructure


class ScanSupernodalStructure(NamedTuple):
    """Static, hashable elimination structure for the scan path.

    ``blocks`` is the same (supernode, separator) tuple-of-tuples as
    SupernodalStructure — hashable so the whole object can be a static jit
    argument; the padded index arrays are derived (and cached by XLA's
    trace cache) inside the factor/solve calls.
    """

    blocks: Tuple[Tuple[Tuple[int, ...], Tuple[int, ...]], ...]
    n: int

    @staticmethod
    def from_cliques(cliques: Sequence[Sequence[int]], n: int,
                     valid_leaf=None, root: int = -1):
        base = SupernodalStructure.from_cliques(
            cliques, n, valid_leaf=valid_leaf, root=root
        )
        return ScanSupernodalStructure(blocks=base.blocks, n=base.n)

    @staticmethod
    def from_structure(s: SupernodalStructure):
        return ScanSupernodalStructure(blocks=s.blocks, n=s.n)

    @property
    def smax(self) -> int:
        return max((len(s) for s, _ in self.blocks), default=1)

    @property
    def pmax(self) -> int:
        return max((len(p) for _, p in self.blocks), default=0)

    def padded_indices(self):
        """(s_idx[K, smax], p_idx[K, pmax], n_ext) int32 numpy arrays.

        Padded slots are distinct dummy indices so gathered padding blocks
        are exactly the identity (a repeated dummy index would gather a
        singular all-ones block).  Supernode padding uses slots
        n..n+smax-1 and separator padding the DISJOINT slots
        n+smax..n+smax+pmax-1 — otherwise G[s_pad, p_pad] would gather a
        dummy diagonal 1 and the Schur update would corrupt it.
        """
        smax, pmax = self.smax, self.pmax
        K = len(self.blocks)
        s_idx = np.zeros((K, smax), np.int32)
        p_idx = np.zeros((K, max(pmax, 1)), np.int32)
        for k, (s, p) in enumerate(self.blocks):
            s_idx[k, : len(s)] = s
            s_idx[k, len(s):] = self.n + np.arange(smax - len(s))
            p_idx[k, : len(p)] = p
            p_idx[k, len(p):] = (
                self.n + smax + np.arange(p_idx.shape[1] - len(p))
            )
        return s_idx, p_idx, self.n + smax + max(pmax, 1)


def _extend(G, structure: ScanSupernodalStructure, n_ext: int):
    """Embed G into the (n_ext, n_ext) backing with an identity dummy block."""
    n = structure.n
    Gext = jnp.zeros((n_ext, n_ext), G.dtype)
    Gext = Gext.at[:n, :n].set(G)
    r = jnp.arange(n, n_ext)
    return Gext.at[r, r].set(1.0)


def factor_llt(G, structure: ScanSupernodalStructure):
    """Supernodal block Cholesky as one lax.scan over the elimination order.

    reference: BlockCholeskyInPlace (block_triangular_operations.cc:184-219).
    """
    s_idx, p_idx, n_ext = structure.padded_indices()
    Gext = _extend(G, structure, n_ext)

    def body(Gc, idx):
        s, p = idx
        D = Gc[s[:, None], s[None, :]]
        L = jnp.linalg.cholesky(D)
        B = jax.scipy.linalg.solve_triangular(
            L, Gc[s[:, None], p[None, :]], lower=True
        )
        Gc = Gc.at[p[:, None], p[None, :]].add(-(B.T @ B))
        return Gc, (L, B)

    _, (Ls, Bs) = jax.lax.scan(
        body, Gext, (jnp.asarray(s_idx), jnp.asarray(p_idx))
    )
    fail = ~(jnp.all(jnp.isfinite(Ls)) & jnp.all(jnp.isfinite(Bs)))
    return (Ls, Bs), fail


def solve_llt(fac, structure: ScanSupernodalStructure, b):
    """Forward/backward block substitution as two scans.

    reference: ApplyBlockInverseInPlace / ...OfTransposeInPlace
    (block_triangular_operations.cc:114-182).
    """
    Ls, Bs = fac
    s_idx, p_idx, n_ext = structure.padded_indices()
    s_idx = jnp.asarray(s_idx)
    p_idx = jnp.asarray(p_idx)
    z = jnp.zeros((n_ext,), b.dtype).at[: structure.n].set(b)

    def fwd(zc, x):
        s, p, L, B = x
        zs = jax.scipy.linalg.solve_triangular(L, zc[s], lower=True)
        zc = zc.at[s].set(zs)
        zc = zc.at[p].add(-(B.T @ zs))
        return zc, None

    z, _ = jax.lax.scan(fwd, z, (s_idx, p_idx, Ls, Bs))

    def bwd(zc, x):
        s, p, L, B = x
        rhs = zc[s] - B @ zc[p]
        zc = zc.at[s].set(
            jax.scipy.linalg.solve_triangular(L.T, rhs, lower=False)
        )
        return zc, None

    z, _ = jax.lax.scan(bwd, z, (s_idx, p_idx, Ls, Bs), reverse=True)
    return z[: structure.n]


def _ldlt_clamped_block(D):
    """Fixed-order clamped LDLT of one padded (smax, smax) block via
    fori_loop (pivot clamp semantics of RLDLT.h:381-393)."""
    k = D.shape[0]
    idx = jnp.arange(k)

    def body(j, M):
        d = M[j, j]
        d = jnp.where(
            jnp.abs(d) < LDLT_PIVOT_CLAMP,
            jnp.where(d >= 0, LDLT_PIVOT_CLAMP, -LDLT_PIVOT_CLAMP),
            d,
        )
        col = M[:, j]
        below = idx > j
        l_col = jnp.where(below, col / d, 0.0)
        M = M - d * jnp.outer(l_col, l_col)
        M = jnp.where(below[:, None] & (idx[None, :] == j), l_col[:, None], M)
        M = M.at[j, j].set(d)
        return M

    M = jax.lax.fori_loop(0, k, body, D)
    L = jnp.tril(M, -1) + jnp.eye(k, dtype=D.dtype)
    return L, jnp.diagonal(M)


def factor_ldlt(G, structure: ScanSupernodalStructure):
    """Supernodal clamped LDLT as one scan (reference BlockLDLTInPlace,
    block_triangular_operations.cc:315-349, fixed-order clamped pivots)."""
    s_idx, p_idx, n_ext = structure.padded_indices()
    Gext = _extend(G, structure, n_ext)

    def body(Gc, idx):
        s, p = idx
        D = Gc[s[:, None], s[None, :]]
        Lu, d = _ldlt_clamped_block(D)
        Gps = Gc[p[:, None], s[None, :]]
        tmp = jax.scipy.linalg.solve_triangular(
            Lu, Gps.T, lower=True, unit_diagonal=True
        ).T  # = G[p,s] Lu^{-T}
        C = tmp / d[None, :]
        Gc = Gc.at[p[:, None], p[None, :]].add(-(C * d[None, :]) @ C.T)
        return Gc, (Lu, d, C)

    _, (Ls, ds, Cs) = jax.lax.scan(
        body, Gext, (jnp.asarray(s_idx), jnp.asarray(p_idx))
    )
    fail = ~(
        jnp.all(jnp.isfinite(Ls))
        & jnp.all(jnp.isfinite(ds))
        & jnp.all(jnp.isfinite(Cs))
    )
    return (Ls, ds, Cs), fail


def solve_ldlt(fac, structure: ScanSupernodalStructure, b):
    Ls, ds, Cs = fac
    s_idx, p_idx, n_ext = structure.padded_indices()
    s_idx = jnp.asarray(s_idx)
    p_idx = jnp.asarray(p_idx)
    z = jnp.zeros((n_ext,), b.dtype).at[: structure.n].set(b)

    def fwd(zc, x):
        s, p, Lu, C = x
        zs = jax.scipy.linalg.solve_triangular(
            Lu, zc[s], lower=True, unit_diagonal=True
        )
        zc = zc.at[s].set(zs)
        zc = zc.at[p].add(-(C @ zs))
        return zc, None

    z, _ = jax.lax.scan(fwd, z, (s_idx, p_idx, Ls, Cs))

    def dscale(zc, x):
        s, d = x
        return zc.at[s].set(zc[s] / d), None

    z, _ = jax.lax.scan(dscale, z, (s_idx, ds))

    def bwd(zc, x):
        s, p, Lu, C = x
        rhs = zc[s] - C.T @ zc[p]
        zc = zc.at[s].set(
            jax.scipy.linalg.solve_triangular(
                Lu.T, rhs, lower=False, unit_diagonal=True
            )
        )
        return zc, None

    z, _ = jax.lax.scan(bwd, z, (s_idx, p_idx, Ls, Cs), reverse=True)
    return z[: structure.n]
