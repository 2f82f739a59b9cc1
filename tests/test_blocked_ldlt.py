"""Blocked panel LDLT (solver/kkt.py::_ldlt_clamped) vs the scalar oracle.

The blocked variant factors 128-wide panels with the scalar kernel and does
the trailing update as matmuls; in fixed elimination order the two produce
the same factor (up to roundoff) including clamping decisions.
reference: BlockLDLTInPlace (block_triangular_operations.cc:315-349) +
RLDLT pivot clamps (RLDLT.h:381-393).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conex_tpu.solver.kkt import (
    LDLT_PIVOT_CLAMP,
    _ldlt_clamped,
    _ldlt_scalar,
    _solve_ldlt,
)


def _recon(M, n):
    L = np.tril(np.asarray(M), -1) + np.eye(n)
    d = np.diagonal(np.asarray(M))
    return L @ np.diag(d) @ L.T


@pytest.mark.parametrize("n", [5, 64, 128, 129, 200, 300])
def test_blocked_matches_scalar(n):
    rng = np.random.default_rng(n)
    A = rng.standard_normal((n, n))
    K = 0.5 * (A + A.T)
    Ms, fs = _ldlt_scalar(jnp.asarray(K))
    Mb, fb = jax.jit(_ldlt_clamped)(jnp.asarray(K))
    assert not bool(fs) and not bool(fb)
    # Only the lower triangle + diagonal are the factor (_solve_ldlt reads
    # tril + diag); the upper triangle holds stale intermediates.
    ts, tb = np.tril(np.asarray(Ms)), np.tril(np.asarray(Mb))
    scale = np.abs(ts).max()
    np.testing.assert_allclose(tb, ts, atol=1e-9 * scale)
    assert np.abs(_recon(Mb, n) - K).max() < 1e-9 * max(1.0, scale)


def test_blocked_kkt_structure_solve():
    """Realistic saddle KKT matrix [[G, E^T], [E, 0]]: factor + solve."""
    rng = np.random.default_rng(7)
    n, k = 250, 20
    G = rng.standard_normal((n, n))
    G = G @ G.T + np.eye(n)
    E = rng.standard_normal((k, n))
    K = np.zeros((n + k, n + k))
    K[:n, :n] = G
    K[n:, :n] = E
    K[:n, n:] = E.T
    b = rng.standard_normal(n + k)
    M, fail = jax.jit(_ldlt_clamped)(jnp.asarray(K))
    assert not bool(fail)
    x = np.asarray(_solve_ldlt(M, jnp.asarray(b)))
    np.testing.assert_allclose(K @ x, b, atol=1e-8)


def test_blocked_clamp_semantics():
    """A zero pivot must be clamped to +/-1e-9, same as the scalar path."""
    rng = np.random.default_rng(3)
    n = 150
    A = rng.standard_normal((n, n))
    K = 0.5 * (A + A.T)
    K[40, :] = 0.0
    K[:, 40] = 0.0  # structurally zero pivot at elimination step 40
    Ms, _ = _ldlt_scalar(jnp.asarray(K))
    Mb, _ = jax.jit(_ldlt_clamped)(jnp.asarray(K))
    ds, db = float(Ms[40, 40]), float(Mb[40, 40])
    assert abs(abs(ds) - LDLT_PIVOT_CLAMP) < 1e-15
    assert abs(abs(db) - LDLT_PIVOT_CLAMP) < 1e-15
    np.testing.assert_allclose(
        np.tril(np.asarray(Mb)), np.tril(np.asarray(Ms)), atol=1e-6
    )
