"""SeDuMi front-end tests (reference conex.m / run_conex_tests.m recipes)."""

import numpy as np
import pytest

from conex_tpu.sedumi import solve_sedumi


def test_sedumi_lp_matches_scipy():
    from scipy.optimize import linprog

    rng = np.random.default_rng(0)
    m, n = 3, 8
    A = rng.uniform(-1, 1, (m, n))
    x0 = np.abs(rng.uniform(0.5, 1, n))
    b = A @ x0
    c = rng.uniform(0, 1, n) + A.T @ rng.uniform(-1, 1, m)

    x, y, info = solve_sedumi(A, b, c, dict(l=n))
    assert info["solved"]
    ref = linprog(c, A_eq=A, b_eq=b, bounds=(0, None), method="highs")
    assert ref.status == 0
    assert c @ x == pytest.approx(ref.fun, abs=1e-5)
    # Primal feasibility and duality gap.
    assert np.linalg.norm(A @ x - b) < 1e-6
    assert x.min() >= -1e-8
    assert abs(c @ x - b @ y) < 1e-5


def test_sedumi_mixed_free_lp_soc():
    """Free + nonneg + Lorentz sections."""
    rng = np.random.default_rng(1)
    m = 3
    nf, nl, q = 1, 4, 4
    n = nf + nl + q
    A = rng.uniform(-1, 1, (m, n))
    xf = rng.uniform(-1, 1, nf)
    xl = np.abs(rng.uniform(0.2, 1, nl))
    xq = rng.uniform(-0.3, 0.3, q)
    xq[0] = np.linalg.norm(xq[1:]) + 0.5
    x0 = np.concatenate([xf, xl, xq])
    b = A @ x0
    yref = rng.uniform(-1, 1, m)
    # c - A'y must be 0 on free, >= 0 on l, in cone on q for some y.
    sl = np.concatenate(
        [np.zeros(nf), np.abs(rng.uniform(0.1, 1, nl)),
         np.concatenate([[1.5], rng.uniform(-0.3, 0.3, q - 1)])]
    )
    c = A.T @ yref + sl

    x, y, info = solve_sedumi(A, b, c, dict(f=nf, l=nl, q=[q]))
    assert info["solved"]
    assert np.linalg.norm(A @ x - b) < 1e-5
    assert x[nf:nf + nl].min() >= -1e-7
    xs = x[nf + nl:]
    assert xs[0] >= np.linalg.norm(xs[1:]) - 1e-6
    assert abs(c @ x - b @ y) < 1e-4


def test_sedumi_sdp():
    """A single s-block: min <C, X> s.t. <A_i, X> = b_i, X PSD."""
    rng = np.random.default_rng(2)
    m, n = 2, 3
    Amats = np.stack([0.5 * (M + M.T) for M in rng.uniform(-1, 1, (m, n, n))])
    X0 = rng.uniform(-1, 1, (n, n))
    X0 = X0 @ X0.T + 0.1 * np.eye(n)
    b = np.einsum("vij,ij->v", Amats, X0)
    yref = rng.uniform(-0.5, 0.5, m)
    S = np.eye(n) * 2.0
    Cmat = np.einsum("v,vij->ij", yref, Amats) + S

    A = Amats.reshape(m, n * n)
    c = Cmat.reshape(-1)
    x, y, info = solve_sedumi(A, b, c, dict(s=[n]))
    assert info["solved"]
    X = x.reshape(n, n)
    assert np.linalg.eigvalsh(0.5 * (X + X.T)).min() >= -1e-6
    assert np.linalg.norm(np.einsum("vij,ij->v", Amats, X) - b) < 1e-5
    assert abs(c @ x - b @ y) < 1e-4


def test_sedumi_dimension_check():
    with pytest.raises(ValueError, match="cone dimensions"):
        solve_sedumi(np.ones((2, 5)), np.ones(2), np.ones(5), dict(l=3))


def test_sedumi_all_cone_types_combined():
    """f + l + two q blocks + s block in one problem."""
    rng = np.random.default_rng(3)
    m = 4
    nf, nl, q1, q2, ns = 1, 3, 3, 4, 3
    n = nf + nl + q1 + q2 + ns * ns
    # Build c = A'y + s* with s* in the cone interior, b = A x* with x* interior.
    A = rng.uniform(-1, 1, (m, n))
    xf = rng.uniform(-1, 1, nf)
    xl = np.abs(rng.uniform(0.2, 1, nl))
    xq1 = np.concatenate([[1.0], rng.uniform(-0.2, 0.2, q1 - 1)])
    xq2 = np.concatenate([[1.0], rng.uniform(-0.2, 0.2, q2 - 1)])
    Xs = rng.uniform(-1, 1, (ns, ns)); Xs = Xs @ Xs.T + 0.2 * np.eye(ns)
    x0 = np.concatenate([xf, xl, xq1, xq2, Xs.reshape(-1)])
    b = A @ x0
    yref = rng.uniform(-0.5, 0.5, m)
    sl = np.concatenate([
        np.zeros(nf),
        np.abs(rng.uniform(0.2, 1, nl)),
        np.concatenate([[1.2], rng.uniform(-0.2, 0.2, q1 - 1)]),
        np.concatenate([[1.2], rng.uniform(-0.2, 0.2, q2 - 1)]),
        (2.0 * np.eye(ns)).reshape(-1),
    ])
    c = A.T @ yref + sl

    x, y, info = solve_sedumi(A, b, c, dict(f=nf, l=nl, q=[q1, q2], s=[ns]))
    assert info["solved"]
    assert np.linalg.norm(A @ x - b) < 1e-4
    assert abs(c @ x - b @ y) < 1e-3
    X = x[nf + nl + q1 + q2:].reshape(ns, ns)
    assert np.linalg.eigvalsh(0.5 * (X + X.T)).min() >= -1e-6
