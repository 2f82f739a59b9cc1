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


# -- presolve (reference MATLAB util/: CleanLinear, EliminateFreeVars,
#    blkdiagPrg/BuildMask/BinaryPsdCompletion) ------------------------------


def _sdp_instance(rng, m, n):
    """Feasible single-block SDP with interior point."""
    A = rng.uniform(-1, 1, (m, n * n))
    A = np.stack(
        [(0.5 * (r.reshape(n, n) + r.reshape(n, n).T)).reshape(-1)
         for r in A]
    )
    X0 = rng.uniform(-1, 1, (n, n))
    X0 = X0 @ X0.T + 0.5 * np.eye(n)
    b = A @ X0.reshape(-1)
    yref = rng.uniform(-1, 1, m)
    S = rng.uniform(-1, 1, (n, n))
    S = S @ S.T + 0.5 * np.eye(n)
    c = A.T @ yref + S.reshape(-1)
    return A, b, c


def test_clean_linear_zero_rows():
    from conex_tpu.preprocess import clean_linear

    rng = np.random.default_rng(5)
    A = rng.uniform(-1, 1, (4, 6))
    b = rng.uniform(-1, 1, 4)
    A2 = np.insert(A, 2, 0.0, axis=0)
    b2 = np.insert(b, 2, 0.0)
    Ar, br, T = clean_linear(A2, b2)
    np.testing.assert_allclose(Ar, A)
    np.testing.assert_allclose(br, b)
    y = rng.uniform(-1, 1, 4)
    yo = T @ y
    assert yo[2] == 0 and np.allclose(np.delete(yo, 2), y)


def test_clean_linear_qr_dependent_rows():
    from conex_tpu.preprocess import clean_linear

    rng = np.random.default_rng(6)
    A = rng.uniform(-1, 1, (3, 6))
    b = rng.uniform(-1, 1, 3)
    # duplicate row 1 (scaled) => dependent
    A2 = np.vstack([A, 2.0 * A[1]])
    b2 = np.concatenate([b, [2.0 * b[1]]])
    Ar, br, T = clean_linear(A2, b2, use_qr=True)
    assert Ar.shape[0] == 3
    # the kept system spans the same row space
    assert np.linalg.matrix_rank(np.vstack([Ar, A2])) == 3


def test_eliminate_free_vars_matches_direct():
    """SDP+free solved via free-variable elimination must agree with the
    direct (equality-constraint) path."""
    from conex_tpu.preprocess import eliminate_free_vars

    rng = np.random.default_rng(7)
    m, nfree, n = 4, 2, 4
    # Build the SDP part around a strictly feasible yref, and give the
    # free block c_f = Af' yref so yref satisfies its affine condition too.
    A_s = rng.uniform(-1, 1, (m, n * n))
    A_s = np.stack(
        [(0.5 * (r.reshape(n, n) + r.reshape(n, n).T)).reshape(-1)
         for r in A_s]
    )
    X0 = rng.uniform(-1, 1, (n, n))
    X0 = X0 @ X0.T + 0.5 * np.eye(n)
    bs = A_s @ X0.reshape(-1)
    yref = rng.uniform(-1, 1, m)
    S = rng.uniform(-1, 1, (n, n))
    S = S @ S.T + 0.5 * np.eye(n)
    cs = A_s.T @ yref + S.reshape(-1)
    Af = rng.uniform(-1, 1, (m, nfree))
    xf0 = rng.uniform(-1, 1, nfree)
    A = np.concatenate([Af, A_s], axis=1)
    b = bs + Af @ xf0
    c = np.concatenate([Af.T @ yref, cs])
    K = dict(f=nfree, s=[n])

    x1, y1, info1 = solve_sedumi(A, b, c, K, blkdiag=False)
    assert info1["solved"]

    A_r, b_r, c_r, K_r, B, y0 = eliminate_free_vars(A, b, c, K)
    x2r, y2r, info2 = solve_sedumi(A_r, b_r, c_r, K_r, blkdiag=False)
    assert info2["solved"]
    y2 = y0 + B @ y2r
    assert abs(b @ y1 - b @ y2) < 1e-5
    # dual slack on the free block must vanish for both
    assert np.linalg.norm(c[:nfree] - Af.T @ y2) < 1e-6


def test_blkdiag_decomposition_splits_and_matches():
    """Two diagonal sub-blocks embedded in ONE PSD cone: the presolve must
    split K.s=[6] into two 3x3 cones and reproduce the un-decomposed
    solution."""
    from conex_tpu.preprocess import blkdiag_decompose

    rng = np.random.default_rng(8)
    n1, n2, m = 3, 3, 4
    n = n1 + n2
    A1, b1, c1 = _sdp_instance(rng, m, n1)
    A2, _, c2 = _sdp_instance(rng, m, n2)

    def embed(vec1, vec2):
        Mfull = np.zeros((n, n))
        Mfull[:n1, :n1] = vec1.reshape(n1, n1)
        Mfull[n1:, n1:] = vec2.reshape(n2, n2)
        return Mfull.reshape(-1)

    A = np.stack([embed(A1[i], A2[i]) for i in range(m)])
    b = b1 + A2 @ (lambda X: X.reshape(-1))(
        np.eye(n2)
    )  # feasible: X = diag(X1, I)
    c = embed(c1, c2)
    K = dict(s=[n])

    red = blkdiag_decompose(A, b, c, K)
    assert sorted(red.K["s"]) == [3, 3]

    x_ref, y_ref, info_ref = solve_sedumi(A, b, c, K, blkdiag=False)
    x_red, y_redv, info_red = solve_sedumi(
        red.A, red.b, red.c, red.K, blkdiag=False
    )
    assert info_ref["solved"] and info_red["solved"]
    x_rec = red.recover_primal(x_red)
    y_rec = red.recover_dual(y_redv)
    assert abs(b @ y_ref - b @ y_rec) < 1e-5
    assert abs(c @ x_ref - c @ x_rec) < 1e-5
    assert np.linalg.norm(A @ x_rec - b) < 1e-5


def test_sedumi_auto_blkdiag_multiblock():
    """len(K.s) > 1 turns the presolve on by default (reference conex.m
    pars.blkdiag default); result must match the presolve-off path."""
    rng = np.random.default_rng(9)
    m = 4
    A1, b1, c1 = _sdp_instance(rng, m, 3)
    A2, b2, c2 = _sdp_instance(rng, m, 2)
    A = np.concatenate([A1, A2], axis=1)
    b = b1 + b2
    c = np.concatenate([c1, c2])
    K = dict(s=[3, 2])

    x_on, y_on, info_on = solve_sedumi(A, b, c, K)  # auto blkdiag
    x_off, y_off, info_off = solve_sedumi(A, b, c, K, blkdiag=False)
    assert info_on["solved"] and info_off["solved"]
    assert abs(b @ y_on - b @ y_off) < 1e-5
    assert abs(c @ x_on - c @ x_off) < 1e-5
