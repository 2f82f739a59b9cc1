"""Dense LP integration tests.

Mirrors the recipes of the reference /root/reference/conex/test/test_lp.cc:
random feasible instances constructed so b = A^T x0 for interior x0, solved,
then checked against the KKT conditions (dual feasibility, nonnegative slack,
complementarity bounded by mu * rank).
"""

import numpy as np
import pytest

from conex_tpu import Program, SolverConfig


def random_feasible_lp(num_constraints, num_vars, rng):
    A = rng.uniform(-1, 1, (num_constraints, num_vars))
    c = np.abs(rng.uniform(-1, 1, num_constraints))
    x0 = np.abs(rng.uniform(-1, 1, num_constraints))
    x0 *= 0.01 / np.linalg.norm(x0)
    b = A.T @ x0
    return A, c, b


def check_lp_kkt(A, c, b, y, x, inv_sqrt_mu_max, eps=1e-12):
    slack = c - A @ y
    n = A.shape[0]
    assert np.linalg.norm(A.T @ x - b) <= 1e-8 * max(np.linalg.norm(b), 1e-6)
    assert slack.min() >= -eps
    assert x.min() >= -eps
    mu = 1.0 / inv_sqrt_mu_max**2
    assert slack @ x >= -eps
    assert slack @ x <= (mu + np.sqrt(eps)) * n


# The reference LP.Dense config (test_lp.cc:55-62).
BASE = dict(
    prepare_dual_variables=True,
    inv_sqrt_mu_max=5e5,
    divergence_upper_bound=1000.0,
    dinf_upper_bound=1.35,
    final_centering_tolerance=1.0,
)


@pytest.mark.parametrize("line_search", [False, True])
@pytest.mark.parametrize("rescaling", [False, True])
def test_lp_dense_grid(line_search, rescaling):
    config = SolverConfig(
        **BASE, enable_line_search=line_search, enable_rescaling=rescaling
    )
    rng = np.random.default_rng(1)
    for i in range(6):
        num_vars = 5
        num_constraints = 6 + 2 * i
        A, c, b = random_feasible_lp(num_constraints, num_vars, rng)
        prog = Program(num_vars)
        prog.add_linear_constraint(A, c)
        res = prog.solve(b, config)
        assert res.solved, f"not solved: iters={res.num_iterations}"
        x = prog.get_dual_variable(0)
        check_lp_kkt(A, c, b, res.y, x, config.inv_sqrt_mu_max)


def test_lp_default_config():
    rng = np.random.default_rng(7)
    A, c, b = random_feasible_lp(20, 8, rng)
    prog = Program(8)
    prog.add_linear_constraint(A, c)
    res = prog.solve(b, SolverConfig(prepare_dual_variables=True))
    assert res.solved
    x = prog.get_dual_variable(0)
    check_lp_kkt(A, c, b, res.y, x, 1000.0, eps=1e-9)


def test_lp_objective_matches_scipy():
    from scipy.optimize import linprog

    rng = np.random.default_rng(3)
    A, c, b = random_feasible_lp(30, 10, rng)
    prog = Program(10)
    prog.add_linear_constraint(A, c)
    res = prog.solve(b, SolverConfig(inv_sqrt_mu_max=1e5))
    assert res.solved
    # maximize b'y s.t. A y <= c  <=>  scipy minimize -b'y
    ref = linprog(-b, A_ub=A, b_ub=c, bounds=(None, None), method="highs")
    assert ref.status == 0
    assert b @ res.y == pytest.approx(-ref.fun, abs=1e-6)
    assert np.max(A @ res.y - c) <= 1e-9


def test_lp_sparse_vs_dense():
    """Two clique-structured LP blocks must agree with the combined dense LP.

    reference: LP.Sparse (test_lp.cc:253-311).
    """
    rng = np.random.default_rng(11)
    num_vars = 6
    A1 = rng.uniform(-1, 1, (8, 3))
    c1 = np.abs(rng.uniform(-1, 1, 8))
    A2 = rng.uniform(-1, 1, (8, 3))
    c2 = np.abs(rng.uniform(-1, 1, 8))
    vars1 = [0, 1, 2]
    vars2 = [3, 4, 5]

    # Combined dense matrix.
    Af = np.zeros((16, num_vars))
    Af[:8, :3] = A1
    Af[8:, 3:] = A2
    cf = np.concatenate([c1, c2])

    x0 = np.abs(rng.uniform(-1, 1, 16))
    x0 *= 0.1 / np.linalg.norm(x0)
    b = Af.T @ x0

    dense = Program(num_vars)
    dense.add_linear_constraint(Af, cf)
    res_dense = dense.solve(b)

    sparse = Program(num_vars)
    sparse.add_linear_constraint(A1, c1, variables=vars1)
    sparse.add_linear_constraint(A2, c2, variables=vars2)
    res_sparse = sparse.solve(b)

    assert res_dense.solved and res_sparse.solved
    np.testing.assert_allclose(res_dense.y, res_sparse.y, atol=1e-6)


@pytest.mark.parametrize("distance_to_infeasible", [-0.1, 0.1])
def test_lp_primal_fails_slater(distance_to_infeasible):
    """reference: LP.RandomPrimal / DoRandomPrimalFailsSlater
    (test_lp.cc:317-380).  The feasible set has implicit equalities
    A1 y = C1; a negative offset makes it infeasible, and the recovered
    cone variable x must then be a Farkas certificate: A'x ~ 0, -C'x > 0,
    x >= 0.
    """
    config = SolverConfig(
        prepare_dual_variables=True,
        inv_sqrt_mu_max=10000.0,
        maximum_mu=1e7,
        divergence_upper_bound=10000.0,
        infeasibility_threshold=2e6,
        final_centering_steps=5,
        final_centering_tolerance=1.0,
    )
    # Like the reference's srand(0), the certificate quality is instance
    # dependent: the divergent trajectory must survive enough iterations
    # before the Schur complement degenerates.  Seed 1 diverges cleanly.
    rng = np.random.default_rng(1)
    m, n1, n2 = 10, 3, 8
    n = 2 * n1 + n2
    yref = rng.uniform(-1, 1, m)
    A1 = rng.uniform(-1, 1, (n1, m))
    C1 = A1 @ yref
    A2 = rng.uniform(-1, 1, (n2, m))
    C2 = A2 @ yref + 2.0
    A = np.vstack([A1, -A1, A2])
    offset = np.full(n1, distance_to_infeasible)
    C = np.concatenate([C1, -(C1 - offset), C2])

    xref = np.abs(rng.uniform(-1, 1, n))
    b = A.T @ xref

    prog = Program(m)
    prog.add_linear_constraint(A, C)
    res = prog.solve(b, config)
    x = prog.get_dual_variable(0)

    if distance_to_infeasible < 0:
        scale = -C @ x
        assert scale >= 0
        assert np.linalg.norm(A.T @ x / scale) < 1e-4
        assert x.min() / scale >= -1e-8
    else:
        assert res.solved
        assert abs(C @ x - b @ res.y) < 1e-5
        assert (C - A @ res.y).min() >= -1e-5
        assert np.linalg.norm(A.T @ x - b) < 1e-5
        assert x.min() >= -1e-8


@pytest.mark.parametrize("distance_to_infeasible", [-1.0, 1.0])
def test_lp_dual_fails_slater(distance_to_infeasible):
    """reference: LP.RandomDual / DoRandomDualFailsSlater
    (test_lp.cc:383-440).  For negative distance the program is unbounded
    (its conic dual infeasible); the returned raw y must be an improving
    ray: -A y >= 0 and b'y >= 0.
    """
    config = SolverConfig(
        prepare_dual_variables=True,
        inv_sqrt_mu_max=10000.0,
        divergence_upper_bound=10000.0,
        maximum_mu=1e7,
        infeasibility_threshold=1e5,
        final_centering_steps=2,
        final_centering_tolerance=1.0,
    )
    rng = np.random.default_rng(0)
    m1 = m2 = 4
    m = m1 + m2
    n = 10
    A1 = rng.uniform(-1, 1, (n, m1))
    A2 = np.abs(rng.uniform(-1, 1, (n, m2)))
    A2[: n - m2, :] = 0.0
    A1[n - m2 :, :] = 0.0
    A = np.hstack([A1, A2])
    C = np.ones(n)
    xref = np.abs(rng.uniform(-1, 1, n))
    A[n - m2 :, m1:] = np.eye(m2)
    b = A.T @ xref
    b[m1:] = distance_to_infeasible

    prog = Program(m)
    prog.add_linear_constraint(A, C)
    res = prog.solve(b, config)
    x = prog.get_dual_variable(0)

    if distance_to_infeasible < 0:
        assert not res.solved
        assert (-A @ res.y).min() >= -1e-8
        assert b @ res.y >= 0
    else:
        assert res.solved
        assert abs(C @ x - b @ res.y) < 1e-6
        assert np.linalg.norm(A.T @ x - b) < 1e-8
        assert (C - A @ res.y).min() >= -1e-8


def test_mu_is_nonincreasing():
    """reference: python run_tests.py VerifyMuIsNonIncreasing."""
    rng = np.random.default_rng(9)
    A, c, b = random_feasible_lp(12, 5, rng)
    prog = Program(5)
    prog.add_linear_constraint(A, c)
    res = prog.solve(b)
    k = res.stats_inv_sqrt_mu
    mu = 1.0 / k**2
    assert np.all(np.diff(mu) <= 1e-9)


def test_lp_many_cliques_scan_path():
    """Chain LP with enough cliques to trip the block-compressed scan
    factorization (program.SCAN_CLIQUE_THRESHOLD) — must agree with the
    same program solved densely."""
    from conex_tpu.program import SCAN_CLIQUE_THRESHOLD
    from conex_tpu.supernodal.compressed import (
        CompressedSupernodalStructure,
    )

    rng = np.random.default_rng(21)
    n_blocks = SCAN_CLIQUE_THRESHOLD + 6
    num_vars = n_blocks + 1  # clique i covers vars {i, i+1}
    rows = 4

    blocks = []
    Af = np.zeros((rows * n_blocks, num_vars))
    cf = np.zeros(rows * n_blocks)
    for i in range(n_blocks):
        Ai = rng.uniform(-1, 1, (rows, 2))
        ci = np.abs(rng.uniform(-1, 1, rows)) + 0.1
        blocks.append((Ai, ci, [i, i + 1]))
        Af[rows * i:rows * (i + 1), i:i + 2] = Ai
        cf[rows * i:rows * (i + 1)] = ci

    x0 = np.abs(rng.uniform(-1, 1, rows * n_blocks))
    x0 *= 0.1 / np.linalg.norm(x0)
    b = Af.T @ x0

    sparse = Program(num_vars)
    for Ai, ci, vars_ in blocks:
        sparse.add_linear_constraint(Ai, ci, variables=vars_)
    assert isinstance(sparse._kkt_structure(), CompressedSupernodalStructure)
    res_sparse = sparse.solve(b)

    dense = Program(num_vars)
    dense.add_linear_constraint(Af, cf)
    res_dense = dense.solve(b)

    assert res_dense.solved and res_sparse.solved
    np.testing.assert_allclose(res_dense.y, res_sparse.y, atol=1e-6)
