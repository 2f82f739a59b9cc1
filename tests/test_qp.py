"""Quadratic-cost (QP) tests.

Mirrors /root/reference/conex/test/quadratic_objective_test.cc: QPs built
from KKT conditions with a known active set must be recovered to 1e-9 under
the line-search configuration.
"""

import numpy as np
import pytest

from conex_tpu import Program, SolverConfig


QP_CONFIG = SolverConfig(
    enable_line_search=True,
    enable_rescaling=False,
    initial_centering_steps_coldstart=0,
    inv_sqrt_mu_max=2e5,
    max_iterations=30,
    final_centering_tolerance=1.05,
    final_centering_steps=0,
    kkt_error_tolerance=1e45,
    dinf_upper_bound=1.0,
    prepare_dual_variables=True,
)


def qp_with_solution(n, num_ineqs, rng):
    """reference: ProblemDataWithSolution (quadratic_objective_test.cc:88-115):
    min 1/2 x'Wx + c'x  s.t.  Ax + b >= 0, with active set = first n rows."""
    size_active = n
    optimal_slack = np.zeros(num_ineqs)
    optimal_lambda = np.zeros(num_ineqs)
    optimal_lambda[:size_active] = np.linspace(1, size_active, size_active)
    optimal_slack[size_active:] = 1.0
    optimal_x = rng.uniform(-1, 1, n)
    W = np.eye(n)
    A = rng.uniform(-1, 1, (num_ineqs, n))
    b = optimal_slack - A @ optimal_x
    c = A.T @ optimal_lambda - W @ optimal_x
    return W, A, b, c, optimal_x, optimal_slack


@pytest.mark.parametrize("n,num_ineqs", [(5, 10), (10, 20)])
def test_random_qp(n, num_ineqs):
    rng = np.random.default_rng(0)
    W, A, b, c, x_opt, slack_opt = qp_with_solution(n, num_ineqs, rng)
    prog = Program(n)
    prog.add_quadratic_cost(W)
    # Constraint: A x + b >= 0  <=>  b - (-A) x >= 0.
    prog.add_linear_constraint(-A, b)
    res = prog.solve(-c, QP_CONFIG)
    assert res.solved
    np.testing.assert_allclose(res.y, x_opt, atol=1e-9)
    np.testing.assert_allclose(A @ res.y + b, slack_opt, atol=1e-9)


def test_qp_requires_line_search():
    prog = Program(2)
    prog.add_quadratic_cost(np.eye(2))
    prog.add_linear_constraint(np.eye(2), np.ones(2))
    with pytest.raises(ValueError, match="line_search"):
        prog.solve(np.ones(2))


def test_qp_unconstrained_minimum_inside():
    """If the unconstrained optimum satisfies the constraints strictly, the
    QP solution is -Q^{-1} c ... here maximize b'y - 1/2 y'Qy -> y* = Q^{-1}b."""
    rng = np.random.default_rng(1)
    n = 4
    M = rng.uniform(-1, 1, (n, n))
    Q = M @ M.T + n * np.eye(n)
    b = rng.uniform(-0.1, 0.1, n)
    ystar = np.linalg.solve(Q, b)
    # Loose box constraints that are inactive at ystar.
    A = np.vstack([np.eye(n), -np.eye(n)])
    cvec = np.full(2 * n, 10.0)
    prog = Program(n)
    prog.add_quadratic_cost(Q)
    prog.add_linear_constraint(A, cvec)
    res = prog.solve(b, QP_CONFIG)
    assert res.solved
    np.testing.assert_allclose(res.y, ystar, atol=1e-6)
