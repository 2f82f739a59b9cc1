"""Equality-constraint tests (LDLT KKT path).

Mirrors /root/reference/conex/test/equality_constraints_test.cc: programs
with affine equalities solved via the indefinite-KKT LDLT path, checked
against known optima and KKT stationarity; many separate equality blocks
must agree with one combined block.
"""

import numpy as np
import pytest

from conex_tpu import Program, SolverConfig


def build_instance(rng, m=5, n=8, p=2):
    A = rng.uniform(-1, 1, (n, m))
    c = np.abs(rng.uniform(-1, 1, n)) + 0.5
    Aeq = rng.uniform(-1, 1, (p, m))
    beq = Aeq @ (0.1 * rng.uniform(-1, 1, m))
    b = A.T @ np.abs(rng.uniform(-1, 1, n)) + Aeq.T @ rng.uniform(-1, 1, p)
    return A, c, Aeq, beq, b


def test_equality_kkt():
    rng = np.random.default_rng(0)
    A, c, Aeq, beq, b = build_instance(rng)
    prog = Program(5)
    prog.add_linear_constraint(A, c)
    prog.add_equality_constraint(Aeq, beq)
    res = prog.solve(b, SolverConfig(max_iterations=60, prepare_dual_variables=True))
    assert res.solved
    assert np.linalg.norm(Aeq @ res.y - beq) < 1e-8
    assert (c - A @ res.y).min() >= -1e-8
    x = prog.get_dual_variable(0)
    lam = prog.get_equality_dual(0)
    # Stationarity: b = A' x + Aeq' lambda.
    assert np.linalg.norm(A.T @ x + Aeq.T @ lam - b) < 1e-5
    assert x.min() >= -1e-9


def test_equality_known_optimum():
    """maximize y1 + y2 s.t. y1 + y2 + y3 = 1, 0 <= y <= 1 elementwise
    => optimum value 1 at y3 = 0."""
    m = 3
    A = np.vstack([np.eye(m), -np.eye(m)])
    c = np.concatenate([np.ones(m), np.zeros(m)])
    Aeq = np.ones((1, m))
    beq = np.array([1.0])
    b = np.array([1.0, 1.0, 0.0])
    prog = Program(m)
    prog.add_linear_constraint(A, c)
    prog.add_equality_constraint(Aeq, beq)
    res = prog.solve(b, SolverConfig(max_iterations=60))
    assert res.solved
    assert b @ res.y == pytest.approx(1.0, abs=1e-6)
    assert Aeq @ res.y == pytest.approx(1.0, abs=1e-8)


def test_many_equality_blocks_vs_one():
    """reference: equality_constraints_test.cc — separate equality
    constraints agree with a single stacked one."""
    rng = np.random.default_rng(1)
    A, c, _, _, b = build_instance(rng, p=0)
    Aeq = rng.uniform(-1, 1, (3, 5))
    beq = Aeq @ (0.05 * rng.uniform(-1, 1, 5))

    one = Program(5)
    one.add_linear_constraint(A, c)
    one.add_equality_constraint(Aeq, beq)
    r1 = one.solve(b, SolverConfig(max_iterations=60))

    many = Program(5)
    many.add_linear_constraint(A, c)
    for i in range(3):
        many.add_equality_constraint(Aeq[i : i + 1], beq[i : i + 1])
    r2 = many.solve(b, SolverConfig(max_iterations=60))

    assert r1.solved and r2.solved
    np.testing.assert_allclose(r1.y, r2.y, atol=1e-7)


def test_equality_with_sdp():
    """Mixed SDP + equality through the LDLT path."""
    rng = np.random.default_rng(2)
    m, n = 4, 4
    As = np.stack([0.5 * (M + M.T) for M in rng.uniform(-1, 1, (m, n, n))])
    C = 0.5 * (lambda M: M + M.T)(rng.uniform(-1, 1, (n, n))) + 3 * np.eye(n)
    X0 = rng.uniform(-1, 1, (n, n))
    X0 = X0 @ X0.T + 0.1 * np.eye(n)
    Aeq = rng.uniform(-1, 1, (1, m))
    beq = Aeq @ (0.05 * rng.uniform(-1, 1, m))
    b = np.einsum("vij,ij->v", As, X0) + Aeq.T @ rng.uniform(-1, 1, 1)
    prog = Program(m)
    prog.add_lmi_constraint(As, C)
    prog.add_equality_constraint(Aeq, beq)
    res = prog.solve(b, SolverConfig(max_iterations=60))
    assert res.solved
    assert abs(Aeq @ res.y - beq)[0] < 1e-7
    S = C - np.einsum("v,vij->ij", res.y, As)
    assert np.linalg.eigvalsh(S).min() >= -1e-7
