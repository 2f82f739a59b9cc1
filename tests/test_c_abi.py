"""C ABI round trip: drive libconex_tpu.so through ctypes.

The extern-C surface (interfaces/conex_tpu.{h,c}) mirrors the reference's
libconex.so API (/root/reference/interfaces/conex.h:41-99): same symbols,
column-major matrix convention, config struct layout.  The test builds the
library with the interfaces/Makefile if needed, loads it with ctypes (the
embedded-CPython calls run in this interpreter), and solves an LP two ways
— through the C ABI and through the Python API — expecting identical
results.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(ROOT, "interfaces", "libconex_tpu.so")


class SolverConfiguration(ctypes.Structure):
    _fields_ = [
        ("prepare_dual_variables", ctypes.c_int),
        ("initialization_mode", ctypes.c_int),
        ("inv_sqrt_mu_max", ctypes.c_double),
        ("minimum_mu", ctypes.c_double),
        ("maximum_mu", ctypes.c_double),
        ("divergence_upper_bound", ctypes.c_double),
        ("enable_line_search", ctypes.c_int),
        ("dinf_upper_bound", ctypes.c_double),
        ("final_centering_steps", ctypes.c_int),
        ("final_centering_tolerance", ctypes.c_double),
        ("initial_centering_steps_warmstart", ctypes.c_int),
        ("initial_centering_steps_coldstart", ctypes.c_int),
        ("warmstart_abort_threshold", ctypes.c_double),
        ("max_iterations", ctypes.c_int),
        ("iterative_refinement_iterations", ctypes.c_int),
        ("infeasibility_threshold", ctypes.c_double),
        ("kkt_error_tolerance", ctypes.c_double),
        ("enable_rescaling", ctypes.c_int),
        ("kkt_solver", ctypes.c_int),
    ]


class IterationStats(ctypes.Structure):
    _fields_ = [("mu", ctypes.c_double), ("iteration_number", ctypes.c_int)]


def _lib():
    if not os.path.exists(LIB):
        r = subprocess.run(
            ["make", "-C", os.path.join(ROOT, "interfaces")],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            pytest.skip(f"cannot build libconex_tpu.so: {r.stderr[-400:]}")
    lib = ctypes.CDLL(LIB)
    lib.CONEX_CreateConeProgram.restype = ctypes.c_void_p
    lib.CONEX_CreateConeProgram.argtypes = []
    lib.CONEX_DeleteConeProgram.argtypes = [ctypes.c_void_p]
    return lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def lp_instance():
    rng = np.random.default_rng(5)
    m, n = 4, 8
    A = rng.uniform(-1, 1, (n, m))
    x0 = rng.uniform(0.5, 1.5, n)
    b = A.T @ x0
    c = rng.uniform(0.5, 1.5, n)
    return A, b, c


def test_c_abi_lp_matches_python():
    lib = _lib()
    A, b, c = lp_instance()
    n, m = A.shape

    prog = lib.CONEX_CreateConeProgram()
    assert prog
    try:
        AF = np.asfortranarray(A)  # column-major per the C convention
        cid = lib.CONEX_AddDenseLinearConstraint(
            ctypes.c_void_p(prog), _dptr(AF), n, m, _dptr(np.ascontiguousarray(c)), n
        )
        assert cid == 0

        cfg = SolverConfiguration()
        lib.CONEX_SetDefaultOptions(ctypes.byref(cfg))
        assert cfg.max_iterations == 25 and cfg.inv_sqrt_mu_max == 1000.0
        cfg.max_iterations = 100
        cfg.prepare_dual_variables = 1

        y = np.zeros(m)
        solved = lib.CONEX_Maximize(
            ctypes.c_void_p(prog), _dptr(np.ascontiguousarray(b)), m,
            ctypes.byref(cfg), _dptr(y), m,
        )
        assert solved == 1

        # Python-API oracle.
        from conex_tpu.interface import Conex
        from conex_tpu import SolverConfig

        ref = Conex(m)
        ref.AddLinearInequality(A, c)
        sol = ref.Maximize(
            b, SolverConfig(max_iterations=100, prepare_dual_variables=True)
        )
        assert sol.status
        np.testing.assert_allclose(y, np.asarray(sol.y), atol=1e-10)

        # Dual variable readback.
        sz = lib.CONEX_GetDualVariableSize(ctypes.c_void_p(prog), 0)
        assert sz == n
        x = np.zeros(n)
        lib.CONEX_GetDualVariable(ctypes.c_void_p(prog), 0, _dptr(x), n, 1)
        np.testing.assert_allclose(A.T @ x, b, atol=1e-6)
        assert x.min() >= -1e-8

        # Iteration stats (circular -1 = last).
        st = IterationStats()
        lib.CONEX_GetIterationStats(
            ctypes.c_void_p(prog), ctypes.byref(st), -1
        )
        assert st.mu < 1e-5
    finally:
        lib.CONEX_DeleteConeProgram(ctypes.c_void_p(prog))


def test_c_abi_box_inequalities():
    """CONEX_AddLinearInequalities: lb <= A y <= ub with one equality row
    (lb == ub), vs the Python AddLinearInequalities oracle."""
    lib = _lib()
    rng = np.random.default_rng(7)
    m, rows = 3, 4
    A = rng.uniform(-1, 1, (rows, m))
    lb = np.array([-1.0, -2.0, 0.5, -1.5])
    ub = np.array([1.0, 2.0, 0.5, 1.5])  # row 2: equality
    b = rng.uniform(-0.2, 0.2, m)

    prog = lib.CONEX_CreateConeProgram()
    try:
        assert lib.CONEX_SetNumberOfVariables(ctypes.c_void_p(prog), m) == 0
        AF = np.asfortranarray(A)
        rid = lib.CONEX_AddLinearInequalities(
            ctypes.c_void_p(prog), _dptr(AF), rows, m,
            _dptr(np.ascontiguousarray(lb)), rows,
            _dptr(np.ascontiguousarray(ub)), rows,
        )
        assert rid == -1  # reference placeholder id (conex.cc:213-214)

        cfg = SolverConfiguration()
        lib.CONEX_SetDefaultOptions(ctypes.byref(cfg))
        cfg.max_iterations = 100
        cfg.kkt_solver = 1  # LDLT (equality duals present)
        y = np.zeros(m)
        solved = lib.CONEX_Maximize(
            ctypes.c_void_p(prog), _dptr(np.ascontiguousarray(b)), m,
            ctypes.byref(cfg), _dptr(y), m,
        )
        assert solved == 1
        Ay = A @ y
        assert (Ay <= ub + 1e-6).all() and (Ay >= lb - 1e-6).all()
        np.testing.assert_allclose(Ay[2], 0.5, atol=1e-6)

        from conex_tpu.interface import Conex
        from conex_tpu import SolverConfig
        from conex_tpu.config import KKT_SOLVER_LDLT

        ref = Conex(m)
        ref.AddLinearInequalities(A, lb, ub)
        sol = ref.Maximize(
            b, SolverConfig(max_iterations=100, kkt_solver=KKT_SOLVER_LDLT)
        )
        assert sol.status
        np.testing.assert_allclose(y, np.asarray(sol.y), atol=1e-10)
    finally:
        lib.CONEX_DeleteConeProgram(ctypes.c_void_p(prog))


def test_c_abi_sparse_lmi():
    """CONEX_AddSparseLMIConstraint over a variable subset."""
    lib = _lib()
    rng = np.random.default_rng(8)
    m_total, m_lmi, order = 4, 2, 3
    As = np.stack(
        [0.5 * (M + M.T) for M in rng.uniform(-1, 1, (m_lmi, order, order))]
    )
    C = np.eye(order)
    vars_ = np.array([1, 3], dtype=np.int64)
    # Bound the remaining variables with an LP block on all 4 vars.
    Alp = np.vstack([np.eye(m_total), -np.eye(m_total)])
    clp = np.ones(2 * m_total)

    prog = lib.CONEX_CreateConeProgram()
    try:
        assert lib.CONEX_SetNumberOfVariables(
            ctypes.c_void_p(prog), m_total) == 0
        Astack = np.concatenate(
            [np.asfortranarray(As[i]).ravel(order="F") for i in range(m_lmi)]
        )
        cid = lib.CONEX_AddSparseLMIConstraint(
            ctypes.c_void_p(prog), _dptr(Astack), order, order, m_lmi,
            _dptr(np.asfortranarray(C).ravel(order="F")), order, order,
            vars_.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), m_lmi,
        )
        assert cid == 0
        AF = np.asfortranarray(Alp)
        lib.CONEX_AddDenseLinearConstraint(
            ctypes.c_void_p(prog), _dptr(AF), 2 * m_total, m_total,
            _dptr(np.ascontiguousarray(clp)), 2 * m_total,
        )

        b = rng.uniform(-0.3, 0.3, m_total)
        cfg = SolverConfiguration()
        lib.CONEX_SetDefaultOptions(ctypes.byref(cfg))
        cfg.max_iterations = 100
        y = np.zeros(m_total)
        solved = lib.CONEX_Maximize(
            ctypes.c_void_p(prog), _dptr(np.ascontiguousarray(b)), m_total,
            ctypes.byref(cfg), _dptr(y), m_total,
        )
        assert solved == 1
        S = C - np.einsum("vij,v->ij", As, y[vars_])
        assert np.linalg.eigvalsh(S).min() >= -1e-7
        assert np.abs(y).max() <= 1 + 1e-7

        from conex_tpu.interface import Conex
        from conex_tpu import SolverConfig

        ref = Conex(m_total)
        ref.AddSparseLMIConstraint(As, C, vars_.tolist())
        ref.AddLinearInequality(Alp, clp)
        sol = ref.Maximize(b, SolverConfig(max_iterations=100))
        assert sol.status
        np.testing.assert_allclose(y, np.asarray(sol.y), atol=1e-10)
    finally:
        lib.CONEX_DeleteConeProgram(ctypes.c_void_p(prog))


def test_c_abi_quadratic_cost_maximize():
    """CONEX_AddQuadraticCost + Maximize: unconstrained optimum inside the
    box -> y* = Q^{-1} b."""
    lib = _lib()
    rng = np.random.default_rng(9)
    n = 4
    M = rng.uniform(-1, 1, (n, n))
    Q = M @ M.T + n * np.eye(n)
    b = rng.uniform(-0.1, 0.1, n)
    ystar = np.linalg.solve(Q, b)
    A = np.vstack([np.eye(n), -np.eye(n)])
    cvec = np.full(2 * n, 10.0)

    prog = lib.CONEX_CreateConeProgram()
    try:
        assert lib.CONEX_SetNumberOfVariables(ctypes.c_void_p(prog), n) == 0
        QF = np.asfortranarray(Q)
        assert lib.CONEX_AddQuadraticCost(
            ctypes.c_void_p(prog), _dptr(QF), n, n) == 0
        AF = np.asfortranarray(A)
        lib.CONEX_AddDenseLinearConstraint(
            ctypes.c_void_p(prog), _dptr(AF), 2 * n, n,
            _dptr(np.ascontiguousarray(cvec)), 2 * n,
        )
        cfg = SolverConfiguration()
        lib.CONEX_SetDefaultOptions(ctypes.byref(cfg))
        cfg.max_iterations = 100
        cfg.enable_line_search = 1
        cfg.enable_rescaling = 0
        cfg.inv_sqrt_mu_max = 2e5
        y = np.zeros(n)
        solved = lib.CONEX_Maximize(
            ctypes.c_void_p(prog), _dptr(np.ascontiguousarray(b)), n,
            ctypes.byref(cfg), _dptr(y), n,
        )
        assert solved == 1
        np.testing.assert_allclose(y, ystar, atol=1e-6)
    finally:
        lib.CONEX_DeleteConeProgram(ctypes.c_void_p(prog))


def test_c_abi_incremental_qp_solve():
    """The reference's test_app.cc SolveQP recipe through the new symbols:
    NewQuadraticCost + UpdateQuadraticCostMatrix + NewLinearInequality +
    CONEX_Solve (zero linear cost) -> y* = 0."""
    lib = _lib()
    n = 4
    prog = lib.CONEX_CreateConeProgram()
    try:
        assert lib.CONEX_SetNumberOfVariables(ctypes.c_void_p(prog), n) == 0
        cid = ctypes.c_int(-1)
        assert lib.CONEX_NewQuadraticCost(
            ctypes.c_void_p(prog), ctypes.byref(cid)) == 0
        for i in range(n):
            assert lib.CONEX_UpdateQuadraticCostMatrix(
                ctypes.c_void_p(prog), cid.value, ctypes.c_double(1.0), i, i
            ) == 0
        lid = ctypes.c_int(-1)
        assert lib.CONEX_NewLinearInequality(
            ctypes.c_void_p(prog), 1, ctypes.byref(lid)) == 0
        for i in range(n):
            lib.CONEX_UpdateLinearOperator(
                ctypes.c_void_p(prog), lid.value, ctypes.c_double(1.0),
                i, 0, 0, 0,
            )
        lib.CONEX_UpdateAffineTerm(
            ctypes.c_void_p(prog), lid.value, ctypes.c_double(1.0), 0, 0, 0
        )
        cfg = SolverConfiguration()
        lib.CONEX_SetDefaultOptions(ctypes.byref(cfg))
        cfg.max_iterations = 100
        cfg.enable_line_search = 1
        cfg.enable_rescaling = 0
        y = np.full(n, 7.0)
        solved = lib.CONEX_Solve(
            ctypes.c_void_p(prog), ctypes.byref(cfg), _dptr(y), n
        )
        assert solved == 1
        np.testing.assert_allclose(y, np.zeros(n), atol=1e-4)
    finally:
        lib.CONEX_DeleteConeProgram(ctypes.c_void_p(prog))


def test_c_abi_incremental_lmi():
    lib = _lib()
    rng = np.random.default_rng(6)
    m, order = 3, 4
    As = np.stack(
        [0.5 * (M + M.T) for M in rng.uniform(-1, 1, (m, order, order))]
    )
    C = np.eye(order)

    prog = lib.CONEX_CreateConeProgram()
    try:
        assert lib.CONEX_SetNumberOfVariables(ctypes.c_void_p(prog), m) == 0
        cid = ctypes.c_int(-1)
        assert (
            lib.CONEX_NewLinearMatrixInequality(
                ctypes.c_void_p(prog), order, 1, ctypes.byref(cid)
            )
            == 0
        )
        for v in range(m):
            for i in range(order):
                for j in range(i + 1):
                    lib.CONEX_UpdateLinearOperator(
                        ctypes.c_void_p(prog), cid.value,
                        ctypes.c_double(As[v, i, j]), v, i, j, 0,
                    )
        for i in range(order):
            lib.CONEX_UpdateAffineTerm(
                ctypes.c_void_p(prog), cid.value, ctypes.c_double(C[i, i]),
                i, i, 0,
            )
        X0 = np.eye(order) * 0.5
        b = np.einsum("vij,ij->v", As, X0)

        cfg = SolverConfiguration()
        lib.CONEX_SetDefaultOptions(ctypes.byref(cfg))
        cfg.max_iterations = 100
        y = np.zeros(m)
        solved = lib.CONEX_Maximize(
            ctypes.c_void_p(prog), _dptr(np.ascontiguousarray(b)), m,
            ctypes.byref(cfg), _dptr(y), m,
        )
        assert solved == 1
        S = C - np.einsum("vij,v->ij", As, y)
        assert np.linalg.eigvalsh(S).min() >= -1e-7
    finally:
        lib.CONEX_DeleteConeProgram(ctypes.c_void_p(prog))
