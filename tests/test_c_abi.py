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
