"""ctypes twin of the MATLAB shim (interfaces/matlab/*.m).

No MATLAB/Octave runtime is available in this environment, so the .m
files are validated by driving libconex_tpu.so through ctypes with the
EXACT call sequence, argument order, and (column-major) data layout that
ConexTpuProgram.m / conex_tpu.m emit, and comparing the result against
the Python SeDuMi front end (conex_tpu.sedumi.solve_sedumi) — the same
oracle relationship the reference's run_conex_tests.m has to sedumi.
"""

import ctypes
import os

import numpy as np

from test_c_abi import SolverConfiguration, _dptr, _lib


def _matlab_maximize_sequence(lib, A, b, c, K):
    """Replicates conex_tpu.m line by line through the ABI.

    A: (m, N) SeDuMi operator (rows = variables), c: (N,), K: dict with
    'l' and 's'.  Returns (y, duals list, solved).
    """
    m = A.shape[0]
    prog = lib.CONEX_CreateConeProgram()
    assert prog
    constraint_ids = []
    try:
        assert lib.CONEX_SetNumberOfVariables(ctypes.c_void_p(prog), m) == 0
        offset = 0
        if K.get("l", 0) > 0:
            nl = K["l"]
            # AddLinearInequality(A(:,1:K.l)', c(1:K.l)):
            # MATLAB passes A(:) of the (rows=nl, cols=m) matrix —
            # column-major flattening.
            Alin = A[:, :nl].T  # (nl, m)
            Aflat = np.asfortranarray(Alin).ravel(order="F")
            cid = lib.CONEX_AddDenseLinearConstraint(
                ctypes.c_void_p(prog), _dptr(Aflat), nl, m,
                _dptr(np.ascontiguousarray(c[:nl])), nl,
            )
            constraint_ids.append(cid)
            offset = nl
        for n in K.get("s", []):
            cols = slice(offset, offset + n * n)
            # Ablk: n x (n*m) horizontal stack, symmetrized per block —
            # flattened column-major this is exactly m consecutive
            # column-major n x n blocks, the ABI's LMI layout.
            blocks = []
            for j in range(m):
                M = A[j, cols].reshape(n, n)
                blocks.append(0.5 * (M + M.T))
            Aflat = np.concatenate(
                [np.asfortranarray(Mj).ravel(order="F") for Mj in blocks]
            )
            Cm = c[cols].reshape(n, n)
            Cm = 0.5 * (Cm + Cm.T)
            cid = lib.CONEX_AddDenseLMIConstraint(
                ctypes.c_void_p(prog), _dptr(Aflat), n, n, m,
                _dptr(np.asfortranarray(Cm).ravel(order="F")), n, n,
            )
            constraint_ids.append(cid)
            offset += n * n

        cfg = SolverConfiguration()
        lib.CONEX_SetDefaultOptions(ctypes.byref(cfg))
        # conex_tpu.m option block.
        cfg.inv_sqrt_mu_max = 1000
        cfg.infeasibility_threshold = 1e3
        cfg.max_iterations = 25
        cfg.prepare_dual_variables = 1
        cfg.divergence_upper_bound = 1
        cfg.final_centering_steps = 5

        y = np.zeros(m)
        solved = lib.CONEX_Maximize(
            ctypes.c_void_p(prog), _dptr(np.ascontiguousarray(b)), m,
            ctypes.byref(cfg), _dptr(y), m,
        )
        duals = []
        for cid in constraint_ids:
            sz = lib.CONEX_GetDualVariableSize(ctypes.c_void_p(prog), cid)
            x = np.zeros(sz)
            lib.CONEX_GetDualVariable(
                ctypes.c_void_p(prog), cid, _dptr(x), sz, 1
            )
            duals.append(x)
        return y, duals, solved
    finally:
        lib.CONEX_DeleteConeProgram(ctypes.c_void_p(prog))


def _sedumi_instance(seed=0):
    """Feasible SeDuMi instance with an l-block and one s-block."""
    rng = np.random.default_rng(seed)
    m, nl, ns = 3, 4, 5
    N = nl + ns * ns
    A = np.zeros((m, N))
    A[:, :nl] = rng.uniform(-1, 1, (m, nl))
    for j in range(m):
        M = rng.uniform(-1, 1, (ns, ns))
        A[j, nl:] = (0.5 * (M + M.T)).ravel()
    # Interior x0: positive l-part, PSD s-part.
    x0 = np.zeros(N)
    x0[:nl] = rng.uniform(0.5, 1.5, nl)
    X = rng.uniform(-1, 1, (ns, ns))
    x0[nl:] = (X @ X.T / ns + 0.1 * np.eye(ns)).ravel()
    b = A @ x0
    # Interior dual: c - A'y strictly in K for y = 0 => c in int(K).
    cvec = np.zeros(N)
    cvec[:nl] = rng.uniform(0.5, 1.5, nl)
    C = rng.uniform(-0.1, 0.1, (ns, ns))
    cvec[nl:] = (0.5 * (C + C.T) + np.eye(ns)).ravel()
    K = {"l": nl, "s": [ns]}
    return A, b, cvec, K


def test_matlab_twin_matches_python_sedumi():
    lib = _lib()
    A, b, c, K = _sedumi_instance(0)
    y, duals, solved = _matlab_maximize_sequence(lib, A, b, c, K)
    assert solved == 1

    from conex_tpu.sedumi import solve_sedumi

    x_ref, y_ref, info = solve_sedumi(A, b, c, K)
    assert info["solved"]
    np.testing.assert_allclose(y, y_ref, atol=1e-8)

    # Reassembled SeDuMi dual (conex_tpu.m postlude) matches too.
    x = np.concatenate([duals[0], np.asarray(duals[1])])
    np.testing.assert_allclose(x, x_ref, atol=1e-8)
    # And satisfies the SeDuMi primal: A x = b, x in K.
    np.testing.assert_allclose(A @ x, b, atol=1e-6)


def test_matlab_shim_files_reference_real_symbols():
    """Every calllib symbol in the .m files must exist in the header —
    guards the shim against ABI drift."""
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hdr = open(os.path.join(root, "interfaces", "conex_tpu.h")).read()
    exported = set(re.findall(r"CONEX_\w+", hdr))
    for fname in ("ConexTpuProgram.m", "conex_tpu.m"):
        src = open(os.path.join(root, "interfaces", "matlab", fname)).read()
        used = set(re.findall(r"'(CONEX_\w+)'", src))
        missing = used - exported
        assert not missing, f"{fname} references unknown symbols {missing}"
        # Struct names used via libstruct must exist too.
        for st in re.findall(r"libstruct\('(\w+)'\)", src):
            assert st in hdr, f"{fname}: struct {st} not in header"
