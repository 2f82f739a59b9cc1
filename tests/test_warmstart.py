"""Warmstart tests.

Mirrors /root/reference/conex/test/test_warmstart.cc: a 1-iteration-at-a-time
warmstarted solve must match a continuous solve (the final cone iterates +
scalings pytree is the checkpoint — explicit state passing replaces the
reference's caller-owned arena, cone_program.h:106-109).
"""

import numpy as np
import pytest

from conex_tpu import COLDSTART, WARMSTART, Program, SolverConfig


def random_lmi_program(rng, n=8, m=5):
    A = np.stack([0.5 * (M + M.T) for M in rng.uniform(-1, 1, (m, n, n))])
    C = np.eye(n)
    prog = Program(m)
    prog.add_lmi_constraint(A, C)
    return prog


def test_warmstart_agrees_with_full_solve():
    """reference: Warmstart.AgreesWithFullSolveIfNoDataIsChanged
    (test_warmstart.cc:14-45)."""
    rng = np.random.default_rng(0)
    prog = random_lmi_program(rng)
    b = prog.get_feasible_objective()

    num_iters = 10
    base = SolverConfig(
        inv_sqrt_mu_max=1e7, final_centering_steps=0, max_iterations=num_iters
    )
    res_full = prog.solve(b, base)
    y_full = res_full.y

    prog2 = random_lmi_program(np.random.default_rng(0))
    y_warm = None
    for i in range(num_iters):
        cfg = base.replace(
            max_iterations=1,
            initialization_mode=COLDSTART if i == 0 else WARMSTART,
        )
        y_warm = prog2.solve(b, cfg).y

    np.testing.assert_allclose(y_warm, y_full, atol=1e-12)


def test_warmstart_resume_after_convergence():
    """reference: Warmstart.TestWorkspaceInitialization
    (test_warmstart.cc:47-79): resuming a converged program reproduces the
    solution in a couple of iterations."""
    rng = np.random.default_rng(1)
    prog = random_lmi_program(rng)
    n = 8
    Alin = rng.uniform(-1, 1, (n, 5))
    Clin = np.ones(n)
    prog.add_linear_constraint(Alin, Clin)
    b = prog.get_feasible_objective()
    cfg = SolverConfig(final_centering_steps=3, final_centering_tolerance=0.01)
    res = prog.solve(b, cfg)
    assert res.solved
    res_warm = prog.solve(
        b, cfg.replace(initialization_mode=WARMSTART, max_iterations=2)
    )
    np.testing.assert_allclose(res_warm.y, res.y, atol=1e-9)


def test_warmstart_abort_on_bad_state():
    """A warmstart from a state that produces a huge first step falls back
    to the identity (reference cone_program.cc:428-436)."""
    rng = np.random.default_rng(2)
    A = rng.uniform(-1, 1, (8, 4))
    c = np.abs(rng.uniform(-1, 1, 8)) + 0.5
    b = A.T @ np.abs(rng.uniform(-1, 1, 8))
    prog = Program(4)
    prog.add_linear_constraint(A, c)
    res_cold = prog.solve(b, SolverConfig(max_iterations=50))
    assert res_cold.solved
    # Poison the warmstart state with a wildly scaled iterate.
    prog._ws = (prog._ws[0] * 1e8,)
    res_warm = prog.solve(
        b,
        SolverConfig(
            max_iterations=50,
            initialization_mode=WARMSTART,
            warmstart_abort_threshold=2.0,
        ),
    )
    assert res_warm.solved
    np.testing.assert_allclose(res_warm.y, res_cold.y, atol=1e-5)
