"""SOCP integration tests.

Mirrors /root/reference/conex/test/test_socp.cc: the same random SOCP solved
through different formulations must agree, and solutions must satisfy the
KKT conditions.  (The LMI-embedding comparison joins once the PSD cone
lands.)
"""

import numpy as np
import pytest

from conex_tpu import Program, SolverConfig
from conex_tpu.algebra import spin

import jax.numpy as jnp


def test_spin_algebra_identities():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 5)))
    # Make x cone-interior so sqrt is defined.
    x = x.at[:, 0].set(jnp.linalg.norm(x[:, 1:], axis=-1) + 1.0)
    s = spin.sqrt(x)
    # sqrt(x) o sqrt(x) = x: Jordan product (a o b) = (a0 b0 + a1.b1, a0 b1 + b0 a1)
    a0, a1 = s[:, 0], s[:, 1:]
    sq = jnp.concatenate(
        [(a0**2 + jnp.sum(a1 * a1, axis=-1))[:, None], 2 * a0[:, None] * a1],
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(sq), np.asarray(x), atol=1e-12)
    # Q(x) e = x^2
    e = jnp.zeros_like(x).at[:, 0].set(1.0)
    np.testing.assert_allclose(
        np.asarray(spin.quadratic_representation(s, e)), np.asarray(x), atol=1e-12
    )
    # det(Q(x)y) = det(x)^2 det(y)
    y = jnp.asarray(rng.normal(size=(4, 5)))
    np.testing.assert_allclose(
        np.asarray(spin.det(spin.quadratic_representation(x, y))),
        np.asarray(spin.det(x) ** 2 * spin.det(y)),
        rtol=1e-10,
    )


def soc_feasible_instance(n, m, rng):
    """Random SOCP: slack (c - A y) in Q^{n+1}, objective b = A' x0 for
    interior x0 (the reference's feasibility-by-construction pattern)."""
    A = rng.uniform(-1, 1, (n + 1, m))
    c = rng.uniform(-1, 1, n + 1)
    c[0] = np.linalg.norm(c[1:]) + 1.0  # strictly feasible at y = 0
    x0 = rng.uniform(-1, 1, n + 1)
    x0[0] = np.linalg.norm(x0[1:]) + 0.5
    b = A.T @ x0
    return A, c, b


def check_socp_kkt(A, c, b, y, x, tol=1e-5):
    slack = c - A @ y
    assert slack[0] >= np.linalg.norm(slack[1:]) - tol, "slack not in cone"
    assert x[0] >= np.linalg.norm(x[1:]) - tol, "dual not in cone"
    assert np.linalg.norm(A.T @ x - b) <= tol * max(1, np.linalg.norm(b))
    # complementarity: <slack, x> small (trace inner product = 2 x.y)
    assert 2 * slack @ x <= 1e-3


def test_socp_random_kkt():
    config = SolverConfig(inv_sqrt_mu_max=10000.0, prepare_dual_variables=True, max_iterations=50)
    rng = np.random.default_rng(1)
    for trial in range(5):
        A, c, b = soc_feasible_instance(4, 3, rng)
        prog = Program(3)
        prog.add_soc_constraint(A, c)
        res = prog.solve(b, config)
        assert res.solved, f"trial {trial} unsolved after {res.num_iterations}"
        x = prog.get_dual_variable(0)
        check_socp_kkt(A, c, b, res.y, x)


def test_socp_vs_reference_formulation():
    """reference: Constraints.SOCP (test_socp.cc:15-95) — the
    |W^{1/2} y| <= 1 ball constraint; optimum has closed form
    y* = Q^{-1} b / sqrt(b' Q^{-1} b) with Q = W^{1/2}'W^{1/2}."""
    rng = np.random.default_rng(2)
    n = 3
    config = SolverConfig(inv_sqrt_mu_max=10000.0, max_iterations=50)
    for i in range(-2, 2):
        Wsqrt = rng.uniform(-1, 1, (n, n))
        b = np.full(n, float(i)) + rng.uniform(-1, 1, n) * 0.02
        As = np.zeros((n + 1, n))
        As[1:, :] = Wsqrt
        Cs = np.zeros(n + 1)
        Cs[0] = 1.0
        prog = Program(n)
        prog.add_soc_constraint(As, Cs)
        res = prog.solve(b, config)
        assert res.solved
        Q = Wsqrt.T @ Wsqrt
        yref = np.linalg.solve(Q, b)
        yref = yref / np.sqrt(b @ yref)
        np.testing.assert_allclose(res.y, yref, atol=2e-4)


def test_socp_batched_matches_separate():
    """A batched SOC block must agree with separate per-cone blocks."""
    rng = np.random.default_rng(3)
    m, n, B = 4, 3, 3
    As = rng.uniform(-1, 1, (B, n + 1, m))
    cs = rng.uniform(-1, 1, (B, n + 1))
    cs[:, 0] = np.linalg.norm(cs[:, 1:], axis=-1) + 1.0
    x0 = rng.uniform(-1, 1, (B, n + 1))
    x0[:, 0] = np.linalg.norm(x0[:, 1:], axis=-1) + 0.5
    b = np.einsum("bnv,bn->v", As, x0)

    batched = Program(m)
    batched.add_soc_constraint(As, cs)
    res_b = batched.solve(b)

    separate = Program(m)
    for k in range(B):
        separate.add_soc_constraint(As[k], cs[k])
    res_s = separate.solve(b)

    assert res_b.solved and res_s.solved
    np.testing.assert_allclose(res_b.y, res_s.y, atol=1e-9)
    assert res_b.num_iterations == res_s.num_iterations


def test_socp_mixed_with_lp():
    """Mixed LP + SOC cones in one program."""
    rng = np.random.default_rng(4)
    m = 3
    A_soc, c_soc, b1 = soc_feasible_instance(3, m, rng)
    A_lp = rng.uniform(-1, 1, (6, m))
    c_lp = np.abs(rng.uniform(-1, 1, 6)) + 0.1
    x_lp = np.abs(rng.uniform(0, 1, 6))
    b = b1 + A_lp.T @ x_lp
    prog = Program(m)
    prog.add_soc_constraint(A_soc, c_soc)
    prog.add_linear_constraint(A_lp, c_lp)
    res = prog.solve(b, SolverConfig(inv_sqrt_mu_max=1000.0))
    assert res.solved
    slack_soc = c_soc - A_soc @ res.y
    assert slack_soc[0] >= np.linalg.norm(slack_soc[1:]) - 1e-8
    assert (c_lp - A_lp @ res.y).min() >= -1e-8


def test_socp_mu_floor_latch_solves_at_aggressive_target():
    """Numerical-floor latch: an aggressive mu target beyond the f64 floor
    must still terminate solved at the achievable accuracy.

    Instances from the BENCH_ACCURACY SOCP family (S=1000 generation,
    seed 2): with inv_sqrt_mu_max=1e4 and rescaling, the scaled mu target
    is ~6e-12 — at that conditioning the divergence-bound mu update's
    slack-eigenvalue arithmetic is pure roundoff.  The reference
    (dump_trajectory, divergence mode) happens to overshoot the k_max clamp
    at iteration 19 on instance 2 and exits "solved" via the
    centering-budget break (cone_program.cc:331-336) after 25 iterations
    with d_inf = 0.059; without the latch our mu update undershoots k_max,
    then collapses (k: 3.8e5 -> 3.2e3 on instance 2), and 162/1000
    instances burn all 60 iterations unsolved.  With the latch the run
    freezes k at its high-water mark, enters final centering, and exits
    solved at unscaled mu within ~2x of the target.  (No latch-off
    counter-assertion: at the f64 floor the unlatched outcome is a
    coin-flip on compiler fusion order, so only the robust-success
    property is stable enough to test.)
    """
    rng = np.random.default_rng(2)
    S, n, m = 1000, 20, 10
    A = rng.standard_normal((S, 1, n + 1, m))
    x = rng.standard_normal((S, 1, n + 1))
    x[..., 0] = np.linalg.norm(x[..., 1:], axis=-1) + 1.0
    b = 2.0 * np.einsum("scnv,scn->sv", A, x)
    c = rng.standard_normal((S, 1, n + 1))
    c[..., 0] = np.linalg.norm(c[..., 1:], axis=-1) + 1.0
    cfg = SolverConfig(max_iterations=60, inv_sqrt_mu_max=1e4)

    # Instances that failed (hit max_iterations unsolved) before the latch.
    for i in (2, 3, 6):
        prog = Program(m, dtype=jnp.float64)
        prog.add_soc_constraint(A[i, 0], c[i, 0])
        res = prog.solve(b[i], cfg)
        assert res.solved, f"instance {i} unsolved"
        assert int(res.num_iterations) <= 40, f"instance {i} slow"
        # The final k is near the (scaled) target ~4.04e5.
        ks = np.asarray(res.stats_inv_sqrt_mu)
        k_final = ks[int(res.num_iterations) - 1]
        assert k_final >= 1e5, f"instance {i} k_final={k_final}"
