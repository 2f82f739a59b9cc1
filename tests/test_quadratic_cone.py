"""Q-weighted quadratic cone + epigraph tests.

Mirrors /root/reference/conex/test/test_socp.cc (the four-formulation
agreement) and the epigraph QP path.
"""

import numpy as np
import pytest

from conex_tpu import Program, SolverConfig


def test_quadratic_cone_matches_soc():
    """reference test_socp.cc: SOC with explicit sqrt == Q-weighted cone
    (with and without Q) to ~1e-5."""
    rng = np.random.default_rng(0)
    n = 3
    cfg = SolverConfig(inv_sqrt_mu_max=10000.0, max_iterations=50)
    for trial in range(3):
        Wsqrt = rng.uniform(-1, 1, (n, n))
        b = rng.uniform(-1, 1, n)
        As = np.zeros((n + 1, n))
        As[1:, :] = Wsqrt
        Cs = np.zeros(n + 1)
        Cs[0] = 1.0

        p1 = Program(n)
        p1.add_soc_constraint(As, Cs)
        y1 = p1.solve(b, cfg).y

        # Same cone as Q-weighted with Q = I and the same A.
        p2 = Program(n)
        p2.add_quadratic_cone_constraint(As, Cs)
        y2 = p2.solve(b, cfg).y

        # Q = Wsqrt'Wsqrt with A embedding identity.
        Q = Wsqrt.T @ Wsqrt
        Aq = np.zeros((n + 1, n))
        Aq[1:, :] = np.eye(n)
        p3 = Program(n)
        p3.add_quadratic_cone_constraint(Aq, Cs, Q=Q)
        y3 = p3.solve(b, cfg).y

        np.testing.assert_allclose(y1, y2, atol=1e-5)
        np.testing.assert_allclose(y1, y3, atol=8e-5)


def test_quadratic_cone_iterations_match_soc():
    """With Q = None the QuadraticCone and SOCCone are the same cone; the
    trajectories must agree step for step."""
    rng = np.random.default_rng(1)
    n, m = 4, 3
    A = rng.uniform(-1, 1, (n + 1, m))
    c = rng.uniform(-1, 1, n + 1)
    c[0] = np.linalg.norm(c[1:]) + 1.0
    x0 = rng.uniform(-1, 1, n + 1)
    x0[0] = np.linalg.norm(x0[1:]) + 0.5
    b = A.T @ x0
    cfg = SolverConfig(max_iterations=40)

    p1 = Program(m)
    p1.add_soc_constraint(A, c)
    r1 = p1.solve(b, cfg)
    p2 = Program(m)
    p2.add_quadratic_cone_constraint(A, c)
    r2 = p2.solve(b, cfg)
    assert r1.num_iterations == r2.num_iterations
    np.testing.assert_allclose(r1.y, r2.y, atol=1e-6)
    np.testing.assert_allclose(
        r1.stats_inv_sqrt_mu, r2.stats_inv_sqrt_mu, rtol=1e-5
    )


def test_epigraph_qp_matches_quadratic_cost():
    """QP solved via the epigraph formulation matches the direct
    quadratic-cost path (reference AddQuadraticCostEpigraph)."""
    rng = np.random.default_rng(2)
    nv = 3
    M = rng.uniform(-1, 1, (nv, nv))
    Qi = M @ M.T + nv * np.eye(nv)
    bvec = rng.uniform(-1, 1, nv)

    qp_cfg = SolverConfig(
        enable_line_search=True,
        enable_rescaling=False,
        inv_sqrt_mu_max=2e5,
        max_iterations=40,
        final_centering_tolerance=1.05,
        final_centering_steps=0,
        kkt_error_tolerance=1e45,
    )
    A_box = np.vstack([np.eye(nv), -np.eye(nv)])
    c_box = np.full(2 * nv, 10.0)

    direct = Program(nv)
    direct.add_quadratic_cost(Qi)
    direct.add_linear_constraint(A_box, c_box)
    y_direct = direct.solve(bvec, qp_cfg).y

    # Epigraph: variables (y, t); maximize b'y - t with t >= 1/2 y'Q y.
    epi = Program(nv + 1)
    epi.add_quadratic_cost_epigraph(Qi, list(range(nv)), nv)
    A_box2 = np.hstack([A_box, np.zeros((2 * nv, 1))])
    epi.add_linear_constraint(A_box2, c_box)
    b2 = np.concatenate([bvec, [-1.0]])
    res = epi.solve(b2, SolverConfig(max_iterations=60, inv_sqrt_mu_max=1e5))
    assert res.solved
    np.testing.assert_allclose(res.y[:nv], y_direct, atol=1e-4)
    assert res.y[nv] == pytest.approx(
        0.5 * y_direct @ Qi @ y_direct, abs=1e-4
    )
