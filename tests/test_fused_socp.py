"""Fused single-kernel SOCP path vs the general vmapped solve loop.

The fused kernel (conex_tpu/parallel/fused_socp.py) re-implements the whole
solve loop in one Pallas kernel; these tests pin its trajectories, solutions,
iteration counts, and status flags to the general path
(parallel/sharded.solve_scenarios) on identical instances.  On CPU the kernel
runs in Pallas interpreter mode (same program, interpreted not compiled).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conex_tpu.config import WARMSTART, SolverConfig
from conex_tpu.cones.soc import SOCCone
from conex_tpu.parallel.fused_socp import solve_socp_fused
from conex_tpu.parallel.sharded import solve_scenarios


def random_socp(rng, S, nc, n, m, feasible=True, dtype=np.float64):
    """Batch of S programs, nc Lorentz cones of dim n+1, m variables."""
    A = rng.standard_normal((S, nc, n + 1, m)).astype(dtype)
    if feasible:
        # interior dual point per cone: x0 > |x1|
        x = rng.standard_normal((S, nc, n + 1)).astype(dtype)
        x[..., 0] = np.linalg.norm(x[..., 1:], axis=-1) + rng.uniform(
            0.5, 1.5, (S, nc)
        )
        # b = A(x) (reference feasibility-by-construction recipe,
        # test_socp.cc)
        b = 2.0 * np.einsum("scnv,scn->sv", A, x).astype(dtype)
    else:
        b = rng.standard_normal((S, m)).astype(dtype)
    c = rng.standard_normal((S, nc, n + 1)).astype(dtype)
    c[..., 0] = np.linalg.norm(c[..., 1:], axis=-1) + rng.uniform(
        0.5, 2.0, (S, nc)
    )
    return A, c, b


def general_path(A, c, b, config, init_w=None, init_k=None,
                 init_b_scaling=None, init_c_scaling=None):
    S, nc, n1, m = A.shape
    blk = SOCCone(A=jnp.asarray(A), c=jnp.asarray(c))
    if init_w is None:
        init_w = jnp.zeros((S, nc, n1), A.dtype).at[:, :, 0].set(1.0)
    init_ws = (jnp.asarray(init_w),)
    scalars = dict(
        k=jnp.zeros((S,), A.dtype) if init_k is None else jnp.asarray(init_k),
        b_scaling=(jnp.ones((S,), A.dtype) if init_b_scaling is None
                   else jnp.asarray(init_b_scaling)),
        c_scaling=(jnp.ones((S,), A.dtype) if init_c_scaling is None
                   else jnp.asarray(init_c_scaling)),
    )
    return solve_scenarios((blk,), (), jnp.asarray(b), init_ws, scalars, config)


CFG = SolverConfig(max_iterations=30)


@pytest.mark.parametrize("nc", [1, 3])
def test_fused_matches_general_feasible(nc):
    rng = np.random.default_rng(5 + nc)
    A, c, b = random_socp(rng, S=9, nc=nc, n=4, m=3)
    ref = general_path(A, c, b, CFG)
    out = solve_socp_fused(A, c, b, CFG)

    np.testing.assert_array_equal(
        np.asarray(out.num_iterations), np.asarray(ref.num_iterations)
    )
    np.testing.assert_allclose(
        np.asarray(out.stats_k), np.asarray(ref.stats_k), rtol=1e-5, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(out.stats_dinf), np.asarray(ref.stats_dinf),
        rtol=1e-3, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out.k), np.asarray(ref.k), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.y), np.asarray(ref.y), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out.w), np.asarray(ref.ws[0]), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_array_equal(
        np.asarray(out.solved), np.asarray(ref.solved)
    )
    assert np.all(np.asarray(out.solved))


def test_fused_solution_quality():
    """Primal feasibility + duality gap on the fused path's own output."""
    rng = np.random.default_rng(11)
    A, c, b = random_socp(rng, S=6, nc=2, n=6, m=4)
    out = solve_socp_fused(A, c, b, CFG.replace(prepare_dual_variables=True))
    assert np.all(np.asarray(out.solved))
    y = np.asarray(out.y)
    # primal feasibility: slack in the cone
    slack = np.asarray(c) - np.einsum("scnv,sv->scn", np.asarray(A), y)
    margins = slack[..., 0] - np.linalg.norm(slack[..., 1:], axis=-1)
    assert margins.min() > -1e-6
    # dual: x = 2*w / (k * b_scaling) satisfies A'x ~ b (SOC dual_scale=2,
    # cones/soc.py; unscaling per reference cone_program.h:120-134)
    x = (
        2.0
        * np.asarray(out.w)
        / (np.asarray(out.k) * np.asarray(out.b_scaling))[:, None, None]
    )
    r = np.einsum("scnv,scn->sv", np.asarray(A), x) - np.asarray(b)
    assert np.abs(r).max() < 1e-4 * max(1.0, np.abs(b).max())


def test_fused_dual_recovery_matches_general():
    rng = np.random.default_rng(7)
    A, c, b = random_socp(rng, S=5, nc=1, n=5, m=3)
    cfg = CFG.replace(prepare_dual_variables=True)
    ref = general_path(A, c, b, cfg)
    out = solve_socp_fused(A, c, b, cfg)
    np.testing.assert_allclose(
        np.asarray(out.w), np.asarray(ref.ws[0]), rtol=1e-5, atol=1e-8
    )


def test_fused_infeasible_detection_matches_general():
    rng = np.random.default_rng(3)
    # random (generically primal-infeasible or unbounded) objectives
    A, c, b = random_socp(rng, S=8, nc=1, n=4, m=3, feasible=False)
    cfg = CFG.replace(max_iterations=60)
    ref = general_path(A, c, b, cfg)
    out = solve_socp_fused(A, c, b, cfg)
    np.testing.assert_array_equal(
        np.asarray(out.solved), np.asarray(ref.solved)
    )
    np.testing.assert_array_equal(
        np.asarray(out.primal_infeasible), np.asarray(ref.primal_infeasible)
    )
    np.testing.assert_array_equal(
        np.asarray(out.dual_infeasible), np.asarray(ref.dual_infeasible)
    )
    np.testing.assert_array_equal(
        np.asarray(out.num_iterations), np.asarray(ref.num_iterations)
    )


def test_fused_fixed_iteration_mode_matches_general():
    """The benchmark configuration: no early exit, no final centering."""
    rng = np.random.default_rng(19)
    A, c, b = random_socp(rng, S=4, nc=1, n=20, m=10)
    cfg = SolverConfig(
        max_iterations=14,
        final_centering_steps=0,
        inv_sqrt_mu_max=1e15,
        kkt_error_tolerance=1e45,
    )
    ref = general_path(A, c, b, cfg)
    out = solve_socp_fused(A, c, b, cfg)
    np.testing.assert_array_equal(
        np.asarray(out.num_iterations), np.asarray(ref.num_iterations)
    )
    np.testing.assert_allclose(
        np.asarray(out.stats_k), np.asarray(ref.stats_k), rtol=1e-5
    )


def test_fused_refinement_and_stall_options():
    rng = np.random.default_rng(23)
    A, c, b = random_socp(rng, S=3, nc=2, n=4, m=3)
    cfg = CFG.replace(
        iterative_refinement_iterations=1,
        mu_stall_iterations=4,
    )
    ref = general_path(A, c, b, cfg)
    out = solve_socp_fused(A, c, b, cfg)
    np.testing.assert_allclose(
        np.asarray(out.stats_k), np.asarray(ref.stats_k), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out.mu_stalled), np.asarray(ref.mu_stalled)
    )


def test_fused_padding_and_3d_input():
    """S not a multiple of the block; (S, n+1, m) single-cone shorthand."""
    rng = np.random.default_rng(31)
    A, c, b = random_socp(rng, S=5, nc=1, n=3, m=2)
    out4 = solve_socp_fused(A, c, b, CFG, block_size=128)
    out3 = solve_socp_fused(A[:, 0], c[:, 0], b, CFG, block_size=128)
    np.testing.assert_allclose(
        np.asarray(out4.y), np.asarray(out3.y), rtol=1e-12
    )
    ref = general_path(A, c, b, CFG)
    np.testing.assert_allclose(
        np.asarray(out4.y), np.asarray(ref.y), rtol=1e-7, atol=1e-9
    )


def test_fused_warmstart_matches_general():
    """Warmstart continuation: stop a coldstart solve mid-trajectory, resume
    both paths from the identical state (w, k, scalings), trajectories must
    stay pinned (reference warmstart contract, test_warmstart.cc:14-45)."""
    rng = np.random.default_rng(41)
    A, c, b = random_socp(rng, S=7, nc=2, n=4, m=3)
    cfg1 = SolverConfig(
        max_iterations=6, final_centering_steps=0, fixed_iterations=True
    )
    part = solve_socp_fused(A, c, b, cfg1)
    part_ref = general_path(A, c, b, cfg1)
    np.testing.assert_allclose(
        np.asarray(part.stats_k), np.asarray(part_ref.stats_k), rtol=1e-6
    )

    cfg2 = SolverConfig(max_iterations=30, initialization_mode=WARMSTART)
    out = solve_socp_fused(
        A, c, b, cfg2,
        init_w=part.w, init_k=part.k,
        init_b_scaling=part.b_scaling, init_c_scaling=part.c_scaling,
    )
    ref = general_path(
        A, c, b, cfg2,
        init_w=part.w, init_k=part.k,
        init_b_scaling=part.b_scaling, init_c_scaling=part.c_scaling,
    )
    np.testing.assert_array_equal(
        np.asarray(out.num_iterations), np.asarray(ref.num_iterations)
    )
    np.testing.assert_allclose(
        np.asarray(out.stats_k), np.asarray(ref.stats_k), rtol=1e-5,
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(out.y), np.asarray(ref.y), rtol=1e-5, atol=1e-8
    )
    np.testing.assert_array_equal(
        np.asarray(out.solved), np.asarray(ref.solved)
    )
    assert np.all(np.asarray(out.solved))
    assert not np.any(np.asarray(out.warmstart_aborted))


def test_fused_warmstart_abort_matches_general():
    """A poisoned warmstart state must abort to identity on both paths and
    still converge (cone_program.cc:428-436)."""
    rng = np.random.default_rng(43)
    A, c, b = random_socp(rng, S=5, nc=1, n=4, m=3)
    S, nc, n1, _ = A.shape
    # wildly scaled iterate: huge first Newton step => abort
    w_bad = np.zeros((S, nc, n1), A.dtype)
    w_bad[..., 0] = 1e6
    cfg = SolverConfig(
        max_iterations=40,
        initialization_mode=WARMSTART,
        warmstart_abort_threshold=2.0,
    )
    k0 = np.full((S,), 1.0, A.dtype)
    out = solve_socp_fused(A, c, b, cfg, init_w=w_bad, init_k=k0)
    ref = general_path(A, c, b, cfg, init_w=w_bad, init_k=k0)
    np.testing.assert_array_equal(
        np.asarray(out.num_iterations), np.asarray(ref.num_iterations)
    )
    np.testing.assert_allclose(
        np.asarray(out.stats_k), np.asarray(ref.stats_k), rtol=1e-5,
        atol=1e-12,
    )
    np.testing.assert_array_equal(
        np.asarray(out.solved), np.asarray(ref.solved)
    )
    assert np.all(np.asarray(out.solved))


def test_fused_config_validation():
    rng = np.random.default_rng(1)
    A, c, b = random_socp(rng, S=2, nc=1, n=3, m=2)
    with pytest.raises(ValueError):
        solve_socp_fused(A, c, b, CFG.replace(enable_line_search=True))
    with pytest.raises(ValueError):
        solve_socp_fused(A, c, b, CFG.replace(kkt_solver=1))
