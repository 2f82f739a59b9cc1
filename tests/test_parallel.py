"""Multi-device tests on the 8-device virtual CPU mesh.

Cone-sharded (TP) and scenario-batched (DP) solves must agree numerically
with the single-device solve — the collectives (psum/pmax/pmin) are exact
re-aggregations of the single-device sums.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from conex_tpu import SolverConfig
from conex_tpu.cones.psd import DenseLMICone, make_psd_state
from conex_tpu.cones.soc import SOCCone
from conex_tpu.parallel.sharded import (
    solve_cone_sharded,
    solve_scenarios,
    solve_scenarios_cone_sharded,
)
from conex_tpu.solver.loop import _solve_impl


def _scalars(dtype, shape=()):
    return dict(
        k=jnp.zeros(shape, dtype),
        b_scaling=jnp.ones(shape, dtype),
        c_scaling=jnp.ones(shape, dtype),
    )


def _sdp_batch(rng, B, n, m, dtype=np.float64):
    A = rng.uniform(-1, 1, (B, m, n, n)).astype(dtype)
    A = 0.5 * (A + np.swapaxes(A, 2, 3))
    C = np.broadcast_to(np.eye(n, dtype=dtype), (B, n, n)).copy()
    X0 = rng.uniform(-1, 1, (B, n, n)).astype(dtype)
    X0 = np.einsum("bij,bkj->bik", X0, X0) + 0.1 * np.eye(n, dtype=dtype)
    b = np.einsum("bvij,bij->v", A, X0).astype(dtype)
    return A, C, b


@pytest.fixture
def mesh8():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs


def test_cone_sharded_matches_single_device(mesh8):
    rng = np.random.default_rng(0)
    B, n, m = 8, 6, 4
    A, C, b = _sdp_batch(rng, B, n, m)
    blk = DenseLMICone(A=jnp.asarray(A), C=jnp.asarray(C))
    init_ws = (blk.identity_state(jnp.float64),)
    config = SolverConfig(max_iterations=30)

    res_single = _solve_impl((blk,), (), jnp.asarray(b), init_ws, _scalars(jnp.float64), config)

    mesh = Mesh(np.asarray(mesh8), ("tp",))
    res_shard = solve_cone_sharded(
        (blk,), (), jnp.asarray(b), init_ws, _scalars(jnp.float64), config, mesh
    )
    assert bool(res_shard.solved) == bool(res_single.solved)
    np.testing.assert_allclose(
        np.asarray(res_shard.y), np.asarray(res_single.y), atol=1e-9
    )
    # Final iterates accumulate psum-vs-serial reduction-order differences
    # through the exponential map; looser than y.
    np.testing.assert_allclose(
        np.asarray(res_shard.ws[0].w), np.asarray(res_single.ws[0].w),
        atol=1e-6,
    )


def test_scenarios_match_loop(mesh8):
    rng = np.random.default_rng(1)
    S, B, n, m = 4, 2, 5, 3
    As, Cs, bs = [], [], []
    for _ in range(S):
        A, C, b = _sdp_batch(rng, B, n, m)
        As.append(A); Cs.append(C); bs.append(b)
    A = np.stack(As); C = np.stack(Cs); b = np.stack(bs)
    config = SolverConfig(max_iterations=30)

    blk = DenseLMICone(A=jnp.asarray(A), C=jnp.asarray(C))
    init_ws = (make_psd_state(jnp.broadcast_to(jnp.eye(n), (S, B, n, n))),)
    mesh = Mesh(np.asarray(mesh8[:4]), ("dp",))
    res = solve_scenarios(
        (blk,), (), jnp.asarray(b), init_ws, _scalars(jnp.float64, (S,)),
        config, mesh=mesh,
    )

    for s in range(S):
        blk_s = DenseLMICone(A=jnp.asarray(A[s]), C=jnp.asarray(C[s]))
        res_s = _solve_impl(
            (blk_s,), (), jnp.asarray(b[s]),
            (blk_s.identity_state(jnp.float64),), _scalars(jnp.float64), config,
        )
        np.testing.assert_allclose(
            np.asarray(res.y)[s], np.asarray(res_s.y), atol=1e-9
        )
        assert bool(np.asarray(res.solved)[s]) == bool(res_s.solved)


def test_scenarios_cone_sharded_2d(mesh8):
    rng = np.random.default_rng(2)
    S, B, n, m = 2, 4, 5, 3
    As, Cs, bs = [], [], []
    for _ in range(S):
        A, C, b = _sdp_batch(rng, B, n, m)
        As.append(A); Cs.append(C); bs.append(b)
    A = np.stack(As); C = np.stack(Cs); b = np.stack(bs)
    config = SolverConfig(max_iterations=25)

    blk = DenseLMICone(A=jnp.asarray(A), C=jnp.asarray(C))
    init_ws = (make_psd_state(jnp.broadcast_to(jnp.eye(n), (S, B, n, n))),)
    mesh = Mesh(np.asarray(mesh8).reshape(2, 4), ("dp", "tp"))
    res = solve_scenarios_cone_sharded(
        (blk,), (), jnp.asarray(b), init_ws, _scalars(jnp.float64, (S,)),
        config, mesh, total_rank=B * n,
    )
    for s in range(S):
        blk_s = DenseLMICone(A=jnp.asarray(A[s]), C=jnp.asarray(C[s]))
        res_s = _solve_impl(
            (blk_s,), (), jnp.asarray(b[s]),
            (blk_s.identity_state(jnp.float64),), _scalars(jnp.float64), config,
        )
        np.testing.assert_allclose(
            np.asarray(res.y)[s], np.asarray(res_s.y), atol=1e-9
        )
