"""Smoke tests for the two driver-checked artifacts.

Round-3 shipped a state refactor that broke ``bench.py`` and
``dryrun_multichip`` without any test noticing (VERDICT r03, Weak #1).
These tests trace the exact call paths of both artifacts on tiny shapes on
the CPU mesh so that class of breakage fails here, in pytest, not in the
driver.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conex_tpu.config import SolverConfig
from conex_tpu.cones.psd import DenseLMICone, make_psd_state
from conex_tpu.parallel.sharded import solve_scenarios


def test_bench_call_path_smoke():
    """bench.py's exact construction + solve path (tiny shapes, f32)."""
    B, n, m = 4, 8, 4
    iters = 8
    dtype = np.float32
    rng = np.random.default_rng(0)
    A = rng.uniform(-1, 1, (B, 1, m, n, n)).astype(dtype)
    A = 0.5 * (A + np.swapaxes(A, 3, 4))
    C = np.broadcast_to(np.eye(n, dtype=dtype), (B, 1, n, n)).copy()
    X0 = rng.uniform(-1, 1, (B, 1, n, n)).astype(dtype)
    X0 = np.einsum("sbij,sbkj->sbik", X0, X0) + 0.1 * np.eye(n, dtype=dtype)
    b = np.einsum("sbvij,sbij->sv", A, X0).astype(dtype)

    blk = DenseLMICone(A=jnp.asarray(A), C=jnp.asarray(C))
    init_ws = (
        make_psd_state(jnp.broadcast_to(jnp.eye(n, dtype=dtype), (B, 1, n, n))),
    )
    scalars = dict(
        k=jnp.zeros((B,), dtype),
        b_scaling=jnp.ones((B,), dtype),
        c_scaling=jnp.ones((B,), dtype),
    )
    config = SolverConfig(
        max_iterations=iters,
        final_centering_steps=0,
        inv_sqrt_mu_max=1e15,
        fixed_iterations=True,
        inv_sqrt_mu_cap_scaled=100.0,
    )
    res = solve_scenarios((blk,), (), jnp.asarray(b), init_ws, scalars, config)
    jax.block_until_ready(res)
    n_iters = np.asarray(res.num_iterations)
    assert (n_iters == iters).all(), n_iters
    assert int(np.asarray(res.fail).sum()) == 0


def test_graft_entry_and_dryrun_multichip():
    """__graft_entry__.entry() jits and dryrun_multichip(8) runs on the
    8-device virtual CPU mesh — exactly what the driver checks."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
    g.dryrun_multichip(8)
