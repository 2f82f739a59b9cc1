"""Benchmark: batched dense-SDP Newton iterations/s on TPU vs single-core conex.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: B independent dense SDPs (n x n LMI, m variables), solved fully
vectorized by the jitted geodesic-IPM loop, exactly 30 Newton iterations
each (SolverConfig(fixed_iterations=True): all early-termination paths
disabled, every scenario runs the full iteration count).  The baseline is
the reference conex solver measured on this machine, single core, same
workload and iteration count (fixed 30; baseline/BASELINE_MEASURED.json,
rebuilt by baseline/build_and_measure.sh).

Validity: the run aborts (exit 1, no metric) unless EVERY scenario
completes exactly 30 iterations with zero factorization failures.  The f32
Schur complement loses positive-definiteness once the scaled duality
measure mu falls below ~2e-6, so the solve caps the scaled k = 1/sqrt(mu)
at 100 (scaled mu >= 1e-4, SolverConfig.inv_sqrt_mu_cap_scaled); past the
cap each iteration is a full-work centering step at the capped mu, the
same per-iteration FLOPs as a mu-decreasing step.  History of this number:
r01 (19,326 it/s) ran without fixed-iteration mode and exited early when
scenarios' factorizations failed (~16 iters); r02 (12,264 it/s) spun to
~25 iterations but every scenario's Cholesky had already failed by ~16 —
both invalid; r03 crashed at trace time (PSDState refactor).  r04 is the
first VALID measurement (all B scenarios complete 30 factorable
iterations): 24,284 it/s at the r03 design, then 34,147 it/s after the
operator-prep hoist and bf16 operand copies (PRECISION.md: XLA's "f32"
matmuls were bf16-truncated all along, so the copies cost no accuracy).
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # optional alternate workloads: `python bench.py socp` runs the fused
    # batched-SOCP benchmark (benchmarks/bench_socp.py, writes
    # BENCH_SOCP.json); `python bench.py accuracy` runs the f64-on-TPU
    # accuracy suite (benchmarks/bench_accuracy.py, writes
    # BENCH_ACCURACY.json).  Default (no argument) is the headline
    # batched dense-SDP workload below.
    if len(sys.argv) > 1 and sys.argv[1] in ("socp", "accuracy", "n300"):
        import importlib

        mod = importlib.import_module(f"benchmarks.bench_{sys.argv[1]}")
        sys.argv = sys.argv[:1] + sys.argv[2:]
        return mod.main()
    import jax

    # Persistent compilation cache: the remote TPU compile service can be
    # wedged by unrelated Mosaic crashes for up to hours; with the disk
    # cache populated (any earlier bench run, same program), this run
    # deserializes the executable and never needs the compiler.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from conex_tpu.config import SolverConfig
    from conex_tpu.cones.psd import DenseLMICone, make_psd_state
    from conex_tpu.parallel.sharded import solve_scenarios

    B, n, m = 256, 100, 50
    iters = 30  # matches the baseline's fixed-30-iteration convention
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
        # f32 precision guard: keep scaled mu >= 1e-4 so every iteration's
        # Schur complement stays factorable (see module docstring).
        inv_sqrt_mu_cap_scaled=100.0,
    )

    log(f"devices: {jax.devices()}")

    def run(bv):
        res = solve_scenarios((blk,), (), bv, init_ws, scalars, config)
        # Force completion with a device->host transfer: on the axon TPU
        # tunnel, block_until_ready can return before the computation has
        # actually run (async futures resolve at transfer time), and
        # exact-repeat executions can be served from a replay cache — so
        # every timed rep uses a unique b and fetches a scalar.
        float(np.asarray(res.y).sum())
        return res

    t0 = time.perf_counter()
    res = run(jnp.asarray(b))
    log(f"compile+first run: {time.perf_counter() - t0:.2f}s")
    n_iters = np.asarray(res.num_iterations)
    fails = np.asarray(res.fail)
    log(f"iterations per scenario: {n_iters}")
    log(f"failures: {int(fails.sum())}/{B}")
    if fails.any() or not (n_iters == iters).all():
        log(
            "INVALID RUN: every scenario must complete exactly "
            f"{iters} iterations with no factorization failure "
            f"(got iters min={n_iters.min()} max={n_iters.max()}, "
            f"fails={int(fails.sum())})"
        )
        sys.exit(1)
    total_iters = int(n_iters.sum())

    best = float("inf")
    for rep in range(3):
        bv = jnp.asarray(b * (1.0 + 1e-6 * (rep + 1)))
        t0 = time.perf_counter()
        run(bv)
        dt = time.perf_counter() - t0
        best = min(best, dt)
        log(f"rep {rep}: {dt:.3f}s")

    iters_per_sec = total_iters / best

    try:
        with open("baseline/BASELINE_MEASURED.json") as f:
            base = json.load(f)["workloads"]["sdp_n100_m50"]["newton_iters_per_sec"]
    except Exception as e:  # pragma: no cover
        log(f"baseline read failed: {e}")
        base = None

    out = {
        "metric": f"batched dense-SDP Newton iterations/s (B={B}, n={n}, m={m}, f32, 1 chip)",
        "value": round(iters_per_sec, 2),
        "unit": "newton_iters/s",
        "vs_baseline": round(iters_per_sec / base, 2) if base else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
