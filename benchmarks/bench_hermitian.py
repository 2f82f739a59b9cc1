"""On-chip Hermitian-cone benchmark: warm-seed speedup evidence.

Solves batched complex (d=2) Hermitian-PSD programs at n=64 on one TPU
chip, fixed 30 Newton iterations (headline convention), comparing the
warm-eigenvector-seed path (HermState, cones/hermitian.py) against the
cold squaring estimator forced every iteration — the design the warm
seeds replaced.  Writes BENCH_HERMITIAN.json.

Run: python benchmarks/bench_hermitian.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _herm_workload(S, d, n, m, rng, dtype):
    """S scenarios, each one Hermitian LMI block of cone-batch 1:
    A (S, 1, m, d, n, n), C (S, 1, d, n, n), b (S, m)."""
    def rand_herm():
        x = rng.uniform(-1, 1, (d, n, n))
        x[0] = 0.5 * (x[0] + x[0].T)
        for k in range(1, d):
            x[k] = 0.5 * (x[k] - x[k].T)
        return x

    A = np.stack(
        [[[rand_herm() for _ in range(m)]] for _ in range(S)]
    ).astype(dtype)  # (S, 1, m, d, n, n)
    C = np.zeros((S, 1, d, n, n), dtype)
    C[:, :, 0] = np.eye(n, dtype=dtype)
    X0 = np.zeros((S, 1, d, n, n), dtype)
    X0[:, :, 0] = 0.3 * np.eye(n, dtype=dtype)
    b = np.einsum("sbvdij,sbdij->sv", A, X0).astype(dtype)
    return A, C, b


def run(S, d, n, m, iters, cold):
    import jax
    import jax.numpy as jnp

    from conex_tpu.config import SolverConfig
    from conex_tpu.cones import hermitian as hmod
    from conex_tpu.cones.hermitian import HermitianCone, make_herm_state
    from conex_tpu.parallel.sharded import solve_scenarios

    dtype = np.float32
    rng = np.random.default_rng(0)
    A, C, b = _herm_workload(S, d, n, m, rng, dtype)
    blk = HermitianCone(A=jnp.asarray(A), C=jnp.asarray(C))
    e = np.zeros((S, 1, d, n, n), dtype)
    e[:, :, 0] = np.eye(n, dtype=dtype)
    ws = (jax.vmap(make_herm_state)(jnp.asarray(e)),)
    sc = dict(k=jnp.zeros((S,), dtype), b_scaling=jnp.ones((S,), dtype),
              c_scaling=jnp.ones((S,), dtype))
    cfg = SolverConfig(
        max_iterations=iters, final_centering_steps=0,
        inv_sqrt_mu_max=1e15, fixed_iterations=True,
        inv_sqrt_mu_cap_scaled=100.0,
        # cache-bust between the two variants (the cold flag is read at
        # trace time inside the cone kernel)
        minimum_mu=1e-15 * (2.0 if cold else 1.0),
    )
    hmod.FORCE_COLD = cold

    def go(bv):
        r = solve_scenarios((blk,), (), bv, ws, sc, cfg)
        float(np.asarray(r.y).sum())
        return r

    t0 = time.perf_counter()
    r = go(jnp.asarray(b))
    compile_s = time.perf_counter() - t0
    it = np.asarray(r.num_iterations)
    fails = int(np.asarray(r.fail).sum())
    best = float("inf")
    for rep in range(3):
        bv = jnp.asarray(b * (1.0 + 1e-6 * (rep + 1)
                              + 1e-8 * (time.time() % 97)))
        t0 = time.perf_counter()
        go(bv)
        best = min(best, time.perf_counter() - t0)
    hmod.FORCE_COLD = False
    return dict(iters_per_sec=round(int(it.sum()) / best, 1),
                S=S, fails=fails, all_full=bool((it == iters).all()),
                compile_seconds=round(compile_s, 1))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    S, d, n, m, iters = 32, 2, 64, 16, 30
    warm = run(S, d, n, m, iters, cold=False)
    log(f"warm: {warm}")
    cold = run(S, d, n, m, iters, cold=True)
    log(f"cold: {cold}")
    payload = dict(
        description=(
            "Batched complex Hermitian-PSD SDPs (d=2, n=64, m=16, S=32 "
            "scenarios, f32, fixed 30 Newton iterations, scaled-mu cap "
            "1e-4) on one TPU chip: the HermState warm-eigenvector path "
            "vs the cold squaring estimator every iteration (the design "
            "it replaced — reference analogue: fresh random-seeded "
            "Lanczos per iteration, hermitian_psd.cc:59)."
        ),
        device=str(jax.devices()[0]),
        warm=warm,
        cold=cold,
        warm_over_cold=round(
            warm["iters_per_sec"] / cold["iters_per_sec"], 2),
    )
    with open(os.path.join(ROOT, "BENCH_HERMITIAN.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps({"warm_over_cold": payload["warm_over_cold"],
                      "ok": True}))


if __name__ == "__main__":
    main()
