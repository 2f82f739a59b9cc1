"""Batched tiny-SOCP throughput: fused Pallas kernel vs general vmapped path.

Workload matches baseline/BASELINE_MEASURED.json socp_n20_m10_batch1000:
independent single-cone SOCPs (n=20, m=10), fixed 30 Newton iterations,
f32 on the TPU.  Reference: 156,760 Newton iters/s single core.

Usage: python benchmarks/bench_socp.py [batch ...]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_workload(S, n, m, dtype=np.float32):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((S, 1, n + 1, m)).astype(dtype)
    x = rng.standard_normal((S, 1, n + 1)).astype(dtype)
    x[..., 0] = np.linalg.norm(x[..., 1:], axis=-1) + 1.0
    b = 2.0 * np.einsum("scnv,scn->sv", A, x).astype(dtype)
    c = rng.standard_normal((S, 1, n + 1)).astype(dtype)
    c[..., 0] = np.linalg.norm(c[..., 1:], axis=-1) + 1.0
    return A, c, b


def main():
    import jax
    import jax.numpy as jnp

    from conex_tpu.config import SolverConfig
    from conex_tpu.cones.soc import SOCCone
    from conex_tpu.parallel.fused_socp import solve_socp_fused
    from conex_tpu.parallel.sharded import solve_scenarios

    batches = [int(a) for a in sys.argv[1:]] or [1000, 10000, 100000]
    n, m, iters = 20, 10, 30
    cfg = SolverConfig(
        max_iterations=iters,
        final_centering_steps=0,
        inv_sqrt_mu_max=1e15,
        kkt_error_tolerance=1e45,
        fixed_iterations=True,
    )
    base = 156760.0
    results = []

    print(f"devices: {jax.devices()}", file=sys.stderr)
    for S in batches:
        A, c, b = make_workload(S, n, m)

        def run_fused():
            # block_size 2048 is the VMEM sweet spot on v5e (4096+ exceeds
            # the 16MB scoped-vmem limit; 1024 leaves ~5% on the table)
            out = solve_socp_fused(A, c, b, cfg, block_size=2048)
            jax.block_until_ready(out.k)
            return out

        t0 = time.perf_counter()
        out = run_fused()
        print(f"S={S} fused compile+run: {time.perf_counter()-t0:.2f}s",
              file=sys.stderr)
        total = int(np.asarray(out.num_iterations).sum())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run_fused()
            best = min(best, time.perf_counter() - t0)
        rec = {
            "metric": f"fused SOCP newton iters/s (S={S}, n={n}, m={m})",
            "value": round(total / best, 0),
            "unit": "newton_iters/s",
            "vs_baseline": round(total / best / base, 2),
        }
        results.append(rec)
        print(json.dumps(rec))

        if S <= 10000:
            blk = SOCCone(A=jnp.asarray(A), c=jnp.asarray(c))
            ws = (jnp.zeros((S, 1, n + 1), A.dtype).at[:, :, 0].set(1.0),)
            sc = dict(k=jnp.zeros((S,), A.dtype),
                      b_scaling=jnp.ones((S,), A.dtype),
                      c_scaling=jnp.ones((S,), A.dtype))

            def run_gen():
                r = solve_scenarios((blk,), (), jnp.asarray(b), ws, sc, cfg)
                jax.block_until_ready(r.k)
                return r

            t0 = time.perf_counter()
            r = run_gen()
            print(f"S={S} general compile+run: {time.perf_counter()-t0:.2f}s",
                  file=sys.stderr)
            totg = int(np.asarray(r.num_iterations).sum())
            bestg = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run_gen()
                bestg = min(bestg, time.perf_counter() - t0)
            rec = {
                "metric": f"general SOCP newton iters/s (S={S})",
                "value": round(totg / bestg, 0),
                "unit": "newton_iters/s",
                "vs_baseline": round(totg / bestg / base, 2),
            }
            results.append(rec)
            print(json.dumps(rec))
            # trajectory agreement
            dk = np.abs(np.asarray(out.stats_k) - np.asarray(r.stats_k))
            rel = dk / np.maximum(np.abs(np.asarray(r.stats_k)), 1e-30)
            print(f"S={S} max rel stats_k diff fused vs general: "
                  f"{rel.max():.2e}", file=sys.stderr)


    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_SOCP.json"), "w") as f:
        json.dump({
            "description": (
                "Batched tiny-SOCP throughput on the real TPU chip, fixed "
                "30 Newton iterations (fixed_iterations=True, no early "
                "exit on either side).  Baseline: reference conex single "
                "core, same workload, fixed 30 iters "
                "(baseline/BASELINE_MEASURED.json socp_n20_m10_batch1000 "
                "= 156,760 iters/s)."
            ),
            "device": str(jax.devices()[0]),
            "results": results,
        }, f, indent=2)
    print(f"wrote {os.path.join(root, 'BENCH_SOCP.json')}", file=sys.stderr)


if __name__ == "__main__":
    main()
