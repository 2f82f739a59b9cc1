"""Full-solve probe: f64 accuracy path, native vs ozaki matmuls, on chip.

Usage: python benchmarks/dev_mixed_solve.py n m B [mode ...]
Solves the sweep workload at (n, m) with batch B in each listed mode
(default: native + ozaki), reporting iters/s, solved count and max rel
duality gap.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ["CONEX_TPU_DISABLE_FUSED_SCHUR"] = "1"
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    from benchmarks.sweep_table import _workload, _solve
    from conex_tpu.config import SolverConfig

    n, m, B = (int(a) for a in sys.argv[1:4])
    modes = sys.argv[4:] or ["default", "ozaki"]
    print("devices:", jax.devices(), file=sys.stderr)

    A, C, b = _workload(B, n, m, np.float64)
    kmax = 4e4 if n < 300 else 1e6
    iters = 120 if n < 300 else 250
    for mode in modes:
        cfg = SolverConfig(max_iterations=iters, inv_sqrt_mu_max=kmax,
                           prepare_dual_variables=True,
                           schur_precision=mode)
        t0 = time.perf_counter()
        r, best = _solve(A, C, b, cfg)
        compile_s = time.perf_counter() - t0
        it = np.asarray(r.num_iterations)
        ok = np.asarray(r.solved)
        X = np.asarray(r.ws[0].w)
        k = np.asarray(r.k)
        bsc = np.asarray(r.b_scaling)
        ys = np.asarray(r.y)
        gaps = []
        for s in range(B):
            if not ok[s]:
                continue
            Xs = X[s, 0] / (k[s] * bsc[s])
            by = b[s] @ ys[s]
            cx = np.sum(np.asarray(C[s, 0]) * Xs)
            gaps.append(abs(cx - by) / (1 + abs(by)))
        gap = f"{max(gaps):.2e}" if gaps else "n/a"
        print(f"mode={mode}: {int(it.sum())/best:.1f} it/s  "
              f"solved {int(ok.sum())}/{B}  "
              f"max_gap {gap}  iters {it.tolist()}  "
              f"fails {int(np.asarray(r.fail).sum())}  "
              f"(first-call {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
