"""Marginal-rate probe: Ozaki vs native-f64 vs bf16 Schur phase.

Chains R dependent repetitions of the two Schur contractions inside one
jit (device-resident), and reports (t(2R) - t(R)) / R — the true
per-phase cost with dispatch/transfer overhead cancelled (PRECISION.md
timing rules).

Run: python benchmarks/dev_ozaki_probe2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
    import functools

    from conex_tpu.algebra import mm

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)

    def chain(kind, R):
        @jax.jit
        def run(Aj, Wj):
            def body(i, W):
                if kind == "ozaki":
                    P = mm._ozaki_einsum("bvij,bjk->bvik", Aj, W)
                    G = mm._ozaki_einsum("bvik,buki->vu", P, P)
                else:
                    P = jnp.einsum("bvij,bjk->bvik", Aj, W)
                    G = jnp.einsum("bvik,buki->vu", P, P)
                # data dependency: perturb W by a trace-scaled identity
                eps = (G[0, 0] * 1e-30).astype(W.dtype)
                return W + eps * jnp.eye(W.shape[-1], dtype=W.dtype)

            return jax.lax.fori_loop(0, R, body, Wj)

        return run

    def measure(kind, Aj, Wj, R):
        f1, f2 = chain(kind, R), chain(kind, 2 * R)
        for f in (f1, f2):
            float(np.asarray(f(Aj, Wj)).sum())  # compile+warm
        ts = []
        for f, reps in ((f1, R), (f2, 2 * R)):
            best = float("inf")
            for k in range(2):
                As = Aj * (1.0 + 1e-9 * (k + 1))
                t0 = time.perf_counter()
                float(np.asarray(f(As, Wj)).sum())
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
        return (ts[1] - ts[0]) / R

    for (B, m, n, R) in [(8, 50, 100, 20), (8, 100, 100, 20),
                         (8, 50, 300, 10), (4, 300, 300, 5)]:
        A64 = rng.normal(size=(B, m, n, n))
        A64 = 0.5 * (A64 + np.swapaxes(A64, 2, 3))
        W64 = rng.normal(size=(B, n, n))
        W64 = np.einsum("bij,bkj->bik", W64, W64) / n
        Aj, Wj = jnp.asarray(A64), jnp.asarray(W64)
        A32, W32 = Aj.astype(jnp.float32), Wj.astype(jnp.float32)

        t_oz = measure("ozaki", Aj, Wj, R)
        t_na = measure("native", Aj, Wj, R)
        t_bf = measure("native", A32, W32, R)
        flops = 2 * 2 * B * m * n ** 3
        print(f"B={B} m={m} n={n}: per-phase "
              f"native={t_na*1e3:.2f}ms ozaki={t_oz*1e3:.2f}ms "
              f"bf16={t_bf*1e3:.2f}ms | ozaki vs native {t_na/t_oz:.1f}x, "
              f"vs bf16 {t_oz/t_bf:.1f}x | "
              f"bf16 {flops/t_bf/1e12:.1f} TFLOP/s, "
              f"ozaki-effective {flops/t_oz/1e12:.2f} TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
