"""On-chip probe: Ozaki f64 einsum vs XLA emulated f64 vs default bf16.

Measures, per Schur-phase shape, the wall time of
  (a) native f64 einsum (XLA emulation),
  (b) mm._ozaki_einsum (exact bf16 passes, f64 combine),
  (c) default f32 einsum (bf16-truncated MXU pass, the throughput path),
and the on-chip relative error of (a) and (b) against a CPU f64 oracle.

Axon timing rules (PRECISION.md): every timed rep salts the inputs and
fetches a scalar from the result; marginal-rate measurement via chained
repeats inside one jit.

Run: python benchmarks/dev_ozaki_probe.py
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

    from conex_tpu.algebra import mm

    print("devices:", jax.devices(), file=sys.stderr)

    rng = np.random.default_rng(0)

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        float(np.asarray(out).ravel()[0].sum())
        best = float("inf")
        for rep in range(reps):
            salted = tuple(a * (1.0 + 1e-9 * (rep + 1)) for a in args)
            t0 = time.perf_counter()
            out = fn(*salted)
            float(np.asarray(out).ravel()[0].sum())
            best = min(best, time.perf_counter() - t0)
        return best

    # Chained panel products: P = A W ('bvij,bjk->bvik') then
    # G = tr-panel ('bvik,buki->vu') — the two hot Schur contractions.
    for (B, m, n) in [(8, 50, 100), (8, 50, 300), (4, 300, 300)]:
        A64 = rng.normal(size=(B, m, n, n))
        A64 = 0.5 * (A64 + np.swapaxes(A64, 2, 3))
        W64 = rng.normal(size=(B, n, n))
        W64 = np.einsum("bij,bkj->bik", W64, W64) / n

        # CPU f64 oracle
        P_ref = np.einsum("bvij,bjk->bvik", A64, W64)
        G_ref = np.einsum("bvik,buki->vu", P_ref, P_ref)

        Aj = jnp.asarray(A64)
        Wj = jnp.asarray(W64)

        @jax.jit
        def f64_native(Aj, Wj):
            P = jnp.einsum("bvij,bjk->bvik", Aj, Wj)
            return jnp.einsum("bvik,buki->vu", P, P)

        @jax.jit
        def f64_ozaki(Aj, Wj):
            P = mm._ozaki_einsum("bvij,bjk->bvik", Aj, Wj)
            return mm._ozaki_einsum("bvik,buki->vu", P, P)

        A32 = jnp.asarray(A64, jnp.float32)
        W32 = jnp.asarray(W64, jnp.float32)

        @jax.jit
        def f32_default(Aj, Wj):
            P = jnp.einsum("bvij,bjk->bvik", Aj, Wj)
            return jnp.einsum("bvik,buki->vu", P, P)

        res = {}
        G_oz = np.asarray(f64_ozaki(Aj, Wj))
        res["ozaki_err"] = float(
            np.linalg.norm(G_oz - G_ref) / np.linalg.norm(G_ref))
        G_na = np.asarray(f64_native(Aj, Wj))
        res["native_err"] = float(
            np.linalg.norm(G_na - G_ref) / np.linalg.norm(G_ref))
        G_32 = np.asarray(f32_default(A32, W32))
        res["bf16_err"] = float(
            np.linalg.norm(G_32 - G_ref) / np.linalg.norm(G_ref))

        res["t_f64_native"] = timeit(f64_native, Aj, Wj)
        res["t_f64_ozaki"] = timeit(f64_ozaki, Aj, Wj)
        res["t_f32_default"] = timeit(f32_default, A32, W32)

        print(f"B={B} m={m} n={n}: "
              f"err ozaki={res['ozaki_err']:.2e} "
              f"native={res['native_err']:.2e} bf16={res['bf16_err']:.2e} | "
              f"t native={res['t_f64_native']*1e3:.1f}ms "
              f"ozaki={res['t_f64_ozaki']*1e3:.1f}ms "
              f"bf16={res['t_f32_default']*1e3:.1f}ms | "
              f"ozaki speedup vs native: "
              f"{res['t_f64_native']/res['t_f64_ozaki']:.1f}x, "
              f"cost vs bf16: "
              f"{res['t_f64_ozaki']/res['t_f32_default']:.1f}x",
              flush=True)


if __name__ == "__main__":
    main()
