"""Weak-scaling measurement of cone-sharded Schur assembly.

BASELINE.md target: >= 80% weak-scaling efficiency on Schur-complement
assembly at 2+ devices.  Keeps the per-device cone count fixed and scales
the device count (1, 2, 4, 8), measuring one full cone-sharded solve (the
per-iteration psum-reduced assembly dominates).  On a real multi-chip slice
the collectives ride ICI; here the 8-device virtual CPU mesh validates the
scaling *structure* (the collective schedule and per-device work are the
same program XLA partitions for real meshes).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python benchmarks/weak_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from conex_tpu.config import SolverConfig  # noqa: E402
from conex_tpu.cones.psd import DenseLMICone  # noqa: E402
from conex_tpu.parallel.sharded import solve_cone_sharded  # noqa: E402


def run(n_devices: int, cones_per_device: int = 4, n: int = 32, m: int = 24,
        iters: int = 8):
    B = cones_per_device * n_devices
    rng = np.random.default_rng(0)
    A = rng.uniform(-1, 1, (B, m, n, n))
    A = 0.5 * (A + np.swapaxes(A, 2, 3))
    C = np.broadcast_to(np.eye(n), (B, n, n)).copy()
    X0 = rng.uniform(-1, 1, (B, n, n))
    X0 = np.einsum("bij,bkj->bik", X0, X0) + 0.1 * np.eye(n)
    b = np.einsum("bvij,bij->v", A, X0)

    blk = DenseLMICone(A=jnp.asarray(A), C=jnp.asarray(C))
    ws = (blk.identity_state(jnp.float64),)
    scal = dict(
        k=jnp.zeros(()), b_scaling=jnp.ones(()), c_scaling=jnp.ones(())
    )
    cfg = SolverConfig(
        max_iterations=iters, final_centering_steps=0, inv_sqrt_mu_max=1e15,
        kkt_error_tolerance=1e45,
    )
    mesh = Mesh(np.asarray(jax.devices()[:n_devices]), ("tp",))

    def once():
        res = solve_cone_sharded(
            (blk,), (), jnp.asarray(b), ws, scal, cfg, mesh
        )
        jax.block_until_ready(res)
        return res

    once()  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        once()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    devices = len(jax.devices())
    counts = [d for d in (1, 2, 4, 8) if d <= devices]
    t1 = None
    print(
        f"devices available: {devices}; per-device cones fixed (weak scaling)"
    )
    print(
        "NOTE: virtual CPU devices share this host's physical cores, so on "
        "this machine perfect weak scaling shows time growing ~linearly in "
        "device count.  The meaningful number here is the *work-normalized "
        "overhead* time(d) / (d * time(1)) — the extra cost introduced by "
        "sharding + collectives vs. just doing d* the work on one device.  "
        "On a real slice each device is its own chip and wall time stays "
        "flat instead."
    )
    for d in counts:
        t = run(d)
        if t1 is None:
            t1 = t
        overhead = t / (d * t1)
        print(
            f"devices={d}: {t * 1000:8.1f} ms/solve   "
            f"work-normalized overhead={overhead:5.2f}x"
        )


if __name__ == "__main__":
    main()
