"""Mu-per-Newton-step experiments (paper-figure reproduction).

Python-3 equivalent of the reference's
/root/reference/examples/performance_plots.py: solves random Hermitian-PSD
programs over the real/complex/quaternion/octonion algebras and mixed-cone
programs, records mu per Newton step, and writes the trajectories to CSV
(plus matplotlib plots when available).

Run:  python examples/performance_plots.py [output_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from conex_tpu import Program, SolverConfig  # noqa: E402


def rand_hermitian(d, n, rng):
    x = rng.uniform(-1, 1, (d, n, n))
    x[0] = 0.5 * (x[0] + x[0].T)
    for i in range(1, d):
        x[i] = 0.5 * (x[i] - x[i].T)
    return x


def mu_trajectory_hermitian(d, n, m, rng, config):
    A = np.stack([rand_hermitian(d, n, rng) for _ in range(m)])
    C = np.zeros((d, n, n))
    C[0] = np.eye(n) * (n + 1.0)
    X0 = np.zeros((d, n, n))
    X0[0] = np.eye(n)
    b = np.einsum("vdij,dij->v", A, X0)
    prog = Program(m)
    prog.add_hermitian_constraint(A, C)
    res = prog.solve(b, config)
    return 1.0 / res.stats_inv_sqrt_mu**2, res


def mu_trajectory_mixed(rng, config):
    m = 3
    prog = Program(m)
    A_lp = rng.uniform(-1, 1, (8, m))
    c_lp = np.abs(rng.uniform(0.5, 1.5, 8))
    prog.add_linear_constraint(A_lp, c_lp)
    A_soc = rng.uniform(-1, 1, (5, m))
    c_soc = rng.uniform(-1, 1, 5)
    c_soc[0] = np.linalg.norm(c_soc[1:]) + 1.0
    prog.add_soc_constraint(A_soc, c_soc)
    A_sdp = np.stack(
        [0.5 * (M + M.T) for M in rng.uniform(-1, 1, (m, 4, 4))]
    )
    prog.add_lmi_constraint(A_sdp, np.eye(4) * 5.0)
    b = prog.get_feasible_objective()
    res = prog.solve(b, config)
    return 1.0 / res.stats_inv_sqrt_mu**2, res


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "plots_out"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(0)
    config = SolverConfig(inv_sqrt_mu_max=1e5, max_iterations=90)

    rows = {}
    for d, name in [(1, "real"), (2, "complex"), (4, "quaternion"),
                    (8, "octonion")]:
        n = 3 if d == 8 else 8
        mus, res = mu_trajectory_hermitian(d, n, 4, rng, config)
        rows[name] = mus
        print(f"{name:10s}: {len(mus)} iterations, final mu {mus[-1]:.2e}, "
              f"solved={res.solved}")

    mus, res = mu_trajectory_mixed(rng, config)
    rows["mixed"] = mus
    print(f"{'mixed':10s}: {len(mus)} iterations, final mu {mus[-1]:.2e}, "
          f"solved={res.solved}")

    for name, mus in rows.items():
        np.savetxt(
            os.path.join(out, f"mu_per_step_{name}.csv"),
            np.column_stack([np.arange(len(mus)), mus]),
            delimiter=",",
            header="newton_step,mu",
        )

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        for name, mus in rows.items():
            ax.semilogy(mus, label=name)
        ax.set_xlabel("Newton step")
        ax.set_ylabel("mu")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(out, "mu_per_step.png"), dpi=120)
        print(f"wrote {out}/mu_per_step.png")
    except Exception as e:  # matplotlib optional
        print(f"(no plot: {e})")
    print(f"wrote CSVs to {out}/")


if __name__ == "__main__":
    main()
