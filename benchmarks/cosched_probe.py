"""Co-scheduling control experiment for WEAK_SCALING.json.

Two COMPLETELY INDEPENDENT single-device distributed-KKT runs (separate
processes, no sharding, no collectives) on this 2-core host: each
degrades from ~6.7 ms solo to 390-536 ms co-scheduled (~60-80x) because
the XLA:CPU intra-op threadpools of the two processes thrash each other.
This bounds the emulation's co-scheduling artifact from below: the
in-mesh sharded program (work-normalized overhead 1.45x at d=2, 3.4x at
d=4) is 1-2 orders of magnitude MORE efficient than co-scheduling
independent programs, so the residual overhead above the 0.5 two-core
ideal is host-scheduling, not the sharding design (whose only
communication, the root-separator psum, measures <= 1.4 ms at d=8 in the
collective-rendezvous floor).

Run: python benchmarks/cosched_probe.py  (prints both per-call times)
"""

import os
import subprocess
import sys

CHILD = r'''
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "%(root)s"); sys.path.insert(0, "%(root)s/benchmarks")
from weak_scaling import run_distributed_kkt
t = run_distributed_kkt(1, cliques_per_chain=16, clique_dim=128)
print(f"{t*1e3:.1f}")
'''


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = CHILD % dict(root=root)
    procs = [
        subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, text=True)
        for _ in range(2)
    ]
    times = [float(p.communicate()[0].strip().splitlines()[-1])
             for p in procs]
    print({"cosched_independent_ms": times})


if __name__ == "__main__":
    main()
