"""Smoke test for the phase-timing harness."""

import numpy as np

from conex_tpu import Program
from conex_tpu.utils.profiling import phase_timings


def test_phase_timings_smoke():
    rng = np.random.default_rng(0)
    m, n = 4, 10
    A = np.stack([0.5 * (M + M.T) for M in rng.uniform(-1, 1, (m, n, n))])
    prog = Program(m)
    prog.add_lmi_constraint(A, np.eye(n) * 3.0)
    t = phase_timings(prog, reps=2)
    assert set(t) == {"assemble", "factor", "solve", "update"}
    assert all(v > 0 for v in t.values())
