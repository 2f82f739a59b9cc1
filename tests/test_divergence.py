"""Unit tests for the divergence-bound inverse.

Mirrors /root/reference/conex/test/test_divergence.cc: the closed-form
inverse must be an actual inverse of the forward bound on both branches.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conex_tpu.solver.mu import (
    SlackAgg,
    divergence_upper_bound,
    divergence_upper_bound_inverse,
)


def make_params(lams):
    lams = np.asarray(lams, dtype=np.float64)
    return SlackAgg(
        lam_min=jnp.asarray(lams.min()),
        lam_max=jnp.asarray(lams.max()),
        frob_sq=jnp.asarray(np.sum(lams**2)),
        trace=jnp.asarray(np.sum(lams)),
    )


@pytest.mark.parametrize(
    "lams", [[0.5, 1.0, 2.0], [1.0, 1.1, 1.2, 4.0], [0.1, 0.2], [2.0, 3.0, 10.0]]
)
@pytest.mark.parametrize("budget", [0.5, 1.0, 10.0, 100.0])
def test_inverse_is_inverse(lams, budget):
    p = make_params(lams)
    rank = len(lams)
    k = float(divergence_upper_bound_inverse(budget, p, rank))
    if k <= 0:
        pytest.skip("inverse reports failure for this configuration")
    got = float(divergence_upper_bound(k, p, rank))
    assert got == pytest.approx(budget, rel=1e-6)


def test_inverse_monotone_in_budget():
    p = make_params([0.5, 1.0, 3.0])
    ks = []
    for budget in [0.5, 1.0, 5.0, 50.0]:
        k = float(divergence_upper_bound_inverse(budget, p, 3))
        if k > 0:
            ks.append(k)
    assert all(a <= b + 1e-12 for a, b in zip(ks, ks[1:]))
