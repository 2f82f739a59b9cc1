"""Dump-slot invariant on the compressed / distributed-compressed paths.

The compressed buffer's last element (``structure.dump``) collects
scatter writes from padding lanes and mirrored-orientation updates
(loop.py::assemble zeroes it before the factorization; VERDICT r03 Weak
#8 flagged that nothing pins the invariant that its VALUE never
influences factor/solve results).  These tests poison the dump slot with
a huge value and assert factor+solve outputs are bit-identical — on the
single-device compressed path and on the distributed-compressed path
through the psum combine (where reduction-order drift was already the
cause of a loosened test tolerance).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from conex_tpu.supernodal.compressed import (
    CompressedSupernodalStructure,
    compress_dense,
    factor_llt,
    solve_llt,
)
from conex_tpu.supernodal.dist_compressed import (
    DistributedCompressedStructure,
    factor_llt as dfactor_llt,
    solve_llt as dsolve_llt,
)


def _chain_problem(rng, n_cliques=4, dim=6):
    step = dim // 2
    cliques = []
    v = 0
    prev = None
    for _ in range(n_cliques):
        if prev is None:
            body = list(range(v, v + dim))
        else:
            body = prev + list(range(v, v + dim - len(prev)))
        cliques.append(body)
        prev = body[-step:]
        v = body[-1] + 1
    n = v
    G = np.eye(n) * (dim * 2.0)
    for c in cliques:
        k = len(c)
        M = rng.normal(size=(k, k))
        idx = np.asarray(c)
        G[idx[:, None], idx[None, :]] += (M @ M.T) / k
    return cliques, n, G


def test_dump_value_ignored_compressed():
    rng = np.random.default_rng(0)
    cliques, n, G = _chain_problem(rng)
    cs = CompressedSupernodalStructure.from_cliques(
        tuple(tuple(c) for c in cliques), n
    )
    buf = compress_dense(jnp.asarray(G), cs)
    b = jnp.asarray(rng.normal(size=n))

    fac_a, fail_a = factor_llt(buf, cs)
    x_a = solve_llt(fac_a, cs, b)
    poisoned = buf.at[cs.dump].set(1e30)
    fac_b, fail_b = factor_llt(poisoned, cs)
    x_b = solve_llt(fac_b, cs, b)
    assert not bool(fail_a) and not bool(fail_b)
    np.testing.assert_array_equal(np.asarray(x_a), np.asarray(x_b))
    np.testing.assert_array_equal(
        jax.tree.leaves(jax.tree.map(np.asarray, fac_a))[0],
        jax.tree.leaves(jax.tree.map(np.asarray, fac_b))[0],
    )


def test_dump_value_ignored_distributed():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(1)
    # star of 4 chains -> one subtree per device
    cliques = []
    hub, v, dim, step = 0, 1, 6, 3
    for _ in range(4):
        prev = [hub]
        for _ in range(3):
            body = list(range(v, v + dim - len(prev)))
            cliques.append(prev + body)
            prev = body[-step:]
            v = body[-1] + 1
    n = v
    G = np.eye(n) * (dim * 2.0)
    for c in cliques:
        k = len(c)
        M = rng.normal(size=(k, k))
        idx = np.asarray(c)
        G[idx[:, None], idx[None, :]] += (M @ M.T) / k
    dcs = DistributedCompressedStructure.from_cliques(cliques, n, 4)
    buf = compress_dense(jnp.asarray(G), dcs.base)
    b = jnp.asarray(rng.normal(size=n))
    mesh = Mesh(np.asarray(devs[:4]), ("tp",))

    def run(buf):
        def inner(buf, b):
            fac, fail = dfactor_llt(buf, dcs, "tp")
            return dsolve_llt(fac, dcs, b, "tp"), fail

        fn = jax.jit(jax.shard_map(
            inner, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()),
            check_vma=False,
        ))
        x, fail = fn(buf, b)
        return np.asarray(x), bool(np.asarray(fail).ravel()[0])

    x_a, fail_a = run(buf)
    x_b, fail_b = run(buf.at[dcs.base.dump].set(-1e30))
    assert not fail_a and not fail_b
    # bit-identical through subtree elimination + root psum + solves
    np.testing.assert_array_equal(x_a, x_b)
    np.testing.assert_allclose(G @ x_a, np.asarray(b), atol=1e-8)
