"""Distributed (subtree-sharded) supernodal factorization tests.

Runs on the 8-device virtual CPU mesh (conftest.py): the clique tree is
partitioned over the "tp" axis, local eliminations run per device, and the
root separator system reduces with psum — results must match the dense
oracle exactly (it is the same elimination, reordered across devices).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from conex_tpu.supernodal.distributed import (
    DistributedSupernodalStructure,
    factor_ldlt,
    factor_llt,
    solve_ldlt,
    solve_llt,
)


def random_clique_spd(cliques, n, rng, delta=1.0):
    G = np.zeros((n, n))
    for c in cliques:
        k = len(c)
        M = rng.normal(size=(k, k))
        idx = np.asarray(c)
        G[idx[:, None], idx[None, :]] += M @ M.T
    G += delta * np.eye(n)
    return G


def chain_cliques(K):
    return [[2 * i, 2 * i + 1, 2 * i + 2] for i in range(K)], 2 * K + 1


def run_distributed(G, b, ds, mode, n_dev):
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("tp",))
    fct = factor_llt if mode == "llt" else factor_ldlt
    slv = solve_llt if mode == "llt" else solve_ldlt

    def inner(G, b):
        fac, fail = fct(G, ds, "tp")
        x = slv(fac, ds, b, "tp")
        return x, fail

    fn = jax.jit(
        jax.shard_map(
            inner, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()),
            check_vma=False,
        )
    )
    x, fail = fn(jnp.asarray(G), jnp.asarray(b))
    return np.asarray(x), bool(np.asarray(fail).ravel()[0])


def test_partition_covers_all_variables():
    cliques, n = chain_cliques(16)
    ds = DistributedSupernodalStructure.from_cliques(cliques, n, 4)
    owned = set(ds.r_vars)
    for blks in ds.local_blocks:
        for s, _ in blks:
            for v in s:
                assert v not in owned, "variable owned twice"
                owned.add(v)
    assert owned == set(range(n))
    # local separators must stay local-or-root (subtree locality)
    for d, blks in enumerate(ds.local_blocks):
        local_vars = {v for s, _ in blks for v in s} | set(ds.r_vars)
        for _, p in blks:
            assert set(p) <= local_vars


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_distributed_llt_chain(n_dev):
    cliques, n = chain_cliques(24)
    rng = np.random.default_rng(0)
    G = random_clique_spd(cliques, n, rng)
    b = rng.normal(size=n)
    ds = DistributedSupernodalStructure.from_cliques(cliques, n, n_dev)
    x, fail = run_distributed(G, b, ds, "llt", n_dev)
    assert not fail
    np.testing.assert_allclose(x, np.linalg.solve(G, b), atol=1e-9)


def test_distributed_llt_star_of_chains():
    """Several chains meeting at a shared hub variable — the hub must land
    in the root separator set."""
    cliques = []
    hub = 0
    v = 1
    for _ in range(5):
        prev = hub
        for _ in range(6):
            cliques.append([prev, v, v + 1])
            prev = v + 1
            v += 2
    n = v
    rng = np.random.default_rng(1)
    G = random_clique_spd(cliques, n, rng)
    b = rng.normal(size=n)
    ds = DistributedSupernodalStructure.from_cliques(cliques, n, 4)
    x, fail = run_distributed(G, b, ds, "llt", 4)
    assert not fail
    np.testing.assert_allclose(x, np.linalg.solve(G, b), atol=1e-9)


def test_distributed_ldlt_indefinite():
    """KKT-style indefinite blocks (equality-dual pattern) through the
    distributed clamped-LDLT path."""
    cliques, n = chain_cliques(20)
    rng = np.random.default_rng(2)
    G = random_clique_spd(cliques, n, rng)
    # flip a few diagonal signs (still factorable fixed-order)
    for v in (5, 17, 33):
        G[v, v] = -G[v, v]
    b = rng.normal(size=n)
    ds = DistributedSupernodalStructure.from_cliques(cliques, n, 4)
    x, fail = run_distributed(G, b, ds, "ldlt", 4)
    assert not fail
    np.testing.assert_allclose(x, np.linalg.solve(G, b), atol=1e-7)


def test_distributed_more_devices_than_subtrees():
    """D=8 on a tiny 3-clique tree: surplus devices get empty no-op
    partitions and the result is still exact."""
    cliques, n = chain_cliques(3)
    rng = np.random.default_rng(3)
    G = random_clique_spd(cliques, n, rng)
    b = rng.normal(size=n)
    ds = DistributedSupernodalStructure.from_cliques(cliques, n, 8)
    x, fail = run_distributed(G, b, ds, "llt", 8)
    assert not fail
    np.testing.assert_allclose(x, np.linalg.solve(G, b), atol=1e-9)


def test_distributed_llt_fail_flag():
    cliques, n = chain_cliques(8)
    ds = DistributedSupernodalStructure.from_cliques(cliques, n, 4)
    G = -np.eye(n)
    b = np.zeros(n)
    _, fail = run_distributed(G, b, ds, "llt", 4)
    assert fail


def test_cone_sharded_with_distributed_kkt():
    """Full solve: sparse chain SOCP, cone batches sharded over tp AND the
    KKT clique tree factored distributed — must match single-device."""
    from conex_tpu import SolverConfig
    from conex_tpu.cones.soc import SOCCone
    from conex_tpu.parallel.sharded import solve_cone_sharded
    from conex_tpu.solver.loop import _solve_impl
    from conex_tpu.supernodal.solver import SupernodalStructure

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")

    rng = np.random.default_rng(7)
    n_blocks, B, dim = 10, 8, 3  # block i on vars {i, i+1, i+2}
    num_vars = n_blocks + 2

    blocks, init_ws, cliques = [], [], []
    for i in range(n_blocks):
        vars_ = (i, i + 1, i + 2)
        A = rng.uniform(-1, 1, (B, dim + 1, len(vars_)))
        x0 = np.concatenate(
            [np.full((B, 1), 2.0), rng.uniform(-0.5, 0.5, (B, dim))], axis=1
        )
        c = np.einsum("bkv->bk", 0 * A) + x0  # interior point => feasible c
        blk = SOCCone(A=jnp.asarray(A), c=jnp.asarray(c), vars_=vars_)
        blocks.append(blk)
        init_ws.append(blk.identity_state(jnp.float64))
        cliques.append(list(vars_))

    b = np.zeros(num_vars)
    for blk in blocks:
        # feasible objective: b = sum_i A_i'(e) / 2 (GetFeasibleObjective)
        e = np.zeros((B, dim + 1)); e[:, 0] = 1.0
        contrib = np.einsum("bkv,bk->v", np.asarray(blk.A), e)
        for j, v in enumerate(blk.vars_):
            b[v] += 0.5 * contrib[j]

    scalars = dict(
        k=jnp.zeros((), jnp.float64),
        b_scaling=jnp.ones((), jnp.float64),
        c_scaling=jnp.ones((), jnp.float64),
    )
    config = SolverConfig(max_iterations=40)

    struct = SupernodalStructure.from_cliques(cliques, num_vars)
    res_single = _solve_impl(
        tuple(blocks), (), jnp.asarray(b), tuple(init_ws), scalars, config,
        kkt_structure=struct,
    )

    dstruct = DistributedSupernodalStructure.from_cliques(
        cliques, num_vars, 8
    )
    mesh = Mesh(np.asarray(devs[:8]), ("tp",))
    res_dist = solve_cone_sharded(
        tuple(blocks), (), jnp.asarray(b), tuple(init_ws), scalars, config,
        mesh, kkt_structure=dstruct,
    )
    assert bool(np.asarray(res_dist.solved)) == bool(res_single.solved)
    np.testing.assert_allclose(
        np.asarray(res_dist.y), np.asarray(res_single.y), atol=1e-8
    )
