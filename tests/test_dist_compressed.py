"""Distributed factorization on block-compressed storage (VERDICT r2 #5).

The composition round 2 lacked: per-device compressed buffers (no dense
(N, N) anywhere), subtree-parallel elimination, root coupling via psum.
Results must match the dense oracle exactly — it is the same elimination
reordered subtree-contiguously.  Runs on the 8-device virtual CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from conex_tpu.supernodal.compressed import compress_dense
from conex_tpu.supernodal.dist_compressed import (
    DistributedCompressedStructure,
    factor_ldlt,
    factor_llt,
    solve_ldlt,
    solve_llt,
)

from test_distributed import chain_cliques, random_clique_spd


def run_dist_compressed(G, b, dcs, mode, n_dev):
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("tp",))
    fct = factor_llt if mode == "llt" else factor_ldlt
    slv = solve_llt if mode == "llt" else solve_ldlt
    buf = compress_dense(jnp.asarray(G), dcs.base)

    def inner(buf, b):
        fac, fail = fct(buf, dcs, "tp")
        x = slv(fac, dcs, b, "tp")
        return x, fail

    fn = jax.jit(
        jax.shard_map(
            inner, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()),
            check_vma=False,
        )
    )
    x, fail = fn(buf, jnp.asarray(b))
    return np.asarray(x), bool(np.asarray(fail).ravel()[0])


def test_structure_is_subtree_contiguous():
    cliques, n = chain_cliques(16)
    dcs = DistributedCompressedStructure.from_cliques(cliques, n, 4)
    seen = []
    for cl in dcs.device_cliques:
        seen.extend(cl)
    seen.extend(dcs.root_cliques)
    assert seen == list(range(len(dcs.base.blocks)))
    # every variable owned exactly once
    owned = {}
    for k, (s, _) in enumerate(dcs.base.blocks):
        for v in s:
            assert v not in owned
            owned[v] = k
    assert set(owned) == set(range(n))


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_dist_compressed_llt_chain(n_dev):
    cliques, n = chain_cliques(24)
    rng = np.random.default_rng(0)
    G = random_clique_spd(cliques, n, rng)
    b = rng.normal(size=n)
    dcs = DistributedCompressedStructure.from_cliques(cliques, n, n_dev)
    x, fail = run_dist_compressed(G, b, dcs, "llt", n_dev)
    assert not fail
    np.testing.assert_allclose(x, np.linalg.solve(G, b), atol=1e-9)


def test_dist_compressed_llt_star_of_chains():
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
    dcs = DistributedCompressedStructure.from_cliques(cliques, n, 4)
    x, fail = run_dist_compressed(G, b, dcs, "llt", 4)
    assert not fail
    np.testing.assert_allclose(x, np.linalg.solve(G, b), atol=1e-9)


def test_dist_compressed_ldlt_indefinite():
    cliques, n = chain_cliques(20)
    rng = np.random.default_rng(2)
    G = random_clique_spd(cliques, n, rng)
    for v in (5, 17, 33):
        G[v, v] = -G[v, v]
    b = rng.normal(size=n)
    dcs = DistributedCompressedStructure.from_cliques(cliques, n, 4)
    x, fail = run_dist_compressed(G, b, dcs, "ldlt", 4)
    assert not fail
    np.testing.assert_allclose(x, np.linalg.solve(G, b), atol=1e-7)


def test_dist_compressed_more_devices_than_subtrees():
    cliques, n = chain_cliques(3)
    rng = np.random.default_rng(3)
    G = random_clique_spd(cliques, n, rng)
    b = rng.normal(size=n)
    dcs = DistributedCompressedStructure.from_cliques(cliques, n, 8)
    x, fail = run_dist_compressed(G, b, dcs, "llt", 8)
    assert not fail
    np.testing.assert_allclose(x, np.linalg.solve(G, b), atol=1e-9)


def test_dist_compressed_fail_flag():
    cliques, n = chain_cliques(8)
    dcs = DistributedCompressedStructure.from_cliques(cliques, n, 4)
    G = -np.eye(n)
    b = np.zeros(n)
    _, fail = run_dist_compressed(G, b, dcs, "llt", 4)
    assert fail


def test_cone_sharded_with_dist_compressed_kkt():
    """Full solve end-to-end: cone batches sharded over tp, assembly
    scattered into the compressed buffer (one O(buffer) psum), KKT factored
    subtree-parallel on compressed storage — no dense (N, N) matrix
    anywhere in the distributed path.  Must match single-device."""
    from conex_tpu import SolverConfig
    from conex_tpu.cones.soc import SOCCone
    from conex_tpu.parallel.sharded import solve_cone_sharded
    from conex_tpu.solver.loop import _solve_impl
    from conex_tpu.supernodal.solver import SupernodalStructure

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")

    rng = np.random.default_rng(7)
    n_blocks, B, dim = 10, 8, 3
    num_vars = n_blocks + 2

    blocks, init_ws, cliques = [], [], []
    for i in range(n_blocks):
        vars_ = (i, i + 1, i + 2)
        A = rng.uniform(-1, 1, (B, dim + 1, len(vars_)))
        x0 = np.concatenate(
            [np.full((B, 1), 2.0), rng.uniform(-0.5, 0.5, (B, dim))], axis=1
        )
        c = np.einsum("bkv->bk", 0 * A) + x0
        blk = SOCCone(A=jnp.asarray(A), c=jnp.asarray(c), vars_=vars_)
        blocks.append(blk)
        init_ws.append(blk.identity_state(jnp.float64))
        cliques.append(list(vars_))

    b = np.zeros(num_vars)
    for blk in blocks:
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

    dcs = DistributedCompressedStructure.from_cliques(cliques, num_vars, 8)
    mesh = Mesh(np.asarray(devs[:8]), ("tp",))
    res_dist = solve_cone_sharded(
        tuple(blocks), (), jnp.asarray(b), tuple(init_ws), scalars, config,
        mesh, kkt_structure=dcs,
    )
    assert bool(np.asarray(res_dist.solved)) == bool(res_single.solved)
    np.testing.assert_allclose(
        np.asarray(res_dist.y), np.asarray(res_single.y), atol=1e-8
    )
