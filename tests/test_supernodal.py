"""Supernodal clique-tree ordering and factorization tests.

Mirrors /root/reference/conex/test/clique_ordering_test.cc,
supernodal_solver_test.cc and block_triangular_operations_test.cc: the
ordering must produce a valid elimination structure (running intersection
property), and the supernodal factor/solve must match dense oracles on
random clique-patterned matrices.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conex_tpu.supernodal.ordering import (
    path_in_tree,
    pick_clique_order,
)
from conex_tpu.supernodal.solver import (
    SupernodalKKTSolver,
    SupernodalStructure,
    factor_ldlt,
    factor_llt,
    solve_ldlt,
    solve_llt,
)


def test_path_in_tree():
    # Chain 0 <- 1 <- 2 <- 3 (parent of i is i-1), heights 0,1,2,3.
    parent = [0, 0, 1, 2]
    height = [0, 1, 2, 3]
    assert path_in_tree(3, 1, parent, height) == [3, 2, 1]
    assert path_in_tree(1, 3, parent, height) == [3, 2, 1]
    assert path_in_tree(2, 2, parent, height) == [2]


def check_valid_elimination(cliques, co, num_vars):
    """Each variable in exactly one supernode; separators appear in later
    cliques' supernodes (running intersection property)."""
    seen = {}
    pos = {e: i for i, e in enumerate(co.order)}
    for e in co.order:
        for v in co.supernodes[e]:
            assert v not in seen, f"variable {v} in two supernodes"
            seen[v] = e
    used = set()
    for c in cliques:
        used |= set(c)
    assert used <= set(seen), "some variable not assigned a supernode"
    for e in co.order:
        for v in co.separators[e]:
            owner = seen[v]
            assert pos[owner] > pos[e], (
                f"separator var {v} of clique {e} eliminated earlier"
            )


def test_clique_order_chain():
    """Chain of overlapping cliques (LQR-like, reference assembly_test)."""
    cliques = [[0, 1, 2], [2, 3, 4], [4, 5, 6], [6, 7, 8]]
    co = pick_clique_order(cliques)
    check_valid_elimination(cliques, co, 9)
    # A chordal chain needs no fill-in: separators are the overlaps.
    total_sep = sorted(sum((co.separators[e] for e in co.order), []))
    assert total_sep == [2, 4, 6]


def test_clique_order_with_fill_in():
    """reference: LP.SparseWithFillIn pattern — cliques whose tree forces
    fill-in via the running intersection property."""
    cliques = [[0, 1], [1, 2], [2, 3], [0, 3]]
    co = pick_clique_order(cliques)
    check_valid_elimination(cliques, co, 4)
    # Some separator must have grown beyond the pairwise intersections.
    sep_sizes = sum(len(co.separators[e]) for e in co.order)
    assert sep_sizes >= 3


def random_clique_spd(cliques, n, rng, delta=1.0):
    G = np.zeros((n, n))
    for c in cliques:
        k = len(c)
        M = rng.normal(size=(k, k))
        idx = np.asarray(c)
        G[idx[:, None], idx[None, :]] += M @ M.T
    G += delta * np.eye(n)
    return G


@pytest.mark.parametrize(
    "cliques,n",
    [
        ([[0, 1, 2], [2, 3, 4], [4, 5, 6]], 7),
        ([[0, 1], [1, 2], [2, 3], [0, 3]], 4),
        ([[0, 1, 2, 3, 4]], 5),
        ([[0, 1, 4], [1, 2, 4], [2, 3, 4], [0, 5]], 6),
    ],
)
def test_supernodal_llt_matches_dense(cliques, n):
    rng = np.random.default_rng(0)
    G = random_clique_spd(cliques, n, rng)
    b = rng.normal(size=n)
    struct = SupernodalStructure.from_cliques(cliques, n)
    fac, fail = factor_llt(jnp.asarray(G), struct)
    assert not bool(fail)
    x = np.asarray(solve_llt(fac, struct, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(G, b), atol=1e-9)


def test_supernodal_ldlt_indefinite():
    """KKT-style indefinite system [G A'; A 0] with the duals appended to
    the clique (reference constraint_manager.h:71-86)."""
    rng = np.random.default_rng(1)
    m, p = 5, 2
    n = m + p
    Gtop = rng.normal(size=(m, m))
    Gtop = Gtop @ Gtop.T + np.eye(m)
    A = rng.normal(size=(p, m))
    K = np.zeros((n, n))
    K[:m, :m] = Gtop
    K[m:, :m] = A
    K[:m, m:] = A.T
    cliques = [list(range(n))]
    struct = SupernodalStructure.from_cliques(cliques, n)
    fac, fail = factor_ldlt(jnp.asarray(K), struct)
    assert not bool(fail)
    b = rng.normal(size=n)
    x = np.asarray(solve_ldlt(fac, struct, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(K, b), atol=1e-8)


def test_supernodal_ldlt_sparse_indefinite():
    rng = np.random.default_rng(2)
    cliques = [[0, 1, 2, 6], [2, 3, 6], [3, 4, 5, 6]]
    n = 7
    G = random_clique_spd(cliques, n, rng)
    # Make it indefinite by flipping the sign of the last diagonal entry
    # (still within the clique pattern).
    G[6, 6] = -G[6, 6]
    struct = SupernodalStructure.from_cliques(cliques, n)
    fac, fail = factor_ldlt(jnp.asarray(G), struct)
    assert not bool(fail)
    b = rng.normal(size=n)
    x = np.asarray(solve_ldlt(fac, struct, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(G, b), atol=1e-7)


def test_supernodal_solver_wrapper():
    rng = np.random.default_rng(3)
    cliques = [[0, 1, 2], [2, 3, 4], [4, 5, 6], [6, 7, 8], [8, 9, 0]]
    n = 10
    G = random_clique_spd(cliques, n, rng)
    solver = SupernodalKKTSolver(cliques, n, mode="llt")
    assert solver.factor(G)
    b = rng.normal(size=n)
    np.testing.assert_allclose(
        solver.solve(b), np.linalg.solve(G, b), atol=1e-8
    )


def test_llt_fails_on_indefinite():
    """Non-PSD input must report factorization failure (reference
    kkt_solver.cc:178-189)."""
    n = 4
    G = -np.eye(n)
    struct = SupernodalStructure.from_cliques([[0, 1, 2, 3]], n)
    _, fail = factor_llt(jnp.asarray(G), struct)
    assert bool(fail)


def test_native_matches_python_ordering():
    """The C++ clique ordering must produce identical structure to the
    Python oracle."""
    from conex_tpu import native
    from conex_tpu.supernodal.ordering import pick_clique_order

    if not native.available():
        pytest.skip("native toolchain unavailable")
    patterns = [
        [[0, 1, 2], [2, 3, 4], [4, 5, 6], [6, 7, 8]],
        [[0, 1], [1, 2], [2, 3], [0, 3]],
        [[0, 1, 4], [1, 2, 4], [2, 3, 4], [0, 5]],
        [[0, 1, 2, 3, 4]],
    ]
    for cliques in patterns:
        a = pick_clique_order(cliques, use_native=True)
        b = pick_clique_order(cliques, use_native=False)
        assert a.order == b.order
        assert a.supernodes == b.supernodes
        assert a.separators == b.separators
        assert a.parent == b.parent
        assert a.height == b.height


def test_elimination_ordering_utilities():
    """reference: elimination_ordering.{h,cc} (MCS, chordality, perfect
    ordering) — vestigial in the reference, provided for completeness."""
    from conex_tpu.supernodal.elimination import (
        is_chordal,
        is_perfectly_ordered,
        maximum_cardinality_search,
    )

    # A chordal graph: two triangles sharing an edge.
    A = np.zeros((4, 4), dtype=bool)
    for i, j in [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]:
        A[i, j] = A[j, i] = True
    assert is_chordal(A)
    order = maximum_cardinality_search(A)
    assert sorted(order) == [0, 1, 2, 3]
    assert is_perfectly_ordered(A, order)

    # C4 (4-cycle) is not chordal.
    C4 = np.zeros((4, 4), dtype=bool)
    for i, j in [(0, 1), (1, 2), (2, 3), (3, 0)]:
        C4[i, j] = C4[j, i] = True
    assert not is_chordal(C4)
    assert not is_perfectly_ordered(C4, [0, 1, 2, 3])


# -- scan-compiled supernodal path (conex_tpu/supernodal/scan.py) -----------


SCAN_PATTERNS = [
    ([[0, 1, 2], [2, 3, 4], [4, 5, 6]], 7),
    ([[0, 1], [1, 2], [2, 3], [0, 3]], 4),
    ([[0, 1, 2, 3, 4]], 5),
    ([[0, 1, 4], [1, 2, 4], [2, 3, 4], [0, 5]], 6),
    # heterogeneous supernode/separator sizes exercise the padding
    ([[0, 1, 2, 3, 7, 8], [3, 4, 7], [4, 5, 6, 7, 8], [8, 9]], 10),
]


@pytest.mark.parametrize("cliques,n", SCAN_PATTERNS)
def test_scan_llt_matches_dense(cliques, n):
    from conex_tpu.supernodal import scan as sc

    rng = np.random.default_rng(0)
    G = random_clique_spd(cliques, n, rng)
    b = rng.normal(size=n)
    struct = sc.ScanSupernodalStructure.from_cliques(cliques, n)
    fac, fail = sc.factor_llt(jnp.asarray(G), struct)
    assert not bool(fail)
    x = np.asarray(sc.solve_llt(fac, struct, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(G, b), atol=1e-9)


@pytest.mark.parametrize("cliques,n", SCAN_PATTERNS)
def test_scan_ldlt_matches_dense(cliques, n):
    from conex_tpu.supernodal import scan as sc

    rng = np.random.default_rng(1)
    G = random_clique_spd(cliques, n, rng)
    # indefinite but factorable in fixed order within the pattern
    last = cliques[-1][-1]
    G[last, last] = -G[last, last]
    b = rng.normal(size=n)
    struct = sc.ScanSupernodalStructure.from_cliques(cliques, n)
    fac, fail = sc.factor_ldlt(jnp.asarray(G), struct)
    assert not bool(fail)
    x = np.asarray(sc.solve_ldlt(fac, struct, jnp.asarray(b)))
    np.testing.assert_allclose(x, np.linalg.solve(G, b), atol=1e-7)


def test_scan_matches_unrolled_long_chain():
    """100-clique chain: scan path must agree with the unrolled path (and
    the dense oracle) — this is the compile-time-scaling workload."""
    from conex_tpu.supernodal import scan as sc

    K = 100
    cliques = [[2 * i, 2 * i + 1, 2 * i + 2] for i in range(K)]
    n = 2 * K + 1
    rng = np.random.default_rng(2)
    G = random_clique_spd(cliques, n, rng)
    b = rng.normal(size=n)

    struct_u = SupernodalStructure.from_cliques(cliques, n)
    struct_s = sc.ScanSupernodalStructure.from_structure(struct_u)

    fac_s, fail_s = sc.factor_llt(jnp.asarray(G), struct_s)
    assert not bool(fail_s)
    x_s = np.asarray(sc.solve_llt(fac_s, struct_s, jnp.asarray(b)))
    np.testing.assert_allclose(x_s, np.linalg.solve(G, b), atol=1e-8)


def test_scan_llt_fails_on_indefinite():
    from conex_tpu.supernodal import scan as sc

    n = 4
    G = -np.eye(n)
    struct = sc.ScanSupernodalStructure.from_cliques([[0, 1, 2, 3]], n)
    _, fail = sc.factor_llt(jnp.asarray(G), struct)
    assert bool(fail)


def test_scan_wrapper():
    rng = np.random.default_rng(3)
    cliques = [[0, 1, 2], [2, 3, 4], [4, 5, 6], [6, 7, 8], [8, 9, 0]]
    n = 10
    G = random_clique_spd(cliques, n, rng)
    solver = SupernodalKKTSolver(cliques, n, mode="llt", scan=True)
    assert solver.factor(G)
    b = rng.normal(size=n)
    np.testing.assert_allclose(
        solver.solve(b), np.linalg.solve(G, b), atol=1e-8
    )
