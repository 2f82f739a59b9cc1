"""Tests for the standalone elimination-ordering utilities.

Recipes follow the reference's chordal-graph machinery
(/root/reference/conex/elimination_ordering.{h,cc}: MaximumCardinalitySearch,
IsChordal, IsPerfectlyOrdered) exercised on the classic cases: chordal
graphs admit a perfect elimination ordering found by MCS; the 4-cycle is
the canonical non-chordal graph; eliminating along a perfect order adds no
fill-in, eliminating a chordless cycle does.
"""

import numpy as np
import pytest

from conex_tpu.supernodal.elimination import (
    eliminate,
    is_chordal,
    is_perfectly_ordered,
    maximum_cardinality_search,
)


def _adj(n, edges):
    A = np.zeros((n, n), dtype=bool)
    for i, j in edges:
        A[i, j] = A[j, i] = True
    return A


def _cycle(n):
    return _adj(n, [(i, (i + 1) % n) for i in range(n)])


def _chordal_example():
    # A 5-cycle fully triangulated from vertex 0 — chordal by construction.
    return _adj(5, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (0, 2), (0, 3)])


def test_mcs_on_chordal_graph_is_perfect():
    A = _chordal_example()
    order = maximum_cardinality_search(A)
    assert sorted(order) == list(range(5))
    assert is_perfectly_ordered(A, order)
    assert is_chordal(A)


def test_tree_is_chordal():
    # Trees are trivially chordal (no cycles at all).
    A = _adj(6, [(0, 1), (0, 2), (1, 3), (1, 4), (2, 5)])
    assert is_chordal(A)


def test_complete_graph_any_order_perfect():
    n = 5
    A = ~np.eye(n, dtype=bool)
    rng = np.random.default_rng(0)
    for _ in range(3):
        order = rng.permutation(n).tolist()
        assert is_perfectly_ordered(A, order)
    assert is_chordal(A)


@pytest.mark.parametrize("n", [4, 5, 6])
def test_chordless_cycle_not_chordal(n):
    A = _cycle(n)
    assert not is_chordal(A)
    # And no ordering at all is perfect for the 4-cycle (exhaustive).
    if n == 4:
        import itertools

        assert not any(
            is_perfectly_ordered(A, p)
            for p in itertools.permutations(range(4))
        )


def test_triangulated_cycle_is_chordal():
    # Adding one chord to the 4-cycle makes it chordal.
    A = _cycle(4)
    A[0, 2] = A[2, 0] = True
    assert is_chordal(A)


def test_eliminate_no_fill_along_perfect_order():
    A = _chordal_example()
    order = maximum_cardinality_search(A)
    G = A.copy()
    for v in order:
        before = G.copy()
        G = eliminate(G, v)
        # No fill-in: every edge in G already existed (minus row/col v).
        added = G & ~before
        assert not added.any()


def test_eliminate_adds_fill_on_cycle():
    # Eliminating any vertex of the chordless 4-cycle connects its two
    # neighbors — one new edge of fill-in.
    A = _cycle(4)
    G = eliminate(A, 0)
    assert G[1, 3] and G[3, 1]
    # The remaining graph on {1,2,3} is a triangle — now chordal.
    assert is_chordal(G[1:, 1:])


def test_mcs_order_covers_disconnected_graph():
    A = _adj(4, [(0, 1), (2, 3)])
    order = maximum_cardinality_search(A)
    assert sorted(order) == [0, 1, 2, 3]
    assert is_chordal(A)
