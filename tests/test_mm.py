"""Split-precision matmul ladder (algebra/mm.py) vs f64 oracles.

On CPU the bf16 splits are emulated exactly, so the error ladder is
verifiable here: default-on-f32-inputs is exact f32, x3 must land near
2^-16 relative, x6 near f32 epsilon — measured against an f64 oracle of
the same f32 inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conex_tpu.algebra import mm


@pytest.fixture
def xy():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (96, 96)).astype(np.float32)
    y = rng.uniform(-1, 1, (96, 96)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def _relerr(out, ref):
    out = np.asarray(out, np.float64)
    return np.linalg.norm(out - ref) / np.linalg.norm(ref)


def test_x3_x6_error_ladder(xy):
    x, y = xy
    ref = np.asarray(x, np.float64) @ np.asarray(y, np.float64)

    e3 = _relerr(jax.jit(lambda a, b: mm.matmul(a, b, "x3"))(x, y), ref)
    e6 = _relerr(jax.jit(lambda a, b: mm.matmul(a, b, "x6"))(x, y), ref)
    # pure bf16 single pass for scale
    e1 = _relerr(
        jax.jit(
            lambda a, b: jnp.matmul(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        )(x, y),
        ref,
    )
    # measured on this shape: bf16 ~2e-3, x3 ~4e-6, x6 ~6e-8
    assert e1 > 1e-4
    assert e3 < e1 / 50       # x3 kills the leading error term
    assert e3 < 1e-5
    assert e6 < 3e-7          # ~f32 quality
    assert e6 <= e3


def test_einsum_matches_matmul(xy):
    x, y = xy
    for m in ("default", "x3", "x6"):
        a = mm.einsum("ij,jk->ik", x, y, m)
        b = mm.matmul(x, y, m)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_f64_passthrough():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (32, 32)))  # f64 under x64
    y = jnp.asarray(rng.uniform(-1, 1, (32, 32)))
    if x.dtype != jnp.float64:
        pytest.skip("needs x64")
    out = mm.matmul(x, y, "x3")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x) @ np.asarray(y), rtol=1e-12
    )


def test_mode_context():
    assert mm.get_mode() == "default"
    with mm.mode("x3"):
        assert mm.get_mode() == "x3"
        with mm.mode("x6"):
            assert mm.get_mode() == "x6"
        assert mm.get_mode() == "x3"
    assert mm.get_mode() == "default"
    with pytest.raises(ValueError):
        mm.set_mode("bogus")


# ---------------------------------------------------------------------------
# Ozaki-scheme f64 einsum
# ---------------------------------------------------------------------------


OZAKI_PATTERNS = [
    ("ij,jk->ik", (100, 100), (100, 100)),
    ("ij,jk->ik", (300, 300), (300, 300)),
    ("bvij,bjk->bvik", (2, 5, 100, 100), (2, 100, 100)),
    ("bvik,buki->vu", (2, 5, 100, 100), (2, 5, 100, 100)),  # promotion
    ("v,bvij->bij", (50,), (2, 50, 30, 30)),
    ("bik,bki->", (2, 60, 60), (2, 60, 60)),
]


@pytest.mark.parametrize("pattern,xs,ys", OZAKI_PATTERNS)
def test_ozaki_einsum_accuracy(pattern, xs, ys):
    """Exact-pass slicing must land ~2^-48-class error — far below the
    2^-24 f32-accumulator floor of the x6 ladder (mm.py module notes)."""
    rng = np.random.default_rng(hash(pattern) % 2**31)
    x = jnp.asarray(rng.normal(size=xs) * 10 ** rng.uniform(-2, 2))
    y = jnp.asarray(rng.normal(size=ys) * 10 ** rng.uniform(-2, 2))
    if x.dtype != jnp.float64:
        pytest.skip("needs x64")
    ref = np.einsum(pattern, np.asarray(x), np.asarray(y))
    got = np.asarray(mm._ozaki_einsum(pattern, x, y))
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-300)
    assert rel < 1e-11, rel


def test_ozaki_plan_promotes_long_contractions():
    # K = 8 * 300 * 300 needs promotion before t >= 6 slices are exact.
    plan = mm._OzakiPlan(
        "bvik,buki->vu", (8, 50, 300, 300), (8, 50, 300, 300), 48)
    assert len(plan.promoted) >= 1 and plan.t >= 6
    assert plan.t * plan.s >= 48
    # Small contraction: no promotion, full-width slices.
    plan = mm._OzakiPlan("ij,jk->ik", (64, 64), (64, 64), 48)
    assert plan.promoted == "" and plan.t == 8 and plan.s == 6


def test_ozaki_row_scaling_keeps_small_rows():
    """Per-row scaling: entries whose row/column scales differ by many
    orders of magnitude keep entrywise-relative accuracy (a per-tensor
    scale would truncate the small rows entirely — the endgame KKT
    regime, where the iterate spectrum spans ~1/mu)."""
    rng = np.random.default_rng(5)
    n = 64
    D = 10.0 ** rng.uniform(-9, 9, n)
    X = jnp.asarray(rng.normal(size=(n, n)) * D[:, None])
    Y = jnp.asarray(rng.normal(size=(n, n)) * D[None, :])
    if X.dtype != jnp.float64:
        pytest.skip("needs x64")
    ref = np.einsum("ij,jk->ik", np.asarray(X), np.asarray(Y))
    got = np.asarray(mm._ozaki_einsum("ij,jk->ik", X, Y))
    scales = (np.abs(np.asarray(X)).max(1)[:, None]
              * np.abs(np.asarray(Y)).max(0)[None, :]) * n
    rel = np.abs(got - ref) / np.maximum(scales, 1e-300)
    assert rel.max() < 1e-13, rel.max()


def test_ozaki_mode_dispatch():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(40, 40)))
    y = jnp.asarray(rng.normal(size=(40, 40)))
    if x.dtype != jnp.float64:
        pytest.skip("needs x64")
    with mm.mode("ozaki"):
        out = mm.matmul(x, y)
        oute = mm.einsum("ij,jk->ik", x, y)
    ref = np.asarray(x) @ np.asarray(y)
    assert np.linalg.norm(np.asarray(out) - ref) / np.linalg.norm(ref) < 1e-12
    assert np.linalg.norm(np.asarray(oute) - ref) / np.linalg.norm(ref) < 1e-12
    # f32 operands under "ozaki" route to the x6 ladder (no f64 combine).
    x32, y32 = x.astype(jnp.float32), y.astype(jnp.float32)
    with mm.mode("ozaki"):
        out32 = mm.matmul(x32, y32)
    assert out32.dtype == jnp.float32
