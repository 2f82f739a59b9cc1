"""Split-precision matmul modes for the TPU MXU.

The TPU MXU multiplies in bfloat16 (8 mantissa bits) and accumulates in
f32.  XLA's *default* precision therefore truncates f32 matmul operands to
bf16 — measured ~4e-4 Frobenius relative error on the benchmark Schur
panel, which destroys the positive-definiteness of the Schur complement
long before the reference's 1e-8 duality-gap territory.  XLA's
HIGH/HIGHEST software-emulated f32 passes measured ~200x slower than a
single bf16 pass on this chip — unusable in the hot loop.

This module implements the classical split-precision ladder instead: write
x = hi + lo (+ lo2) with each term a bf16, expand the product, and drop
the smallest cross terms.

    x3: (xh + xl)(yh + yl) ~ xh yh + xh yl + xl yh        — ~2^-16 rel err
    x6: 3-way split, 6 products                           — ~f32 rel err

Each pass is a full-speed MXU bf16 matmul with f32 accumulation, so x3
costs ~3 bf16 passes and x6 ~6 — versus ~200 for XLA HIGHEST.  Every
partial product is wrapped in ``jax.lax.optimization_barrier`` so XLA's
algebraic simplifier cannot re-associate the split back into a single
truncated dot (observed: without barriers the three x3 dots get folded
into one bf16 dot and the result is bit-identical to default precision).

The active mode is a trace-time setting (set it before/while tracing a
jitted function; it is baked into the trace, which is correct because the
solver retraces per static SolverConfig).

reference role: the conex reference is f64 end-to-end on CPU
(cone_program.cc); this ladder is the TPU-native answer to SURVEY.md §7's
"f32 + compensated accumulation for Schur panels" risk item.
"""

from __future__ import annotations

import contextlib
from contextvars import ContextVar

import jax
import jax.numpy as jnp

MODES = ("default", "x3", "x6", "highest", "float32")

_mode: ContextVar[str] = ContextVar("conex_tpu_mm_mode", default="default")


def get_mode() -> str:
    return _mode.get()


def set_mode(m: str) -> None:
    if m not in MODES:
        raise ValueError(f"unknown mm mode {m!r}; valid: {MODES}")
    _mode.set(m)


@contextlib.contextmanager
def mode(m: str):
    if m not in MODES:
        raise ValueError(f"unknown mm mode {m!r}; valid: {MODES}")
    tok = _mode.set(m)
    try:
        yield
    finally:
        _mode.reset(tok)


def _split2(x):
    # The barrier on hi must come BEFORE the subtraction: XLA:TPU's
    # algebraic simplifier pushes the outer bf16 convert through the
    # subtract, folding bf16(x - f32(bf16(x))) to bf16(x) - bf16(x) == 0
    # (observed on-chip: the lo term comes back all-zero without it).
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    lo = (x - hi.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, lo


def _split3(x):
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16))
    r = x - hi.astype(x.dtype)
    mid = jax.lax.optimization_barrier(r.astype(jnp.bfloat16))
    lo = (r - mid.astype(x.dtype)).astype(jnp.bfloat16)
    return hi, mid, lo


def einsum(pattern: str, x, y, mode: str | None = None):
    """Two-operand einsum with the active split-precision mode.

    Modes other than x3/x6 only apply when both operands are f32 (f64
    inputs — the CPU test configuration — always use the native path).
    """
    m = mode if mode is not None else _mode.get()
    f32 = x.dtype == jnp.float32 and y.dtype == jnp.float32
    if m == "default" or not f32:
        return jnp.einsum(pattern, x, y)
    if m == "highest":
        return jnp.einsum(pattern, x, y, precision=jax.lax.Precision.HIGHEST)
    if m == "float32":
        # One f32 pass where the backend supports it natively (CPU); on
        # TPU this is the same HIGHEST software emulation.
        return jnp.einsum(pattern, x, y, precision=jax.lax.Precision.HIGHEST)

    acc = jnp.float32

    def d(a, b):
        return jax.lax.optimization_barrier(
            jnp.einsum(pattern, a, b, preferred_element_type=acc)
        )

    if m == "x3":
        xh, xl = _split2(x)
        yh, yl = _split2(y)
        xh, xl, yh, yl = jax.lax.optimization_barrier((xh, xl, yh, yl))
        return d(xh, yh) + (d(xh, yl) + d(xl, yh))
    if m == "x6":
        xh, xm, xl = _split3(x)
        yh, ym, yl = _split3(y)
        parts = jax.lax.optimization_barrier((xh, xm, xl, yh, ym, yl))
        xh, xm, xl, yh, ym, yl = parts
        return (
            d(xh, yh)
            + (d(xh, ym) + d(xm, yh))
            + (d(xh, yl) + d(xm, ym) + d(xl, yh))
        )
    raise ValueError(f"unknown mm mode {m!r}")


def matmul(x, y, mode: str | None = None):
    """Batched matrix product (..., i, j) @ (..., j, k) with the active
    split-precision mode."""
    m = mode if mode is not None else _mode.get()
    f32 = x.dtype == jnp.float32 and y.dtype == jnp.float32
    if m == "default" or not f32:
        return x @ y
    if m in ("highest", "float32"):
        return jnp.matmul(x, y, precision=jax.lax.Precision.HIGHEST)

    def d(a, b):
        return jax.lax.optimization_barrier(
            jnp.matmul(a, b, preferred_element_type=jnp.float32)
        )

    if m == "x3":
        xh, xl = _split2(x)
        yh, yl = _split2(y)
        xh, xl, yh, yl = jax.lax.optimization_barrier((xh, xl, yh, yl))
        return d(xh, yh) + (d(xh, yl) + d(xl, yh))
    if m == "x6":
        xh, xm, xl = _split3(x)
        yh, ym, yl = _split3(y)
        parts = jax.lax.optimization_barrier((xh, xm, xl, yh, ym, yl))
        xh, xm, xl, yh, ym, yl = parts
        return (
            d(xh, yh)
            + (d(xh, ym) + d(xm, yh))
            + (d(xh, yl) + d(xm, ym) + d(xl, yh))
        )
    raise ValueError(f"unknown mm mode {m!r}")
