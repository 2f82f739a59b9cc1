"""Dev probe round 2 (run on the real chip):

1. bf16x3 split matmul with optimization barriers — test the hypothesis
   that XLA's algebraic simplifier refolds the 3-pass split into one
   default-precision (bf16) dot unless barriers block the rewrite.
2. Padded Pallas Schur kernel variants (single-contraction matmuls only).

Usage: python benchmarks/dev_tpu_probe2.py [part1|part2]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

bf16, f32 = jnp.bfloat16, jnp.float32


def timed(f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return out, best


# ------------------------------- part 1: split precision ------------------
def part1():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (512, 512)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (512, 512)).astype(np.float32))
    x64, y64 = np.asarray(x, np.float64), np.asarray(y, np.float64)
    ref = x64 @ y64

    @jax.jit
    def mm_default(x, y):
        return jnp.dot(x, y)

    @jax.jit
    def mm_x3_naive(x, y):
        xh = x.astype(bf16); xl = (x - xh.astype(f32)).astype(bf16)
        yh = y.astype(bf16); yl = (y - yh.astype(f32)).astype(bf16)
        d = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
        return d(xh, yh) + d(xh, yl) + d(xl, yh)

    @jax.jit
    def mm_x3_barrier(x, y):
        xh = x.astype(bf16); xl = (x - xh.astype(f32)).astype(bf16)
        yh = y.astype(bf16); yl = (y - yh.astype(f32)).astype(bf16)
        xh, xl, yh, yl = jax.lax.optimization_barrier((xh, xl, yh, yl))
        d = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
        p1 = jax.lax.optimization_barrier(d(xh, yh))
        p2 = jax.lax.optimization_barrier(d(xh, yl))
        p3 = jax.lax.optimization_barrier(d(xl, yh))
        return p1 + (p2 + p3)

    @jax.jit
    def mm_x6_barrier(x, y):
        def split3(v):
            h = v.astype(bf16)
            r = v - h.astype(f32)
            m_ = r.astype(bf16)
            l = (r - m_.astype(f32)).astype(bf16)
            return h, m_, l
        xh, xm, xl = split3(x); yh, ym, yl = split3(y)
        parts = jax.lax.optimization_barrier((xh, xm, xl, yh, ym, yl))
        xh, xm, xl, yh, ym, yl = parts
        d = lambda a, b: jax.lax.optimization_barrier(
            jnp.dot(a, b, preferred_element_type=f32))
        return (d(xh, yh) + (d(xh, ym) + d(xm, yh))
                + (d(xh, yl) + d(xm, ym) + d(xl, yh)))

    for name, f in [("default", mm_default), ("x3_naive", mm_x3_naive),
                    ("x3_barrier", mm_x3_barrier), ("x6_barrier", mm_x6_barrier)]:
        out, t = timed(f, x, y)
        err = np.linalg.norm(np.asarray(out, np.float64) - ref) / np.linalg.norm(ref)
        print(f"{name}: fro relerr={err:.2e}  best={t*1e3:.3f} ms", flush=True)


# ------------------------------- part 2: pallas kernels --------------------
def _round_up(x, m):
    return ((x + m - 1) // m) * m


def einsum_schur(A, w, C):
    P = jnp.einsum("bvij,bjk->bvik", A, w)
    CW = C @ w
    G = jnp.einsum("bvik,buki->vu", P, P)
    AW = jnp.einsum("bvii->v", P)
    AQc = jnp.einsum("bik,bvki->v", CW, P)
    w_dot_c = jnp.einsum("bii->", CW)
    c_dot_Qc = jnp.einsum("bik,bki->", CW, CW)
    return G, AW, AQc, w_dot_c, c_dot_Qc


def _kernel_b2(At_ref, w_ref, C_ref, G_ref, AW_ref, AQc_ref, wc_ref, cqc_ref):
    # At layout: (1, n, m, n) with At[0,i,v,j] = A[v,i,j]; n,m padded.
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        G_ref[:] = jnp.zeros_like(G_ref)
        AW_ref[:] = jnp.zeros_like(AW_ref)
        AQc_ref[:] = jnp.zeros_like(AQc_ref)
        wc_ref[:] = jnp.zeros_like(wc_ref)
        cqc_ref[:] = jnp.zeros_like(cqc_ref)

    n, m = At_ref.shape[1], At_ref.shape[2]
    w = w_ref[0]
    At = At_ref[0]  # (n, m, n)
    # Pb[i,v,k] = (A_v W)[i,k]
    Pb = jnp.dot(
        At.reshape(n * m, n), w, preferred_element_type=f32
    ).reshape(n, m, n)
    # Rb[i,u,k] = (W A_u)[i,k]  via w @ At2d with At2d = (n, m*n)
    Rb = jnp.dot(
        w, At.reshape(n, m * n), preferred_element_type=f32
    ).reshape(n, m, n)
    G3 = jax.lax.dot_general(
        Pb, Rb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (n, m, m)
    G_ref[:] += jnp.sum(G3, axis=0)
    CW = jnp.dot(C_ref[0], w, preferred_element_type=f32)
    eyeb = jnp.eye(n, dtype=Pb.dtype)
    AW_ref[:] += jnp.sum(Pb * eyeb[:, None, :], axis=(0, 2))[None, :]
    AQc_ref[:] += jnp.sum(Pb * CW.T[:, None, :], axis=(0, 2))[None, :]
    wc_ref[:] = wc_ref[:] + jnp.trace(CW)[None, None]
    cqc_ref[:] = cqc_ref[:] + jnp.sum(CW * CW.T)[None, None]


def fused_b2(A, w, C):
    B, m, n, _ = A.shape
    n_p = _round_up(n, 128)
    m_p = _round_up(m, 8)
    A = jnp.pad(A, ((0, 0), (0, m_p - m), (0, n_p - n), (0, n_p - n)))
    w = jnp.pad(w, ((0, 0), (0, n_p - n), (0, n_p - n)))
    C = jnp.pad(C, ((0, 0), (0, n_p - n), (0, n_p - n)))
    At = jnp.swapaxes(A, 1, 2)  # (B, n_p, m_p, n_p)
    out = pl.pallas_call(
        _kernel_b2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, n_p, m_p, n_p), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_p, n_p), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_p, n_p), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m_p, m_p), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_p), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_p), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_p, m_p), A.dtype),
            jax.ShapeDtypeStruct((1, m_p), A.dtype),
            jax.ShapeDtypeStruct((1, m_p), A.dtype),
            jax.ShapeDtypeStruct((1, 1), A.dtype),
            jax.ShapeDtypeStruct((1, 1), A.dtype),
        ],
    )(At, w, C)
    G, AW, AQc, wc, cqc = out
    return G[:m, :m], AW[0, :m], AQc[0, :m], wc[0, 0], cqc[0, 0]


def _kernel_a2(A_ref, w_ref, C_ref, G_ref, AW_ref, AQc_ref, wc_ref, cqc_ref):
    # A layout: (1, m, n, n) padded; G via minor-dims transpose + big matmul.
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        G_ref[:] = jnp.zeros_like(G_ref)
        AW_ref[:] = jnp.zeros_like(AW_ref)
        AQc_ref[:] = jnp.zeros_like(AQc_ref)
        wc_ref[:] = jnp.zeros_like(wc_ref)
        cqc_ref[:] = jnp.zeros_like(cqc_ref)

    m, n = A_ref.shape[1], A_ref.shape[2]
    w = w_ref[0]
    A = A_ref[0]
    P3 = jnp.dot(
        A.reshape(m * n, n), w, preferred_element_type=f32
    ).reshape(m, n, n)
    PT3 = jnp.swapaxes(P3, 1, 2)
    G_ref[:] += jnp.dot(
        P3.reshape(m, n * n), PT3.reshape(m, n * n).T,
        preferred_element_type=f32,
    )
    CW = jnp.dot(C_ref[0], w, preferred_element_type=f32)
    eye = jnp.eye(n, dtype=P3.dtype)
    AW_ref[:] += jnp.sum(P3 * eye[None], axis=(1, 2))[None, :]
    AQc_ref[:] += jnp.sum(P3 * CW.T[None], axis=(1, 2))[None, :]
    wc_ref[:] = wc_ref[:] + jnp.trace(CW)[None, None]
    cqc_ref[:] = cqc_ref[:] + jnp.sum(CW * CW.T)[None, None]


def fused_a2(A, w, C):
    B, m, n, _ = A.shape
    n_p = _round_up(n, 128)
    m_p = _round_up(m, 8)
    A = jnp.pad(A, ((0, 0), (0, m_p - m), (0, n_p - n), (0, n_p - n)))
    w = jnp.pad(w, ((0, 0), (0, n_p - n), (0, n_p - n)))
    C = jnp.pad(C, ((0, 0), (0, n_p - n), (0, n_p - n)))
    out = pl.pallas_call(
        _kernel_a2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, m_p, n_p, n_p), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_p, n_p), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_p, n_p), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m_p, m_p), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_p), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_p), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_p, m_p), A.dtype),
            jax.ShapeDtypeStruct((1, m_p), A.dtype),
            jax.ShapeDtypeStruct((1, m_p), A.dtype),
            jax.ShapeDtypeStruct((1, 1), A.dtype),
            jax.ShapeDtypeStruct((1, 1), A.dtype),
        ],
    )(A, w, C)
    G, AW, AQc, wc, cqc = out
    return G[:m, :m], AW[0, :m], AQc[0, :m], wc[0, 0], cqc[0, 0]


def check(name, fn, A, w, C, ref):
    try:
        jf = jax.jit(fn)
        out, t = timed(jf, A, w, C)
    except Exception as e:
        print(f"{name}: FAIL: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    errs = [
        float(jnp.max(jnp.abs(o - r)) / (jnp.max(jnp.abs(r)) + 1e-30))
        for o, r in zip(out, ref)
    ]
    print(f"{name}: OK rel_errs={['%.1e' % e for e in errs]} best={t*1e3:.3f} ms",
          flush=True)


def part2():
    B, m, n = 256, 50, 100
    dtype = np.float32
    rng = np.random.default_rng(0)
    A = rng.uniform(-1, 1, (B, m, n, n)).astype(dtype)
    A = 0.5 * (A + np.swapaxes(A, 2, 3))
    w = rng.uniform(-1, 1, (B, n, n)).astype(dtype)
    w = np.einsum("bij,bkj->bik", w, w) + 0.1 * np.eye(n, dtype=dtype)
    C = np.broadcast_to(np.eye(n, dtype=dtype), (B, n, n)).copy()
    A, w, C = jnp.asarray(A), jnp.asarray(w), jnp.asarray(C)
    print(f"part2 shape B={B} m={m} n={n}", flush=True)
    je = jax.jit(einsum_schur)
    ref, t = timed(je, A, w, C)
    print(f"einsum (default prec): best={t*1e3:.3f} ms", flush=True)
    check("fused_b2", fused_b2, A, w, C, ref)
    check("fused_a2", fused_a2, A, w, C, ref)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("part1", "both"):
        part1()
    if which in ("part2", "both"):
        part2()
