"""Dev probe: fused Schur kernel variants on the real TPU chip.

Tests correctness (vs the einsum oracle) and speed of candidate Pallas
formulations of G_vu = tr(A_v W A_u W) that use only single-contraction
matmuls (Mosaic's tpu.matmul rejects multi-dim contractions).

Run on the real chip:  python benchmarks/dev_pallas_probe.py
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def einsum_schur(A, w, C):
    P = jnp.einsum("bvij,bjk->bvik", A, w)
    CW = C @ w
    G = jnp.einsum("bvik,buki->vu", P, P)
    AW = jnp.einsum("bvii->v", P)
    AQc = jnp.einsum("bik,bvki->v", CW, P)
    w_dot_c = jnp.einsum("bii->", CW)
    c_dot_Qc = jnp.einsum("bik,bki->", CW, CW)
    return G, AW, AQc, w_dot_c, c_dot_Qc


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# ---------------- Variant A: pad + minor-dims transpose + one big matmul ----
def _kernel_a(A_ref, w_ref, C_ref, G_ref, AW_ref, AQc_ref, wc_ref, cqc_ref):
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
        A.reshape(m * n, n), w, preferred_element_type=jnp.float32
    ).reshape(m, n, n)
    PT3 = jnp.swapaxes(P3, 1, 2)
    G_ref[:] += jnp.dot(
        P3.reshape(m, n * n), PT3.reshape(m, n * n).T,
        preferred_element_type=jnp.float32,
    )
    CW = jnp.dot(C_ref[0], w, preferred_element_type=jnp.float32)
    eye = jnp.eye(n, dtype=P3.dtype)
    AW_ref[:] += jnp.sum(P3 * eye[None], axis=(1, 2))[None, :]
    CWt = CW.T
    AQc_ref[:] += jnp.sum(P3 * CWt[None], axis=(1, 2))[None, :]
    wc_ref[:] = wc_ref[:] + jnp.sum(CW * eye)
    cqc_ref[:] = cqc_ref[:] + jnp.sum(CW * CWt)


# ---------------- Variant B: batch-leading batched matmul -------------------
def _kernel_b(At_ref, w_ref, C_ref, G_ref, AW_ref, AQc_ref, wc_ref, cqc_ref):
    # At layout: (1, n, m, n) with At[0,i,v,j] = A[v,i,j]
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
    # Pb[i,v,k] = sum_j A[v,i,j] w[j,k] = (A_v W)[i,k]
    Pb = jnp.dot(
        At.reshape(n * m, n), w, preferred_element_type=jnp.float32
    ).reshape(n, m, n)
    # Rb[i,u,k] = sum_j w[i,j] A[u,j,k] = (W A_u)[i,k]
    Rb = jnp.dot(
        w, At.reshape(n, m * n), preferred_element_type=jnp.float32
    ).reshape(n, m, n)
    # G_vu = sum_i sum_k Pb[i,v,k] Rb[i,u,k]
    G3 = jax.lax.dot_general(
        Pb, Rb, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (n, m, m)
    G_ref[:] += jnp.sum(G3, axis=0)
    CW = jnp.dot(C_ref[0], w, preferred_element_type=jnp.float32)
    # AW_v = tr(A_v W) = sum_i Pb[i, v, i]
    eyeb = jnp.eye(n, dtype=Pb.dtype)  # mask over (i, k)
    AW_ref[:] += jnp.sum(Pb * eyeb[:, None, :], axis=(0, 2))[None, :]
    # AQc_v = tr(C W A_v W) = sum_ik CW[k,i]... tr(CW * P_v) with
    # P_v[i,k] = Pb[i,v,k]:   sum_ik CW^T[i,k]... tr(C W A_v W)
    # = sum_{i,k} (CW)[k,i] Pb[i,v,k]
    AQc_ref[:] += jnp.sum(Pb * CW.T[:, None, :], axis=(0, 2))[None, :]
    wc_ref[:] = wc_ref[:] + jnp.trace(CW)
    cqc_ref[:] = cqc_ref[:] + jnp.sum(CW * CW.T)


def fused_a(A, w, C, pad_to=128):
    B, m, n, _ = A.shape
    np_ = _round_up(n, pad_to)
    if np_ != n:
        A = jnp.pad(A, ((0, 0), (0, 0), (0, np_ - n), (0, np_ - n)))
        w = jnp.pad(w, ((0, 0), (0, np_ - n), (0, np_ - n)))
        C = jnp.pad(C, ((0, 0), (0, np_ - n), (0, np_ - n)))
    out = pl.pallas_call(
        _kernel_a,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, m, np_, np_), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, np_), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, np_), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m, m), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, m), A.dtype),
            jax.ShapeDtypeStruct((1, m), A.dtype),
            jax.ShapeDtypeStruct((1, m), A.dtype),
            jax.ShapeDtypeStruct((1, 1), A.dtype),
            jax.ShapeDtypeStruct((1, 1), A.dtype),
        ],
    )(A, w, C)
    G, AW, AQc, wc, cqc = out
    return G, AW[0], AQc[0], wc[0, 0], cqc[0, 0]


def fused_b(A, w, C, pad_to=128):
    B, m, n, _ = A.shape
    np_ = _round_up(n, pad_to)
    if np_ != n:
        A = jnp.pad(A, ((0, 0), (0, 0), (0, np_ - n), (0, np_ - n)))
        w = jnp.pad(w, ((0, 0), (0, np_ - n), (0, np_ - n)))
        C = jnp.pad(C, ((0, 0), (0, np_ - n), (0, np_ - n)))
    At = jnp.swapaxes(A, 1, 2)  # (B, n, m, n)
    out = pl.pallas_call(
        _kernel_b,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, np_, m, np_), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, np_), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_, np_), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m, m), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, m), A.dtype),
            jax.ShapeDtypeStruct((1, m), A.dtype),
            jax.ShapeDtypeStruct((1, m), A.dtype),
            jax.ShapeDtypeStruct((1, 1), A.dtype),
            jax.ShapeDtypeStruct((1, 1), A.dtype),
        ],
    )(A, w, C)
    G, AW, AQc, wc, cqc = out
    return G, AW[0], AQc[0], wc[0, 0], cqc[0, 0]


def check(name, fn, A, w, C, ref):
    try:
        jf = jax.jit(fn)
        out = jf(A, w, C)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name}: COMPILE/RUN FAIL: {type(e).__name__}: {str(e)[:300]}")
        return None
    errs = [
        float(jnp.max(jnp.abs(o - r)) / (jnp.max(jnp.abs(r)) + 1e-30))
        for o, r in zip(out, ref)
    ]
    # time
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(jf(A, w, C))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: OK rel_errs={['%.2e' % e for e in errs]} best={best*1e3:.3f} ms")
    return best


def main():
    B, m, n = 256, 50, 100
    if len(sys.argv) > 1:
        B, m, n = (int(x) for x in sys.argv[1].split(","))
    dtype = np.float32
    rng = np.random.default_rng(0)
    A = rng.uniform(-1, 1, (B, m, n, n)).astype(dtype)
    A = 0.5 * (A + np.swapaxes(A, 2, 3))
    w = rng.uniform(-1, 1, (B, n, n)).astype(dtype)
    w = np.einsum("bij,bkj->bik", w, w) + 0.1 * np.eye(n, dtype=dtype)
    C = np.broadcast_to(np.eye(n, dtype=dtype), (B, n, n)).copy()
    A, w, C = jnp.asarray(A), jnp.asarray(w), jnp.asarray(C)

    print(f"shape B={B} m={m} n={n}, backend={jax.default_backend()}")
    je = jax.jit(einsum_schur)
    ref = je(A, w, C)
    jax.block_until_ready(ref)
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(je(A, w, C))
        best = min(best, time.perf_counter() - t0)
    print(f"einsum oracle: best={best*1e3:.3f} ms")

    check("fused_a (pad+transpose+big matmul)", fused_a, A, w, C, ref)
    check("fused_b (batch-leading batched mm)", fused_b, A, w, C, ref)


if __name__ == "__main__":
    main()
