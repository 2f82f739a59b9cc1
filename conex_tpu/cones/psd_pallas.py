"""Fused Pallas Schur-complement kernel for the dense LMI cone.

The XLA einsum formulation of the Schur panel (psd.py::schur) materializes
the panel P = A W of shape (B, m, n, n) in HBM and re-reads it for each of
the G / AW / AQc contractions: at the flagship benchmark shape
(B=256, n=100, m=50, f32) P alone is 512 MB, and the measured schur phase
(6.7 ms of the 12.3 ms Newton iteration) is HBM-bandwidth-bound on that
traffic — not MXU-bound.

This kernel fuses the whole phase over a grid on the cone batch: each step
loads one cone's operator block A_b (m*n^2 floats) into VMEM, forms
P_b = A_b W_b with one (m*n, n) x (n, n) MXU matmul, and immediately
contracts every output —

    G   += P2 @ P2t.T          (P2[v,(i,k)] = P[v,i,k], P2t[u,(i,k)] = P[u,k,i])
    AW  += diag-sum of P_b     (tr A_v W)
    AQc += <P_v, CW^T>         (tr C W A_v W)
    w.c += tr CW,   c.Qc += <CW, CW^T>

— so P never leaves VMEM.  HBM traffic drops to one read of A (+ w, C) and
the tiny outputs.  reference: the SCHUR_COMPLEMENT_FUNCTION hot loop,
dense_lmi_constraint.cc:72-103 (the reference's pre-vectorized panel is the
same layout trick; the fusion is the TPU addition).

Used when running on TPU (psd.py dispatches); the einsum path remains the
portable implementation and the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _schur_kernel(A_ref, w_ref, C_ref, G_ref, AW_ref, AQc_ref, wc_ref,
                  cqc_ref):
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
    A = A_ref[0]  # (m, n, n)

    # P = A W: one (m*n, n) x (n, n) MXU matmul.
    P = jnp.dot(
        A.reshape(m * n, n), w, preferred_element_type=jnp.float32
    ).reshape(m, n, n)
    CW = jnp.dot(C_ref[0], w, preferred_element_type=jnp.float32)

    # G_vu = sum_ik P[v,i,k] P[u,k,i] — multi-dim contraction, no reshape
    # (Mosaic rejects (m, n, n) -> (m, n^2) shape casts for unaligned n).
    G_ref[:] += jax.lax.dot_general(
        P, P, (((1, 2), (2, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    eye = jnp.eye(n, dtype=P.dtype)
    AW_ref[:] += jnp.sum(P * eye[None], axis=(1, 2))[None, :]
    CWt = CW.T
    AQc_ref[:] += jnp.sum(P * CWt[None], axis=(1, 2))[None, :]
    wc_ref[:] = wc_ref[:] + jnp.sum(CW * eye)
    cqc_ref[:] = cqc_ref[:] + jnp.sum(CW * CWt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def schur_fused(A, w, C, interpret=False):
    """Fused Schur phase: (G, AW, AQc, w_dot_c, c_dot_Qc) for a batch of
    dense LMIs.  A: (B, m, n, n), w/C: (B, n, n)."""
    B, m, n, _ = A.shape
    dtype = A.dtype
    grid = (B,)
    out = pl.pallas_call(
        _schur_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, m, n, n), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda b: (b, 0, 0),
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
            jax.ShapeDtypeStruct((m, m), dtype),
            jax.ShapeDtypeStruct((1, m), dtype),
            jax.ShapeDtypeStruct((1, m), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        interpret=interpret,
    )(A, w, C)
    G, AW, AQc, wc, cqc = out
    return G, AW[0], AQc[0], wc[0, 0], cqc[0, 0]
