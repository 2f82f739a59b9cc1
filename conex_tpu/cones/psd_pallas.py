"""Fused Pallas Schur-complement kernel for the dense LMI cone.

The XLA einsum formulation of the Schur panel (psd.py::schur) materializes
the panel P = A W of shape (B, m, n, n) in HBM and re-reads it for each of
the G / AW / AQc contractions: at the flagship benchmark shape
(B=256, n=100, m=50, f32) P alone is 512 MB of HBM traffic per direction.
This kernel fuses the whole phase over a grid on the cone batch: each step
loads one cone's operator block into VMEM, forms the panel products on the
MXU, and contracts every output without the panel ever leaving VMEM.

Mosaic (the Pallas TPU compiler) only supports single-contracting-dim
matmuls, and lane-dimension reshapes/transposes require 128-aligned
shapes, so the kernel works on inputs padded to n -> multiple of 128 and
m -> multiple of 8, in the batch-leading layout At[b,i,v,j] = A[b,v,i,j]:

    Pb = (At.(n*m, n)) @ w            -> Pb[i,v,k] = (A_v W)[i,k]
    Rb = w @ (At.(n, m*n))            -> Rb[i,u,k] = (W A_u)[i,k]
    G  = sum_i Pb[i] @ Rb[i]^T        (one batched matmul, batch dim i)
    AW_v  = sum_i Pb[i,v,i]           (masked reduction)
    AQc_v = sum_{i,k} Pb[i,v,k] CW[k,i]

(the first kernel design used a multi-dim dot_general and an unaligned
lane reshape; Mosaic rejects the former at verification and SIGABRTs on
the latter — both discovered on-chip, hence this formulation).

reference: the SCHUR_COMPLEMENT_FUNCTION hot loop,
dense_lmi_constraint.cc:72-103 (the reference's pre-vectorized panel is
the same layout trick; the fusion is the TPU addition).

Used when running on TPU (psd.py dispatches); the einsum path remains the
portable implementation and the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _schur_kernel(At_ref, w_ref, C_ref, G_ref, AW_ref, AQc_ref, wc_ref,
                  cqc_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        G_ref[:] = jnp.zeros_like(G_ref)
        AW_ref[:] = jnp.zeros_like(AW_ref)
        AQc_ref[:] = jnp.zeros_like(AQc_ref)
        wc_ref[:] = jnp.zeros_like(wc_ref)
        cqc_ref[:] = jnp.zeros_like(cqc_ref)

    n, m = At_ref.shape[1], At_ref.shape[2]
    # Compute precision follows the prepared operator's dtype (bf16 when
    # prepare_operator(lo=True) — see its docstring).
    w = w_ref[0].astype(At_ref.dtype)
    At = At_ref[0]  # (n, m, n), At[i,v,j] = A[v,i,j]
    f32 = jnp.float32
    # Pb[i,v,k] = (A_v W)[i,k] — leading-dims reshape only (lane dim kept).
    Pb = jnp.dot(
        At.reshape(n * m, n), w, preferred_element_type=f32
    ).reshape(n, m, n)
    # Rb[i,u,k] = (W A_u)[i,k] — the (n, m*n) reshape merges lanes, legal
    # because n is 128-aligned here.
    Rb = jnp.dot(
        w, At.reshape(n, m * n), preferred_element_type=f32
    ).reshape(n, m, n)
    # G_vu = sum_ik Pb[i,v,k] Rb[i,u,k]: batched matmul over i (single
    # contracting dim k), then reduce the batch axis.
    G3 = jax.lax.dot_general(
        Pb, Rb, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (n, m, m)
    G_ref[:] += jnp.sum(G3, axis=0)
    CW = jnp.dot(C_ref[0].astype(At_ref.dtype), w,
                 preferred_element_type=f32)
    eyeb = jnp.eye(n, dtype=Pb.dtype)
    # AW_v = tr(A_v W) = sum_i Pb[i,v,i]
    AW_ref[:] += jnp.sum(Pb * eyeb[:, None, :], axis=(0, 2))[None, :]
    # AQc_v = tr(C W A_v W) = sum_ik CW[k,i] Pb[i,v,k]
    AQc_ref[:] += jnp.sum(Pb * CW.T[:, None, :], axis=(0, 2))[None, :]
    wc_ref[:] = wc_ref[:] + jnp.trace(CW)[None, None]
    cqc_ref[:] = cqc_ref[:] + jnp.sum(CW * CW.T)[None, None]


def prepare_operator(A, lo=False):
    """Pad (n -> 128-multiple, m -> 8/16-multiple) and transpose A to the
    kernel's batch-leading layout At[b,i,v,j] = A_pad[b,v,i,j].  Called
    once per solve (DenseLMICone.prepare); zero padding is exact — padded
    rows contribute zero rows/columns to every kernel output.

    ``lo=True`` stores At in bfloat16 (m padded to 16 for the bf16 tile):
    Mosaic's f32 matmul truncates operands to bf16 anyway (measured
    3e-4 fro err on-chip, identical error class), so the narrow copy
    halves the kernel's HBM traffic — the dominant per-iteration cost —
    at zero accuracy loss.  The kernel's compute precision follows
    At.dtype, so full-precision modes pass lo=False."""
    B, m, n, _ = A.shape
    n_p = _round_up(n, 128)
    m_p = _round_up(m, 16 if lo else 8)
    if n_p != n:
        A = jnp.pad(A, ((0, 0), (0, 0), (0, n_p - n), (0, n_p - n)))
    if m_p != m:
        A = jnp.pad(A, ((0, 0), (0, m_p - m), (0, 0), (0, 0)))
    At = jnp.swapaxes(A, 1, 2)  # (B, n_p, m_p, n_p)
    return At.astype(jnp.bfloat16) if lo else At


@functools.partial(jax.jit, static_argnames=("interpret",))
def schur_fused(A, w, C, At=None, interpret=False):
    """Fused Schur phase: (G, AW, AQc, w_dot_c, c_dot_Qc) for a batch of
    dense LMIs.  A: (B, m, n, n), w/C: (B, n, n).  ``At``: optional
    precomputed prepare_operator(A) — pass it when calling from inside a
    loop so the pad+transpose is not re-executed per iteration (XLA does
    not reliably hoist it; profiled at 2.5 ms/iter on the bench shape).
    """
    B, m, n, _ = A.shape
    n_p = _round_up(n, 128)
    if At is None:
        At = prepare_operator(A)
    m_p = At.shape[2]
    if n_p != n:
        w = jnp.pad(w, ((0, 0), (0, n_p - n), (0, n_p - n)))
        C = jnp.pad(C, ((0, 0), (0, n_p - n), (0, n_p - n)))
    dtype = w.dtype
    out = pl.pallas_call(
        _schur_kernel,
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
            jax.ShapeDtypeStruct((m_p, m_p), dtype),
            jax.ShapeDtypeStruct((1, m_p), dtype),
            jax.ShapeDtypeStruct((1, m_p), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
            jax.ShapeDtypeStruct((1, 1), dtype),
        ],
        interpret=interpret,
    )(At, w, C)
    G, AW, AQc, wc, cqc = out
    return G[:m, :m], AW[0, :m], AQc[0, :m], wc[0, 0], cqc[0, 0]
