"""Fused batched-SOCP solver: the whole geodesic IPM in ONE Pallas kernel.

The general path (parallel/sharded.solve_scenarios) vmaps the jitted solve
loop over scenarios; XLA compiles each Newton iteration into tens of small
kernels whose launch latency (~2.5 ms per iteration regardless of batch
size) dominates for tiny cones — the reference's sequential CPU solver
(soc_constraint.cc hot path measured by baseline/bench_reference.cc) was only
beaten ~5x at 10k scenarios.  This module removes the dispatch floor by
compiling the ENTIRE solve — Schur assembly, Cholesky factorization,
divergence-based mu selection, the Newton solve, the geodesic step, the
termination state machine, and dual recovery — into one Pallas TPU kernel
per block of scenarios.

Layout: scenarios ride the trailing TWO axes as (Bs, 128) so per-scenario
scalars fill whole (8,128) vector registers (a flat (1, B) lane layout
wastes 7/8 sublanes); problem dimensions (cones nc, cone dim n+1,
variables m) are leading axes reduced with static-shape ops.

Semantics replicate conex_tpu.solver.loop._solve_impl (itself a port of
/root/reference/conex/cone_program.cc:235-533) restricted to programs that
are a batch of Lorentz-cone constraints:

  * cone blocks: one SOCCone batch (nc cones of dim n+1 per scenario),
  * no equality constraints (KKT system is the m x m Schur complement, LLT),
  * divergence-bound mu updates (the reference SOC kernel has no line
    search: constraint.h:24-28 makes line-search mode a no-op for SOC),
  * coldstart initialization.

Mosaic restrictions honored throughout (found the hard way): no i1 vectors
through while_loop carries or region boundaries, no select_n between i1
vectors, no scalar-i1-to-vector broadcasts, no scatter/dynamic-store ops.

Tests pin trajectory equality (sqrt(1/mu) per iteration, iteration counts,
primal solutions, final iterates) against the general path.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import KKT_SOLVER_LLT, WARMSTART, SolverConfig
from ..solver.mu import SlackAgg, mu_from_divergence

LANES = 128


class FusedSOCPResult(NamedTuple):
    """Mirror of solver.loop.SolveResult for the fused path (reduced stats:
    the two series the reference exposes through CONEX_GetIterationStats,
    interfaces/conex.cc:259-285)."""

    y: jnp.ndarray  # (S, m) primal solution (unscaled)
    solved: jnp.ndarray  # (S,) bool
    primal_infeasible: jnp.ndarray  # (S,) bool
    dual_infeasible: jnp.ndarray  # (S,) bool
    num_iterations: jnp.ndarray  # (S,) int32
    w: jnp.ndarray  # (S, nc, n+1) final cone iterates / duals
    y_kkt: jnp.ndarray  # (S, m) raw final KKT solution
    k: jnp.ndarray  # (S,) final inv_sqrt_mu
    warmstart_aborted: jnp.ndarray  # (S,) bool
    b_scaling: jnp.ndarray  # (S,)
    c_scaling: jnp.ndarray  # (S,)
    stats_k: jnp.ndarray  # (S, T) sqrt_inv_mu per iteration
    stats_dinf: jnp.ndarray  # (S, T) norm_inf_d per iteration
    fail: jnp.ndarray  # (S,) bool
    mu_stalled: jnp.ndarray  # (S,) bool


# ---------------------------------------------------------------------------
# Batch-last spin-factor algebra (spin dimension at a given axis, scenarios
# along the trailing (Bs, 128) axes).  Mirrors conex_tpu/algebra/spin.py.
# ---------------------------------------------------------------------------


def _head_tail(x, ax):
    head = jax.lax.slice_in_dim(x, 0, 1, axis=ax)
    tail = jax.lax.slice_in_dim(x, 1, x.shape[ax], axis=ax)
    return head, tail


def _qrep(x, y, ax):
    """Q(x) y = 2 <x,y> x - det(x) R y (soc_constraint.cc:130-143)."""
    dot = jnp.sum(x * y, axis=ax, keepdims=True)
    xh, xt = _head_tail(x, ax)
    detx = xh * xh - jnp.sum(xt * xt, axis=ax, keepdims=True)
    yh, yt = _head_tail(y, ax)
    minus_ry = jnp.concatenate([-yh, yt], axis=ax)
    return 2.0 * dot * x + detx * minus_ry


def _spectral(x, fn, ax):
    h, t = _head_tail(x, ax)
    nq = jnp.sqrt(jnp.sum(t * t, axis=ax, keepdims=True))
    qhat = jnp.where(nq > 0, t / jnp.where(nq == 0, 1.0, nq), 0.0)
    f1 = fn(h + nq)
    f2 = fn(h - nq)
    return jnp.concatenate([0.5 * (f1 + f2), 0.5 * (f1 - f2) * qhat], axis=ax)


def _eigs(x, ax):
    """(lam_plus, lam_minus), each with a size-1 slot at ``ax``."""
    h, t = _head_tail(x, ax)
    nq = jnp.sqrt(jnp.sum(t * t, axis=ax, keepdims=True))
    return h + nq, h - nq


def _identity_like(x, ax):
    """The spin-factor identity e = (1, 0, ..., 0) shaped like ``x``."""
    h, t = _head_tail(x, ax)
    return jnp.concatenate([jnp.ones_like(h), jnp.zeros_like(t)], axis=ax)


# ---------------------------------------------------------------------------
# Unrolled batched dense Cholesky on (m, m, Bs, 128) + triangular solves.
# m is tiny (the variable count of one scenario); scenarios ride the
# trailing register tiles.
# ---------------------------------------------------------------------------


def _chol(G):
    m = G.shape[0]
    L = jnp.zeros_like(G)
    fail = jnp.zeros(G.shape[2:], dtype=bool)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1, 1), 1)
    for j in range(m):
        if j:
            acc = jnp.sum(L[:, :j] * L[j : j + 1, :j], axis=1)
        else:
            acc = jnp.zeros_like(G[:, 0])
        col = G[:, j] - acc  # (m, Bs, 128)
        pj = col[j]  # (Bs, 128)
        fail = fail | ~(pj > 0) | ~jnp.isfinite(pj)
        d = jnp.sqrt(jnp.where(pj > 0, pj, 1.0))
        newcol = jnp.where(rows == j, d, jnp.where(rows > j, col / d, 0.0))
        # Masked column write (Mosaic has no scatter lowering).
        L = jnp.where(cols == j, newcol[:, None], L)
    return L, fail


def _chol_solve(L, r):
    """Solve L L^T x = r, r: (m, Bs, 128)."""
    m = L.shape[0]
    xs = []
    for j in range(m):
        s = r[j]
        for t in range(j):
            s = s - L[j, t] * xs[t]
        xs.append(s / L[j, j])
    ys = [None] * m
    for j in reversed(range(m)):
        s = xs[j]
        for t in range(j + 1, m):
            s = s - L[t, j] * ys[t]
        ys[j] = s / L[j, j]
    return jnp.stack(ys, axis=0)


def _matvec(G, x):
    """G @ x with G: (m, m, Bs, 128), x: (m, Bs, 128)."""
    return jnp.sum(G * x[None], axis=1)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _make_kernel(config: SolverConfig, nc: int, n1: int, m: int, rank: float):
    T = config.max_iterations
    fc_steps = config.final_centering_steps
    warmstart = config.initialization_mode == WARMSTART
    init_centering = (
        config.initial_centering_steps_warmstart
        if warmstart
        else config.initial_centering_steps_coldstart
    )
    refine = config.iterative_refinement_iterations
    k_min_clamp = math.sqrt(1.0 / (1e-15 + config.maximum_mu))

    def solve_kkt(L, G, rhs):
        x = _chol_solve(L, rhs)
        for _ in range(refine):
            x = x + _chol_solve(L, rhs - _matvec(G, x))
        return x

    def assemble(A, cvec, w):
        """SOC Schur-complement contributions (soc_constraint.cc:272-303),
        summed over the nc cones of each scenario."""
        wsqrt = _spectral(w, jnp.sqrt, 1)  # (nc, n1, Bs, 128)
        WA = _qrep(wsqrt[:, :, None], A, 1)  # (nc, n1, m, Bs, 128)
        WsqrtC = _qrep(wsqrt, cvec, 1)  # (nc, n1, Bs, 128)
        Gcols = [
            2.0 * jnp.sum(WA * WA[:, :, u : u + 1], axis=(0, 1))
            for u in range(m)
        ]
        G = jnp.stack(Gcols, axis=1)  # (m, m, Bs, 128); symmetric
        AW = 2.0 * jnp.sum(A * w[:, :, None], axis=(0, 1))  # (m, Bs, 128)
        AQc = 2.0 * jnp.sum(WA * WsqrtC[:, :, None], axis=(0, 1))
        w_dot_c = 2.0 * jnp.sum(WsqrtC[:, 0], axis=0)  # (Bs, 128)
        c_dot_Qc = 2.0 * jnp.sum(WsqrtC * WsqrtC, axis=(0, 1))
        return wsqrt, G, AW, AQc, w_dot_c, c_dot_Qc

    def minus_slack(A, cvec, y, c_weight):
        """A^T y - k c per cone (soc_constraint.cc:193-197)."""
        Ay = jnp.sum(A * y[None, None], axis=2)  # (nc, n1, Bs, 128)
        return Ay - c_weight[None, None] * cvec

    def slack_agg(wsqrt, A, cvec, y, c_weight, dtype):
        """GetWeightedSlackEigenvalues aggregation (cone_program.cc:31-57)."""
        ws = _qrep(wsqrt, minus_slack(A, cvec, y, c_weight), 1)
        ev1, ev2 = _eigs(ws, 1)  # (nc, 1, Bs, 128) each
        lam_max_c = -jnp.minimum(ev1, ev2)[:, 0]  # (nc, Bs, 128)
        lam_min_c = -jnp.maximum(ev1, ev2)[:, 0]
        lam_min = jnp.minimum(
            jnp.asarray(30000.0, dtype), jnp.min(lam_min_c, axis=0)
        )
        lam_max = jnp.maximum(
            jnp.asarray(-30000.0, dtype), jnp.max(lam_max_c, axis=0)
        )
        frob_sq = jnp.sum(lam_max_c**2 + lam_min_c**2, axis=0)
        trace = jnp.sum(lam_max_c + lam_min_c, axis=0)
        return SlackAgg(
            lam_min=lam_min, lam_max=lam_max, frob_sq=frob_sq, trace=trace
        )

    def kernel(
        A_ref, c_ref, b_ref, w0_ref, k0_ref, bsc0_ref, csc0_ref,
        # outputs
        y_ref, w_ref, k_ref, kmax_ref, bsc_ref, csc_ref, by_ref, cx_ref,
        fail_ref, mir_ref, stall_ref, niter_ref, abort_ref,
        statk_ref, statd_ref,
    ):
        A = A_ref[:]  # (nc, n1, m, Bs, 128)
        cvec = c_ref[:]  # (nc, n1, Bs, 128)
        bvec = b_ref[:]  # (m, Bs, 128)
        dtype = A.dtype
        Bs = A.shape[-2]

        one = jnp.ones((Bs, LANES), dtype)
        zero = jnp.zeros((Bs, LANES), dtype)
        izero = jnp.zeros((Bs, LANES), jnp.int32)

        iota_T = jax.lax.broadcasted_iota(jnp.int32, (T, 1, 1), 0)

        def vmask(scalar_bool):
            """Broadcast a scalar predicate to a (Bs, 128) mask via int32
            (Mosaic cannot broadcast i1 scalars into vectors directly)."""
            return (izero + scalar_bool.astype(jnp.int32)) != 0

        # Booleans are carried as int32: Mosaic cannot round-trip i1
        # vectors through while_loop regions (i8->i1 trunc unsupported).
        def body(carry):
            (g, w, y, k, k_max, b_sc, c_sc, kkt_err, centering,
             by, cx, d_inf, done_i, fail_i, mir_i, num_iter, stall,
             aborted_i, stats_k, stats_d) = carry
            done = done_i != 0
            fail = fail_i != 0
            mir = mir_i != 0
            aborted = aborted_i != 0
            active = ~done

            # --- break-before-assemble (cone_program.cc:331-336) ---
            final_c_pre = (
                (k >= k_max)
                | (kkt_err > config.kkt_error_tolerance)
                | vmask(g >= config.max_iterations - fc_steps)
            )
            stop_centering = final_c_pre & (centering >= fc_steps)
            if config.fixed_iterations:
                stop_centering = izero != 0
            mark = active & stop_centering
            done = done | mark
            # logic, not select_n: Mosaic cannot select between i1 vectors
            mir = (mark & vmask(g >= config.max_iterations - 1)) | (
                ~mark & mir
            )
            run = active & ~stop_centering

            # --- run_iteration (cone_program.cc:311-483) ---
            initial_centering = vmask(g < init_centering)
            final_centering = final_c_pre
            update_mu = (
                vmask(g == 0)
                | (~(initial_centering | final_centering))
                | aborted
            )

            wsqrt, G, AW, AQc, w_dot_c, c_dot_Qc = assemble(A, cvec, w)

            if config.enable_rescaling:
                do_rescale = vmask(g < 1)
                if warmstart:
                    # warmstart keeps the caller's scalings
                    # (cone_program.cc:343-357 / loop.py:318-330)
                    b_sc_n, c_sc_n = b_sc, c_sc
                else:
                    bnorm = jnp.sqrt(jnp.sum(bvec * bvec, axis=0))
                    cnorm = jnp.sqrt(jnp.sum(AQc * AQc, axis=0))
                    b_sc_n = jnp.where(do_rescale, 1.0 / (1.0 + bnorm), b_sc)
                    c_sc_n = jnp.where(do_rescale, 1.0 / (1.0 + cnorm), c_sc)
                mu_target = (1.0 / (k_max * k_max)) * b_sc_n * c_sc_n
                k_max_n = jnp.where(do_rescale, 1.0 / jnp.sqrt(mu_target), k_max)
            else:
                b_sc_n, c_sc_n, k_max_n = b_sc, c_sc, k_max

            L, fac_fail = _chol(G)

            # factor-fail branch (coldstart): done+fail (cone_program.cc:
            # 360-371); merged by masking at the end of the body.
            AQc_s = AQc * c_sc_n
            b_s_vec = bvec * b_sc_n[None]

            # --- mu update (divergence mode, cone_program.cc:374-398) ---
            ydiv = solve_kkt(L, G, AQc_s - b_s_vec)
            p = slack_agg(wsqrt, A, cvec, ydiv, c_sc_n, dtype)
            temp = mu_from_divergence(p, rank, config.divergence_upper_bound)
            k_mu = jnp.where(temp > 0, temp, k * 0.5)
            k_new = jnp.where(update_mu, k_mu, k)
            centering_new = jnp.where(
                update_mu,
                centering,
                centering + jnp.where(initial_centering, 0, 1),
            )
            k_new = jnp.clip(k_new, k_min_clamp, k_max_n)

            # --- Newton solve + step (cone_program.cc:409-436) ---
            y_new = solve_kkt(
                L, G, k_new[None] * (b_s_vec + AQc_s) - 2.0 * AW
            )
            c_weight = k_new * c_sc_n
            d = _qrep(wsqrt, minus_slack(A, cvec, y_new, c_weight), 1)
            dh, dt = _head_tail(d, 1)
            d = jnp.concatenate([dh + 1.0, dt], axis=1)  # d += e
            ev1, ev2 = _eigs(d, 1)
            norminf = jnp.max(
                jnp.maximum(jnp.abs(ev1), jnp.abs(ev2))[:, 0], axis=0
            )
            normsq = 2.0 * jnp.sum(d * d, axis=(0, 1))
            step_size = jnp.minimum(1.0, 2.0 / (norminf * norminf))
            expd = _spectral(step_size[None, None] * d, jnp.exp, 1)
            w_new = _qrep(wsqrt, expd, 1)

            # --- Warmstart abort on large first step (cone_program.cc:
            # 428-436): reset the iterate to identity, keep everything
            # else from the iteration; forces a mu update next iteration.
            if warmstart:
                ws_abort = vmask(g == 0) & (
                    norminf >= config.warmstart_abort_threshold
                )
                w_new = jnp.where(
                    ws_abort[None, None], _identity_like(w_new, 1), w_new
                )
            else:
                ws_abort = izero != 0

            # --- statistics (cone_program.cc:439-471) ---
            d_2sq = jnp.abs(normsq)
            d_inf_new = jnp.abs(norminf)
            by_new = jnp.sum(bvec * y_new, axis=0) / (k_new * c_sc_n)
            cx_new = (
                2.0 * w_dot_c
                + jnp.sum(AQc * y_new, axis=0)
                - k_new * c_dot_Qc * c_sc_n
            ) / (k_new * b_sc_n)
            mu = 1.0 / (k_new * k_new)
            s_dot_x = mu * (rank - d_2sq) / (b_sc_n * c_sc_n)
            kkt_err_new = jnp.abs(cx_new - by_new - s_dot_x) / s_dot_x

            stop = (final_centering | (k_new >= k_max_n)) & (
                d_inf_new <= config.final_centering_tolerance
            )
            if config.fixed_iterations:
                stop = izero != 0

            if config.mu_stall_iterations > 0 and not config.fixed_iterations:
                rel = jnp.abs(k_new - k) / jnp.maximum(jnp.abs(k), 1e-30)
                stalled_now = (
                    update_mu
                    & ~final_centering
                    & vmask(g > 0)
                    & (rel < config.mu_stall_tolerance)
                )
                stall_new = jnp.where(stalled_now, stall + 1, izero)
                stop = stop | (stall_new >= config.mu_stall_iterations)
            else:
                stall_new = stall

            # --- merge: run lanes take the iteration, factor-fail lanes
            # abort (or, first-iteration warmstart, reset to identity and
            # continue: cone_program.cc:360-371), frozen lanes keep state ---
            ok = run & ~fac_fail
            ffail = run & fac_fail
            if warmstart:
                abort_f = ffail & vmask(g == 0)
            else:
                abort_f = ffail & (izero != 0)
            ffail = ffail & ~abort_f

            def sel(mask, new, old):
                return jnp.where(mask, new, old)

            w = jnp.where(
                ok[None, None],
                w_new,
                jnp.where(abort_f[None, None], _identity_like(w, 1), w),
            )
            y = jnp.where(ok[None], y_new, y)
            k = sel(ok, k_new, k)
            k_max = sel(run, k_max_n, k_max)
            b_sc = sel(run, b_sc_n, b_sc)
            c_sc = sel(run, c_sc_n, c_sc)
            kkt_err = sel(ok, kkt_err_new, kkt_err)
            centering = jnp.where(ok, centering_new, centering)
            by = sel(ok, by_new, by)
            cx = sel(ok, cx_new, cx)
            d_inf = sel(ok, d_inf_new, d_inf)
            done = done | (ok & stop) | ffail
            fail = fail | ffail
            mir = mir & ~(ok & stop)
            num_iter = jnp.where(ok, g + 1, num_iter)
            stall = jnp.where(ok, stall_new, stall)
            # one-iteration flag (loop.py:453,490): set on the aborting
            # iteration, cleared by the next completed iteration.
            aborted = (ok & ws_abort) | abort_f | (~(ok | ffail) & aborted)
            # One-hot row write via float masks (no dynamic-slice stores,
            # and no i1 sublane-broadcasts).
            rowf = (iota_T == g).astype(dtype) * ok.astype(dtype)[None]
            stats_k = stats_k * (1.0 - rowf) + k[None] * rowf
            stats_d = stats_d * (1.0 - rowf) + d_inf[None] * rowf

            return (g + 1, w, y, k, k_max, b_sc, c_sc, kkt_err,
                    centering, by, cx, d_inf, done.astype(jnp.int32),
                    fail.astype(jnp.int32), mir.astype(jnp.int32), num_iter,
                    stall, aborted.astype(jnp.int32), stats_k, stats_d)

        def cond(carry):
            g = carry[0]
            done_i = carry[12]
            # integer min-reduce: bool vector reductions hit an unsupported
            # i8->i1 truncation in Mosaic
            return (jnp.min(done_i) == 0) & (g < config.max_iterations)

        carry0 = (
            jnp.zeros((), jnp.int32),  # g
            w0_ref[:],  # w
            jnp.zeros((m, Bs, LANES), dtype),  # y
            k0_ref[:],  # k
            jnp.full((Bs, LANES), config.inv_sqrt_mu_max, dtype),  # k_max
            bsc0_ref[:],  # b_scaling
            csc0_ref[:],  # c_scaling
            zero,  # kkt_err
            izero,  # centering
            zero - 1.0,  # by
            zero + 1.0,  # cx
            zero,  # d_inf
            izero,  # done (int32-carried bool)
            izero,  # fail
            izero + 1,  # max_iters_reached
            izero,  # num_iter
            izero,  # stall
            izero,  # warmstart_aborted
            jnp.zeros((T, Bs, LANES), dtype),  # stats_k
            jnp.zeros((T, Bs, LANES), dtype),  # stats_dinf
        )
        carry = jax.lax.while_loop(cond, body, carry0)
        (_, w, y, k, k_max, b_sc, c_sc, _, _, by, cx, _, _, fail_i, mir_i,
         num_iter, stall, aborted_i, stats_k, stats_d) = carry
        fail = fail_i != 0
        mir = mir_i != 0

        if config.prepare_dual_variables:
            # Dual recovery (cone_program.cc:500-516): one extra
            # assemble/factor/solve + first-order affine step.
            _, G, AW, _, _, _ = assemble(A, cvec, w)
            L, fac_fail = _chol(G)
            y2 = solve_kkt(L, G, k[None] * bvec * b_sc[None] - AW)
            w_rec = w + _qrep(w, minus_slack(A, cvec, y2, zero), 1)
            skip = fail | fac_fail
            w = jnp.where(skip[None, None], w, w_rec)

        y_ref[:] = y
        w_ref[:] = w
        k_ref[:] = k
        kmax_ref[:] = k_max
        bsc_ref[:] = b_sc
        csc_ref[:] = c_sc
        by_ref[:] = by
        cx_ref[:] = cx
        fail_ref[:] = fail.astype(jnp.int32)
        mir_ref[:] = mir.astype(jnp.int32)
        stall_ref[:] = stall
        niter_ref[:] = num_iter
        abort_ref[:] = aborted_i
        statk_ref[:] = stats_k
        statd_ref[:] = stats_d

    return kernel


# ---------------------------------------------------------------------------
# Host wrapper
# ---------------------------------------------------------------------------


def _check_config(config: SolverConfig):
    if config.enable_line_search:
        raise ValueError(
            "fused SOCP path requires divergence-mode mu updates "
            "(the reference SOC kernel has no line search either, "
            "constraint.h:24-28)"
        )
    if config.kkt_solver != KKT_SOLVER_LLT:
        raise ValueError("fused SOCP path factors with LLT only")


@functools.partial(
    jax.jit,
    static_argnames=("config", "block_rows", "interpret"),
)
def _solve_padded(
    A_t, c_t, b_t, w0_t, k0_t, bsc0_t, csc0_t, config, block_rows, interpret
):
    """All inputs carry the scenario axis as trailing (S2, 128); the grid
    tiles S2 in blocks of ``block_rows`` sublane rows."""
    nc, n1, m, S2, _ = A_t.shape
    dtype = A_t.dtype
    T = config.max_iterations
    rank = 2.0 * nc  # Lorentz cones have rank 2 (soc_constraint.h:24)
    grid = S2 // block_rows

    kernel = _make_kernel(config, nc, n1, m, rank)

    def spec(*lead):
        nlead = len(lead)
        return pl.BlockSpec(
            (*lead, block_rows, LANES),
            lambda i, _n=nlead: tuple([0] * _n) + (i, 0),
            memory_space=pltpu.VMEM,
        )

    out_shapes = [
        jax.ShapeDtypeStruct((m, S2, LANES), dtype),  # y
        jax.ShapeDtypeStruct((nc, n1, S2, LANES), dtype),  # w
        jax.ShapeDtypeStruct((S2, LANES), dtype),  # k
        jax.ShapeDtypeStruct((S2, LANES), dtype),  # k_max
        jax.ShapeDtypeStruct((S2, LANES), dtype),  # b_scaling
        jax.ShapeDtypeStruct((S2, LANES), dtype),  # c_scaling
        jax.ShapeDtypeStruct((S2, LANES), dtype),  # by
        jax.ShapeDtypeStruct((S2, LANES), dtype),  # cx
        jax.ShapeDtypeStruct((S2, LANES), jnp.int32),  # fail
        jax.ShapeDtypeStruct((S2, LANES), jnp.int32),  # max_iters_reached
        jax.ShapeDtypeStruct((S2, LANES), jnp.int32),  # stall
        jax.ShapeDtypeStruct((S2, LANES), jnp.int32),  # num_iter
        jax.ShapeDtypeStruct((S2, LANES), jnp.int32),  # warmstart_aborted
        jax.ShapeDtypeStruct((T, S2, LANES), dtype),  # stats_k
        jax.ShapeDtypeStruct((T, S2, LANES), dtype),  # stats_dinf
    ]
    out_specs = [
        spec(m), spec(nc, n1), spec(), spec(), spec(), spec(), spec(),
        spec(), spec(), spec(), spec(), spec(), spec(), spec(T), spec(T),
    ]
    in_specs = [
        spec(nc, n1, m), spec(nc, n1), spec(m), spec(nc, n1), spec(),
        spec(), spec(),
    ]

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(A_t, c_t, b_t, w0_t, k0_t, bsc0_t, csc0_t)


def solve_socp_fused(
    A,
    c,
    b,
    config: SolverConfig,
    init_w=None,
    init_k=None,
    init_b_scaling=None,
    init_c_scaling=None,
    block_size: int = 1024,
    interpret: Optional[bool] = None,
) -> FusedSOCPResult:
    """Solve S independent SOCP scenarios in one fused TPU kernel.

    Each scenario s is  max b[s]'y  s.t.  c[s,j] - A[s,j] y in Q^{n+1}
    for nc Lorentz cones j.

    Args:
      A: (S, nc, n+1, m) or (S, n+1, m) constraint operators.
      c: (S, nc, n+1) or (S, n+1) affine terms.
      b: (S, m) objectives.
      config: SolverConfig (divergence mu mode, LLT; coldstart or warmstart).
      init_w: optional (S, nc, n+1) initial iterates (defaults to identity);
        for warmstart pass the previous solve's ``w``.
      init_k: optional (S,) initial inv_sqrt_mu (defaults to 0); for
        warmstart pass the previous solve's ``k``.
      init_b_scaling: optional (S,) rescaling state carried across a
        warmstart (previous ``b_scaling``; defaults to 1).
      init_c_scaling: optional (S,) likewise for ``c_scaling``.
      block_size: scenarios per kernel instance (rounded to 128 lanes x
        sublane rows).
      interpret: force Pallas interpreter mode (auto-on for CPU backend).
    """
    _check_config(config)
    A = jnp.asarray(A)
    if A.ndim == 3:
        A = A[:, None]
        c = jnp.asarray(c)[:, None]
    c = jnp.asarray(c)
    b = jnp.asarray(b)
    S, nc, n1, m = A.shape
    dtype = A.dtype

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # Scenario tiling: lanes of 128, block_rows sublane rows per kernel.
    block_rows = max(1, block_size // LANES)
    S2_need = -(-S // LANES)
    block_rows = min(block_rows, S2_need)
    S2 = -(-S2_need // block_rows) * block_rows
    S_pad = S2 * LANES

    def pad(x, value=0.0):
        if x.shape[0] == S_pad:
            return x
        widths = [(0, S_pad - S)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=value)

    if init_w is None:
        init_w = jnp.zeros((S, nc, n1), dtype).at[:, :, 0].set(1.0)
    if init_k is None:
        init_k = jnp.zeros((S,), dtype)
    if init_b_scaling is None:
        init_b_scaling = jnp.ones((S,), dtype)
    if init_c_scaling is None:
        init_c_scaling = jnp.ones((S,), dtype)

    def to_tiles(x):
        """(S_pad, ...) -> (..., S2, 128)"""
        x = jnp.moveaxis(x, 0, -1)
        return x.reshape(*x.shape[:-1], S2, LANES)

    A_t = to_tiles(pad(A))
    c_t = to_tiles(pad(c))
    b_t = to_tiles(pad(b))
    w0_t = to_tiles(pad(jnp.asarray(init_w, dtype)))
    k0_t = to_tiles(pad(jnp.asarray(init_k, dtype)))
    bsc0_t = to_tiles(pad(jnp.asarray(init_b_scaling, dtype), 1.0))
    csc0_t = to_tiles(pad(jnp.asarray(init_c_scaling, dtype), 1.0))

    (y, w, k, k_max, b_sc, c_sc, by, cx, fail_i, mir_i, stall, num_iter,
     aborted_i, stats_k, stats_d) = _solve_padded(
        A_t, c_t, b_t, w0_t, k0_t, bsc0_t, csc0_t, config, block_rows,
        bool(interpret)
    )

    def from_tiles(x):
        """(..., S2, 128) -> (S, ...)"""
        x = x.reshape(*x.shape[:-2], S_pad)
        return jnp.moveaxis(x, -1, 0)[:S]

    # --- epilogue (cone_program.cc:485-532), elementwise on host-side XLA ---
    k = from_tiles(k)
    fail = from_tiles(fail_i).astype(bool)
    mir = from_tiles(mir_i).astype(bool)
    by = from_tiles(by)
    cx = from_tiles(cx)
    b_sc = from_tiles(b_sc)
    c_sc = from_tiles(c_sc)
    y = from_tiles(y)
    w = from_tiles(w)

    mu = 1.0 / (k * k)
    infeasible = mu > config.infeasibility_threshold
    primal_infeasible = infeasible & (cx * k <= -0.5)
    dual_infeasible = infeasible & (by * k >= 0.5)
    if config.mu_stall_iterations > 0:
        mu_stalled = (
            from_tiles(stall) >= config.mu_stall_iterations
        ) & (k < from_tiles(k_max))
    else:
        mu_stalled = jnp.zeros_like(fail)
    solved = (~infeasible) & (~fail) & (~mu_stalled) & (~mir)
    y_out = jnp.where(
        (infeasible | fail)[:, None], y, y / (k * c_sc)[:, None]
    )

    return FusedSOCPResult(
        y=y_out,
        solved=solved,
        primal_infeasible=primal_infeasible,
        dual_infeasible=dual_infeasible,
        num_iterations=from_tiles(num_iter),
        w=w,
        y_kkt=y,
        k=k,
        warmstart_aborted=from_tiles(aborted_i).astype(bool),
        b_scaling=b_sc,
        c_scaling=c_sc,
        stats_k=from_tiles(stats_k),
        stats_dinf=from_tiles(stats_d),
        fail=fail,
        mu_stalled=mu_stalled,
    )
