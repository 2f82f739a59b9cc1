"""Common types for cone blocks.

A *cone block* is a pytree dataclass holding the static problem data for one
constraint (or one batch of same-shape constraints) of a cone family, plus
methods implementing the functional kernel interface consumed by the solve
loop.  This replaces the reference's type-erased ``Constraint``
(/root/reference/conex/constraint.h:51-197) with plain functions over arrays:
state is never mutated in place, it is threaded through the jitted iteration.

Interface (all methods traced under jit; ``w`` is the block's iterate pytree):

  identity_state(dtype)          -> w            (reference: SetIdentity)
  rank()                         -> int (static) (reference: Rank)
  schur(w)                       -> SchurOut     (ConstructSchurComplementSystem)
  prepare_step(w, y, cw, ew)     -> (cache, norminf, normsq)   (PrepareStep)
  take_step(w, cache, step_size) -> w            (TakeStep)
  affine_step(w, y, e_weight)    -> w            (PrepareStep with affine=True)
  slack_stats(w, y, c_weight)    -> SlackStats   (GetWeightedSlackEigenvalues)
  line_search(w, y0, y1, c0, c1, dinf) -> (lb, ub, fail)  (PerformLineSearch)
  dual_variable(w)               -> array        (get_dual_variable)

``y`` passed to the block is the *local* segment of the KKT solution gathered
over the block's variables (reference: Vars(), cone_program.h:59-67).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp


class SchurOut(NamedTuple):
    """One block's contribution to the Schur-complement system.

    Mirrors WorkspaceSchurComplement (reference conex/newton_step.h:51-107),
    restricted to the block's local variables.
    """

    G: jnp.ndarray  # (v, v) local Schur complement block
    AW: jnp.ndarray  # (v,)
    AQc: jnp.ndarray  # (v,)
    w_dot_c: jnp.ndarray  # scalar <w, c>
    c_dot_Qc: jnp.ndarray  # scalar <c, Q(w) c>


class SlackStats(NamedTuple):
    """Eigenvalue statistics of the weighted slack Q(w^1/2) s.

    Mirrors WeightedSlackEigenvalues (reference conex/newton_step.h:11-18).
    """

    lam_min: jnp.ndarray
    lam_max: jnp.ndarray
    frob_sq: jnp.ndarray
    trace: jnp.ndarray


class StepCache(NamedTuple):
    """Newton direction data cached between prepare_step and take_step."""

    d: jnp.ndarray


def local_vars(y: jnp.ndarray, vars_: Optional[Tuple[int, ...]], v: int):
    """Gather the local variable segment of the KKT vector y.

    Reference: Vars() (conex/cone_program.h:59-67).  ``vars_`` is static so
    the gather indices are compile-time constants; None means the first ``v``
    entries (the dense fast path, zero-copy slice).
    """
    if vars_ is None:
        return y[:v]
    return y[jnp.array(vars_, dtype=jnp.int32)]
