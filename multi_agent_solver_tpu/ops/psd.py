"""Regularized positive-definite factorization with escalation.

The reference regularizes ``q_uu`` with a retry loop: attempt an Eigen LLT,
and on failure add ``reg * I`` with ``reg`` growing 10x each try
(``ilqr.hpp:172-183``; the same pattern appears in ``osqp.hpp:135-147``).
A data-dependent retry loop defeats XLA compilation, so the TPU-native
formulation evaluates a *static ladder* of cumulative regularization levels --
``c_j = reg_init * (factor^j - 1) / (factor - 1)``, exactly the partial sums
the reference's ``q_uu += reg * I; reg *= factor`` accumulates -- factorizes
all candidates in one batched Cholesky, and selects the first finite one.

For the tiny control dimensions of trajectory optimization (nu <= 8) the whole
ladder costs less than one HBM round-trip, and the select is branch-free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..types import Array


def _reg_ladder(reg_init: float, factor: float, num_levels: int, dtype) -> Array:
    """Cumulative regularization sums c_0=0, c_1=reg, c_2=reg(1+f), ..."""
    j = jnp.arange(num_levels, dtype=dtype)
    return reg_init * (factor**j - 1.0) / (factor - 1.0)


@partial(jax.jit, static_argnames=("reg_init", "factor", "num_levels"))
def cholesky_with_escalation(
    Q: Array,
    reg_init: float = 1e-6,
    factor: float = 10.0,
    num_levels: int = 16,
):
    """Lower-Cholesky factor of ``Q + c_j*I`` for the smallest successful ``c_j``.

    Returns ``(chol, level_index)``.  ``jnp.linalg.cholesky`` yields NaNs for
    non-PD inputs, which serves as the failure signal (the analogue of Eigen's
    ``llt.info() != Success``).  If every level fails (pathological), the most
    regularized candidate is returned.
    """
    n = Q.shape[-1]
    dtype = Q.dtype
    levels = _reg_ladder(reg_init, factor, num_levels, dtype)
    eye = jnp.eye(n, dtype=dtype)
    candidates = Q[None, :, :] + levels[:, None, None] * eye
    chols = jnp.linalg.cholesky(candidates)  # [L, n, n], NaN rows on failure
    ok = jnp.all(jnp.isfinite(chols.reshape(num_levels, -1)), axis=-1)
    idx = jnp.argmax(ok)  # first success; 0 if none (then fall back to last)
    idx = jnp.where(jnp.any(ok), idx, num_levels - 1)
    return jnp.take(chols, idx, axis=0), idx


def solve_psd_with_reg(Q: Array, rhs: Array, **kwargs):
    """Solve ``(Q + c*I) x = rhs`` with the escalation ladder.

    ``rhs`` may be a vector ``[n]`` or matrix ``[n, k]``.
    """
    chol, _ = cholesky_with_escalation(Q, **kwargs)
    return jax.scipy.linalg.cho_solve((chol, True), rhs)
