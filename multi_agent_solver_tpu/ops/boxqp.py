"""Small box-constrained QP solves by exhaustive active-set enumeration.

Control-limited DDP (Tassa et al. 2014) replaces the reference's post-hoc
control clamp (ilqr.hpp:213-214) with a box-constrained Newton step in the
backward pass:

    min_du  1/2 du' Quu du + qu' du   s.t.  lb <= du <= ub

For the tiny control dimensions of trajectory optimization (nu <= 4 covers
every model here), the QP is solved EXACTLY by enumerating all 3^nu
active-set configurations (each dim free / at lower / at upper), solving each
free subsystem in closed form, and selecting the configuration whose KKT
conditions hold -- for a strictly convex QP exactly one does.  Everything is
elementwise/branch-free arithmetic, so it batches over problems and vmaps
into the Riccati scan.

Clamped dimensions get zero feedback rows (the standard control-limited DDP
gain treatment).
"""

from __future__ import annotations

import itertools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..types import Array
from .small import solve_spd_small

FREE, AT_LB, AT_UB = 0, 1, 2


def boxqp_gains(
    Quu: Array,    # [nu, nu] SPD (already regularized)
    qu: Array,     # [nu]
    Qux: Array,    # [nu, nx]
    lb: Array,     # [nu] lower bounds on du
    ub: Array,     # [nu] upper bounds on du
) -> Tuple[Array, Array]:
    """Exact box-QP feedforward ``k`` and control-limited feedback ``K``.

    Returns ``k [nu]`` (the constrained minimizer) and ``K [nu, nx]`` with
    zeroed rows for clamped dimensions.
    """
    nu = qu.shape[0]
    nx = Qux.shape[1]
    if nu > 4:
        raise ValueError("boxqp enumeration supports nu <= 4")
    dtype = qu.dtype
    big = jnp.asarray(1e30, dtype)

    best_k = jnp.zeros((nu,), dtype)
    best_K = jnp.zeros((nu, nx), dtype)
    found = jnp.asarray(False)

    for config in itertools.product((FREE, AT_LB, AT_UB), repeat=nu):
        free = [i for i in range(nu) if config[i] == FREE]
        clamped = [i for i in range(nu) if config[i] != FREE]
        v = jnp.stack([
            lb[i] if config[i] == AT_LB else (ub[i] if config[i] == AT_UB else 0.0 * qu[i])
            for i in range(nu)
        ])

        if free:
            F = jnp.asarray(free)
            Quu_FF = Quu[jnp.ix_(F, F)]
            rhs = qu[F] + (Quu[jnp.ix_(F, jnp.asarray(clamped))] @ v[jnp.asarray(clamped)]
                           if clamped else jnp.zeros((len(free),), dtype))
            du_F = -solve_spd_small(Quu_FF, rhs)
            du = v
            for pos, i in enumerate(free):
                du = du.at[i].set(du_F[pos])
        else:
            du = v

        grad = qu + Quu @ du
        ok = jnp.asarray(True)
        for i in range(nu):
            if config[i] == FREE:
                ok = ok & (du[i] >= lb[i]) & (du[i] <= ub[i])
            elif config[i] == AT_LB:
                ok = ok & (grad[i] >= 0.0)
            else:
                ok = ok & (grad[i] <= 0.0)

        # Feedback: free rows solve the free subsystem against Qux; clamped
        # rows are zero.
        K = jnp.zeros((nu, nx), dtype)
        if free:
            F = jnp.asarray(free)
            K_F = -solve_spd_small(Quu[jnp.ix_(F, F)], Qux[F])
            for pos, i in enumerate(free):
                K = K.at[i].set(K_F[pos])

        take = ok & ~found
        best_k = jnp.where(take, du, best_k)
        best_K = jnp.where(take, K, best_K)
        found = found | ok

    # Degenerate fallback (should not trigger for SPD Quu): unconstrained
    # Newton step clipped to the box.
    du_unc = -solve_spd_small(Quu, qu)
    K_unc = -solve_spd_small(Quu, Qux)
    best_k = jnp.where(found, best_k, jnp.clip(du_unc, lb, ub))
    best_K = jnp.where(found, best_K, K_unc)
    return best_k, best_K
