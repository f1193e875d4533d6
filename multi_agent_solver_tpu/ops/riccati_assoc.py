"""Time-parallel (associative-scan) Riccati backward pass.

The Riccati recursion looks inherently sequential, but each stage's
value-function update is a linear-fractional map, and such maps compose
associatively: parametrize the map from ``V_{t+1}`` to ``V_t`` by the
five-tuple ``e_t = (A, b, C, eta, J)`` (Sarkka & Garcia-Fernandez,
"Temporal Parallelization of Bayesian Smoothers", arXiv:1809.06360 --
SURVEY.md section 5 names this as the horizon-parallel design), with

    combine(e_i, e_j):                      # e_i earlier, e_j later
        A = A_j (I + C_i J_j)^-1 A_i
        b = A_j (I + C_i J_j)^-1 (b_i + C_i eta_j) + b_j
        C = A_j (I + C_i J_j)^-1 C_i A_j' + C_j
        eta = A_i' (I + J_j C_i)^-1 (eta_j - J_j b_i) + eta_i
        J = A_i' (I + J_j C_i)^-1 J_j A_i + J_i

``jax.lax.associative_scan`` then evaluates ALL suffix compositions in
O(log T) depth of batched [T, nx, nx] matmuls -- MXU-shaped work instead of
T dependent tiny steps.  Appending a terminal element (A = 0, J = phixx,
eta = -phix) makes the suffix at index t exactly ``(J, eta) = (v_xx_t,
-v_x_t)``; the per-stage gains follow in one batched solve.

Cross terms ``lux`` are eliminated by completing the square
(u = v - R^-1 M x), which maps the stage to an equivalent cross-free LQ
stage -- verified to machine precision against the sequential recursion.

Caveat (documented behavior difference from the scan/Pallas backward):
``q_uu`` regularization cannot be decided per-stage inside a parallel
composition, so this path assumes ``luu``-dominated positive-definite
stages (optionally shifted by a constant ``reg``).  Crossover vs the
sequential kernel is at long horizons: see docs/BENCHMARKS.md.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..types import Array
from .small import inv_small, solve_spd_small


def _inv_general_small(M: Array) -> Array:
    """Closed-form inverse for general n <= 4 matrices.

    ``jnp.linalg.solve`` on tiny batched matrices is ~40x too slow on TPU
    (round-1 finding, ops/small.py); the combine's ``I + C J`` matrices are
    nonsingular (product of PSD factors shifted by I) but not symmetric, so
    route through the adjugate/Schur ``inv_small`` instead of LU.
    """
    n = M.shape[-1]
    if n <= 4:
        return inv_small(M)
    return jnp.linalg.inv(M)


def _combine(ei, ej):
    """Associative composition; ei covers the earlier interval."""
    Ai, bi, Ci, etai, Ji = ei
    Aj, bj, Cj, etaj, Jj = ej
    nx = Ai.shape[-1]
    eye = jnp.eye(nx, dtype=Ai.dtype)
    M1 = eye + Ci @ Jj                       # [..., nx, nx]
    M2 = eye + Jj @ Ci
    AjM1 = Aj @ _inv_general_small(M1)
    AiTM2 = jnp.swapaxes(Ai, -1, -2) @ _inv_general_small(M2)
    A = AjM1 @ Ai
    b = (AjM1 @ (bi + (Ci @ etaj[..., None])[..., 0])[..., None])[..., 0] + bj
    C = AjM1 @ Ci @ jnp.swapaxes(Aj, -1, -2) + Cj
    eta = (AiTM2 @ (etaj - (Jj @ bi[..., None])[..., 0])[..., None])[..., 0] + etai
    J = AiTM2 @ Jj @ Ai + Ji
    return A, b, C, eta, J


@functools.partial(jax.jit, static_argnames=("reg",))
def riccati_backward_assoc(
    A: Array,      # [B, T, nx, nx]
    Bm: Array,     # [B, T, nx, nu]
    lx: Array,     # [B, T, nx]
    lu: Array,     # [B, T, nu]
    lxx: Array,    # [B, T, nx, nx]
    luu: Array,    # [B, T, nu, nu]
    lux: Array,    # [B, T, nu, nx]
    vx0: Array,    # [B, nx]      terminal value gradient
    vxx0: Array,   # [B, nx, nx]  terminal value Hessian
    reg: float = 0.0,
) -> Tuple[Array, Array]:
    """Batched time-parallel Riccati; returns ``k [B, T, nu]``, ``K [B, T, nu, nx]``.

    Drop-in for the sequential backward pass on positive-definite stages
    (``tests/test_riccati_assoc.py`` asserts 1e-6 agreement with lax.scan).
    """
    B, T, nx, _ = A.shape
    nu = Bm.shape[-1]
    dtype = A.dtype

    if reg:
        luu = luu + reg * jnp.eye(nu, dtype=dtype)

    # Stage elements with the cross term completed away.  All small solves
    # are closed-form (see _inv_general_small): luu is SPD here.
    Rinv = inv_small(luu)
    RinvM = Rinv @ lux                                     # R^-1 M   [B,T,nu,nx]
    Rinvr = (Rinv @ lu[..., None])[..., 0]                 # R^-1 lu  [B,T,nu]
    Abar = A - Bm @ RinvM
    Qbar = lxx - jnp.swapaxes(lux, -1, -2) @ RinvM
    qbar = lx - (jnp.swapaxes(lux, -1, -2) @ Rinvr[..., None])[..., 0]
    b_el = -(Bm @ Rinvr[..., None])[..., 0]
    C_el = Bm @ Rinv @ jnp.swapaxes(Bm, -1, -2)
    eta_el = -qbar
    J_el = 0.5 * (Qbar + jnp.swapaxes(Qbar, -1, -2))

    # Append the terminal element along the time axis.
    zmat = jnp.zeros((B, 1, nx, nx), dtype)
    zvec = jnp.zeros((B, 1, nx), dtype)
    elems = (
        jnp.concatenate([Abar, zmat], axis=1),
        jnp.concatenate([b_el, zvec], axis=1),
        jnp.concatenate([C_el, zmat], axis=1),
        jnp.concatenate([eta_el, -vx0[:, None]], axis=1),
        jnp.concatenate([J_el, vxx0[:, None]], axis=1),
    )

    # All suffix compositions in O(log T) batched-matmul levels.  With
    # reverse=True, lax.associative_scan feeds the operator (later, earlier)
    # relative to our interval convention -- swap (the op is associative but
    # NOT commutative; verified against the sequential recursion).
    _, _, _, eta_all, J_all = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, axis=1, reverse=True
    )
    S_next = J_all[:, 1:]          # v_xx at t+1, per stage t
    s_next = -eta_all[:, 1:]       # v_x  at t+1

    # Gains from the (exact) downstream value functions, one batched solve.
    BT = jnp.swapaxes(Bm, -1, -2)
    q_u = lu + (BT @ s_next[..., None])[..., 0]
    q_uu = luu + BT @ S_next @ Bm
    q_ux = lux + BT @ S_next @ A
    rhs = jnp.concatenate([q_u[..., None], q_ux], axis=-1)
    sol = solve_spd_small(q_uu, rhs)
    return -sol[..., 0], -sol[..., 1:]
