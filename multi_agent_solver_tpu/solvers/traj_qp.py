"""Structured trajectory box-QP: banded constraints + block-tridiagonal KKT.

Both reference QP layers hand OSQP a sparse matrix whose only structure is
stage-banded: dynamics rows couple two consecutive stage-variable blocks,
plus identity bound rows on every variable (osqp.hpp:333-407,
osqp_collocation.hpp:169-204).  The dense ADMM backend (admm_qp.py)
factorizes the (T nb)x(T nb) KKT matrix with one Cholesky -- O((T nb)^3),
fine at T=80, cubic death for long horizons or stacked agents.

This module is the scalable path: the constraint matrix NEVER materializes.

* A trajectory QP is ``N`` stage blocks ``w_t`` of width ``nb`` with
  banded rows ``r_t = C_t w_t + Cp_t w_{t+1}`` (t = 0..N-2) and box rows on
  every variable -- exactly the shape of both SQP subproblems (and of a
  centralized multi-agent joint problem, where ``nb`` is the stacked agent
  width).
* Matvecs are batched einsums over ``[T, nr, nb]`` blocks: O(T nr nb).
* The ADMM KKT matrix ``diag(P + sigma) + A' diag(rho) A`` assembles
  directly into block-tridiagonal ``(D, L)`` and is factorized/solved by
  cyclic reduction (:mod:`..ops.block_tridiag`): O(T nb^3) work in
  O(log T) batched levels instead of a dense O((T nb)^3) factor.

Semantics (scaling, staged adaptive rho, eq-row rho scaling, relaxation,
polish-by-reweighting, unscaled residuals) mirror
:func:`..solvers.admm_qp.solve_box_qp` -- same algorithm, structured
linear algebra.  ``tests/test_traj_qp.py`` asserts both backends agree.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.block_tridiag import bt_factor, bt_solve
from ..types import Array
from .admm_qp import ADMMConfig, INFTY, full_precision


class TrajQP(NamedTuple):
    """Stage-structured box QP.

    minimize    1/2 w' diag(P) w + q' w
    subject to  r_lb <= C_t w_t + Cp_t w_{t+1} <= r_ub     (t = 0..N-2)
                z_lb <= w <= z_ub                          (every variable)

    Pad slots (e.g. the nonexistent u_T of a shooting problem) are pinned
    with ``z_lb = z_ub = 0``, ``P = 1``, ``q = 0`` and zero C/Cp columns.
    """

    P_diag: Array   # [N, nb]
    q: Array        # [N, nb]
    C: Array        # [N-1, nr, nb]
    Cp: Array       # [N-1, nr, nb]
    r_lb: Array     # [N-1, nr]
    r_ub: Array     # [N-1, nr]
    z_lb: Array     # [N, nb]
    z_ub: Array     # [N, nb]


class TrajQPSolution(NamedTuple):
    w: Array          # [N, nb] primal (unscaled)
    y_r: Array        # [N-1, nr] banded-row duals
    y_b: Array        # [N, nb] box-row duals
    iterations: Array
    r_prim: Array
    r_dual: Array
    converged: Array


def _matvec_A(C, Cp, w, s_b):
    """A w -> (banded rows [T, nr], box rows [N, nb]).

    ``s_b`` is the diagonal of the (scaled) box-identity rows: after Ruiz
    equilibration the box block of A_s is diag(E_b * Dv), not I.
    """
    r = jnp.einsum("trb,tb->tr", C, w[:-1]) + jnp.einsum("trb,tb->tr", Cp, w[1:])
    return r, s_b * w


def _rmatvec_A(C, Cp, y_r, y_b, s_b):
    """A' y -> [N, nb]."""
    out = s_b * y_b
    out = out.at[:-1].add(jnp.einsum("trb,tr->tb", C, y_r))
    out = out.at[1:].add(jnp.einsum("trb,tr->tb", Cp, y_r))
    return out


def _ruiz(P_diag, q, C, Cp, iters: int):
    """Structured modified Ruiz equilibration (see admm_qp._ruiz_equilibrate).

    Returns (Dv [N, nb], E_r [T, nr], E_b [N, nb], c).
    """
    N, nb = q.shape
    dtype = q.dtype
    Dv = jnp.ones((N, nb), dtype)
    E_r = jnp.ones(C.shape[:2], dtype)
    E_b = jnp.ones((N, nb), dtype)
    c = jnp.asarray(1.0, dtype)

    def body(_, carry):
        Dv, E_r, E_b, c = carry
        P_s = c * Dv * Dv * P_diag
        C_s = E_r[:, :, None] * C * Dv[:-1, None, :]
        Cp_s = E_r[:, :, None] * Cp * Dv[1:, None, :]
        box_s = E_b * Dv
        # Column norms over [P_s; A_s].
        colC = jnp.max(jnp.abs(C_s), axis=1)          # [T, nb] -> vars w_t, t<N-1
        colCp = jnp.max(jnp.abs(Cp_s), axis=1)        # [T, nb] -> vars w_{t+1}
        col = jnp.maximum(jnp.abs(P_s), jnp.abs(box_s))
        col = col.at[:-1].max(colC)
        col = col.at[1:].max(colCp)
        # Row norms.
        row_r = jnp.maximum(
            jnp.max(jnp.abs(C_s), axis=2), jnp.max(jnp.abs(Cp_s), axis=2)
        )
        row_b = jnp.abs(box_s)
        Dv = Dv / jnp.sqrt(jnp.maximum(col, 1e-10))
        E_r = E_r / jnp.sqrt(jnp.maximum(row_r, 1e-10))
        E_b = E_b / jnp.sqrt(jnp.maximum(row_b, 1e-10))
        # Cost normalization.
        P_s = c * Dv * Dv * P_diag
        q_s = c * Dv * q
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(jnp.mean(jnp.abs(P_s)), jnp.max(jnp.abs(q_s))), 1e-10
        )
        return Dv, E_r, E_b, c * gamma

    return jax.lax.fori_loop(0, iters, body, (Dv, E_r, E_b, c))


def _residuals(P_diag, q, C, Cp, s_b, w, y_r, y_b, z_r, z_b, Dv, E_r, E_b, c):
    """Unscaled OSQP residuals of scaled iterates."""
    Ar, Ab = _matvec_A(C, Cp, w, s_b)
    Ar_u, Ab_u = Ar / E_r, Ab / E_b
    zr_u, zb_u = z_r / E_r, z_b / E_b
    r_prim = jnp.maximum(
        jnp.max(jnp.abs(Ar_u - zr_u)), jnp.max(jnp.abs(Ab_u - zb_u))
    )
    Px = (P_diag * w) / Dv / c    # D^{-1} P_s w_s / c = P w  (unscaled)
    Aty = _rmatvec_A(C, Cp, y_r, y_b, s_b) / Dv / c
    qu = q / Dv / c
    r_dual = jnp.max(jnp.abs(Px + qu + Aty))
    prim_scale = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(Ar_u)), jnp.max(jnp.abs(Ab_u))),
        jnp.maximum(jnp.max(jnp.abs(zr_u)), jnp.max(jnp.abs(zb_u))),
    )
    dual_scale = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))),
        jnp.max(jnp.abs(qu)),
    )
    return r_prim, r_dual, prim_scale, dual_scale


def _kkt_blocks(P_diag, C, Cp, rho_r, rho_b, sigma, s_b=None):
    """Block-tridiagonal (D, L) of diag(P + sigma) + A' diag(rho) A."""
    N, nb = P_diag.shape
    if s_b is None:
        s_b = jnp.ones((N, nb), P_diag.dtype)
    eye = jnp.eye(nb, dtype=P_diag.dtype)
    D = eye[None] * (P_diag + sigma + rho_b * s_b * s_b)[:, None, :]
    # Row-weighted Gram blocks of the banded rows.
    D = D.at[:-1].add(jnp.einsum("tra,tr,trb->tab", C, rho_r, C))
    D = D.at[1:].add(jnp.einsum("tra,tr,trb->tab", Cp, rho_r, Cp))
    L = jnp.einsum("tra,tr,trb->tab", Cp, rho_r, C)     # K[t+1, t]
    return D, L


@full_precision
def solve_traj_box_qp(
    qp: TrajQP,
    config: ADMMConfig = ADMMConfig(),
    w0: Optional[Array] = None,
    y_r0: Optional[Array] = None,
    y_b0: Optional[Array] = None,
) -> TrajQPSolution:
    """Structured analogue of :func:`..solvers.admm_qp.solve_box_qp`."""
    P_diag, q = qp.P_diag, qp.q
    N, nb = q.shape
    dtype = q.dtype

    is_eq_r = jnp.abs(qp.r_ub - qp.r_lb) < 1e-12
    is_eq_b = jnp.abs(qp.z_ub - qp.z_lb) < 1e-12

    if config.scaling_iters > 0:
        Dv, E_r, E_b, c = _ruiz(P_diag, q, qp.C, qp.Cp, config.scaling_iters)
    else:
        Dv = jnp.ones((N, nb), dtype)
        E_r = jnp.ones(qp.C.shape[:2], dtype)
        E_b = jnp.ones((N, nb), dtype)
        c = jnp.asarray(1.0, dtype)

    # Scaled problem data (local names are the SCALED quantities below).
    P_s = c * Dv * Dv * P_diag
    q_s = c * Dv * q
    C = E_r[:, :, None] * qp.C * Dv[:-1, None, :]
    Cp = E_r[:, :, None] * qp.Cp * Dv[1:, None, :]
    r_lb = jnp.clip(E_r * qp.r_lb, -INFTY, INFTY)
    r_ub = jnp.clip(E_r * qp.r_ub, -INFTY, INFTY)
    z_lb = jnp.clip(E_b * qp.z_lb, -INFTY, INFTY)
    z_ub = jnp.clip(E_b * qp.z_ub, -INFTY, INFTY)
    s_b = E_b * Dv               # scaled box-identity diagonal

    w = jnp.zeros((N, nb), dtype) if w0 is None else w0 / Dv
    y_r = jnp.zeros_like(r_lb) if y_r0 is None else c * y_r0 / E_r
    y_b = jnp.zeros((N, nb), dtype) if y_b0 is None else c * y_b0 / E_b
    zr0, zb0 = _matvec_A(C, Cp, w, s_b)
    z_r = jnp.clip(zr0, r_lb, r_ub)
    z_b = jnp.clip(zb0, z_lb, z_ub)

    sigma = jnp.asarray(config.sigma, dtype)
    alpha = jnp.asarray(config.alpha, dtype)
    iters_per_stage = max(1, config.max_iterations // max(1, config.adaptive_rho_stages))

    def rho_vecs(rho_bar):
        rho_r = jnp.where(is_eq_r, rho_bar * config.eq_rho_scale, rho_bar)
        rho_b = jnp.where(is_eq_b, rho_bar * config.eq_rho_scale, rho_bar)
        return rho_r, rho_b

    def admm_iter(carry):
        w, y_r, y_b, z_r, z_b, rho_r, rho_b, factor, k, done = carry
        rhs = sigma * w - q_s + _rmatvec_A(
            C, Cp, rho_r * z_r - y_r, rho_b * z_b - y_b, s_b
        )
        w_t = bt_solve(factor, rhs)
        zr_t, zb_t = _matvec_A(C, Cp, w_t, s_b)
        w_new = alpha * w_t + (1.0 - alpha) * w
        zr_rel = alpha * zr_t + (1.0 - alpha) * z_r
        zb_rel = alpha * zb_t + (1.0 - alpha) * z_b
        zr_new = jnp.clip(zr_rel + y_r / rho_r, r_lb, r_ub)
        zb_new = jnp.clip(zb_rel + y_b / rho_b, z_lb, z_ub)
        yr_new = y_r + rho_r * (zr_rel - zr_new)
        yb_new = y_b + rho_b * (zb_rel - zb_new)

        r_prim, r_dual, ps, ds = _residuals(
            P_s, q_s, C, Cp, s_b, w_new, yr_new, yb_new, zr_new, zb_new, Dv, E_r, E_b, c
        )
        eps_prim = config.eps_abs + config.eps_rel * ps
        eps_dual = config.eps_abs + config.eps_rel * ds
        done = (r_prim <= eps_prim) & (r_dual <= eps_dual)
        return w_new, yr_new, yb_new, zr_new, zb_new, rho_r, rho_b, factor, k + 1, done

    def stage(carry, _):
        w, y_r, y_b, z_r, z_b, rho_bar, total_iters, converged = carry
        rho_r, rho_b = rho_vecs(rho_bar)
        factor = bt_factor(*_kkt_blocks(P_s, C, Cp, rho_r, rho_b, sigma, s_b))

        def cond(cc):
            return (~cc[9]) & (cc[8] < iters_per_stage)

        w, y_r, y_b, z_r, z_b, _, _, _, k, done = jax.lax.while_loop(
            cond,
            admm_iter,
            (w, y_r, y_b, z_r, z_b, rho_r, rho_b, factor,
             jnp.asarray(0, jnp.int32), converged),
        )

        r_prim, r_dual, ps, ds = _residuals(
            P_s, q_s, C, Cp, s_b, w, y_r, y_b, z_r, z_b, Dv, E_r, E_b, c
        )
        ratio = jnp.sqrt(
            (r_prim / jnp.maximum(ps, 1e-10))
            / jnp.maximum(r_dual / jnp.maximum(ds, 1e-10), 1e-10)
        )
        rho_new = jnp.clip(rho_bar * ratio, config.rho_min, config.rho_max)
        rho_bar = jnp.where(done, rho_bar, rho_new)
        return (w, y_r, y_b, z_r, z_b, rho_bar, total_iters + k, converged | done), None

    init = (
        w, y_r, y_b, z_r, z_b,
        jnp.asarray(config.rho, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    (w, y_r, y_b, z_r, z_b, _, total_iters, converged), _ = jax.lax.scan(
        stage, init, None, length=config.adaptive_rho_stages
    )

    if config.polish:
        tol = 1e-6
        act_r = ((z_r - r_lb <= tol) & (y_r < 0.0)) | ((r_ub - z_r <= tol) & (y_r > 0.0)) | is_eq_r
        act_b = ((z_b - z_lb <= tol) & (y_b < 0.0)) | ((z_ub - z_b <= tol) & (y_b > 0.0)) | is_eq_b
        rho_pr = jnp.where(act_r, config.polish_rho, config.polish_rho_inactive).astype(dtype)
        rho_pb = jnp.where(act_b, config.polish_rho, config.polish_rho_inactive).astype(dtype)
        factor = bt_factor(*_kkt_blocks(P_s, C, Cp, rho_pr, rho_pb, sigma, s_b))

        def polish_iter(_, carry):
            w, y_r, y_b, z_r, z_b = carry
            rhs = sigma * w - q_s + _rmatvec_A(
                C, Cp, rho_pr * z_r - y_r, rho_pb * z_b - y_b, s_b
            )
            w_t = bt_solve(factor, rhs)
            zr_t, zb_t = _matvec_A(C, Cp, w_t, s_b)
            w_n = alpha * w_t + (1.0 - alpha) * w
            zr_rel = alpha * zr_t + (1.0 - alpha) * z_r
            zb_rel = alpha * zb_t + (1.0 - alpha) * z_b
            zr_n = jnp.clip(zr_rel + y_r / rho_pr, r_lb, r_ub)
            zb_n = jnp.clip(zb_rel + y_b / rho_pb, z_lb, z_ub)
            return w_n, y_r + rho_pr * (zr_rel - zr_n), y_b + rho_pb * (zb_rel - zb_n), zr_n, zb_n

        polished = jax.lax.fori_loop(
            0, config.polish_iters, polish_iter, (w, y_r, y_b, z_r, z_b)
        )
        rp0, rd0, _, _ = _residuals(P_s, q_s, C, Cp, s_b, w, y_r, y_b, z_r, z_b, Dv, E_r, E_b, c)
        rp1, rd1, _, _ = _residuals(P_s, q_s, C, Cp, s_b, *polished, Dv, E_r, E_b, c)
        better = jnp.maximum(rp1, rd1) < jnp.maximum(rp0, rd0)
        w = jnp.where(better, polished[0], w)
        y_r = jnp.where(better, polished[1], y_r)
        y_b = jnp.where(better, polished[2], y_b)
        z_r = jnp.where(better, polished[3], z_r)
        z_b = jnp.where(better, polished[4], z_b)

    r_prim, r_dual, _, _ = _residuals(P_s, q_s, C, Cp, s_b, w, y_r, y_b, z_r, z_b, Dv, E_r, E_b, c)
    return TrajQPSolution(
        w=Dv * w, y_r=E_r * y_r / c, y_b=E_b * y_b / c,
        iterations=total_iters, r_prim=r_prim, r_dual=r_dual, converged=converged,
    )
