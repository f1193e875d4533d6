"""Primal-dual interior-point trajectory QP backend (``ip_qp=1``).

The ADMM backend (solvers/traj_qp.py, the OSQP-parity path) runs thousands
of cheap first-order iterations; a Mehrotra predictor-corrector
interior-point method solves the same QP in ~5-30 Newton steps, each a
fresh block-tridiagonal factor + a handful of solves.  There is no
reference counterpart (the reference delegates to OSQP's ADMM,
osqp.hpp:15).

**Double precision only.**  IP linear algebra needs f64 -- the Schur
system's condition number grows like 1/mu, and in f32 the late barrier
iterations produce garbage Newton steps (measured: the collocation SQP's
second warm-started QP NaNs; every production IP code is double
precision).  The SQP dispatchers therefore route ``ip_qp=1`` to this
backend only for f64 problems (x64-enabled processes, e.g. CPU parity
runs) and silently keep ADMM on f32 backends such as the TPU.

Problem shape (the structured SQP subproblem, ``TrajQP`` with equality
banded rows, which both SQP transcriptions produce: dynamics/defect rows
always have ``r_lb == r_ub``):

    minimize   1/2 w' diag(P) w + q' w
    s.t.       C_t w_t + Cp_t w_{t+1} = b_t            (t = 0..N-2)
               lb <= w <= ub                           (entries may be +-inf)

Method notes:

* Box slacks only where the bound is finite (masked); zero-width boxes
  (``lb == ub`` pad pins) are handled by proximal pinning: ``P += 1e10``
  on those variables, which fixes them to the bound value to ~1e-10
  relative without special-casing the linear algebra.
* Newton step by elimination: ``W = (P + D)^{-1}`` is diagonal
  (``D = m_l lam_l/s_l + m_u lam_u/s_u``), so the reduced system is the
  banded-row Schur complement ``S = A W A'`` -- block tridiagonal with
  ``nr x nr`` blocks, factored by cyclic reduction (ops/block_tridiag.py).
* Mehrotra: affine predictor, sigma = (mu_aff/mu)^3, corrector reusing the
  factorization, 0.99 fraction-to-boundary steps.
* Fixed-iteration ``while_loop`` (vmappable); unscaled residual + mu
  convergence tests against ``config.eps_abs``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.block_tridiag import bt_factor, bt_solve
from ..types import Array
from .admm_qp import ADMMConfig, INFTY, full_precision
from .traj_qp import TrajQP, TrajQPSolution

_PIN = 1e10          # proximal pin weight for zero-width boxes (f64 path)
_MAX_ITERS = 40
_TAU = 0.99          # fraction-to-boundary

_DELTA = 1e-8        # primal regularization: free variables (no bound, zero
                     # cost curvature -- e.g. unpenalized states) make P + D
                     # singular; the Newton solve uses P + D + _DELTA and one
                     # iterative-refinement step against the TRUE system
                     # recovers full accuracy (standard IP linear algebra).


def _schur_blocks(C, Cp, Wd):
    """Block-tridiagonal (D, L) of S = A W A' for banded equality rows.

    ``Wd`` [N, nb] diagonal of W; rows t couple (w_t, w_{t+1}):
    S[t, t]   = C_t W_t C_t' + Cp_t W_{t+1} Cp_t'
    S[t+1, t] = C_{t+1} W_{t+1} Cp_t'
    """
    D = jnp.einsum("tab,tb,tcb->tac", C, Wd[:-1], C)
    D = D + jnp.einsum("tab,tb,tcb->tac", Cp, Wd[1:], Cp)
    L = jnp.einsum("tab,tb,tcb->tac", C[1:], Wd[1:-1], Cp[:-1])
    return D, L


def _matvec_rows(C, Cp, w):
    return jnp.einsum("trb,tb->tr", C, w[:-1]) + jnp.einsum("trb,tb->tr", Cp, w[1:])


def _rmatvec_rows(C, Cp, y):
    out = jnp.zeros((C.shape[0] + 1, C.shape[2]), y.dtype)
    out = out.at[:-1].add(jnp.einsum("trb,tr->tb", C, y))
    out = out.at[1:].add(jnp.einsum("trb,tr->tb", Cp, y))
    return out


def _max_step(s, ds, mask):
    """Largest alpha in (0, 1] with s + alpha ds >= (1 - _TAU) s (masked)."""
    ratio = jnp.where(mask & (ds < 0.0), -_TAU * s / jnp.minimum(ds, -1e-300), jnp.inf)
    return jnp.minimum(1.0, jnp.min(ratio))


@full_precision
def solve_traj_box_qp_ip(
    qp: TrajQP,
    config: ADMMConfig = ADMMConfig(),
    w0=None,
    y_r0=None,
    y_b0=None,
) -> TrajQPSolution:
    """Interior-point drop-in for :func:`..solvers.traj_qp.solve_traj_box_qp`.

    Banded rows must be equalities (both SQP transcriptions guarantee it);
    ``b = r_lb`` is taken as the equality value.  Warm-start arguments are
    accepted for signature compatibility; interior-point methods restart
    from the analytic center, so only ``w0`` is used (pushed strictly
    inside the box).
    """
    P_diag, q = qp.P_diag, qp.q
    C, Cp, b = qp.C, qp.Cp, qp.r_lb
    N, nb = q.shape
    dtype = q.dtype

    # Masks: finite boxes get slacks; zero-width boxes get proximal pins.
    pinned = jnp.abs(qp.z_ub - qp.z_lb) < 1e-12
    m_l = jnp.isfinite(qp.z_lb) & (qp.z_lb > -INFTY / 2) & ~pinned
    m_u = jnp.isfinite(qp.z_ub) & (qp.z_ub < INFTY / 2) & ~pinned
    lb = jnp.where(m_l, qp.z_lb, 0.0)
    ub = jnp.where(m_u, qp.z_ub, 0.0)
    P_eff = P_diag + jnp.where(pinned, _PIN, 0.0)
    q_eff = q - jnp.where(pinned, _PIN * qp.z_lb, 0.0)
    n_slack = jnp.maximum(jnp.sum(m_l) + jnp.sum(m_u), 1)

    # Infeasible start: slacks begin at 1 regardless of w (the slack
    # equalities w - lb = s_l / ub - w = s_u carry their own residuals
    # r_l / r_u below and are linear, so one Newton step zeroes them).
    w = jnp.zeros((N, nb), dtype) if w0 is None else jnp.asarray(w0, dtype)
    w = jnp.where(pinned, qp.z_lb, w)
    s_l = jnp.ones((N, nb), dtype)
    s_u = jnp.ones((N, nb), dtype)
    lam_l = jnp.ones_like(s_l)
    lam_u = jnp.ones_like(s_u)
    y = jnp.zeros(b.shape, dtype)

    eps = jnp.asarray(config.eps_abs, dtype)

    def residuals(w, y, lam_l, lam_u):
        r_d = (
            P_eff * w + q_eff + _rmatvec_rows(C, Cp, y)
            - jnp.where(m_l, lam_l, 0.0) + jnp.where(m_u, lam_u, 0.0)
        )
        # Pinned rows carry the pin's f64 roundoff (_PIN * eps_machine),
        # not a KKT error -- exclude them from the stationarity test.
        r_d = jnp.where(pinned, 0.0, r_d)
        r_p = _matvec_rows(C, Cp, w) - b
        return r_d, r_p

    def mu_of(s_l, lam_l, s_u, lam_u):
        dots = jnp.sum(jnp.where(m_l, s_l * lam_l, 0.0)) + jnp.sum(
            jnp.where(m_u, s_u * lam_u, 0.0)
        )
        return dots / n_slack

    def cond(state):
        w, y, s_l, s_u, lam_l, lam_u, k, done = state
        return (~done) & (k < _MAX_ITERS)

    def body(state):
        w, y, s_l, s_u, lam_l, lam_u, k, _ = state
        r_d, r_p = residuals(w, y, lam_l, lam_u)
        mu = mu_of(s_l, lam_l, s_u, lam_u)

        Dd = jnp.where(m_l, lam_l / s_l, 0.0) + jnp.where(m_u, lam_u / s_u, 0.0)
        Hd = P_eff + Dd                      # true Newton diagonal
        Wd = 1.0 / (Hd + _DELTA)             # regularized inverse
        factor = bt_factor(*_schur_blocks(C, Cp, Wd))

        def solve_kkt(f, g):
            """(Hd + delta) dw + A' dy = f;  A dw = g  -- plus one
            refinement step against the unregularized Hd system."""
            def once(f_, g_):
                rhs_y = _matvec_rows(C, Cp, Wd * f_) - g_
                dy_ = bt_solve(factor, rhs_y)
                dw_ = Wd * (f_ - _rmatvec_rows(C, Cp, dy_))
                return dw_, dy_

            dw, dy = once(f, g)
            e_f = f - (Hd * dw + _rmatvec_rows(C, Cp, dy))
            e_g = g - _matvec_rows(C, Cp, dw)
            cw, cy = once(e_f, e_g)
            return dw + cw, dy + cy
        # Slack-equality residuals (infeasible start): w - lb - s_l,
        # ub - w - s_u; linear, so Newton zeroes them in one step via
        # ds_l = dw + r_l, ds_u = r_u - dw.
        r_l = jnp.where(m_l, w - lb - s_l, 0.0)
        r_u = jnp.where(m_u, ub - w - s_u, 0.0)

        def newton(sig_mu, ds_l_aff=None, dlam_l_aff=None,
                   ds_u_aff=None, dlam_u_aff=None):
            # Complementarity targets (with optional Mehrotra correction).
            t_l = sig_mu - s_l * lam_l
            t_u = sig_mu - s_u * lam_u
            if ds_l_aff is not None:
                t_l = t_l - ds_l_aff * dlam_l_aff
                t_u = t_u - ds_u_aff * dlam_u_aff
            r1 = (
                -r_d
                + jnp.where(m_l, (t_l - lam_l * r_l) / s_l, 0.0)
                - jnp.where(m_u, (t_u - lam_u * r_u) / s_u, 0.0)
            )
            dw, dy = solve_kkt(r1, -r_p)
            ds_l = dw + r_l
            ds_u = r_u - dw
            dlam_l = jnp.where(m_l, (t_l - lam_l * ds_l) / s_l, 0.0)
            dlam_u = jnp.where(m_u, (t_u - lam_u * ds_u) / s_u, 0.0)
            return dw, dy, ds_l, ds_u, dlam_l, dlam_u

        # Affine predictor.
        dw_a, dy_a, dsl_a, dsu_a, dll_a, dlu_a = newton(0.0)
        a_p = jnp.minimum(_max_step(s_l, dsl_a, m_l), _max_step(s_u, dsu_a, m_u))
        a_d = jnp.minimum(_max_step(lam_l, dll_a, m_l), _max_step(lam_u, dlu_a, m_u))
        mu_aff = mu_of(
            s_l + a_p * dsl_a, lam_l + a_d * dll_a,
            s_u + a_p * dsu_a, lam_u + a_d * dlu_a,
        )
        sigma = jnp.clip((mu_aff / jnp.maximum(mu, 1e-300)) ** 3, 0.0, 1.0)

        # Corrector (same factorization).
        dw, dy, ds_l, ds_u, dlam_l, dlam_u = newton(
            sigma * mu, a_p * dsl_a, a_d * dll_a, a_p * dsu_a, a_d * dlu_a
        )
        a_p = jnp.minimum(_max_step(s_l, ds_l, m_l), _max_step(s_u, ds_u, m_u))
        a_d = jnp.minimum(_max_step(lam_l, dlam_l, m_l), _max_step(lam_u, dlam_u, m_u))

        w = w + a_p * dw
        s_l = jnp.where(m_l, s_l + a_p * ds_l, s_l)
        s_u = jnp.where(m_u, s_u + a_p * ds_u, s_u)
        y = y + a_d * dy
        lam_l = jnp.where(m_l, lam_l + a_d * dlam_l, lam_l)
        lam_u = jnp.where(m_u, lam_u + a_d * dlam_u, lam_u)

        # Non-finite bail-out: past the dtype's accuracy the Schur solve can
        # blow up; keep the last finite iterate and stop.
        finite = (
            jnp.all(jnp.isfinite(w)) & jnp.all(jnp.isfinite(y))
            & jnp.all(jnp.isfinite(lam_l)) & jnp.all(jnp.isfinite(lam_u))
        )
        w = jnp.where(finite, w, state[0])
        y = jnp.where(finite, y, state[1])
        s_l = jnp.where(finite, s_l, state[2])
        s_u = jnp.where(finite, s_u, state[3])
        lam_l = jnp.where(finite, lam_l, state[4])
        lam_u = jnp.where(finite, lam_u, state[5])

        r_d, r_p = residuals(w, y, lam_l, lam_u)
        r_l = jnp.where(m_l, w - lb - s_l, 0.0)
        r_u = jnp.where(m_u, ub - w - s_u, 0.0)
        mu = mu_of(s_l, lam_l, s_u, lam_u)
        done = (
            (jnp.max(jnp.abs(r_p)) <= eps)
            & (jnp.max(jnp.abs(r_d)) <= eps)
            & (jnp.maximum(jnp.max(jnp.abs(r_l)), jnp.max(jnp.abs(r_u))) <= eps)
            & (mu <= eps)
        ) | ~finite
        return w, y, s_l, s_u, lam_l, lam_u, k + 1, done

    init = (w, y, s_l, s_u, lam_l, lam_u, jnp.asarray(0, jnp.int32),
            jnp.asarray(False))
    w, y, s_l, s_u, lam_l, lam_u, iters, done = jax.lax.while_loop(
        cond, body, init
    )

    r_d, r_p = residuals(w, y, lam_l, lam_u)
    # OSQP sign convention for box duals: positive at the upper bound.
    y_b = jnp.where(m_u, lam_u, 0.0) - jnp.where(m_l, lam_l, 0.0)
    return TrajQPSolution(
        w=jnp.where(pinned, qp.z_lb, w),
        y_r=y,
        y_b=y_b,
        iterations=iters,
        r_prim=jnp.max(jnp.abs(r_p)),
        r_dual=jnp.max(jnp.abs(r_d)),
        converged=done,
    )
