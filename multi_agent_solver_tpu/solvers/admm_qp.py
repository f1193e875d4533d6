"""Batched ADMM box-constrained QP solver (the OSQP replacement).

The reference links the OSQP C library through OsqpEigen (osqp.hpp:15,
osqp_collocation.hpp:12).  OSQP's sparse LDL^T + CSC machinery neither
compiles for TPU nor batches, so this module implements the same operator
-splitting algorithm (Stellato et al., "OSQP: an operator splitting solver
for quadratic programs") natively in JAX:

    minimize    (1/2) z'Pz + q'z
    subject to  lb <= Az <= ub

* The KKT system ``(P + sigma I + A' diag(rho) A)`` is formed **densely** and
  factorized with one Cholesky -- trajectory-optimization QPs here have a few
  hundred variables, so a dense factor is a single small MXU task and the
  per-iteration solve is two triangular matmuls; no sparse scatter/gather
  anywhere (TPUs hate it).
* Constraint-wise penalties: equality rows (lb == ub) get ``rho * 1e3``
  exactly like OSQP's default rho scheme.
* Adaptive rho runs in a small fixed number of *stages*: each stage
  factorizes once and runs ADMM iterations under ``lax.while_loop`` with
  residual-based early exit; between stages rho rescales by
  ``sqrt(r_prim_rel / r_dual_rel)`` (OSQP's rule) and the KKT refactorizes.
* Everything is pure and vmappable: Nash sweeps solve N agents' QPs as
  batch lanes of one program.

* Ruiz equilibration (the reference sets ``setScaling(10)``) runs as a fixed
  number of vectorized passes over the diagonal cost and dense A; convergence
  is checked on **unscaled** residuals, as OSQP does.

Polish is implemented as a reweighted-active-set refinement (static shapes);
see ADMMConfig.polish.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def full_precision(fn):
    """Trace ``fn`` with f32-exact matmuls.

    TPU dots default to bf16-input passes; the ADMM recursions (Gram
    products, Cholesky solves, cyclic reduction) amplify that rounding into
    divergence/NaN at f32 -- observed on the real chip for the collocation
    SQP (single_track cost=nan) while identical CPU f32 runs converge.
    These are tiny matrices; full precision costs nothing measurable.
    """

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped

from ..types import Array

INFTY = 1e30  # OsqpEigen::INFTY analogue


@dataclasses.dataclass(frozen=True)
class ADMMConfig:
    """Mirrors the OSQP settings the reference sets (osqp.hpp:49-54,
    osqp_collocation.hpp:106-113)."""

    max_iterations: int = 1000      # setMaxIteration
    eps_abs: float = 1e-3           # OSQP defaults (shooting); collocation 1e-4
    eps_rel: float = 1e-3
    rho: float = 0.1                # OSQP default
    sigma: float = 1e-6
    alpha: float = 1.6              # relaxation
    eq_rho_scale: float = 1e3       # equality rows: rho * 1e3 (OSQP convention)
    adaptive_rho_stages: int = 4    # setAdaptiveRho(true): staged refactors
    rho_min: float = 1e-6
    rho_max: float = 1e6
    scaling_iters: int = 10         # setScaling(10): Ruiz equilibration passes
    # setPolish(true): after convergence, re-solve with the detected active
    # set treated as (near-)equalities.  OSQP solves the reduced KKT of
    # exactly the active rows; with static shapes we realize the same effect
    # by reweighting rho: polish_rho on active rows, polish_rho_inactive on
    # the rest, then a short ADMM refinement from the current iterate.
    polish: bool = True
    polish_rho: float = 1e6
    polish_rho_inactive: float = 1e-6
    polish_iters: int = 30


class QPSolution(NamedTuple):
    x: Array          # primal solution [n]
    y: Array          # dual solution [m]
    z: Array          # projected constraint value [m]
    iterations: Array  # total ADMM iterations executed
    r_prim: Array
    r_dual: Array
    converged: Array


def _ruiz_equilibrate(P_diag, q, A, iters: int):
    """Modified Ruiz equilibration (OSQP section 5.1), vectorized.

    Returns scaling vectors ``D`` [n], ``E`` [m] and cost scalar ``c`` such
    that the scaled problem uses ``P_s = c D^2 P``, ``q_s = c D q``,
    ``A_s = E A D`` (elementwise outer scaling), ``[lb_s, ub_s] = E [lb, ub]``.
    """
    n = q.shape[0]
    m = A.shape[0]
    dtype = q.dtype
    D = jnp.ones(n, dtype)
    E = jnp.ones(m, dtype)
    c = jnp.asarray(1.0, dtype)

    def body(_, carry):
        D, E, c = carry
        P_s = c * D * D * P_diag                      # diagonal of scaled P
        A_s = E[:, None] * A * D[None, :]
        # Column norms of [P_s; A_s] -> delta_x; row norms of A_s -> delta_e.
        col_norm = jnp.maximum(jnp.abs(P_s), jnp.max(jnp.abs(A_s), axis=0))
        row_norm = jnp.max(jnp.abs(A_s), axis=1)
        delta_x = 1.0 / jnp.sqrt(jnp.maximum(col_norm, 1e-10))
        delta_e = 1.0 / jnp.sqrt(jnp.maximum(row_norm, 1e-10))
        D = D * delta_x
        E = E * delta_e
        # Cost normalization (OSQP's gamma step).
        P_s = c * D * D * P_diag
        q_s = c * D * q
        gamma = 1.0 / jnp.maximum(
            jnp.maximum(jnp.mean(jnp.abs(P_s)), jnp.max(jnp.abs(q_s))), 1e-10
        )
        c = c * gamma
        return D, E, c

    return jax.lax.fori_loop(0, iters, body, (D, E, c))


def _residuals(P_diag, q, A, x, y, z, D, E, c):
    """Unscaled OSQP residuals of scaled iterates (OSQP section 5.1)."""
    Ax = (A @ x) / E              # E^{-1} A_s x_s = A x  (unscaled)
    zu = z / E
    r_prim = jnp.max(jnp.abs(Ax - zu))
    Px = (P_diag * x) / D / c     # D^{-1} P_s x_s / c = P x  (unscaled)
    Aty = (A.T @ y) / D / c
    qu = q / D / c
    r_dual = jnp.max(jnp.abs(Px + qu + Aty))
    prim_scale = jnp.maximum(jnp.max(jnp.abs(Ax)), jnp.max(jnp.abs(zu)))
    dual_scale = jnp.maximum(
        jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(Aty))), jnp.max(jnp.abs(qu))
    )
    return r_prim, r_dual, prim_scale, dual_scale


@full_precision
def solve_box_qp(
    P_diag: Array,
    q: Array,
    A: Array,
    lb: Array,
    ub: Array,
    config: ADMMConfig = ADMMConfig(),
    x0: Optional[Array] = None,
    y0: Optional[Array] = None,
) -> QPSolution:
    """Solve one box-QP with diagonal cost (both reference QP layers build
    diagonal-only Hessians: osqp.hpp:272-311, osqp_collocation.hpp:274-336).

    ``A`` is dense ``[m, n]``; pass ``x0``/``y0`` to warm start (the analogue
    of OSQP's persistent workspace, osqp.hpp:90-110).
    """
    n = q.shape[0]
    m = lb.shape[0]
    dtype = q.dtype

    is_eq = jnp.abs(ub - lb) < 1e-12

    # Ruiz equilibration; scaled problem quantities carry an _s mentally --
    # the local names P_diag/q/A/lb/ub below are the SCALED data.
    if config.scaling_iters > 0:
        D, E, c = _ruiz_equilibrate(P_diag, q, A, config.scaling_iters)
    else:
        D = jnp.ones(n, dtype)
        E = jnp.ones(m, dtype)
        c = jnp.asarray(1.0, dtype)
    P_diag = c * D * D * P_diag
    q = c * D * q
    A = E[:, None] * A * D[None, :]
    lb = jnp.clip(E * lb, -INFTY, INFTY)
    ub = jnp.clip(E * ub, -INFTY, INFTY)

    x = jnp.zeros(n, dtype) if x0 is None else x0 / D
    y = jnp.zeros(m, dtype) if y0 is None else c * y0 / E
    z = jnp.clip(A @ x, lb, ub)

    sigma = jnp.asarray(config.sigma, dtype)
    alpha = jnp.asarray(config.alpha, dtype)

    iters_per_stage = max(1, config.max_iterations // max(1, config.adaptive_rho_stages))

    def rho_vector(rho_bar):
        return jnp.where(is_eq, rho_bar * config.eq_rho_scale, rho_bar)

    def factor(rho_bar):
        rho_vec = rho_vector(rho_bar)
        K = jnp.diag(P_diag + sigma) + (A.T * rho_vec) @ A
        return jnp.linalg.cholesky(K), rho_vec

    def admm_iter(carry):
        x, y, z, rho_vec, chol, k, done = carry
        rhs = sigma * x - q + A.T @ (rho_vec * z - y)
        x_tilde = jax.scipy.linalg.cho_solve((chol, True), rhs)
        z_tilde = A @ x_tilde
        x_new = alpha * x_tilde + (1.0 - alpha) * x
        z_relax = alpha * z_tilde + (1.0 - alpha) * z
        z_new = jnp.clip(z_relax + y / rho_vec, lb, ub)
        y_new = y + rho_vec * (z_relax - z_new)

        r_prim, r_dual, ps, ds = _residuals(P_diag, q, A, x_new, y_new, z_new, D, E, c)
        eps_prim = config.eps_abs + config.eps_rel * ps
        eps_dual = config.eps_abs + config.eps_rel * ds
        done = (r_prim <= eps_prim) & (r_dual <= eps_dual)
        return x_new, y_new, z_new, rho_vec, chol, k + 1, done

    def stage(carry, _):
        x, y, z, rho_bar, total_iters, converged = carry

        chol, rho_vec = factor(rho_bar)

        def cond(c):
            return (~c[6]) & (c[5] < iters_per_stage)

        x, y, z, _, _, k, done = jax.lax.while_loop(
            cond,
            admm_iter,
            (x, y, z, rho_vec, chol, jnp.asarray(0, jnp.int32), converged),
        )

        # OSQP adaptive-rho rule between stages.
        r_prim, r_dual, ps, ds = _residuals(P_diag, q, A, x, y, z, D, E, c)
        ratio = jnp.sqrt(
            (r_prim / jnp.maximum(ps, 1e-10)) / jnp.maximum(r_dual / jnp.maximum(ds, 1e-10), 1e-10)
        )
        rho_new = jnp.clip(rho_bar * ratio, config.rho_min, config.rho_max)
        rho_bar = jnp.where(done, rho_bar, rho_new)
        return (x, y, z, rho_bar, total_iters + k, converged | done), None

    init = (
        x, y, z,
        jnp.asarray(config.rho, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
    )
    (x, y, z, _, total_iters, converged), _ = jax.lax.scan(
        stage, init, None, length=config.adaptive_rho_stages
    )

    if config.polish:
        # Active-set detection on the scaled iterate (OSQP section 5.2):
        # rows whose slack sits at a bound with the matching dual sign.
        tol = 1e-6
        at_lb = (z - lb <= tol) & (y < 0.0)
        at_ub = (ub - z <= tol) & (y > 0.0)
        active = at_lb | at_ub | is_eq
        rho_vec = jnp.where(
            active,
            jnp.asarray(config.polish_rho, dtype),
            jnp.asarray(config.polish_rho_inactive, dtype),
        )
        K = jnp.diag(P_diag + sigma) + (A.T * rho_vec) @ A
        chol = jnp.linalg.cholesky(K)

        def polish_iter(_, carry):
            x, y, z = carry
            rhs = sigma * x - q + A.T @ (rho_vec * z - y)
            x_t = jax.scipy.linalg.cho_solve((chol, True), rhs)
            z_t = A @ x_t
            x_n = alpha * x_t + (1.0 - alpha) * x
            z_rel = alpha * z_t + (1.0 - alpha) * z
            z_n = jnp.clip(z_rel + y / rho_vec, lb, ub)
            y_n = y + rho_vec * (z_rel - z_n)
            return x_n, y_n, z_n

        x_p, y_p, z_p = jax.lax.fori_loop(
            0, config.polish_iters, polish_iter, (x, y, z)
        )
        # Keep the polished iterate only if it tightened the residuals.
        rp0, rd0, _, _ = _residuals(P_diag, q, A, x, y, z, D, E, c)
        rp1, rd1, _, _ = _residuals(P_diag, q, A, x_p, y_p, z_p, D, E, c)
        better = jnp.maximum(rp1, rd1) < jnp.maximum(rp0, rd0)
        x = jnp.where(better, x_p, x)
        y = jnp.where(better, y_p, y)
        z = jnp.where(better, z_p, z)

    r_prim, r_dual, _, _ = _residuals(P_diag, q, A, x, y, z, D, E, c)
    return QPSolution(
        x=D * x, y=E * y / c, z=z / E, iterations=total_iters,
        r_prim=r_prim, r_dual=r_dual, converged=converged,
    )
