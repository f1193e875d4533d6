"""Trapezoidal direct-collocation SQP in delta form ("osqp_collocation").

Behavioural analogue of the reference's ``solvers/osqp_collocation.hpp:23-510``
on the native ADMM QP backend.  This is the reference's recommended solver for
the nonconvex pendulum swing-up (README.md:26), and unlike its iLQR it is
mathematically sound: trapezoidal defects use the continuous dynamics and
their exact Jacobians.

Preserved reference semantics:

* decision vector ``z = [dx_1..dx_T, du_0..du_{T-1}]`` -- x_0 is eliminated
  (osqp_collocation.hpp:37-46);
* diagonal-only Hessians with the convexification shift: if
  ``min(diag) + reg < 0``, shift the whole diagonal by ``|min(diag)| + reg``
  (osqp_collocation.hpp:274-336);
* trapezoidal defect ``d = x_{t+1} - x_t - dt/2 (f_t + f_{t+1})`` as equality
  rows ``lb = ub = -d`` with linearization
  ``[I - dt/2 Fx_{t+1}] dx_{t+1} + [-I - dt/2 Fx_t] dx_t
  - dt/2 Fu_t du_t - dt/2 Fu_{t+1} du_{t+1}``
  (osqp_collocation.hpp:358-389);
* bounds in delta form ``bound - reference`` on x_1..x_T and u_0..u_{T-1}
  (osqp_collocation.hpp:398-421);
* outer SQP loop applies the FULL delta step (no line search) and stops when
  ``||delta|| < tolerance``; the reported cost is the objective of the final
  trajectory (osqp_collocation.hpp:470-503).

The reference's change-detection caches (osqp_collocation.hpp:259-356) are
unnecessary here: all T stages' derivatives evaluate in a handful of batched
fused launches, cheaper than any cache bookkeeping.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..ocp import OCPSpec
from ..types import Array, SolverParams, get_param, param_flag
from .admm_qp import ADMMConfig, INFTY, solve_box_qp
from .base import SolveResult, SolverBase, register_solver
from .osqp_shooting import _PersistentWorkspaceMixin, _maybe_deadline


@dataclasses.dataclass(frozen=True)
class OSQPCollocationConfig:
    max_iterations: int = 20
    tolerance: float = 1e-4
    reg: float = 1e-6                    # osqp_collocation.hpp:467 constexpr
    qp_max_iterations: int = 4000        # osqpmax_iter default
    qp_eps_abs: float = 1e-4             # osqpabs_tol default
    qp_eps_rel: float = 1e-4             # osqprel_tol default
    # Optional trust-region cap on ||delta|| per SQP step (param step_limit).
    # The reference applies FULL steps with no safeguard
    # (osqp_collocation.hpp:488-494), which diverges on problems with
    # near-singular dynamics (e.g. the rocket's thrust/max(m, eps) as m -> 0);
    # 0 disables (reference parity).
    step_limit: float = 0.0
    # 'structured' (default): block-tridiagonal KKT by cyclic reduction
    # (solvers/traj_qp.py) -- O(T nb^3), scales to T in the thousands.
    # 'dense': materialized constraint matrix + dense Cholesky.
    backend: str = "structured"
    # Initial state trajectory (param ``colloc_init``): 'rollout' integrates
    # the warm-start controls (reference parity, osqp_collocation.hpp:455-463);
    # 'hold' seeds every knot at the initial state.  Collocation never needs a
    # dynamically feasible seed -- the trapezoidal equality rows repair the
    # defects -- so 'hold' sidesteps seeds whose rollout is numerically
    # garbage (the rocket's half-thrust guess empties the tank at exactly
    # t = T dt and RK4 through the thrust/max(m, 1e-6) singularity produces
    # |v| ~ 1e5; delta steps from there diverge, docs/PARITY.md).
    init: str = "rollout"
    # QP backend for the structured path (param ``ip_qp``): 'admm' (default,
    # OSQP-parity first-order) or 'ip' (Mehrotra interior point).
    qp_solver: str = "admm"
    max_ms: float = 1000.0         # osqp_collocation.hpp:104 default; opt-in
    enforce_max_ms: bool = False
    debug: bool = False

    @classmethod
    def from_params(cls, params: SolverParams) -> "OSQPCollocationConfig":
        return cls(
            max_iterations=int(get_param(params, "max_iterations")),
            tolerance=get_param(params, "tolerance"),
            qp_max_iterations=int(get_param(params, "osqpmax_iter", 4000)),
            qp_eps_abs=get_param(params, "osqpabs_tol", 1e-4),
            qp_eps_rel=get_param(params, "osqprel_tol", 1e-4),
            step_limit=get_param(params, "step_limit", 0.0),
            backend="dense" if param_flag(params, "dense_qp") else "structured",
            init=str(params.get("colloc_init", "rollout"))
                if isinstance(params.get("colloc_init", "rollout"), str)
                else ("hold" if params.get("colloc_init") else "rollout"),
            qp_solver="ip" if param_flag(params, "ip_qp") else "admm",
            max_ms=get_param(params, "max_ms", 1000.0),
            enforce_max_ms=param_flag(params, "enforce_max_ms"),
            debug=param_flag(params, "debug"),
        )


def _collocation_indices(T: int, nx: int, nu: int):
    """Static scatter indices for the trapezoidal constraint blocks.

    Variable layout: dx_t at (t-1)*nx for t=1..T; du_t at T*nx + t*nu.
    """
    n = T * nx + T * nu
    n_dyn = T * nx
    m = n_dyn + T * nx + T * nu

    def id_state(t):  # t in 1..T
        return (t - 1) * nx

    t_idx = np.arange(T)
    i = np.arange(nx)
    jx = np.arange(nx)
    ju = np.arange(nu)

    # dx_{t+1} block: rows t*nx+i, cols id_state(t+1)+j  (always present)
    rows_xp = (t_idx[:, None, None] * nx + i[None, :, None]) + np.zeros((1, 1, nx), int)
    cols_xp = (t_idx[:, None, None] * nx + jx[None, None, :]) + np.zeros((1, nx, 1), int)
    # dx_t block: only for t >= 1, cols id_state(t)+j
    rows_x = rows_xp[1:]
    cols_x = ((t_idx[1:, None, None] - 1) * nx + jx[None, None, :]) + np.zeros((1, nx, 1), int)
    # du_t block: cols T*nx + t*nu + j (always present)
    rows_u = (t_idx[:, None, None] * nx + i[None, :, None]) + np.zeros((1, 1, nu), int)
    cols_u = (T * nx + t_idx[:, None, None] * nu + ju[None, None, :]) + np.zeros((1, nx, 1), int)
    # du_{t+1} block: only for t+1 < T
    rows_up = rows_u[:-1]
    cols_up = (T * nx + (t_idx[:-1, None, None] + 1) * nu + ju[None, None, :]) + np.zeros(
        (1, nx, 1), int
    )

    base = np.zeros((m, n))
    r = np.arange(T * nx + T * nu)
    base[n_dyn + r, r] = 1.0   # identity bound rows
    return base, (rows_xp, cols_xp, rows_x, cols_x, rows_u, cols_u, rows_up, cols_up), (m, n, n_dyn)


def _convexify(diag: Array, reg: float) -> Array:
    """Diagonal shift when min(diag) + reg < 0 (osqp_collocation.hpp:277-283)."""
    min_diag = jnp.min(diag, axis=-1, keepdims=True)
    shift = jnp.where(min_diag + reg < 0.0, jnp.abs(min_diag) + reg, 0.0)
    return diag + shift


def _initial_trajectory(spec: OCPSpec, us0: Array, mode: str) -> Array:
    """Seed state knots: 'rollout' (reference parity) or 'hold' at x0."""
    if mode == "hold":
        return jnp.broadcast_to(
            spec.initial_state, (spec.horizon_steps + 1, spec.state_dim)
        ).astype(spec.initial_state.dtype)
    return spec.rollout(us0)


def _solve_osqp_collocation_structured(
    spec: OCPSpec, config: OSQPCollocationConfig, qp_warm=None
):
    """Structured-QP variant: stage blocks s_k = [dx_k, du_k] (k = 0..T;
    dx_0 and du_T are pinned pads), trapezoidal row t coupling s_t and
    s_{t+1} -- identical QP to the dense path, block-tridiagonal KKT."""
    from .traj_qp import TrajQP, solve_traj_box_qp
    from .ip_qp import solve_traj_box_qp_ip

    T, nx, nu = spec.horizon_steps, spec.state_dim, spec.control_dim
    dtype = spec.initial_state.dtype
    dt = spec.dt
    d = spec.derivs
    nb = nx + nu
    N = T + 1
    eye = jnp.eye(nx, dtype=dtype)

    qp_config = ADMMConfig(
        max_iterations=config.qp_max_iterations,
        eps_abs=config.qp_eps_abs,
        eps_rel=config.qp_eps_rel,
    )

    ts = jnp.arange(T)
    ts_mid = jnp.arange(1, T)
    u_mid_idx = jnp.minimum(ts_mid, T - 1)

    def assemble(xs, us):
        # Gradient / diagonal Hessian stage blocks (osqp_collocation.hpp:246-340).
        # Cost derivative oracles forward any extra context slice unchanged
        # (inter-agent coupling enters through these stacks exactly as in the
        # iLQR stage expansion, ilqr.py:168).
        def stage_args(t, ui):
            base = (xs[t], us[ui], t)
            return base if spec.context is None else base + (spec.context[t],)

        g_x_mid = jax.vmap(lambda t, ui: d.lx(*stage_args(t, ui)))(ts_mid, u_mid_idx)
        g_term = d.phix(xs[T])
        g_u = jax.vmap(lambda t: d.lu(*stage_args(t, t)))(ts)
        q_x = jnp.concatenate([jnp.zeros((1, nx), dtype), g_x_mid, g_term[None]], axis=0)
        q_u = jnp.concatenate([g_u, jnp.zeros((1, nu), dtype)], axis=0)
        q = jnp.concatenate([q_x, q_u], axis=1)

        Q_mid = jax.vmap(lambda t, ui: jnp.diagonal(d.lxx(*stage_args(t, ui))))(ts_mid, u_mid_idx)
        Q_term = jnp.diagonal(d.phixx(xs[T]))
        R_all = jax.vmap(lambda t: jnp.diagonal(d.luu(*stage_args(t, t))))(ts)
        P_x = jnp.concatenate(
            [jnp.ones((1, nx), dtype), _convexify(Q_mid, config.reg),
             _convexify(Q_term, config.reg)[None]],
            axis=0,
        )
        P_u = jnp.concatenate(
            [_convexify(R_all, config.reg), jnp.ones((1, nu), dtype)], axis=0
        )
        P_diag = jnp.concatenate([P_x, P_u], axis=1)

        # Dynamics knots and trapezoidal rows (osqp_collocation.hpp:342-389).
        u_knot_idx = jnp.minimum(jnp.arange(T + 1), T - 1)
        u_knots = us[u_knot_idx]
        f_all = jax.vmap(spec.dynamics)(xs, u_knots)
        Fx_all = jax.vmap(d.fx)(xs, u_knots)
        Fu_all = jax.vmap(d.fu)(xs, u_knots)
        defect = xs[1:] - xs[:-1] - 0.5 * dt * (f_all[:-1] + f_all[1:])  # [T, nx]

        C_x = -eye[None] - 0.5 * dt * Fx_all[:T]       # on dx_t
        C_x = C_x.at[0].set(0.0)                       # dx_0 pad: no column
        C_u = -0.5 * dt * Fu_all[:T]                   # on du_t
        C = jnp.concatenate([C_x, C_u], axis=2)
        Cp_x = eye[None] - 0.5 * dt * Fx_all[1:]       # on dx_{t+1}
        Cp_u = -0.5 * dt * Fu_all[1:]                  # on du_{t+1}
        Cp_u = Cp_u.at[T - 1].set(0.0)                 # du_T pad: no column
        Cp = jnp.concatenate([Cp_x, Cp_u], axis=2)

        def delta_bounds(bound, refs, default):
            if bound is None:
                return jnp.full(refs.shape, default, dtype)
            return bound[None, :] - refs

        zx_lb = jnp.concatenate(
            [jnp.zeros((1, nx), dtype), delta_bounds(spec.state_lower_bounds, xs[1:], -INFTY)]
        )
        zx_ub = jnp.concatenate(
            [jnp.zeros((1, nx), dtype), delta_bounds(spec.state_upper_bounds, xs[1:], INFTY)]
        )
        zu_lb = jnp.concatenate(
            [delta_bounds(spec.input_lower_bounds, us, -INFTY), jnp.zeros((1, nu), dtype)]
        )
        zu_ub = jnp.concatenate(
            [delta_bounds(spec.input_upper_bounds, us, INFTY), jnp.zeros((1, nu), dtype)]
        )
        z_lb = jnp.concatenate([zx_lb, zu_lb], axis=1)
        z_ub = jnp.concatenate([zx_ub, zu_ub], axis=1)
        return TrajQP(P_diag, q, C, Cp, -defect, -defect, z_lb, z_ub)

    us0 = spec.initial_controls
    xs0 = _initial_trajectory(spec, us0, config.init)

    def cond(state):
        return (state[6] < config.max_iterations) & ~state[7] & ~state[8]

    def body(state):
        xs, us, w_warm, yr_warm, yb_warm, _, it, _, _ = state
        # Interior-point linear algebra needs double precision (every
        # production IP solver is f64: the Schur system's condition grows
        # like 1/mu); on f32 backends (TPU) 'ip' falls back to ADMM.
        use_ip = config.qp_solver == "ip" and dtype == jnp.float64
        qp_solve = solve_traj_box_qp_ip if use_ip else solve_traj_box_qp
        qp = qp_solve(
            assemble(xs, us), qp_config, w0=w_warm, y_r0=yr_warm, y_b0=yb_warm
        )
        w = qp.w
        if config.step_limit > 0.0:
            norm = jnp.sqrt(jnp.sum(w**2))
            scale = jnp.minimum(1.0, config.step_limit / jnp.maximum(norm, 1e-30))
            w = w * scale
        dx = w[1:, :nx]
        du = w[:T, nx:]

        step_norm = jnp.sqrt(jnp.sum(dx**2) + jnp.sum(du**2))
        # Non-finite guard: a diverged QP step (e.g. the rocket's m -> 0
        # singularity under unguarded full steps) is rejected and the loop
        # stops with the last finite iterate.  The reference applies the
        # step regardless and the whole trajectory NaNs out
        # (osqp_collocation.hpp:488-494 has no safeguard); for every finite
        # trajectory this branch never triggers, so parity is unaffected.
        finite = jnp.isfinite(step_norm)
        xs = jnp.where(finite, xs.at[1:].add(dx), xs)   # full step
        us = jnp.where(finite, us + du, us)
        done = (step_norm < config.tolerance) | ~finite
        timed_out = _maybe_deadline(config)
        return (xs, us, qp.w, qp.y_r, qp.y_b, qp.iterations, it + 1, done, timed_out)

    if qp_warm is None:
        qp_warm = (
            jnp.zeros((N, nb), dtype), jnp.zeros((T, nx), dtype),
            jnp.zeros((N, nb), dtype),
        )
    init = (
        xs0, us0, *qp_warm,
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), jnp.asarray(False),
        jnp.asarray(False),
    )
    xs, us, w, y_r, y_b, _, it, done, _ = jax.lax.while_loop(cond, body, init)
    cost = spec.cost(xs, us)   # osqp_collocation.hpp:503
    result = SolveResult(states=xs, controls=us, cost=cost, iterations=it, converged=done)
    return result, (w, y_r, y_b)


def solve_osqp_collocation_warm(
    spec: OCPSpec, config: OSQPCollocationConfig, qp_warm=None
):
    """Solve and also return the final QP primal/dual state (persistent
    workspace analogue, osqp.hpp:90-110 / osqp_collocation.hpp:455-463)."""
    if config.backend == "structured":
        return _solve_osqp_collocation_structured(spec, config, qp_warm)
    return _solve_osqp_collocation_dense(spec, config, qp_warm)


def solve_osqp_collocation(spec: OCPSpec, config: OSQPCollocationConfig) -> SolveResult:
    return solve_osqp_collocation_warm(spec, config)[0]


def _solve_osqp_collocation_dense(
    spec: OCPSpec, config: OSQPCollocationConfig, qp_warm=None
):
    T, nx, nu = spec.horizon_steps, spec.state_dim, spec.control_dim
    dtype = spec.initial_state.dtype
    dt = spec.dt
    d = spec.derivs

    base_np, idxs, (m, n, n_dyn) = _collocation_indices(T, nx, nu)
    rows_xp, cols_xp, rows_x, cols_x, rows_u, cols_u, rows_up, cols_up = idxs
    A_base = jnp.asarray(base_np, dtype)
    eye = jnp.eye(nx, dtype=dtype)

    qp_config = ADMMConfig(
        max_iterations=config.qp_max_iterations,
        eps_abs=config.qp_eps_abs,
        eps_rel=config.qp_eps_rel,
    )

    ts = jnp.arange(T)
    # Stage-cost evaluation points: states t=1..T-1 pair with u_{min(t, T-1)}
    # (osqp_collocation.hpp:246-263); the terminal state uses terminal cost.
    ts_mid = jnp.arange(1, T)
    u_mid_idx = jnp.minimum(ts_mid, T - 1)

    def assemble(xs, us):
        # Cost oracles forward any context slice unchanged (see ilqr.py:168).
        def stage_args(t, ui):
            base = (xs[t], us[ui], t)
            return base if spec.context is None else base + (spec.context[t],)

        # Gradient (osqp_collocation.hpp:246-253).
        g_x_mid = jax.vmap(lambda t, ui: d.lx(*stage_args(t, ui)))(ts_mid, u_mid_idx)  # [T-1, nx]
        g_term = d.phix(xs[T])
        g_u = jax.vmap(lambda t: d.lu(*stage_args(t, t)))(ts)                          # [T, nu]
        q = jnp.concatenate([g_x_mid.reshape(-1), g_term, g_u.reshape(-1)])

        # Diagonal Hessians with convexification (osqp_collocation.hpp:260-336).
        Q_mid = jax.vmap(lambda t, ui: jnp.diagonal(d.lxx(*stage_args(t, ui))))(ts_mid, u_mid_idx)
        Q_term = jnp.diagonal(d.phixx(xs[T]))
        R_all = jax.vmap(lambda t: jnp.diagonal(d.luu(*stage_args(t, t))))(ts)
        P_diag = jnp.concatenate([
            _convexify(Q_mid, config.reg).reshape(-1),
            _convexify(Q_term, config.reg),
            _convexify(R_all, config.reg).reshape(-1),
        ])
        # NOTE: the reference's trailing `h_val[...] = reg` loop
        # (osqp_collocation.hpp:339-340) is dead code -- the duplicate
        # diagonal triplets in the phase-1 pattern merge in
        # setFromTriplets, so kH has already covered every stored nnz by
        # then.  The Hessian diagonal is exactly the convexified Q/R
        # values; do NOT add reg here.

        # Dynamics values/Jacobians at all T+1 knots (continuous-time).
        u_knot_idx = jnp.minimum(jnp.arange(T + 1), T - 1)
        x_knots = xs
        u_knots = us[u_knot_idx]
        f_all = jax.vmap(spec.dynamics)(x_knots, u_knots)     # [T+1, nx]
        Fx_all = jax.vmap(d.fx)(x_knots, u_knots)             # [T+1, nx, nx]
        Fu_all = jax.vmap(d.fu)(x_knots, u_knots)             # [T+1, nx, nu]

        defect = xs[1:] - xs[:-1] - 0.5 * dt * (f_all[:-1] + f_all[1:])  # [T, nx]

        blk_xp = eye[None] - 0.5 * dt * Fx_all[1:]            # [T, nx, nx]
        blk_x = -eye[None] - 0.5 * dt * Fx_all[1:T]           # [T-1, nx, nx] (t=1..T-1)
        blk_u = -0.5 * dt * Fu_all[:-1]                       # [T, nx, nu]
        blk_up = -0.5 * dt * Fu_all[1:T]                      # [T-1, nx, nu] (t+1 < T)

        A_mat = (
            A_base
            .at[rows_xp, cols_xp].add(blk_xp)
            .at[rows_x, cols_x].add(blk_x)
            .at[rows_u, cols_u].add(blk_u)
            .at[rows_up, cols_up].add(blk_up)
        )

        # Bounds: equality -defect on dynamics rows; delta-form boxes.
        def delta_bounds(bound, refs, default):
            if bound is None:
                return jnp.full((refs.shape[0] * refs.shape[1],), default, dtype)
            return (bound[None, :] - refs).reshape(-1)

        lb = jnp.concatenate([
            -defect.reshape(-1),
            delta_bounds(spec.state_lower_bounds, xs[1:], -INFTY),
            delta_bounds(spec.input_lower_bounds, us, -INFTY),
        ])
        ub = jnp.concatenate([
            -defect.reshape(-1),
            delta_bounds(spec.state_upper_bounds, xs[1:], INFTY),
            delta_bounds(spec.input_upper_bounds, us, INFTY),
        ])
        return P_diag, q, A_mat, lb, ub

    # Warm start from the initial guess (osqp_collocation.hpp:455-463).
    us0 = spec.initial_controls
    xs0 = _initial_trajectory(spec, us0, config.init)

    def cond(state):
        return (state[5] < config.max_iterations) & ~state[6] & ~state[7]

    def body(state):
        xs, us, x_warm, y_warm, _, it, _, _ = state
        P_diag, q, A_mat, lb, ub = assemble(xs, us)
        qp = solve_box_qp(P_diag, q, A_mat, lb, ub, qp_config, x0=x_warm, y0=y_warm)

        delta = qp.x
        if config.step_limit > 0.0:
            norm = jnp.sqrt(jnp.sum(delta**2))
            scale = jnp.minimum(1.0, config.step_limit / jnp.maximum(norm, 1e-30))
            delta = delta * scale
        dx = delta[: T * nx].reshape(T, nx)
        du = delta[T * nx:].reshape(T, nu)

        step_norm = jnp.sqrt(jnp.sum(delta**2))
        # Non-finite guard: see the structured backend above.
        finite = jnp.isfinite(step_norm)
        xs = jnp.where(finite, xs.at[1:].add(dx), xs)   # full step
        us = jnp.where(finite, us + du, us)
        done = (step_norm < config.tolerance) | ~finite
        timed_out = _maybe_deadline(config)
        return (xs, us, qp.x, qp.y, qp.iterations, it + 1, done, timed_out)

    if qp_warm is None:
        qp_warm = (jnp.zeros((n,), dtype), jnp.zeros((m,), dtype))
    init = (
        xs0, us0, *qp_warm,
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), jnp.asarray(False),
        jnp.asarray(False),
    )
    xs, us, x_qp, y_qp, _, it, done, _ = jax.lax.while_loop(cond, body, init)
    cost = spec.cost(xs, us)   # osqp_collocation.hpp:503
    result = SolveResult(states=xs, controls=us, cost=cost, iterations=it, converged=done)
    return result, (x_qp, y_qp)


@register_solver
class OSQPCollocation(_PersistentWorkspaceMixin, SolverBase):
    """Host-side collocation SQP with the reference's API surface."""

    name = "osqp_collocation"
    config_cls = OSQPCollocationConfig
    _solve_fn = staticmethod(solve_osqp_collocation)
    _warm_solve_fn = staticmethod(solve_osqp_collocation_warm)
