"""Shooting SQP with an ADMM box-QP subproblem ("osqp" solver).

Behavioural analogue of the reference's ``solvers/osqp.hpp:33-416``, with the
OSQP C library replaced by the batched native ADMM solver
(:mod:`multi_agent_solver_tpu.solvers.admm_qp`).

Preserved reference semantics:

* decision vector ``z = [x_0..x_T, u_0..u_{T-1}]`` (osqp.hpp:240);
* **diagonal-only** Hessian with floor ``max(diag + reg, 1e-6)``
  (osqp.hpp:272-311);
* dynamics rows ``x_{t+1} - A_t x_t - B_t u_t`` with ``lb = ub = 0`` and the
  *continuous-time* dynamics Jacobians -- the reference neither adds the
  affine defect term nor discretizes (osqp.hpp:344-361, 386-387), making the
  QP a crude model whose answer is only used as a search direction;
* identity rows bounding every state and control, +-infinity when unset
  (osqp.hpp:363-407);
* outer loop: solve QP, extract ``u_candidate`` from the solution tail,
  Armijo along ``-d_u`` where ``d_u = u - u_candidate`` (i.e. interpolate
  toward the QP answer), accept on true-cost decrease else stop; converge on
  ``|cost - cost_new| < tolerance`` (osqp.hpp:122-198);
* QP warm starts carry across SQP iterations (the analogue of the persistent
  OSQP workspace, osqp.hpp:90-110).

TPU-first re-design: the QP matrices assemble with static (numpy-computed)
scatter indices and batched Jacobian stacks -- no sparse triplets -- and the
whole SQP loop is one jitted/vmappable program.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from ..line_search import armijo_line_search
from ..ocp import OCPSpec
from ..types import Array, SolverParams, get_param, param_flag
from .admm_qp import ADMMConfig, INFTY, solve_box_qp
from .base import SolveResult, SolverBase, register_solver


def _maybe_deadline(config):
    if config.enforce_max_ms and config.max_ms > 0:
        from .base import deadline_exceeded

        return deadline_exceeded()
    return jnp.asarray(False)


@dataclasses.dataclass(frozen=True)
class OSQPShootingConfig:
    max_iterations: int = 20
    tolerance: float = 1e-4
    hessian_floor: float = 1e-6          # osqp.hpp:283 max(diag+reg, 1e-6)
    qp_max_iterations: int = 1000        # setMaxIteration(1000), osqp.hpp:52
    qp_eps: float = 1e-3                 # OSQP default tolerances
    # 'structured' (default): banded rows + block-tridiagonal KKT by cyclic
    # reduction (solvers/traj_qp.py) -- O(T nb^3), the scalable TPU path.
    # 'dense': materialized constraint matrix + dense Cholesky KKT
    # (admm_qp.py) -- same answers (tests/test_qp_parity.py), O((T nb)^3).
    backend: str = "structured"
    # Exact delta-form Gauss-Newton QP (param ``sqp_exact``): expand around
    # the CURRENT rollout with discrete RK4 Jacobians and delta bounds,
    # instead of the reference's absolute-variable QP with homogeneous
    # continuous-Jacobian rows and an uncentered gradient (osqp.hpp:344-361).
    # The reference model cannot descend from an interior optimum of the
    # base cost (its q addresses absolute coordinates, not steps), so this
    # mode auto-enables for context/coupled solves, which are beyond the
    # reference and carry no parity obligation.
    exact: bool = False
    # QP backend for the structured path (param ``ip_qp``): 'admm' (default,
    # OSQP-parity first-order) or 'ip' (Mehrotra interior point,
    # solvers/ip_qp.py -- ~2 orders less sequential depth on TPU).
    qp_solver: str = "admm"
    max_ms: float = 0.0            # host deadline (osqp.hpp:122-132); opt-in
    enforce_max_ms: bool = False
    debug: bool = False

    @classmethod
    def from_params(cls, params: SolverParams) -> "OSQPShootingConfig":
        return cls(
            max_iterations=int(get_param(params, "max_iterations")),
            tolerance=get_param(params, "tolerance"),
            backend="dense" if param_flag(params, "dense_qp") else "structured",
            exact=param_flag(params, "sqp_exact"),
            qp_solver="ip" if param_flag(params, "ip_qp") else "admm",
            max_ms=get_param(params, "max_ms", 0.0),
            enforce_max_ms=param_flag(params, "enforce_max_ms"),
            debug=param_flag(params, "debug"),
        )


def _shooting_indices(T: int, nx: int, nu: int):
    """Static scatter indices for the dense constraint matrix."""
    n = (T + 1) * nx + T * nu
    n_dyn = T * nx
    n_sb = (T + 1) * nx
    n_cb = T * nu
    m = n_dyn + n_sb + n_cb

    t = np.arange(T)[:, None, None]
    i = np.arange(nx)[None, :, None]
    jx = np.arange(nx)[None, None, :]
    ju = np.arange(nu)[None, None, :]

    rows_A = np.broadcast_to(t * nx + i, (T, nx, nx))
    cols_A = np.broadcast_to(t * nx + jx, (T, nx, nx))
    rows_B = np.broadcast_to(t * nx + i[:, :, :1], (T, nx, nu))
    cols_B = np.broadcast_to((T + 1) * nx + t * nu + ju, (T, nx, nu))

    base = np.zeros((m, n))
    # +I at x_{t+1} in dynamics rows.
    r = np.arange(n_dyn)
    base[r, nx + r] = 1.0
    # identity rows for state bounds then control bounds.
    r2 = np.arange(n_sb + n_cb)
    base[n_dyn + r2, r2] = 1.0
    return base, (rows_A, cols_A, rows_B, cols_B), (m, n, n_dyn, n_sb, n_cb)


def _solve_osqp_shooting_structured(
    spec: OCPSpec, config: OSQPShootingConfig, qp_warm=None
):
    """Structured-QP variant: stage blocks w_t = [x_t, u_t] (w_T pads u),
    dynamics rows C_t w_t + Cp_t w_{t+1} with C_t = [-A_t | -B_t],
    Cp_t = [I | 0] -- the same QP as the dense path, block-tridiagonal KKT."""
    from .traj_qp import TrajQP, solve_traj_box_qp
    from .ip_qp import solve_traj_box_qp_ip

    T, nx, nu = spec.horizon_steps, spec.state_dim, spec.control_dim
    dtype = spec.initial_state.dtype
    d = spec.derivs
    nb = nx + nu
    N = T + 1

    exact = config.exact or spec.context is not None

    qp_config = ADMMConfig(
        max_iterations=config.qp_max_iterations,
        eps_abs=config.qp_eps,
        eps_rel=config.qp_eps,
    )
    ts = jnp.arange(T)

    def stage_bounds(bound, default, dim):
        col = jnp.full((dim,), default, dtype) if bound is None else bound
        return jnp.broadcast_to(col, (N, dim))

    z_lb_abs = jnp.concatenate(
        [
            stage_bounds(spec.state_lower_bounds, -INFTY, nx),
            stage_bounds(spec.input_lower_bounds, -INFTY, nu),
        ],
        axis=1,
    )
    z_ub_abs = jnp.concatenate(
        [
            stage_bounds(spec.state_upper_bounds, INFTY, nx),
            stage_bounds(spec.input_upper_bounds, INFTY, nu),
        ],
        axis=1,
    )
    # Pin the nonexistent u_T pad slots.
    z_lb_abs = z_lb_abs.at[T, nx:].set(0.0)
    z_ub_abs = z_ub_abs.at[T, nx:].set(0.0)

    r_bounds = jnp.zeros((T, nx), dtype)           # lb = ub = 0 dyn rows
    eye_pad = jnp.concatenate(
        [jnp.eye(nx, dtype=dtype), jnp.zeros((nx, nu), dtype)], axis=1
    )  # Cp_t = [I | 0]

    def assemble(xs, us):
        x, u = xs[:-1], us
        # Cost derivative oracles forward any extra context argument unchanged
        # (inter-agent coupling enters the QP through these Hessian/gradient
        # stacks exactly as it enters the iLQR stage expansion, ilqr.py:168).
        cost_args = (x, u, ts) if spec.context is None else (x, u, ts, spec.context)
        Q_diag = jax.vmap(lambda *a: jnp.diagonal(d.lxx(*a)))(*cost_args)
        QT_diag = jnp.diagonal(d.phixx(xs[-1]))
        R_diag = jax.vmap(lambda *a: jnp.diagonal(d.luu(*a)))(*cost_args)
        P_stage = jnp.concatenate(
            [
                jnp.maximum(Q_diag, config.hessian_floor),
                jnp.maximum(R_diag, config.hessian_floor),
            ],
            axis=1,
        )
        P_term = jnp.concatenate(
            [jnp.maximum(QT_diag, config.hessian_floor), jnp.ones((nu,), dtype)]
        )
        P_diag = jnp.concatenate([P_stage, P_term[None]], axis=0)

        q_stage = jnp.concatenate(
            [jax.vmap(d.lx)(*cost_args), jax.vmap(d.lu)(*cost_args)], axis=1
        )
        q_term = jnp.concatenate([d.phix(xs[-1]), jnp.zeros((nu,), dtype)])
        q = jnp.concatenate([q_stage, q_term[None]], axis=0)

        if exact:
            # Delta-form Gauss-Newton model: rows delta_x_{t+1} =
            # A_d delta_x_t + B_d delta_u_t with exact discrete (RK4)
            # Jacobians; the defect is zero because xs IS a rollout of us.
            A_t = jax.vmap(d.step_fx)(x, u)
            B_t = jax.vmap(d.step_fu)(x, u)
        else:
            A_t = jax.vmap(d.fx)(x, u)   # continuous Jacobians (parity, osqp.hpp:351)
            B_t = jax.vmap(d.fu)(x, u)
        C = jnp.concatenate([-A_t, -B_t], axis=2)              # [T, nx, nb]
        Cp = jnp.broadcast_to(eye_pad, (T, nx, nb))
        if exact:
            # Delta-form box bounds around the current trajectory; the free
            # initial state delta is pinned (x_0 is given, osqp.hpp leaves
            # the absolute x_0 merely box-bounded).
            w_ref = jnp.concatenate(
                [xs, jnp.concatenate([us, jnp.zeros((1, nu), dtype)])], axis=1
            )
            z_lb = (z_lb_abs - w_ref).at[0, :nx].set(0.0).at[T, nx:].set(0.0)
            z_ub = (z_ub_abs - w_ref).at[0, :nx].set(0.0).at[T, nx:].set(0.0)
        else:
            z_lb, z_ub = z_lb_abs, z_ub_abs
        return TrajQP(P_diag, q, C, Cp, r_bounds, r_bounds, z_lb, z_ub)

    # Context-aware true objective for the line search / acceptance tests.
    objective = spec.objective_function if spec.context is None else spec.cost

    us0 = spec.initial_controls
    xs0 = spec.rollout(us0)
    cost0 = spec.cost(xs0, us0)

    def cond(state):
        return (state[7] < config.max_iterations) & ~state[8] & ~state[9]

    def body(state):
        xs, us, cost, w_warm, yr_warm, yb_warm, _, it, _, _ = state
        # Interior-point linear algebra needs double precision (every
        # production IP solver is f64: the Schur system's condition grows
        # like 1/mu); on f32 backends (TPU) 'ip' falls back to ADMM.
        use_ip = config.qp_solver == "ip" and dtype == jnp.float64
        qp_solve = solve_traj_box_qp_ip if use_ip else solve_traj_box_qp
        qp = qp_solve(
            assemble(xs, us), qp_config, w0=w_warm, y_r0=yr_warm, y_b0=yb_warm
        )
        u_candidate = us + qp.w[:T, nx:] if exact else qp.w[:T, nx:]
        d_u = us - u_candidate                     # osqp.hpp:168
        alpha = armijo_line_search(
            spec.initial_state, us, d_u, spec.dynamics, objective, spec.dt
        )
        u_new = us - alpha * d_u
        xs_new = spec.rollout(u_new)
        cost_new = spec.cost(xs_new, u_new)

        small_change = jnp.abs(cost - cost_new) < config.tolerance
        improved = cost_new < cost
        accept = small_change | improved           # osqp.hpp:177-190
        done = small_change | ~improved            # stop on converge or regression

        xs = jnp.where(accept, xs_new, xs)
        us = jnp.where(accept, u_new, us)
        cost = jnp.where(accept, cost_new, cost)
        timed_out = _maybe_deadline(config)
        return (xs, us, cost, qp.w, qp.y_r, qp.y_b, qp.iterations, it + 1, done,
                timed_out)

    if qp_warm is None:
        qp_warm = (
            jnp.zeros((N, nb), dtype), jnp.zeros((T, nx), dtype),
            jnp.zeros((N, nb), dtype),
        )
    init = (
        xs0, us0, cost0, *qp_warm,
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), jnp.asarray(False),
        jnp.asarray(False),
    )
    xs, us, cost, w, y_r, y_b, _, it, done, _ = jax.lax.while_loop(cond, body, init)
    result = SolveResult(states=xs, controls=us, cost=cost, iterations=it, converged=done)
    return result, (w, y_r, y_b)


def solve_osqp_shooting_warm(spec: OCPSpec, config: OSQPShootingConfig, qp_warm=None):
    """Solve and also return the final QP primal/dual state.

    The TPU analogue of the reference's persistent OSQP workspace
    (osqp.hpp:90-110): repeated ``solve()`` calls on a same-shaped problem
    (MPC shifts, Nash sweeps) pass the previous solve's QP state back in so
    the first SQP iteration's ADMM starts at (near-)optimal duals.
    """
    if config.backend == "structured" or config.exact or spec.context is not None:
        return _solve_osqp_shooting_structured(spec, config, qp_warm)
    return _solve_osqp_shooting_dense(spec, config, qp_warm)


def solve_osqp_shooting(spec: OCPSpec, config: OSQPShootingConfig) -> SolveResult:
    return solve_osqp_shooting_warm(spec, config)[0]


def _solve_osqp_shooting_dense(spec: OCPSpec, config: OSQPShootingConfig, qp_warm=None):
    T, nx, nu = spec.horizon_steps, spec.state_dim, spec.control_dim
    dtype = spec.initial_state.dtype
    d = spec.derivs

    base_np, (rows_A, cols_A, rows_B, cols_B), (m, n, n_dyn, n_sb, n_cb) = (
        _shooting_indices(T, nx, nu)
    )
    A_base = jnp.asarray(base_np, dtype)

    # Bound rows are constant across iterations (osqp.hpp:386-407).
    def bound_vec(bound, default, count_t, dim):
        if bound is None:
            return jnp.full((count_t * dim,), default, dtype)
        return jnp.tile(bound, count_t)

    lb = jnp.concatenate([
        jnp.zeros((n_dyn,), dtype),                                     # lb=ub=0 dyn rows
        bound_vec(spec.state_lower_bounds, -INFTY, T + 1, nx),
        bound_vec(spec.input_lower_bounds, -INFTY, T, nu),
    ])
    ub = jnp.concatenate([
        jnp.zeros((n_dyn,), dtype),
        bound_vec(spec.state_upper_bounds, INFTY, T + 1, nx),
        bound_vec(spec.input_upper_bounds, INFTY, T, nu),
    ])

    qp_config = ADMMConfig(
        max_iterations=config.qp_max_iterations,
        eps_abs=config.qp_eps,
        eps_rel=config.qp_eps,
    )

    ts = jnp.arange(T)

    def assemble(xs, us):
        """P_diag, q, A for the current linearization (osqp.hpp:272-408)."""
        x, u = xs[:-1], us
        Q_diag = jax.vmap(lambda a, b, t: jnp.diagonal(d.lxx(a, b, t)))(x, u, ts)
        QT_diag = jnp.diagonal(d.phixx(xs[-1]))
        R_diag = jax.vmap(lambda a, b, t: jnp.diagonal(d.luu(a, b, t)))(x, u, ts)
        P_diag = jnp.concatenate([
            jnp.maximum(Q_diag.reshape(-1), config.hessian_floor),
            jnp.maximum(QT_diag, config.hessian_floor),
            jnp.maximum(R_diag.reshape(-1), config.hessian_floor),
        ])

        q = jnp.concatenate([
            jax.vmap(d.lx)(x, u, ts).reshape(-1),
            d.phix(xs[-1]),
            jax.vmap(d.lu)(x, u, ts).reshape(-1),
        ])

        A_t = jax.vmap(d.fx)(x, u)   # continuous Jacobians (parity, osqp.hpp:351)
        B_t = jax.vmap(d.fu)(x, u)
        A_mat = A_base.at[rows_A, cols_A].add(-A_t).at[rows_B, cols_B].add(-B_t)
        return P_diag, q, A_mat

    # Context-aware true objective for the line search / acceptance tests.
    objective = spec.objective_function if spec.context is None else spec.cost

    us0 = spec.initial_controls
    xs0 = spec.rollout(us0)
    cost0 = spec.cost(xs0, us0)

    def cond(state):
        return (state[6] < config.max_iterations) & ~state[7] & ~state[8]

    def body(state):
        xs, us, cost, x_warm, y_warm, _, it, _, _ = state
        P_diag, q, A_mat = assemble(xs, us)
        qp = solve_box_qp(P_diag, q, A_mat, lb, ub, qp_config, x0=x_warm, y0=y_warm)

        u_candidate = qp.x[(T + 1) * nx:].reshape(T, nu)
        d_u = us - u_candidate                     # osqp.hpp:168
        alpha = armijo_line_search(
            spec.initial_state, us, d_u, spec.dynamics, objective, spec.dt
        )
        u_new = us - alpha * d_u
        xs_new = spec.rollout(u_new)
        cost_new = spec.cost(xs_new, u_new)

        small_change = jnp.abs(cost - cost_new) < config.tolerance
        improved = cost_new < cost
        accept = small_change | improved           # osqp.hpp:177-190
        done = small_change | ~improved            # stop on converge or regression

        xs = jnp.where(accept, xs_new, xs)
        us = jnp.where(accept, u_new, us)
        cost = jnp.where(accept, cost_new, cost)
        timed_out = _maybe_deadline(config)
        return (xs, us, cost, qp.x, qp.y, qp.iterations, it + 1, done, timed_out)

    if qp_warm is None:
        qp_warm = (jnp.zeros((n,), dtype), jnp.zeros((m,), dtype))
    init = (
        xs0, us0, cost0, *qp_warm,
        jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32), jnp.asarray(False),
        jnp.asarray(False),
    )
    xs, us, cost, x_qp, y_qp, _, it, done, _ = jax.lax.while_loop(cond, body, init)
    result = SolveResult(states=xs, controls=us, cost=cost, iterations=it, converged=done)
    return result, (x_qp, y_qp)


class _PersistentWorkspaceMixin:
    """Carry the QP primal/dual state across ``solve()`` calls.

    Reference semantics (osqp.hpp:90-110): the OSQP workspace persists on the
    solver object and warm-starts the next solve whenever the problem shapes
    are unchanged; any shape/param change rebuilds it from scratch.
    """

    _warm_solve_fn = None   # staticmethod(fn(spec, config, qp_warm))

    def __init__(self, **params):
        super().__init__(**params)
        self._qp_state = None

    def set_params(self, params) -> None:
        super().set_params(params)
        self._qp_state = None

    def solve_spec(self, spec: OCPSpec) -> SolveResult:
        sig = (
            spec.horizon_steps, spec.state_dim, spec.control_dim,
            str(spec.initial_state.dtype), self.config,
        )
        warm = None
        if self._qp_state is not None and self._qp_state[0] == sig:
            warm = self._qp_state[1]
        key = (self.config, warm is None)
        fn = self._jitted.get(key)
        if fn is None:
            fn = jax.jit(
                lambda s, qw: type(self)._warm_solve_fn(s, self.config, qw)
            )
            self._jitted[key] = fn
        result, state = fn(spec, warm)
        self._qp_state = (sig, state)
        return result


@register_solver
class OSQP(_PersistentWorkspaceMixin, SolverBase):
    """Host-side shooting SQP with the reference's API surface."""

    name = "osqp"
    config_cls = OSQPShootingConfig
    _solve_fn = staticmethod(solve_osqp_shooting)
    _warm_solve_fn = staticmethod(solve_osqp_shooting_warm)
