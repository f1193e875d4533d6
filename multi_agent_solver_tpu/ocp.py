"""Optimal-control problem definition.

Two-layer TPU-native analogue of the reference's ``OCP`` struct
(``ocp.hpp:30-237``):

* :class:`OCP` -- a mutable host-side problem description with the same field
  names and lifecycle methods as the reference (``initialize_problem``,
  ``verify_problem``, ``reset``, ``update_initial_with_best``, plus mutable
  ``best_states`` / ``best_controls`` / ``best_cost`` result storage).  Users
  coming from the reference set the same attributes and call the same methods.

* :class:`OCPSpec` -- the frozen, jittable pytree the solvers actually consume.
  Array data (initial state, warm-start controls, bounds) are pytree leaves, so
  a spec can be vmapped/sharded over leading batch axes; functions and
  dimensions are static metadata hashed into the XLA compilation.

Differences from the reference, by design:

* derivative oracles default to exact AD instead of finite differences
  (reference installs FD defaults at ``ocp.hpp:117-135``); pass
  ``derivative_mode='fd'`` to reproduce the reference numerics.
* analytic derivative overrides take ``(x, u)`` / ``(x, u, t)`` directly rather
  than the reference's ``(function, x, u)`` convention (``types.hpp:42-50``) --
  the extra function argument exists there only so FD defaults can close over
  the callback, which JAX does not need.
* trajectories are time-major (``[T+1, nx]`` / ``[T, nu]``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from .utils.pytree import pytree_dataclass, field as pytree_field

from .derivatives import Derivatives, make_derivatives
from .integrators import integrate_horizon, integrate_rk4
from .types import Array


def compute_trajectory_cost(states, controls, stage_cost, terminal_cost, context=None):
    """Total cost: sum of per-stage costs plus terminal cost.

    Reference: ``compute_trajectory_cost`` (ocp.hpp:14-28).  Stage costs are
    evaluated at ``(x_t, u_t, t)`` for ``t = 0..T-1`` and are NOT scaled by dt,
    matching the reference.  Vectorized over the horizon with ``vmap`` instead
    of the reference's sequential accumulation loop.  With ``context`` the
    stage cost receives the per-step context slice as a fourth argument.
    """
    T = controls.shape[0]
    ts = jnp.arange(T)
    if context is None:
        stage = jax.vmap(stage_cost)(states[:-1], controls, ts)
    else:
        stage = jax.vmap(stage_cost)(states[:-1], controls, ts, context)
    return jnp.sum(stage) + terminal_cost(states[-1])


@pytree_dataclass
class OCPSpec:
    """Frozen, jittable problem spec (the solver-facing pytree)."""

    # --- dynamic leaves (batchable / shardable) ---
    initial_state: Array                       # [nx]
    initial_controls: Array                    # [T, nu] warm start
    state_lower_bounds: Optional[Array] = None  # [nx] or None
    state_upper_bounds: Optional[Array] = None
    input_lower_bounds: Optional[Array] = None  # [nu] or None
    input_upper_bounds: Optional[Array] = None
    # Optional per-stage context [T, C]: when present, the stage cost is
    # called as ``stage_cost(x, u, t, context_t)``.  This is how inter-agent
    # coupling reaches a single agent's solve (the other agents' current
    # plans are context), and how moving obstacles / reference trajectories
    # enter -- a capability the reference lacks entirely
    # (multi_agent_problem.hpp:76-92 notes no coupling anywhere).
    context: Optional[Array] = None

    # --- static metadata (part of the compilation key) ---
    dynamics: Callable = pytree_field(pytree_node=False, default=None)
    stage_cost: Callable = pytree_field(pytree_node=False, default=None)
    terminal_cost: Callable = pytree_field(pytree_node=False, default=None)
    objective_function: Callable = pytree_field(pytree_node=False, default=None)
    equality_constraints: Optional[Callable] = pytree_field(pytree_node=False, default=None)
    inequality_constraints: Optional[Callable] = pytree_field(pytree_node=False, default=None)
    derivs: Derivatives = pytree_field(pytree_node=False, default=None)
    state_dim: int = pytree_field(pytree_node=False, default=0)
    control_dim: int = pytree_field(pytree_node=False, default=0)
    horizon_steps: int = pytree_field(pytree_node=False, default=0)
    eq_dim: int = pytree_field(pytree_node=False, default=0)
    ineq_dim: int = pytree_field(pytree_node=False, default=0)
    dt: float = pytree_field(pytree_node=False, default=0.0)
    # True when objective_function is the synthesized sum of stage costs plus
    # terminal cost (ocp.hpp:170-180) -- lets fused kernels accumulate the
    # objective inline instead of calling the opaque user function.
    objective_is_default: bool = pytree_field(pytree_node=False, default=True)
    # 'ad' or 'fd': which derivative defaults the oracle bundle was built
    # with.  Fused AD kernels are only exact substitutes in 'ad' mode.
    derivative_mode: str = pytree_field(pytree_node=False, default="ad")

    # Convenience -------------------------------------------------------
    def rollout(self, controls: Array) -> Array:
        return integrate_horizon(self.initial_state, controls, self.dt, self.dynamics)

    def cost(self, states: Array, controls: Array) -> Array:
        if self.context is not None:
            # Context-dependent problems always use the synthesized objective
            # (validated at spec construction).
            return compute_trajectory_cost(
                states, controls, self.stage_cost, self.terminal_cost, self.context
            )
        return self.objective_function(states, controls)

    def stage_cost_at(self, x: Array, u: Array, t, context_t=None) -> Array:
        """Evaluate the stage cost with or without context uniformly."""
        if self.context is not None:
            return self.stage_cost(x, u, t, context_t)
        return self.stage_cost(x, u, t)

    @property
    def has_input_bounds(self) -> bool:
        """Reference clamps controls only when BOTH input bounds are set
        (ilqr.hpp:213-214, cgd.hpp:85-88)."""
        return self.input_lower_bounds is not None and self.input_upper_bounds is not None

    @property
    def has_state_bounds(self) -> bool:
        return self.state_lower_bounds is not None or self.state_upper_bounds is not None


@jax.jit
def _spec_rollout_and_cost(spec: "OCPSpec"):
    """Initial rollout + cost as ONE compiled program.

    ``initialize_problem``/``reset`` used to evaluate these eagerly; on a
    remote TPU every eager primitive is a separate device round-trip
    (~40 ms each, plus a first-touch compile), which turned problem setup
    into minutes.  Jitting the whole computation makes setup one compile
    (cached on the spec's static functions, so homogeneous agents share it)
    plus one execution.
    """
    xs = spec.rollout(spec.initial_controls)
    return xs, spec.cost(xs, spec.initial_controls)


@jax.jit
def rollout_and_cost(spec: "OCPSpec", controls: Array):
    """Jitted rollout + objective of arbitrary controls (host-loop helper).

    Host-side code (heterogeneous-agent fallbacks, MPC shims, examples) must
    never evaluate ``spec.rollout``/``spec.cost`` eagerly: on a remote TPU
    each eager primitive is a ~40 ms round-trip.  This single compiled entry
    point is cached per spec statics.
    """
    xs = spec.rollout(controls)
    return xs, spec.cost(xs, controls)


@jax.jit
def cost_of(spec: "OCPSpec", states: Array, controls: Array):
    """Jitted objective evaluation (see :func:`rollout_and_cost`)."""
    return spec.cost(states, controls)


def _zero_stage_cost(x, u, t):
    """Default stage cost (reference: ocp.hpp:45)."""
    return jnp.asarray(0.0)


def _zero_terminal_cost(x):
    """Default terminal cost (reference: ocp.hpp:46)."""
    return jnp.asarray(0.0)


@functools.lru_cache(maxsize=None)
def _step_jacobians(dynamics: Callable, dt: float, fd: bool):
    """Memoized discrete-step Jacobian oracles (identity-stable so OCPs built
    from the same dynamics share spec statics)."""
    step_map = lambda x, u: integrate_rk4(x, u, dt, dynamics)
    if fd:
        from .finite_differences import fd_jacobian

        return (
            lambda x, u: fd_jacobian(lambda y: step_map(y, u), x, eps=1e-6),
            lambda x, u: fd_jacobian(lambda w: step_map(x, w), u, eps=1e-6),
        )
    return jax.jacfwd(step_map, argnums=0), jax.jacfwd(step_map, argnums=1)


@functools.lru_cache(maxsize=None)
def _synthesized_objective(stage_cost: Callable, terminal_cost: Callable):
    """Memoized default objective (sum of stages + terminal, ocp.hpp:170-180)."""
    return lambda X, U: compute_trajectory_cost(X, U, stage_cost, terminal_cost)


def with_context_cost(spec: OCPSpec, stage_cost_ctx: Callable) -> OCPSpec:
    """Derive a spec whose stage cost takes a per-step context argument.

    ``stage_cost_ctx(x, u, t, ctx_t)`` replaces the stage cost; derivative
    oracles and the synthesized objective are rebuilt for the 4-argument
    signature.  Call once per (static) cost structure, then supply the actual
    context arrays per solve via ``spec.replace(context=...)`` -- leaves
    change, statics stay cached.
    """
    if not spec.objective_is_default:
        raise ValueError("context costs require the synthesized objective")
    if spec.derivative_mode != "ad":
        raise ValueError("context costs require AD derivative mode")

    derivs = make_derivatives(
        spec.dynamics,
        stage_cost_ctx,
        spec.terminal_cost,
        spec.equality_constraints,
        spec.inequality_constraints,
        mode="ad",
        step_fx=spec.derivs.step_fx,
        step_fu=spec.derivs.step_fu,
        fx=spec.derivs.fx,
        fu=spec.derivs.fu,
    )
    return spec.replace(stage_cost=stage_cost_ctx, derivs=derivs)


@functools.lru_cache(maxsize=None)
def _state_bound_ineq_fns(base_fn, lb_key, ub_key, mode):
    """Memoized constraint fn (+ Jacobian oracles) stacking finite
    state-bound rows ``x_i - ub_i <= 0`` / ``lb_i - x_i <= 0`` under any
    existing inequality constraints.  Keys are concrete float tuples so
    problems sharing bounds share identical spec statics."""
    import numpy as _np

    ub_rows = tuple(
        (i, v) for i, v in enumerate(ub_key or ()) if _np.isfinite(v)
    )
    lb_rows = tuple(
        (i, v) for i, v in enumerate(lb_key or ()) if _np.isfinite(v)
    )
    extra = len(ub_rows) + len(lb_rows)
    if extra == 0:
        return None, None, None, 0

    def g(x, u):
        # Works on both per-problem vectors ([nx]) and lane-shaped kernel
        # values ([nx, 8, 128]): rows inherit x[i]'s shape.
        parts = []
        if base_fn is not None:
            b = base_fn(x, u)
            if b.ndim == 1 and x.ndim > 1:   # lift lane-collapsed base rows
                b = b.reshape(b.shape + (1,) * (x.ndim - 1)) + x[0] * 0.0
            parts.append(b)
        rows = [x[i] - v for i, v in ub_rows] + [v - x[i] for i, v in lb_rows]
        parts.append(jnp.stack(rows, axis=0))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    if mode == "ad":
        gx = jax.jacfwd(g, argnums=0)
        gu = jax.jacfwd(g, argnums=1)
    else:
        from .finite_differences import fd_jacobian

        gx = lambda x, u: fd_jacobian(lambda y: g(y, u), x, eps=1e-6)
        gu = lambda x, u: fd_jacobian(lambda w: g(x, w), u, eps=1e-6)
    return g, gx, gu, extra


def with_state_bound_constraints(spec: OCPSpec) -> OCPSpec:
    """Fold the spec's finite state bounds into its inequality constraints.

    The reference enforces state bounds only in the QP solvers; its iLQR and
    CGD silently ignore them (rocket_max_altitude.cpp:122-128 documents
    this).  This transform makes them visible to the AL machinery instead
    (solver param ``state_bounds_al=1``), turning each finite bound entry
    into a PHR inequality row.  Statics are memoized on (base constraint,
    bound values, mode), so repeated solves share one compiled program.
    """
    lb, ub = spec.state_lower_bounds, spec.state_upper_bounds
    if lb is None and ub is None:
        return spec
    lb_key = None if lb is None else tuple(float(v) for v in np.asarray(lb))
    ub_key = None if ub is None else tuple(float(v) for v in np.asarray(ub))
    g, gx, gu, extra = _state_bound_ineq_fns(
        spec.inequality_constraints, lb_key, ub_key, spec.derivative_mode
    )
    if extra == 0:
        return spec
    return spec.replace(
        inequality_constraints=g,
        ineq_dim=spec.ineq_dim + extra,
        derivs=spec.derivs.replace(ineq_gx=gx, ineq_gu=gu),
    )


class OCP:
    """Mutable host-side problem description mirroring the reference API.

    Attribute names match ``ocp.hpp:30-237`` one-for-one; trajectories are
    time-major JAX arrays.
    """

    def __init__(self, **kwargs: Any):
        # Dimensions
        self.state_dim: int = 0
        self.control_dim: int = 0
        self.horizon_steps: int = 0
        self.dt: float = 0.0
        self.id: int = 0

        # Problem functions (module-level zero defaults so OCPs sharing all
        # function objects produce identical spec statics -- the homogeneity
        # requirement for stacked agent lanes)
        self.dynamics = None
        self.stage_cost = _zero_stage_cost
        self.terminal_cost = _zero_terminal_cost
        self.objective_function = None

        # Bounds (None == absent, like the reference's std::optional)
        self.state_lower_bounds: Optional[Array] = None
        self.state_upper_bounds: Optional[Array] = None
        self.input_lower_bounds: Optional[Array] = None
        self.input_upper_bounds: Optional[Array] = None

        # Path constraints and their optional analytic Jacobians
        self.equality_constraints = None
        self.inequality_constraints = None
        self.equality_constraints_state_jacobian = None
        self.equality_constraints_control_jacobian = None
        self.inequality_constraints_state_jacobian = None
        self.inequality_constraints_control_jacobian = None

        # Optional analytic derivatives (signatures: (x,u) / (x,u,t) / (x))
        self.dynamics_state_jacobian = None
        self.dynamics_control_jacobian = None
        self.cost_state_gradient = None
        self.cost_control_gradient = None
        self.cost_state_hessian = None
        self.cost_control_hessian = None
        self.cost_cross_term = None
        self.terminal_cost_gradient = None
        self.terminal_cost_hessian = None

        # Warm start and result storage
        self.initial_state: Optional[Array] = None
        self.initial_states: Optional[Array] = None
        self.initial_controls: Optional[Array] = None
        self.best_states: Optional[Array] = None
        self.best_controls: Optional[Array] = None
        self.best_cost: float = float("inf")

        # 'ad' (default, exact) or 'fd' (reference-parity finite differences)
        self.derivative_mode: str = "ad"

        self._spec: Optional[OCPSpec] = None
        for key, value in kwargs.items():
            if not hasattr(self, key):
                raise AttributeError(f"OCP has no field '{key}'")
            setattr(self, key, value)

    # -- lifecycle (reference: ocp.hpp:83-183) --------------------------
    def reset(self) -> None:
        """Zero the controls and re-roll the trajectory (ocp.hpp:83-93)."""
        dtype = jnp.asarray(self.initial_state).dtype
        self.initial_controls = jnp.zeros((self.horizon_steps, self.control_dim), dtype)
        self.initial_states, cost = _spec_rollout_and_cost(self.spec())
        self.best_states = self.initial_states
        self.best_controls = self.initial_controls
        self.best_cost = float(cost)

    def update_initial_with_best(self) -> None:
        """Warm start from the current best trajectory (ocp.hpp:95-100).

        Only pytree *leaves* of the cached spec change, so jitted solver
        executables stay cached across Nash sweeps (no retracing).
        """
        self.initial_controls = self.best_controls
        self.initial_states = self.best_states

    def initialize_problem(self) -> None:
        """Shape-fix controls, roll out, install derivative defaults, and
        synthesize the objective (reference: ocp.hpp:102-183)."""
        self.initial_state = jnp.asarray(self.initial_state)
        dtype = self.initial_state.dtype

        if (
            self.initial_controls is None
            or tuple(jnp.asarray(self.initial_controls).shape)
            != (self.horizon_steps, self.control_dim)
        ):
            self.initial_controls = jnp.zeros((self.horizon_steps, self.control_dim), dtype)
        else:
            self.initial_controls = jnp.asarray(self.initial_controls, dtype)

        for field in (
            "state_lower_bounds",
            "state_upper_bounds",
            "input_lower_bounds",
            "input_upper_bounds",
        ):
            value = getattr(self, field)
            if value is not None:
                setattr(self, field, jnp.asarray(value, dtype))

        self._spec = None
        spec = self.spec()

        self.initial_states, cost = _spec_rollout_and_cost(spec)
        self.best_states = self.initial_states
        self.best_controls = self.initial_controls
        self.best_cost = float(cost)

    def verify_problem(self) -> bool:
        """Consistency checks (reference: ocp.hpp:186-236, assert-based)."""
        assert self.state_dim != 0, "No state dimension"
        assert self.control_dim != 0, "No control dimension"
        assert self.horizon_steps != 0, "No horizon dimension"
        assert self.dt != 0.0, "dt is 0.0"
        assert self.initial_state.shape == (self.state_dim,), (
            "Initial state size does not match state dimension"
        )
        for name, dim in (
            ("state_lower_bounds", self.state_dim),
            ("state_upper_bounds", self.state_dim),
            ("input_lower_bounds", self.control_dim),
            ("input_upper_bounds", self.control_dim),
        ):
            bound = getattr(self, name)
            if bound is not None:
                assert bound.shape == (dim,), f"{name} size mismatch"

        spec = self.spec()
        assert spec.objective_function is not None, "Objective cost function is not set."

        out = jax.eval_shape(self.dynamics, self.best_states[0], self.best_controls[0])
        assert out.shape == (self.state_dim,), "Dynamics output size mismatch"

        jax.eval_shape(spec.objective_function, self.best_states, self.best_controls)
        for constraint in (self.inequality_constraints, self.equality_constraints):
            if constraint is not None:
                cshape = jax.eval_shape(constraint, self.best_states[0], self.best_controls[0])
                assert len(cshape.shape) == 1, "Constraints output invalid shape"
        return True

    # -- solver-facing spec ---------------------------------------------
    def spec(self) -> OCPSpec:
        """Return the frozen solver-facing spec.

        The static parts (functions, derivative oracles, dims) are built once
        and cached; later calls only refresh the array leaves (warm start,
        bounds).  Call :meth:`invalidate` after mutating problem *functions*.
        """
        if self._spec is not None:
            self._spec = self._spec.replace(
                initial_state=jnp.asarray(self.initial_state),
                initial_controls=jnp.asarray(self.initial_controls),
                state_lower_bounds=self.state_lower_bounds,
                state_upper_bounds=self.state_upper_bounds,
                input_lower_bounds=self.input_lower_bounds,
                input_upper_bounds=self.input_upper_bounds,
            )
            return self._spec

        step_fx, step_fu = _step_jacobians(
            self.dynamics, float(self.dt), self.derivative_mode == "fd"
        )

        derivs = make_derivatives(
            self.dynamics,
            self.stage_cost,
            self.terminal_cost,
            self.equality_constraints,
            self.inequality_constraints,
            mode=self.derivative_mode,
            step_fx=step_fx,
            step_fu=step_fu,
            fx=self.dynamics_state_jacobian,
            fu=self.dynamics_control_jacobian,
            lx=self.cost_state_gradient,
            lu=self.cost_control_gradient,
            lxx=self.cost_state_hessian,
            luu=self.cost_control_hessian,
            lux=self.cost_cross_term,
            phix=self.terminal_cost_gradient,
            phixx=self.terminal_cost_hessian,
            eq_gx=self.equality_constraints_state_jacobian,
            eq_gu=self.equality_constraints_control_jacobian,
            ineq_gx=self.inequality_constraints_state_jacobian,
            ineq_gu=self.inequality_constraints_control_jacobian,
        )

        objective = self.objective_function
        objective_is_default = objective is None
        if objective is None:
            objective = _synthesized_objective(self.stage_cost, self.terminal_cost)

        # Probe constraint dimensionality once, statically (the analogue of the
        # reference calling the constraint at the initial state: ilqr.hpp:318-323).
        eq_dim = ineq_dim = 0
        x_probe = jnp.asarray(self.initial_state)
        u_probe = jnp.zeros((self.control_dim,), x_probe.dtype)
        if self.equality_constraints is not None:
            eq_dim = int(jax.eval_shape(self.equality_constraints, x_probe, u_probe).shape[0])
        if self.inequality_constraints is not None:
            ineq_dim = int(
                jax.eval_shape(self.inequality_constraints, x_probe, u_probe).shape[0]
            )

        if self.initial_controls is None:
            self.initial_controls = jnp.zeros(
                (self.horizon_steps, self.control_dim), x_probe.dtype
            )

        self._spec = OCPSpec(
            initial_state=x_probe,
            initial_controls=jnp.asarray(self.initial_controls),
            state_lower_bounds=self.state_lower_bounds,
            state_upper_bounds=self.state_upper_bounds,
            input_lower_bounds=self.input_lower_bounds,
            input_upper_bounds=self.input_upper_bounds,
            dynamics=self.dynamics,
            stage_cost=self.stage_cost,
            terminal_cost=self.terminal_cost,
            objective_function=objective,
            equality_constraints=self.equality_constraints,
            inequality_constraints=self.inequality_constraints,
            derivs=derivs,
            state_dim=self.state_dim,
            control_dim=self.control_dim,
            horizon_steps=self.horizon_steps,
            eq_dim=eq_dim,
            ineq_dim=ineq_dim,
            dt=float(self.dt),
            objective_is_default=objective_is_default,
            derivative_mode=self.derivative_mode,
        )
        return self._spec

    def invalidate(self) -> None:
        """Drop the cached spec (required after mutating problem functions)."""
        self._spec = None

    def set_result(self, states: Array, controls: Array, cost) -> None:
        """Store a solver result (the analogue of solvers mutating best_*)."""
        self.best_states = states
        self.best_controls = controls
        self.best_cost = float(cost)
