"""Augmented-Lagrangian iLQR, TPU-native.

Behavioural analogue of the reference solver (``solvers/ilqr.hpp:23-461``),
re-architected for XLA/TPU:

* **Linearization is batched over the horizon**: dynamics Jacobians, cost
  gradients/Hessians and constraint residuals/Jacobians for all T stages are
  produced by ``vmap`` in a handful of fused launches (the reference evaluates
  them stage-by-stage inside the backward loop, ilqr.hpp:106-113).
* **The Riccati recursion is a ``lax.scan``** carrying ``(v_x, v_xx)``; only
  the truly sequential value recursion remains sequential.
* **Regularization retries become a static ladder** of batched Cholesky
  candidates (see :mod:`multi_agent_solver_tpu.ops.psd`; reference retry loop:
  ilqr.hpp:172-183).
* **The forward line search evaluates every alpha in parallel**: one batched
  feedback rollout with a lane per candidate step, then a branch-free select
  of the largest improving alpha -- exactly equivalent to the reference's
  first-accept halving loop (ilqr.hpp:199-228) because alphas are tested in
  decreasing order there.
* **Outer iterations are a ``lax.while_loop``** with a convergence flag, so
  batched (vmapped) problem instances can converge at different iterations.

Parity notes (deliberately preserved reference behaviour):

* The *continuous-time* dynamics Jacobians are used directly as the discrete
  transition matrices in the Riccati recursion, exactly as the reference does
  (ilqr.hpp:106-119) even though the rollout integrates RK4.
* The merit function is the AL-augmented objective with an activation mask on
  inequalities (compute_merit, ilqr.hpp:379-407).
* Dual updates and the penalty schedule run every iteration after the line
  search (ilqr.hpp:239-260); convergence requires merit improvement below
  tolerance AND violations below constraint_tolerance (ilqr.hpp:269-271).
* One deliberate fix over the reference: the line-search acceptance merit is
  recomputed with the CURRENT multipliers/penalty at the top of every
  iteration.  The reference carries the previous iteration's merit value
  across its dual updates (ilqr.hpp:234 vs 239-260), so once multipliers
  grow, every trial compares against a stale (too low) bar and the solver
  deadlocks with violated constraints.  None of the reference's examples use
  functional constraints, so its behaviour there is unaffected -- and for
  unconstrained problems merit == cost and the recomputation is the
  identical value, preserving exact parity.
* ``max_ms`` wall-clock budgets are not representable inside a compiled TPU
  program; iteration counts are the budget (see docs/DESIGN.md).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..constraints import eval_constraints_horizon
from ..integrators import integrate_rk4
from ..ocp import OCPSpec
from ..ops.small import psd_solve_with_escalation
from ..types import Array, SolverParams, get_param, param_flag
from .base import SolveResult, SolverBase, register_solver


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    """Static solver configuration (reference defaults: ilqr.hpp:26-37)."""

    max_iterations: int = 50
    tolerance: float = 1e-6
    penalty: float = 10.0
    penalty_increase: float = 5.0
    constraint_tolerance: float = 1e-4
    inequality_activation_tolerance: float = 1e-6
    alpha_min: float = 1e-3       # forward-pass floor (ilqr.hpp:199)
    # Optional override of the forward-pass candidate ladder (beyond the
    # reference, which always halves 1.0 -> alpha_min, 10 candidates).  The
    # acceptance rule is unchanged (largest improving candidate, monotone
    # merit), only the granularity: a Newton-quality step accepts alpha = 1
    # nearly always, so scoring 10 full-horizon rollouts per iteration is
    # almost all waste -- profiling put the select kernel at 65% of fused
    # device time (docs/BENCHMARKS.md).  A short ladder like (1, 1/2, 1/8)
    # recovers that time; on the headline benchmark the converged costs are
    # IDENTICAL down to a 2-rung ladder (tests/test_fused_loop.py).
    alpha_ladder: tuple = None
    # With alpha_warmup = k > 0, the first k iterations use the FULL
    # reference ladder (global phase, where small alphas are actually
    # taken) and later iterations the short alpha_ladder (refinement
    # phase).  Fused path only; 0 = same ladder every iteration.
    alpha_warmup: int = 0
    # Fused-path lane fold: pack this many 1024-problem batch tiles into the
    # sublane axis of every kernel block, so each elementwise op inside the
    # sequential-grid kernels covers fold x (8, 128) vector registers.  The
    # time recursion serializes grid steps; with one vreg per op the VPU sat
    # at ~15% utilization (latency/overhead-bound, BENCH_r02) -- folding
    # raises per-step ILP near-linearly until VMEM or issue width binds.
    # 0 = auto (largest power of two <= 8 that divides the batch tiles and
    # fits the Riccati kernel's per-step VMEM budget).
    lane_fold: int = 0
    # Host wall-clock budget (reference: ilqr.hpp:84-90).  Ignored unless
    # enforce_max_ms is set -- see solvers/base.py deadline machinery.
    max_ms: float = 0.0
    enforce_max_ms: bool = False
    reg_init: float = 1e-6        # q_uu regularization ladder (ilqr.hpp:174)
    reg_factor: float = 10.0
    reg_levels: int = 16
    # 'discrete' (default): exact Jacobians of the RK4 step map, obtained by
    # AD through the integrator -- the mathematically correct discrete-time
    # Riccati recursion.  'continuous': reproduce the reference exactly, which
    # feeds raw continuous-time dynamics Jacobians into the recursion
    # (ilqr.hpp:106-119) and consequently stalls far from the optimum on e.g.
    # the single-track benchmark (see docs/PARITY.md).
    jacobian_mode: str = "discrete"
    # 'clamp' (default): reference behaviour -- unconstrained gains, controls
    # clamped per step in the forward pass (ilqr.hpp:213-214).  'boxqp':
    # control-limited DDP -- the backward pass solves each stage's
    # box-constrained QP exactly (ops/boxqp.py) and zeroes feedback rows of
    # clamped dims; escapes the bound-corner stalls the clamp can hit.
    bound_mode: str = "clamp"
    # Full second-order DDP (param ``ddp``): add the exact dynamics-Hessian
    # terms ``V_x . F_(xx|ux|uu)`` of the discrete step map to the Q-expansion
    # (the reference -- and default -- is the Gauss-Newton/iLQR variant that
    # drops them, ilqr.hpp:115-119), with Tassa-style adaptive-mu state
    # regularization to keep the gains descent directions when the curvature
    # is indefinite.  Newton-exact per stage (tests/test_ddp.py), identical
    # on affine-dynamics (LQR) problems, and quadratically convergent near
    # the optimum -- but often SLOWER than Gauss-Newton far from it (the
    # single-track's near-uncontrollable v=0 start is a worst case), which
    # is why Gauss-Newton stays the default.  Requires the default
    # 'discrete' Jacobian mode; scan backward only.
    ddp: bool = False
    # Cost-structure declaration: the stage/terminal costs are quadratic in
    # (x, u) (for a fixed context), so their Hessian stacks lxx/luu/lux/phixx
    # are trajectory-independent and are evaluated ONCE before the outer loop
    # instead of per iteration.  Tri-state (round 5, VERDICT r4 item 3):
    #
    # * ``None`` (default) -- AUTO-DETECT: a trace-time probe evaluates the
    #   AD Hessians at two random (x, u) points (probe_cost_structure) and
    #   hoists exactly when they match.  The default path now gets the
    #   hoisting speedup for every truly quadratic cost with no flags.
    # * ``True`` -- user assertion, now VERIFIED against the same probe:
    #   a non-quadratic cost with the flag set raises ValueError instead of
    #   silently returning a fixed-metric Gauss-Newton variant's answer.
    #   (In 'fd' derivative mode the probe is too noisy to adjudicate --
    #   f32 second-difference stencils of an exactly quadratic cost carry
    #   O(1e-2) relative noise -- so explicit flags are trusted there.)
    # * ``False`` -- hoisting off (per-iteration Hessian evaluation).
    quadratic_cost: "bool | None" = None
    # Stronger structure on top of quadratic_cost: the cost Hessians are
    # additionally TIME-invariant (true for every fixed-weight tracking
    # cost in the zoo: single-track lane follow, LQR, quadrotor hover).  The
    # fused path then keeps ONE Hessian block per problem and the Riccati
    # kernel reads it once per batch row instead of per stage -- at nx=4,
    # nu=2 that cuts the kernel's HBM traffic by half (28 of 58 tiles per
    # grid step were constant stacks).  Same tri-state semantics as
    # quadratic_cost: None = probe (compare Hessians at t=0 vs t=T-1),
    # True = verified assertion, False = off.  Ignored without
    # quadratic_cost.
    stationary_cost: "bool | None" = None
    # Whole-batch early exit (the reference's convergence break,
    # ilqr.hpp:269-271, lifted to the batch: stop when EVERY lane's
    # convergence flag is set).  True = lax.while_loop with a data-dependent
    # predicate; False = fixed-trip fori_loop to max_iterations with the
    # same per-lane freeze masks -- identical results whenever any lane is
    # still active at the last iteration (converged lanes never change
    # state), and the only difference otherwise is wasted no-op iterations.
    # Why opt out: a data-dependent while predicate must round-trip the
    # reduced flag through the host-side execution stream; through this
    # environment's remote-TPU tunnel that costs ~20 ms PER ITERATION
    # (xplane: per-iteration pred/scalar copy-start pairs dominating wall
    # time), which fixed trip counts eliminate entirely.  Large-batch
    # benchmarks (P[all 262k lanes converge early] ~ 0) lose nothing.
    early_exit: bool = True
    # Stationary-path implementation switch (A/B benchmarking knob): True
    # linearizes INSIDE the Riccati kernel (riccati_fusedlin_pallas_tiled
    # -- reads x, u instead of A/B/lx/lu stacks, no separate linearize
    # launch); False keeps the separate hessians=False linearize kernel +
    # time-constant Hessian blocks (hess_tconst).  Identical results
    # (tests/test_fused_loop.py); only device time differs.
    stationary_fusedlin: bool = True
    # Select-kernel time unroll (param ``time_unroll``): consecutive time
    # steps processed per sequential grid step of the forward-select kernel.
    # 0 = auto (2 when the horizon divides evenly, else 1).  Identical
    # arithmetic per sub-step -- only the grid-step count and DMA cadence
    # change.
    time_unroll: int = 0
    # Lane-resident fused-loop routing for batched solves (param ``fused``):
    # 'auto' (default) fuses eligible unconstrained/uncoupled problems only;
    # 'on' also fuses coupled (context) and AL-constrained solves; 'off'
    # forces the kernel-per-phase path.  See solve_ilqr_batched.
    fused: str = "auto"
    # Reverse-mode differentiable solve (param ``differentiable``): the outer
    # while_loop becomes a bounded, rematerialized fori_loop (converged
    # instances freeze), so ``jax.grad`` flows through the returned
    # trajectory/cost into every problem parameter (initial state, cost
    # weights, dynamics constants) -- learned-cost tuning and differentiable
    # MPC.  Unrolled differentiation of the optimizer: exact for the program
    # actually run, memory O(sqrt-ish) via jax.checkpoint on the iteration
    # body.  Batched solves route through vmap of the scan path (the Pallas
    # kernels define no VJP).  No reference counterpart (C++/Eigen cannot
    # differentiate through a solver).
    differentiable: bool = False
    # Opt-in host-path transform: fold finite state bounds into AL
    # inequality rows (param ``state_bounds_al``); the reference's iLQR
    # ignores state bounds entirely (rocket_max_altitude.cpp:122-128).
    state_bounds_al: bool = False
    debug: bool = False

    @classmethod
    def from_params(cls, params: SolverParams) -> "ILQRConfig":
        """Reference key names (ilqr.hpp:39-55); max_iterations/tolerance/max_ms
        required there -- max_ms is accepted and ignored (not jittable)."""
        return cls(
            max_iterations=int(get_param(params, "max_iterations")),
            tolerance=get_param(params, "tolerance"),
            penalty=get_param(params, "penalty", 10.0),
            penalty_increase=get_param(params, "penalty_increase", 5.0),
            constraint_tolerance=get_param(params, "constraint_tolerance", 1e-4),
            inequality_activation_tolerance=get_param(
                params, "inequality_activation_tolerance", 1e-6
            ),
            jacobian_mode=(
                "continuous" if param_flag(params, "continuous_jacobians") else "discrete"
            ),
            bound_mode="boxqp" if param_flag(params, "boxqp") else "clamp",
            ddp=param_flag(params, "ddp"),
            # Tri-state: key absent = auto-detect (None); present follows the
            # reference >0.5 flag convention (explicit on/off).
            quadratic_cost=(
                param_flag(params, "quadratic_cost")
                if "quadratic_cost" in params else None
            ),
            stationary_cost=(
                param_flag(params, "stationary_cost")
                if "stationary_cost" in params else None
            ),
            # Same >0.5 threshold as every other flag (ADVICE r4): bool(0.3)
            # would have enabled this flag while disabling any other.
            early_exit=get_param(params, "early_exit", 1.0) > 0.5,
            fused=(
                "auto" if "fused" not in params
                else ("on" if param_flag(params, "fused") else "off")
            ),
            time_unroll=int(get_param(params, "time_unroll", 0.0)),
            differentiable=param_flag(params, "differentiable"),
            state_bounds_al=param_flag(params, "state_bounds_al"),
            max_ms=get_param(params, "max_ms", 0.0),
            enforce_max_ms=param_flag(params, "enforce_max_ms"),
            debug=param_flag(params, "debug"),
        )


def _alpha_ladder_floats(alpha_min: float):
    """Python-float candidates 1, 1/2, 1/4, ... down to alpha_min (ilqr.hpp:199-206)."""
    alphas = []
    alpha = 1.0
    while alpha >= alpha_min:
        alphas.append(alpha)
        alpha *= 0.5
    return tuple(alphas)


def _alpha_ladder(alpha_min: float, dtype) -> Array:
    """Array form of the forward-pass candidate ladder."""
    return jnp.asarray(_alpha_ladder_floats(alpha_min), dtype)


def compute_merit(
    spec: OCPSpec,
    config: ILQRConfig,
    states: Array,
    controls: Array,
    eq_mult: Array,
    ineq_mult: Array,
    rho: Array,
) -> Array:
    """AL merit with inequality activation mask (reference: ilqr.hpp:379-407)."""
    merit = spec.cost(states, controls)   # context-aware objective
    if spec.eq_dim > 0:
        g = eval_constraints_horizon(spec.equality_constraints, states, controls)
        merit = merit + jnp.sum(eq_mult * g) + 0.5 * rho * jnp.sum(g**2)
    if spec.ineq_dim > 0:
        h = eval_constraints_horizon(spec.inequality_constraints, states, controls)
        slack = jnp.maximum(h, 0.0)
        active = (h > -config.inequality_activation_tolerance).astype(states.dtype)
        active_slack = slack * active
        merit = merit + jnp.sum((ineq_mult * active) * active_slack)
        merit = merit + 0.5 * rho * jnp.sum(active_slack**2)
    return merit


def _linearize(
    spec: OCPSpec, config: "ILQRConfig", xs: Array, us: Array, hess=None
):
    """Stage-wise derivatives for the whole horizon in batched launches.

    ``hess``: optional precomputed ``(lxx, luu, lux)`` stacks (quadratic-cost
    hoisting, see :func:`_cost_hessians`) -- skips their per-iteration AD.
    """
    d = spec.derivs
    ts = jnp.arange(spec.horizon_steps)
    x, u = xs[:-1], us
    if config.jacobian_mode == "discrete" and d.step_fx is not None:
        A = jax.vmap(d.step_fx)(x, u)  # [T, nx, nx] exact d(step)/dx
        B = jax.vmap(d.step_fu)(x, u)  # [T, nx, nu] exact d(step)/du
    else:
        A = jax.vmap(d.fx)(x, u)      # [T, nx, nx] continuous (reference parity)
        B = jax.vmap(d.fu)(x, u)      # [T, nx, nu]
    hess_dyn = None
    if getattr(config, "ddp", False):
        # Exact second derivatives of the discrete step map for the full-DDP
        # Q-expansion (forward-over-forward AD through the integrator).
        step = lambda xx, uu: integrate_rk4(xx, uu, spec.dt, spec.dynamics)
        Fxx = jax.vmap(jax.jacfwd(jax.jacfwd(step, 0), 0))(x, u)  # [T,nx,nx,nx]
        Fux = jax.vmap(jax.jacfwd(jax.jacfwd(step, 1), 0))(x, u)  # [T,nx,nu,nx]
        Fuu = jax.vmap(jax.jacfwd(jax.jacfwd(step, 1), 1))(x, u)  # [T,nx,nu,nu]
        hess_dyn = (Fxx, Fux, Fuu)
    # Cost derivative oracles forward any extra context argument unchanged.
    cost_args = (x, u, ts) if spec.context is None else (x, u, ts, spec.context)
    lx = jax.vmap(d.lx)(*cost_args)     # [T, nx]
    lu = jax.vmap(d.lu)(*cost_args)     # [T, nu]
    if hess is not None:
        lxx, luu, lux = hess
    else:
        lxx = jax.vmap(d.lxx)(*cost_args)   # [T, nx, nx]
        luu = jax.vmap(d.luu)(*cost_args)   # [T, nu, nu]
        lux = jax.vmap(d.lux)(*cost_args)   # [T, nu, nx]
    if hess_dyn is not None:
        return A, B, lx, lu, lxx, luu, lux, hess_dyn
    return A, B, lx, lu, lxx, luu, lux


def _cost_hessians(spec: OCPSpec, xs: Array, us: Array):
    """One-shot stage-cost Hessian stacks ``(lxx, luu, lux)`` plus the
    symmetrized terminal ``phixx`` at a nominal trajectory (quadratic-cost
    hoisting: for quadratic costs these are trajectory-independent)."""
    d = spec.derivs
    ts = jnp.arange(spec.horizon_steps)
    x, u = xs[:-1], us
    cost_args = (x, u, ts) if spec.context is None else (x, u, ts, spec.context)
    lxx = jax.vmap(d.lxx)(*cost_args)
    luu = jax.vmap(d.luu)(*cost_args)
    lux = jax.vmap(d.lux)(*cost_args)
    phixx = d.phixx(xs[-1])
    phixx = 0.5 * (phixx + phixx.T)
    return (lxx, luu, lux), phixx


def probe_cost_structure(spec: OCPSpec) -> "tuple[bool, bool]":
    """Trace-time probe of the cost Hessians' structure -> (quadratic,
    stationary).

    Evaluates the AD cost Hessians ``lxx/luu/lux`` at two pseudo-random
    concrete ``(x, u)`` points for each of two stage indices (t = 0 and
    t = T-1), plus the terminal ``phixx`` at both points.  Every input is a
    CONCRETE array, so the whole probe executes eagerly at trace time --
    even inside an outer ``jit``/``vmap`` trace (no tracer flows in) -- and
    contributes nothing to the compiled program.

    * ``quadratic``: all Hessian blocks match across the (x, u) points at
      both stage indices and the terminal Hessian matches across points --
      the precondition for hoisting them out of the iteration loop
      (:func:`_cost_hessians`).
    * ``stationary``: additionally t-invariant (t=0 blocks == t=T-1
      blocks) and context-free -- the precondition for the fused path's
      single-block ``hess_tconst`` layout.

    The reference gets this structure by the USER supplying constant
    analytic cost derivatives (single_track_ocp.cpp:41-66); here the
    framework discovers it.  Non-finite probe values (costs with
    singularities at generic points) compare unequal, so the probe degrades
    to the safe "not quadratic" answer.  Context costs are probed with a
    fixed random context vector per stage index; they can be quadratic but
    never auto-stationary (the context varies over t).
    """
    import numpy as np

    d = spec.derivs
    nx, nu, T = spec.state_dim, spec.control_dim, spec.horizon_steps
    has_ctx = spec.context is not None
    rng = np.random.RandomState(0xC057)
    f32 = jnp.float32

    # ensure_compile_time_eval escapes the surrounding omnistaged trace:
    # with it, these all-concrete-operand ops execute eagerly instead of
    # being staged into the jaxpr as if they depended on the jit arguments.
    with jax.ensure_compile_time_eval():
        x_pts = [jnp.asarray(rng.standard_normal(nx), f32) for _ in range(2)]
        u_pts = [jnp.asarray(rng.standard_normal(nu), f32) for _ in range(2)]
        # Per-stage context slice: spec.context is [T, ...] on a
        # single-problem spec, so one stage's ctx has shape context.shape[1:]
        # (a vector for plain context costs, [K, nx] for coupled sweeps).
        ctx = [
            jnp.asarray(rng.standard_normal(spec.context.shape[1:]), f32)
            if has_ctx else None
            for _ in range(2)
        ]

        def blocks(x, u, t, c):
            args = (x, u, jnp.asarray(t, jnp.int32))
            if has_ctx:
                args = args + (c,)
            return tuple(np.asarray(f(*args), np.float64)
                         for f in (d.lxx, d.luu, d.lux))

        def match(a, b):
            return all(
                np.all(np.isfinite(p)) and np.all(np.isfinite(q))
                and np.allclose(p, q, rtol=1e-4, atol=1e-6)
                for p, q in zip(a, b)
            )

        q00 = blocks(x_pts[0], u_pts[0], 0, ctx[0])
        q01 = blocks(x_pts[1], u_pts[1], 0, ctx[0])
        q10 = blocks(x_pts[0], u_pts[0], T - 1, ctx[1])
        q11 = blocks(x_pts[1], u_pts[1], T - 1, ctx[1])
        p_terms = tuple(
            (np.asarray(d.phixx(x), np.float64),) for x in x_pts
        )
    quadratic = (
        match(q00, q01) and match(q10, q11) and match(*p_terms)
    )
    stationary = quadratic and not has_ctx and match(q00, q10)
    return quadratic, stationary


def resolve_cost_structure(
    spec: OCPSpec, config: "ILQRConfig"
) -> "tuple[bool, bool]":
    """Concrete ``(quadratic, stationary)`` from the tri-state config fields.

    ``None`` = auto-detect via :func:`probe_cost_structure`; ``True`` = user
    assertion, VERIFIED against the probe (ValueError on mismatch -- a wrong
    assertion silently returned wrong gains/trajectories before round 5);
    ``False`` = hoisting off.  In 'fd' derivative mode the f32 stencil noise
    makes the probe unreliable, so auto stays off and explicit flags are
    trusted unverified (documented in the config docstring).
    """
    want_q, want_s = config.quadratic_cost, config.stationary_cost
    if want_q is False:
        return False, False
    if spec.derivative_mode != "ad":
        quad = bool(want_q)
        return quad, quad and bool(want_s)
    probe_q, probe_s = probe_cost_structure(spec)
    if want_q and not probe_q:
        raise ValueError(
            "quadratic_cost=1 was set but the stage/terminal cost Hessians "
            "differ between probe points -- the cost is not quadratic in "
            "(x, u), and hoisting would silently return wrong solutions. "
            "Remove the flag (auto-detection hoists truly quadratic costs)."
        )
    if want_s and not probe_s:
        raise ValueError(
            "stationary_cost=1 was set but the cost Hessians at t=0 and "
            "t=T-1 differ (or the cost takes a per-stage context) -- the "
            "time-invariant hoisting layout would be wrong. Remove the flag."
        )
    quad = probe_q if want_q is None else bool(want_q)
    stationary = quad and (probe_s if want_s is None else bool(want_s))
    return quad, stationary


def _add_al_terms(spec, config, xs, us, lx, lu, lxx, luu, lux, eq_mult, ineq_mult, rho):
    """Fold AL constraint contributions into the stage derivatives.

    These terms are purely local per stage (they do not involve the value
    function), so they move out of the reference's backward loop
    (ilqr.hpp:121-169) into one batched computation.
    """
    d = spec.derivs
    x, u = xs[:-1], us
    if spec.eq_dim > 0:
        g = eval_constraints_horizon(spec.equality_constraints, xs, us)   # [T, m]
        Gx = jax.vmap(d.eq_gx)(x, u)                                      # [T, m, nx]
        Gu = jax.vmap(d.eq_gu)(x, u)                                      # [T, m, nu]
        dual = eq_mult + rho * g                                          # [T, m]
        lx = lx + jnp.einsum("tmi,tm->ti", Gx, dual)
        lu = lu + jnp.einsum("tmi,tm->ti", Gu, dual)
        lxx = lxx + rho * jnp.einsum("tmi,tmj->tij", Gx, Gx)
        lux = lux + rho * jnp.einsum("tmi,tmj->tij", Gu, Gx)
        luu = luu + rho * jnp.einsum("tmi,tmj->tij", Gu, Gu)
    if spec.ineq_dim > 0:
        h = eval_constraints_horizon(spec.inequality_constraints, xs, us)
        Hx = jax.vmap(d.ineq_gx)(x, u)
        Hu = jax.vmap(d.ineq_gu)(x, u)
        slack = jnp.maximum(h, 0.0)
        active = (h > -config.inequality_activation_tolerance).astype(h.dtype)
        dual = ineq_mult * active + rho * slack * active                  # ilqr.hpp:155-158
        lx = lx + jnp.einsum("tmi,tm->ti", Hx, dual)
        lu = lu + jnp.einsum("tmi,tm->ti", Hu, dual)
        # Gauss-Newton Hessians masked by the active set (ilqr.hpp:163-169).
        lxx = lxx + rho * jnp.einsum("tmi,tm,tmj->tij", Hx, active, Hx)
        lux = lux + rho * jnp.einsum("tmi,tm,tmj->tij", Hu, active, Hx)
        luu = luu + rho * jnp.einsum("tmi,tm,tmj->tij", Hu, active, Hu)
    return lx, lu, lxx, luu, lux


def _backward_pass(
    spec, config, xs, A, B, lx, lu, lxx, luu, lux, us=None, phixx_const=None,
    hess_dyn=None, mu0=None,
):
    """Riccati recursion as a reverse scan (reference loop: ilqr.hpp:104-193).

    With ``config.bound_mode == 'boxqp'`` (and input bounds present), each
    stage's gains come from the exact box-constrained QP instead of the
    unconstrained solve-then-clamp (``us`` supplies the linearization point
    for the delta bounds).
    """
    use_boxqp = (
        config.bound_mode == "boxqp"
        and spec.has_input_bounds
        and spec.control_dim <= 4
        and us is not None
    )
    v_x = spec.derivs.phix(xs[-1])
    if phixx_const is not None:
        v_xx = phixx_const
    else:
        v_xx = spec.derivs.phixx(xs[-1])
        v_xx = 0.5 * (v_xx + v_xx.T)  # ilqr.hpp:102

    scan_inputs = (A, B, lx, lu, lxx, luu, lux)
    if use_boxqp:
        scan_inputs = scan_inputs + (us,)
    if hess_dyn is not None:
        scan_inputs = scan_inputs + hess_dyn

    def step(carry, inputs):
        v_x, v_xx = carry
        Fxx_t = Fux_t = Fuu_t = None
        if hess_dyn is not None:
            inputs, (Fxx_t, Fux_t, Fuu_t) = inputs[:-3], inputs[-3:]
        if use_boxqp:
            A_t, B_t, lx_t, lu_t, lxx_t, luu_t, lux_t, u_t = inputs
        else:
            A_t, B_t, lx_t, lu_t, lxx_t, luu_t, lux_t = inputs
        q_x = lx_t + A_t.T @ v_x
        q_u = lu_t + B_t.T @ v_x
        q_xx = lxx_t + A_t.T @ v_xx @ A_t
        q_ux = lux_t + B_t.T @ v_xx @ A_t
        q_uu = luu_t + B_t.T @ v_xx @ B_t
        if Fxx_t is not None:
            # Full DDP: V_x-weighted dynamics curvature (dropped by iLQR and
            # by the reference, ilqr.hpp:115-119).
            q_xx = q_xx + jnp.einsum("i,ijk->jk", v_x, Fxx_t)
            q_ux = q_ux + jnp.einsum("i,iaj->aj", v_x, Fux_t)
            q_uu = q_uu + jnp.einsum("i,iab->ab", v_x, Fuu_t)

            # Tassa-style state regularization (Tassa et al. 2012): far from
            # the optimum the curvature terms make q_uu indefinite, and a
            # plain q_uu + mu*I ladder yields gains that are not descent
            # directions for the merit -- the line search then rejects
            # everything and the solver stalls.  Regularizing THROUGH the
            # dynamics (mu B^T B on q_uu, mu B^T A on q_ux) is equivalent to
            # V_xx + mu*I and keeps the gains consistent.
            from ..ops.small import leading_minors_positive, solve_spd_small

            j = jnp.arange(config.reg_levels, dtype=q_uu.dtype)
            levels = config.reg_init * (config.reg_factor**j - 1.0) / (
                config.reg_factor - 1.0
            )
            if mu0 is not None:
                # Outer-loop adapted floor: raised after a failed line
                # search, lowered after acceptance (Tassa's mu schedule).
                levels = levels + mu0
            eye_u = jnp.eye(q_uu.shape[0], dtype=q_uu.dtype)
            BtB = B_t.T @ B_t + 1e-12 * eye_u
            cands = q_uu[None] + levels[:, None, None] * BtB
            ok = leading_minors_positive(cands)
            idx = jnp.where(jnp.any(ok), jnp.argmax(ok), config.reg_levels - 1)
            mu = levels[idx]
            q_uu_r = q_uu + mu * BtB
            q_ux_r = q_ux + mu * (B_t.T @ A_t)
            rhs = jnp.concatenate([q_u[:, None], q_ux_r], axis=1)
            sol = solve_spd_small(q_uu_r, rhs)
            k_t = -sol[:, 0]
            K_t = -sol[:, 1:]
            v_x_new = q_x + K_t.T @ q_u + q_ux.T @ k_t + K_t.T @ (q_uu @ k_t)
            v_xx_new = q_xx + K_t.T @ q_ux + q_ux.T @ K_t + K_t.T @ q_uu @ K_t
            v_xx_new = 0.5 * (v_xx_new + v_xx_new.T)
            return (v_x_new, v_xx_new), (k_t, K_t)

        if use_boxqp:
            from ..ops.boxqp import boxqp_gains
            from ..ops.small import leading_minors_positive

            # Same cumulative regularization ladder, materialized so the
            # box-QP sees the regularized Hessian.
            j = jnp.arange(config.reg_levels, dtype=q_uu.dtype)
            levels = config.reg_init * (config.reg_factor**j - 1.0) / (
                config.reg_factor - 1.0
            )
            eye = jnp.eye(q_uu.shape[0], dtype=q_uu.dtype)
            cands = q_uu[None] + levels[:, None, None] * eye
            ok = leading_minors_positive(cands)
            idx = jnp.where(jnp.any(ok), jnp.argmax(ok), config.reg_levels - 1)
            q_uu_reg = q_uu + levels[idx] * eye
            k_t, K_t = boxqp_gains(
                q_uu_reg, q_u, q_ux,
                spec.input_lower_bounds - u_t,
                spec.input_upper_bounds - u_t,
            )
        else:
            rhs = jnp.concatenate([q_u[:, None], q_ux], axis=1)
            sol, _ = psd_solve_with_escalation(
                q_uu, rhs, config.reg_init, config.reg_factor, config.reg_levels
            )
            k_t = -sol[:, 0]
            K_t = -sol[:, 1:]

        # Value recursion incl. K^T q_uu k terms (ilqr.hpp:188-192).
        v_x_new = q_x + K_t.T @ q_u + q_ux.T @ k_t + K_t.T @ (q_uu @ k_t)
        v_xx_new = q_xx + K_t.T @ q_ux + q_ux.T @ K_t + K_t.T @ q_uu @ K_t
        v_xx_new = 0.5 * (v_xx_new + v_xx_new.T)
        return (v_x_new, v_xx_new), (k_t, K_t)

    _, (k, K) = jax.lax.scan(step, (v_x, v_xx), scan_inputs, reverse=True)
    return k, K


def _forward_pass(spec, config, xs, us, k, K, eq_mult, ineq_mult, rho, current_merit):
    """All-alpha batched feedback rollout + branch-free accept.

    Equivalent to the reference's decreasing-alpha first-accept loop
    (ilqr.hpp:199-228): the largest alpha whose merit improves wins.
    """
    alphas = (
        jnp.asarray(config.alpha_ladder, xs.dtype)
        if config.alpha_ladder else _alpha_ladder(config.alpha_min, xs.dtype)
    )

    def rollout(alpha):
        def step(x_t, inp):
            x_ref, u_ref, k_t, K_t = inp
            u_t = u_ref + alpha * k_t + K_t @ (x_t - x_ref)
            if spec.has_input_bounds:  # ilqr.hpp:213-214
                u_t = jnp.clip(u_t, spec.input_lower_bounds, spec.input_upper_bounds)
            x_next = integrate_rk4(x_t, u_t, spec.dt, spec.dynamics)
            return x_next, (x_next, u_t)

        _, (x_tail, u_new) = jax.lax.scan(step, xs[0], (xs[:-1], us, k, K))
        x_new = jnp.concatenate([xs[:1], x_tail], axis=0)
        return x_new, u_new

    xs_cand, us_cand = jax.vmap(rollout)(alphas)  # [A, T+1, nx], [A, T, nu]
    merits = jax.vmap(
        lambda X, U: compute_merit(spec, config, X, U, eq_mult, ineq_mult, rho)
    )(xs_cand, us_cand)

    accept = merits < current_merit
    idx = jnp.argmax(accept)
    found = jnp.any(accept)
    x_new = jnp.where(found, xs_cand[idx], xs)
    u_new = jnp.where(found, us_cand[idx], us)
    merit_new = jnp.where(found, merits[idx], current_merit)
    return x_new, u_new, merit_new


def solve_ilqr(spec: OCPSpec, config: ILQRConfig) -> SolveResult:
    """Pure functional AL-iLQR solve (jittable, vmappable)."""
    T = spec.horizon_steps
    dtype = spec.initial_state.dtype

    us0 = spec.initial_controls
    xs0 = spec.rollout(us0)
    cost0 = spec.cost(xs0, us0)

    eq_mult0 = jnp.zeros((T, spec.eq_dim), dtype)
    ineq_mult0 = jnp.zeros((T, spec.ineq_dim), dtype)
    rho0 = jnp.asarray(config.penalty, dtype)
    merit0 = compute_merit(spec, config, xs0, us0, eq_mult0, ineq_mult0, rho0)

    # Quadratic-cost hoisting: trajectory-independent Hessians leave the loop
    # (auto-detected or verified at trace time, resolve_cost_structure).
    hess0 = phixx0 = None
    if resolve_cost_structure(spec, config)[0]:
        hess0, phixx0 = _cost_hessians(spec, xs0, us0)

    def cond(state):
        it, converged, timed_out = state[7], state[8], state[11]
        return (it < config.max_iterations) & ~converged & ~timed_out

    def body(state):
        xs, us, cost, _, eq_mult, ineq_mult, rho, it, converged, _, _, _ = state[:12]
        mu = state[12] if config.ddp else None

        # Fresh merit under the CURRENT multipliers/penalty (see module
        # docstring: fixes the reference's stale-merit deadlock).
        merit = compute_merit(spec, config, xs, us, eq_mult, ineq_mult, rho)

        lin = _linearize(spec, config, xs, us, hess0)
        A, B, lx, lu, lxx, luu, lux = lin[:7]
        hess_dyn = lin[7] if len(lin) > 7 else None
        lx, lu, lxx, luu, lux = _add_al_terms(
            spec, config, xs, us, lx, lu, lxx, luu, lux, eq_mult, ineq_mult, rho
        )
        k, K = _backward_pass(
            spec, config, xs, A, B, lx, lu, lxx, luu, lux, us,
            phixx_const=phixx0, hess_dyn=hess_dyn, mu0=mu,
        )
        xs_new, us_new, merit_new = _forward_pass(
            spec, config, xs, us, k, K, eq_mult, ineq_mult, rho, merit
        )

        improvement = merit - merit_new
        cost_new = spec.cost(xs_new, us_new)

        # Dual updates + penalty schedule (ilqr.hpp:239-260).
        eq_viol = ineq_viol = jnp.asarray(0.0, dtype)
        if spec.eq_dim > 0:
            g = eval_constraints_horizon(spec.equality_constraints, xs_new, us_new)
            eq_mult = eq_mult + rho * g
            eq_viol = jnp.sqrt(jnp.sum(g**2))
        if spec.ineq_dim > 0:
            h = eval_constraints_horizon(spec.inequality_constraints, xs_new, us_new)
            positive = jnp.maximum(h, 0.0)
            ineq_mult = jnp.maximum(ineq_mult + rho * positive, 0.0)
            ineq_viol = jnp.sqrt(jnp.sum(positive**2))

        rho = jnp.where(
            (eq_viol > config.constraint_tolerance)
            | (ineq_viol > config.constraint_tolerance),
            rho * config.penalty_increase,
            rho,
        )

        converged = (
            (improvement < config.tolerance)
            & (eq_viol < config.constraint_tolerance)
            & (ineq_viol < config.constraint_tolerance)
        )
        if config.ddp:
            # Tassa mu schedule: a failed line search is NOT convergence --
            # raise mu and redo the (more conservative) backward pass from
            # the same iterate; lower mu after acceptance.  Converge only on
            # an ACCEPTED step with tiny improvement, or when mu saturates.
            accepted = merit_new < merit
            mu_next = jnp.where(
                accepted, mu * 0.5, jnp.maximum(mu, 1e-6) * 10.0
            )
            converged = (
                (accepted & converged) | (~accepted & (mu > 1e8))
            )
        if config.debug:  # per-iteration trace (reference: ilqr.hpp:262-267)
            jax.debug.print(
                "iLQR iter {it}: cost={c} merit={m} d_merit={d} "
                "eq_violation={ev} ineq_violation={iv}",
                it=it, c=cost_new, m=merit_new, d=improvement, ev=eq_viol, iv=ineq_viol,
            )
        if config.enforce_max_ms and config.max_ms > 0:
            from .base import deadline_exceeded

            timed_out = deadline_exceeded()
        else:
            timed_out = jnp.asarray(False)
        out = (
            xs_new, us_new, cost_new, merit_new, eq_mult, ineq_mult, rho,
            it + 1, converged, eq_viol, ineq_viol, timed_out,
        )
        if config.ddp:
            out = out + (mu_next,)
        return out

    zero = jnp.asarray(0.0, dtype)
    init = (xs0, us0, cost0, merit0, eq_mult0, ineq_mult0, rho0,
            jnp.asarray(0, jnp.int32), jnp.asarray(False), zero, zero,
            jnp.asarray(False))
    if config.ddp:
        init = init + (zero,)   # adaptive mu
    if config.differentiable:
        # Bounded, rematerialized loop: reverse-differentiable (while_loop
        # is not), identical fixed point -- converged state is frozen by the
        # same predicate the while_loop uses to exit.
        iter_body = jax.checkpoint(body)

        def fori_body(_, state):
            new_state = iter_body(state)
            keep = cond(state)
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(keep, n, o), new_state, state
            )

        final = jax.lax.fori_loop(
            0, config.max_iterations, fori_body, init
        )
        (xs, us, cost, merit, eq_mult, ineq_mult, rho, it, converged,
         eqv, inv, _) = final[:12]
    else:
        final = jax.lax.while_loop(cond, body, init)
        (xs, us, cost, merit, eq_mult, ineq_mult, rho, it, converged,
         eqv, inv, _) = final[:12]
    return SolveResult(
        states=xs,
        controls=us,
        cost=cost,
        iterations=it,
        converged=converged,
        merit=merit,
        eq_violation=eqv,
        ineq_violation=inv,
    )


def _batched_backward_pallas(
    specs: OCPSpec, config: ILQRConfig, xs, us, al_terms, interpret: bool,
    phixx_const=None, boxqp=False,
):
    """Backward pass for the whole batch via the fused Pallas kernel."""
    from ..ops.riccati_pallas import riccati_backward_pallas

    A, Bm, lx, lu, lxx, luu, lux = al_terms
    phix = jax.vmap(lambda s, xT: s.derivs.phix(xT))(specs, xs[:, -1])
    if phixx_const is not None:
        phixx = phixx_const
    else:
        phixx = jax.vmap(lambda s, xT: s.derivs.phixx(xT))(specs, xs[:, -1])
        phixx = 0.5 * (phixx + jnp.swapaxes(phixx, -1, -2))
    if boxqp:
        # Delta bounds around the current controls for the in-kernel box QP.
        lb = specs.input_lower_bounds[:, None, :] - us
        ub = specs.input_upper_bounds[:, None, :] - us
    else:
        lb = ub = None
    k, K = riccati_backward_pallas(
        A, Bm, lx, lu, lxx, luu, lux, phix, phixx,
        reg_init=config.reg_init, reg_factor=config.reg_factor,
        reg_levels=config.reg_levels, interpret=interpret,
        lb=lb, ub=ub,
    )
    return k.astype(xs.dtype), K.astype(xs.dtype)


# ---------------------------------------------------------------------------
# Lane-space AL machinery for the fused loop
# ---------------------------------------------------------------------------
#
# In lane layout [nb, T, d..., 8, 128] every constraint/merit/dual-update
# computation is layout-neutral elementwise XLA math (the expensive layout
# conversions only appear when switching between problem-major [B, T, ...]
# and lane tiles -- which the fused loop never does).  Constraint Jacobians
# come from jvps against lane-shaped basis tangents, mirroring the in-kernel
# linearizer.


def _lanes_of(x):
    return jnp.zeros_like(x[0]), jnp.ones_like(x[0])


def _lane_basis(n, j, zeros, ones):
    return jnp.stack([ones if i == j else zeros for i in range(n)], axis=0)


def _ensure_m_lanes(g, m, zeros):
    """Broadcast an [m] (lane-collapsed) constraint value to [m, 8, 128]."""
    if g.ndim == 1:
        g = g[:, None, None] + zeros
    return g


def _lane_constraint_stacks(constraint, m, xs_stage_l, us_l):
    """g [nb,T,m,8,128], Gx [nb,T,m,nx,8,128], Gu [nb,T,m,nu,8,128]."""
    nx = xs_stage_l.shape[2]
    nu = us_l.shape[2]

    def per_stage(x, u):
        zeros, ones = _lanes_of(x)
        g = _ensure_m_lanes(constraint(x, u), m, zeros)
        Gx = jnp.stack(
            [_ensure_m_lanes(
                jax.jvp(lambda xx: constraint(xx, u), (x,),
                        (_lane_basis(nx, j, zeros, ones),))[1], m, zeros)
             for j in range(nx)], axis=1)
        Gu = jnp.stack(
            [_ensure_m_lanes(
                jax.jvp(lambda uu: constraint(x, uu), (u,),
                        (_lane_basis(nu, j, zeros, ones),))[1], m, zeros)
             for j in range(nu)], axis=1)
        return g, Gx, Gu

    return jax.vmap(jax.vmap(per_stage))(xs_stage_l, us_l)


def _lane_constraint_vals(constraint, m, xs_stage_l, us_l):
    def per_stage(x, u):
        return _ensure_m_lanes(constraint(x, u), m, _lanes_of(x)[0])

    return jax.vmap(jax.vmap(per_stage))(xs_stage_l, us_l)


def _lane_objective(spec, xs_stage_l, xT_l, us_l, ctx_l=None):
    """True (un-augmented) objective per lane: [nb, 8, 128]."""
    T = xs_stage_l.shape[1]
    ts = jnp.arange(T)

    def per_tile(xs, us, *ctx):
        zeros = jnp.zeros_like(xs[0, 0])
        if ctx:
            c = jax.vmap(
                lambda x, u, t, ct: spec.stage_cost(x, u, t, ct) + zeros
            )(xs, us, ts, ctx[0])
        else:
            c = jax.vmap(lambda x, u, t: spec.stage_cost(x, u, t) + zeros)(xs, us, ts)
        return c.sum(0)

    args = (xs_stage_l, us_l) + ((ctx_l,) if ctx_l is not None else ())
    stage_sum = jax.vmap(per_tile)(*args)
    term = jax.vmap(lambda x: spec.terminal_cost(x) + _lanes_of(x)[0])(xT_l)
    return stage_sum + term


def _lane_merit(spec, config, objective, g, h, eq_mult_l, ineq_mult_l, rho_l):
    """AL merit per lane (mirrors compute_merit) given precomputed pieces."""
    merit = objective
    if g is not None:
        merit = merit + (eq_mult_l * g).sum((1, 2))
        merit = merit + 0.5 * rho_l * (g**2).sum((1, 2))
    if h is not None:
        slack = jnp.maximum(h, 0.0)
        active = (h > -config.inequality_activation_tolerance).astype(h.dtype)
        active_slack = slack * active
        merit = merit + ((ineq_mult_l * active) * active_slack).sum((1, 2))
        merit = merit + 0.5 * rho_l * (active_slack**2).sum((1, 2))
    return merit


def _lane_al_fold(spec, config, lin, stacks_eq, stacks_ineq,
                  eq_mult_l, ineq_mult_l, rho_l):
    """Fold AL constraint terms into the derivative stacks (_add_al_terms
    in lane layout)."""
    A, Bm, lx, lu, lxx, luu, lux = lin
    rho3 = rho_l[:, None, None]                    # for [nb,T,m,8,128]
    rho4 = rho_l[:, None, None, None]              # for [nb,T,i,j,8,128]

    def outer(P, Q, w=None):
        # sum_m P[..., m, i, :] * Q[..., m, j, :] (optionally weighted by w_m)
        prod = P[:, :, :, :, None] * Q[:, :, :, None, :]
        if w is not None:
            prod = prod * w[:, :, :, None, None]
        return prod.sum(2)

    if stacks_eq is not None:
        g, Gx, Gu = stacks_eq
        dual = eq_mult_l + rho3 * g
        lx = lx + (Gx * dual[:, :, :, None]).sum(2)
        lu = lu + (Gu * dual[:, :, :, None]).sum(2)
        lxx = lxx + rho4 * outer(Gx, Gx)
        lux = lux + rho4 * outer(Gu, Gx)
        luu = luu + rho4 * outer(Gu, Gu)
    if stacks_ineq is not None:
        h, Hx, Hu = stacks_ineq
        slack = jnp.maximum(h, 0.0)
        active = (h > -config.inequality_activation_tolerance).astype(h.dtype)
        dual = ineq_mult_l * active + rho3 * slack * active
        lx = lx + (Hx * dual[:, :, :, None]).sum(2)
        lu = lu + (Hu * dual[:, :, :, None]).sum(2)
        lxx = lxx + rho4 * outer(Hx, Hx, active)
        lux = lux + rho4 * outer(Hu, Hx, active)
        luu = luu + rho4 * outer(Hu, Hu, active)
    return A, Bm, lx, lu, lxx, luu, lux


def _solve_ilqr_batched_fused(
    specs: OCPSpec, config: ILQRConfig, interpret: bool, use_boxqp: bool
) -> SolveResult:
    """Fully lane-resident iteration loop (the fastest path).

    Profiling the kernel-per-phase path showed the two hand-written kernels
    at ~10% of solve time with ~90% in XLA glue -- a fifth of it pure layout
    copies converting [B, T, ...] <-> lane tiles around EVERY kernel call,
    every iteration.  This driver tiles once, carries the while_loop state
    in lane layout [nb, T, ..., 8, 128], runs linearize / terminal-derivs /
    Riccati / select as three kernel launches per iteration with zero
    conversions between them, and untiles once at the end.  AL constraints
    and coupling contexts are supported (merit, derivative folds, and dual
    updates are layout-neutral lane math; the select kernel evaluates AL
    merits in-kernel) -- the caller gates which problems route here and
    requires lane-traceable dynamics/costs/constraints and AD mode.
    """
    from ..ops.forward_select_pallas import (
        LANE, SUB, TILE, _to_lanes, forward_select_pallas_tiled,
    )
    from ..ops.linearize_pallas import linearize_pallas_tiled
    from ..ops.riccati_pallas import (
        riccati_backward_pallas_tiled,
        riccati_fusedlin_pallas_tiled,
    )

    B = specs.initial_state.shape[0]
    T, nx, nu = specs.horizon_steps, specs.state_dim, specs.control_dim
    out_dtype = specs.initial_state.dtype
    f32 = jnp.float32
    pad = (-B) % TILE
    Bp = B + pad
    nb = Bp // TILE

    # Lane fold (see ILQRConfig.lane_fold): every kernel block carries
    # ``fold`` batch tiles on a widened (fold*8, 128) sublane axis.  The
    # Riccati kernel has the largest per-grid-step footprint; keep its
    # double-buffered blocks + scratch within ~8 MB of the 16 MB VMEM.
    ric_tiles = (2 * nx * nx + 2 * nx * nu + nx + nu + nu * nu
                 + (2 * nu if use_boxqp else 0)        # bound blocks
                 + nu + nu * nx)                       # outputs
    per_fold_bytes = (2 * ric_tiles + nx + nx * nx) * TILE * 4
    fold = config.lane_fold
    if fold <= 0:
        fold = 8
        while fold > 1 and (nb % fold or fold * per_fold_bytes > 8 << 20):
            fold //= 2
    fold = max(1, min(fold, nb))
    if nb % fold:
        fold = 1
    SUBL = SUB * fold                                  # sublane width
    nb = nb // fold                                    # grid rows

    def padded(x):
        if pad:
            # Replicate the first problem into pad lanes: keeps the padded
            # dynamics on valid states (no NaN lanes from zero-padding
            # models with singularities).
            fill = jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])
            x = jnp.concatenate([x, fill], 0)
        return x.astype(f32)

    pack = lambda arr: _to_lanes(padded(arr), Bp, SUBL) # [Bp,...] -> [nb,...,SUBL,128]

    # --- one-time tiling --------------------------------------------------
    x0_l = pack(specs.initial_state)                    # [nb, nx, 8, 128]
    us_l0 = pack(specs.initial_controls)                # [nb, T, nu, 8, 128]
    ctx_l = pack(specs.context) if specs.context is not None else None

    if specs.has_input_bounds:
        lb_l = pack(jnp.broadcast_to(specs.input_lower_bounds, (B, nu)))
        ub_l = pack(jnp.broadcast_to(specs.input_upper_bounds, (B, nu)))
    else:
        lb_l = jnp.zeros((nb, nu, SUBL, LANE), f32)
        ub_l = jnp.zeros((nb, nu, SUBL, LANE), f32)

    ladder_full = _alpha_ladder_floats(config.alpha_min)
    ladder_short = (
        tuple(float(a) for a in config.alpha_ladder)
        if config.alpha_ladder else ladder_full
    )
    # iteration-scheduled ladder: full reference granularity during the
    # global phase, the short ladder once steps are Newton-quality.
    use_schedule = config.alpha_warmup > 0 and ladder_short != ladder_full
    # Select-kernel time unroll (see ILQRConfig.time_unroll): auto = 2.
    tu_sel = config.time_unroll if config.time_unroll > 0 else 2
    if T % tu_sel:
        tu_sel = 1
    # Statics carrier for the kernels (they read only spec statics).
    spec0 = jax.tree_util.tree_map(
        lambda x: x[0] if getattr(x, "ndim", 0) > 0 else x, specs
    )
    discrete = config.jacobian_mode == "discrete"
    zeros_like_k = jnp.zeros((nb, T, nu, SUBL, LANE), f32)
    zeros_like_K = jnp.zeros((nb, T, nu, nx, SUBL, LANE), f32)
    vxx_dummy = jnp.zeros((nb, nx, nx, SUBL, LANE), f32)

    # Initial rollout + cost in ONE select launch: alpha = 0 with zero gains
    # applies the initial controls raw.  Bounds are stripped like
    # rollout_select does -- reference plain rollouts never clamp, so
    # out-of-box initial controls must pass through unchanged.
    x0_bc = jnp.broadcast_to(x0_l[:, None], (nb, T, nx, SUBL, LANE))
    spec_init = spec0.replace(input_lower_bounds=None, input_upper_bounds=None)
    xs_tail_l0, _, obj_l0, _ = forward_select_pallas_tiled(
        spec_init, x0_bc, us_l0, zeros_like_k, zeros_like_K,
        jnp.full((nb, SUBL, LANE), jnp.inf, f32), lb_l, ub_l,
        (0.0,), interpret, ctx_l=ctx_l,
    )
    # STAGE-layout carry (round 5): the loop carries (x_0..x_{T-1}, x_T)
    # instead of x_1..x_T -- the layout both the Riccati and select kernels
    # consume/produce natively, so the per-iteration concat-shift and the
    # XLA-side accept/freeze jnp.where passes (measured 4.2 ms of the
    # 26.4 ms iteration at batch 262k) disappear.
    xs_stage_l0 = jnp.concatenate([x0_l[:, None], xs_tail_l0[:, :-1]], axis=1)
    xT_l0 = xs_tail_l0[:, -1]

    eq_dim, ineq_dim = specs.eq_dim, specs.ineq_dim
    has_al = eq_dim > 0 or ineq_dim > 0

    # Quadratic-cost hoisting (auto-detected or verified at trace time,
    # resolve_cost_structure): the Hessian stacks are trajectory-independent,
    # so they are computed ONCE here and the per-iteration linearize kernel
    # skips their nested-jvp chains and their 28-of-58 share of output
    # blocks.  With stationary structure they are additionally
    # time-invariant: one block per problem, and the Riccati kernel reads it
    # once per batch row (hess_tconst).
    quad, stat_probe = resolve_cost_structure(spec0, config)
    stationary = stat_probe and not has_al and ctx_l is None
    hess_l = None
    if stationary:
        pre = linearize_pallas_tiled(
            spec0, x0_l[:, None], us_l0[:, :1], discrete, interpret
        )
        hess_l = pre[4:]                    # each [nb, 1, ..., SUBL, LANE]
    elif quad:
        pre = linearize_pallas_tiled(
            spec0, xs_stage_l0, us_l0, discrete, interpret, ctx_l=ctx_l
        )
        hess_l = pre[4:]                    # each [nb, T, ..., SUBL, LANE]

    eq_mult_l0 = jnp.zeros((nb, T, eq_dim, SUBL, LANE), f32)
    ineq_mult_l0 = jnp.zeros((nb, T, ineq_dim, SUBL, LANE), f32)
    rho_l0 = jnp.full((nb, SUBL, LANE), config.penalty, f32)
    converged_l0 = jnp.zeros((nb, SUBL, LANE), bool)
    zeros_lane = jnp.zeros((nb, SUBL, LANE), f32)

    def stage_vals(fn, dim, xs_stage_l, us_l):
        return (_lane_constraint_vals(fn, dim, xs_stage_l, us_l)
                if dim > 0 else None)

    def cond(state):
        it, converged_l = state[9], state[10]
        return (it < config.max_iterations) & jnp.any(~converged_l)

    def body(state):
        (xs_stage_l, xT_l, us_l, cost_l, eq_mult_l, ineq_mult_l, rho_l,
         eqv_l, inv_l, it, converged_l) = state
        active = ~converged_l                            # [nb, 8, 128]

        # NOTE on structure: linearization stays a SEPARATE kernel on the
        # parallel (nb, T) grid.  Emitting it from the select kernel's
        # phase-2 re-roll (emit_lin) was tried and measured 20% SLOWER
        # end-to-end: it serializes (nx+nu+Hessian) jvp chains into the
        # sequential phase-2 grid steps, whereas the standalone launch
        # pipelines freely across all (b, t) blocks.
        if stationary and config.stationary_fusedlin:
            lin = None     # in-kernel linearization (riccati_fusedlin below)
        elif stationary:
            lin = linearize_pallas_tiled(
                spec0, xs_stage_l, us_l, discrete, interpret, hessians=False,
            )
        elif quad:
            lin = linearize_pallas_tiled(
                spec0, xs_stage_l, us_l, discrete, interpret, ctx_l=ctx_l,
                hessians=False,
            ) + hess_l
        else:
            lin = linearize_pallas_tiled(
                spec0, xs_stage_l, us_l, discrete, interpret, ctx_l=ctx_l
            )

        if has_al:
            # Fresh merit under the CURRENT multipliers (stale-merit fix;
            # see solve_ilqr) + AL terms folded into the stacks -- all
            # layout-neutral lane math.
            stacks_eq = (
                _lane_constraint_stacks(
                    spec0.equality_constraints, eq_dim, xs_stage_l, us_l)
                if eq_dim > 0 else None
            )
            stacks_ineq = (
                _lane_constraint_stacks(
                    spec0.inequality_constraints, ineq_dim, xs_stage_l, us_l)
                if ineq_dim > 0 else None
            )
            merit_l = _lane_merit(
                spec0, config, cost_l,
                stacks_eq[0] if stacks_eq else None,
                stacks_ineq[0] if stacks_ineq else None,
                eq_mult_l, ineq_mult_l, rho_l,
            )
            lin = _lane_al_fold(
                spec0, config, lin, stacks_eq, stacks_ineq,
                eq_mult_l, ineq_mult_l, rho_l,
            )
        else:
            merit_l = cost_l

        if use_boxqp:
            blb = lb_l[:, None] - us_l
            bub = ub_l[:, None] - us_l
        else:
            blb = bub = None
        # Terminal phix/phixx derived in-kernel from x_T (vxx slot unused).
        if stationary and config.stationary_fusedlin:
            # Stationary quadratic cost: linearize INSIDE the Riccati kernel
            # (reads x, u -- 6 lane tiles per stage instead of 30 -- and no
            # separate linearize launch; see riccati_fusedlin_pallas_tiled).
            k_l, K_l = riccati_fusedlin_pallas_tiled(
                xs_stage_l, us_l, *hess_l, xT_l,
                dynamics=spec0.dynamics, stage_cost=spec0.stage_cost,
                terminal_fn=spec0.terminal_cost, dt=spec0.dt,
                discrete=discrete,
                reg_init=config.reg_init, reg_factor=config.reg_factor,
                reg_levels=config.reg_levels, interpret=interpret,
                lb_l=blb, ub_l=bub,
                # tu=2 is bit-equal to tu=1 (interpret-mode check) and
                # shaves ~3% kernel time; tu=4 drifts 1 ulp, so stay at 2.
                time_unroll=2,
            )
        elif stationary:
            k_l, K_l = riccati_backward_pallas_tiled(
                *(lin + hess_l), xT_l, vxx_dummy,
                reg_init=config.reg_init, reg_factor=config.reg_factor,
                reg_levels=config.reg_levels, interpret=interpret,
                lb_l=blb, ub_l=bub, terminal_fn=spec0.terminal_cost,
                hess_tconst=True,
            )
        else:
            k_l, K_l = riccati_backward_pallas_tiled(
                *lin, xT_l, vxx_dummy,
                reg_init=config.reg_init, reg_factor=config.reg_factor,
                reg_levels=config.reg_levels, interpret=interpret,
                lb_l=blb, ub_l=bub, terminal_fn=spec0.terminal_cost,
            )

        def run_select(ladder):
            # stage_out mode: accept + freeze masking and the stage-layout
            # shift happen in-kernel (see forward_select_pallas docstring).
            return forward_select_pallas_tiled(
                spec0, xs_stage_l, us_l, k_l, K_l, merit_l, lb_l, ub_l,
                ladder, interpret, ctx_l=ctx_l,
                eq_mult_l=eq_mult_l if eq_dim > 0 else None,
                ineq_mult_l=ineq_mult_l if ineq_dim > 0 else None,
                rho_l=rho_l if has_al else None,
                act_tol=config.inequality_activation_tolerance,
                active_l=active.astype(f32), xT_l=xT_l,
                time_unroll=tu_sel,
            )

        if use_schedule:
            xs_stage_new, us_new, merit_kept, accept_l, xT_new = jax.lax.cond(
                it < config.alpha_warmup,
                lambda: run_select(ladder_full),
                lambda: run_select(ladder_short),
            )
        else:
            xs_stage_new, us_new, merit_kept, accept_l, xT_new = (
                run_select(ladder_short)
            )
        # accept_l is already ANDed with active and the rejected/frozen
        # lanes' outputs are verbatim copies of the inputs (in-kernel
        # masking) -- no XLA-side select passes needed.
        improvement = merit_l - merit_kept

        if has_al:
            # True objective of the kept trajectory + dual/penalty updates
            # at it (reference order: ilqr.hpp:233,239-260).
            cost_new = _lane_objective(
                spec0, xs_stage_new, xT_new, us_new, ctx_l=ctx_l
            )
            rho3 = rho_l[:, None, None]
            eq_viol = ineq_viol = zeros_lane
            eq_mult_new, ineq_mult_new = eq_mult_l, ineq_mult_l
            if eq_dim > 0:
                g_new = stage_vals(spec0.equality_constraints, eq_dim,
                                   xs_stage_new, us_new)
                eq_mult_new = eq_mult_l + rho3 * g_new
                eq_viol = jnp.sqrt((g_new**2).sum((1, 2)))
            if ineq_dim > 0:
                h_new = stage_vals(spec0.inequality_constraints, ineq_dim,
                                   xs_stage_new, us_new)
                positive = jnp.maximum(h_new, 0.0)
                ineq_mult_new = jnp.maximum(ineq_mult_l + rho3 * positive, 0.0)
                ineq_viol = jnp.sqrt((positive**2).sum((1, 2)))
            rho_new = jnp.where(
                (eq_viol > config.constraint_tolerance)
                | (ineq_viol > config.constraint_tolerance),
                rho_l * config.penalty_increase, rho_l,
            )
            newly = (
                active & (improvement < config.tolerance)
                & (eq_viol < config.constraint_tolerance)
                & (ineq_viol < config.constraint_tolerance)
            )
            mask = lambda new, old: jnp.where(
                active.reshape((nb,) + (1,) * (new.ndim - 3) + (SUBL, LANE)),
                new, old,
            )
            return (
                xs_stage_new, xT_new, us_new, mask(cost_new, cost_l),
                mask(eq_mult_new, eq_mult_l), mask(ineq_mult_new, ineq_mult_l),
                mask(rho_new, rho_l), mask(eq_viol, eqv_l),
                mask(ineq_viol, inv_l), it + 1, converged_l | newly,
            )

        newly = active & (improvement < config.tolerance)
        return (xs_stage_new, xT_new, us_new, merit_kept, eq_mult_l,
                ineq_mult_l, rho_l, eqv_l, inv_l, it + 1,
                converged_l | newly)

    init = (xs_stage_l0, xT_l0, us_l0, obj_l0, eq_mult_l0, ineq_mult_l0,
            rho_l0, zeros_lane, zeros_lane, jnp.asarray(0, jnp.int32),
            converged_l0)
    if config.early_exit:
        final = jax.lax.while_loop(cond, body, init)
    else:
        # Fixed trip count: no data-dependent predicate, hence no per-
        # iteration host round trip (see ILQRConfig.early_exit).  Converged
        # lanes are frozen by the same masks the while body uses.
        final = jax.lax.fori_loop(
            0, config.max_iterations, lambda _, s: body(s), init
        )
    (xs_stage_l, xT_l, us_l, cost_l, _, _, _, eqv_l, inv_l, it,
     converged_l) = final
    xs_tail_l = jnp.concatenate([xs_stage_l[:, 1:], xT_l[:, None]], axis=1)

    from ..ops.forward_select_pallas import _from_lanes
    unpack = lambda arr: _from_lanes(arr, B)
    xs_tail = unpack(xs_tail_l).astype(out_dtype)        # [B, T, nx]
    xs = jnp.concatenate(
        [specs.initial_state[:, None].astype(out_dtype), xs_tail], axis=1
    )
    us = unpack(us_l).astype(out_dtype)
    cost = unpack(cost_l).astype(out_dtype)
    return SolveResult(
        states=xs, controls=us, cost=cost,
        iterations=jnp.broadcast_to(it, (B,)), converged=unpack(converged_l),
        merit=cost, eq_violation=unpack(eqv_l).astype(out_dtype),
        ineq_violation=unpack(inv_l).astype(out_dtype),
    )


def _lane_cost_traceable(specs: OCPSpec, nx: int, nu: int) -> bool:
    """Can the stage cost be traced on lane-shaped values with a float t?"""
    args = [
        jax.ShapeDtypeStruct((nx, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((nu, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((8, 128), jnp.float32),
    ]
    if specs.context is not None:
        ctx_inner = tuple(specs.context.shape[2:])
        args.append(jax.ShapeDtypeStruct(ctx_inner + (8, 128), jnp.float32))
    try:
        out = jax.eval_shape(specs.stage_cost, *args)
        return tuple(out.shape) in [(8, 128), ()]
    except Exception:
        return False


def _lane_constraints_traceable(specs: OCPSpec, nx: int, nu: int) -> bool:
    """Can the constraint fns be traced on lane-shaped values with the
    expected [m(, 8, 128)] output?"""
    args = [
        jax.ShapeDtypeStruct((nx, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((nu, 8, 128), jnp.float32),
    ]
    for fn, m in (
        (specs.equality_constraints, specs.eq_dim),
        (specs.inequality_constraints, specs.ineq_dim),
    ):
        if m == 0:
            continue
        try:
            out = jax.eval_shape(fn, *args)
            if tuple(out.shape) not in [(m, 8, 128), (m,)]:
                return False
        except Exception:
            return False
    return True


def solve_ilqr_batched(
    specs: OCPSpec, config: ILQRConfig, backward: str = "auto",
    linearize: str = "xla", fused: str = "auto",
) -> SolveResult:
    """Batched AL-iLQR: spec leaves carry a leading batch axis ``[B, ...]``.

    Identical semantics to ``vmap(solve_ilqr)`` but the Riccati backward pass
    runs as ONE fused Pallas kernel over all batch lanes (see
    ops/riccati_pallas.py) -- the hot path of the solves/s benchmark.
    ``backward``: 'pallas', 'scan', or 'auto' (pallas when nx <= 16, nu <= 4;
    covers pairwise-stacked agents, richer vehicle models, the nx=12
    quadrotor -- measured 3.5x over the scan route -- and the nx=16
    rotor-lag quadrotor, measured 3.2x at batch 8192, r3).
    ``fused``: 'auto' (default) routes eligible problems (lane-traceable
    dynamics/costs, AD mode, unconstrained, no context) through the fully
    lane-resident iteration loop (:func:`_solve_ilqr_batched_fused`);
    False forces the kernel-per-phase path.
    """
    B = specs.initial_state.shape[0]
    T = specs.horizon_steps
    dtype = specs.initial_state.dtype
    nx, nu = specs.state_dim, specs.control_dim

    if config.differentiable:
        # Reverse-differentiable batched solve: vmap the scan-path unrolled
        # loop (Pallas kernels define no VJP, and the fused driver's masked
        # while_loop is not reverse-differentiable either).
        return jax.vmap(lambda s: solve_ilqr(s, config))(specs)

    if fused == "auto" and config.fused != "auto":
        # Config-level routing (param ``fused``): 'on' also fuses coupled /
        # AL-constrained solves, 'off' forces the kernel-per-phase path.
        fused = config.fused == "on"

    if backward == "auto":
        backward = "pallas" if (nx <= 16 and nu <= 4) else "scan"
    if config.ddp:
        backward = "scan"   # dynamics-Hessian terms live on the scan path
        fused = False
    use_boxqp = config.bound_mode == "boxqp" and specs.has_input_bounds
    if use_boxqp and backward == "assoc":
        backward = "scan"   # the time-parallel pass has no box-QP stage solve
    interpret = jax.default_backend() == "cpu"

    from ..ops.forward_pallas import (
        forward_pass_pallas,
        rollout_pallas,
        spec_supports_lane_forward,
    )

    context_inner = (
        tuple(specs.context.shape[2:]) if specs.context is not None else None
    )
    lane_forward = (
        backward == "pallas"
        and specs.objective_is_default
        and spec_supports_lane_forward(specs, context_inner)
    )

    # Fully lane-resident loop: the fastest path when eligible (see
    # _solve_ilqr_batched_fused).  The in-kernel linearizer passes the time
    # index as a lane-shaped float, hence the traceability probe.
    # On CPU, context (coupled) and AL-constrained solves are fused only on
    # explicit request: the fused loop's all-f32 numerics perturb knife-edge
    # dynamics relative to the kernel-per-phase path's f64 XLA glue --
    # symmetric Nash games are bistable, and AL endgames under the x5
    # penalty schedule take near-chaotic final steps -- so 'auto' keeps
    # those on the numerically-matched path there (both implementations
    # agree to f32 precision for many iterations; tests/test_fused_loop.py).
    # On TPU both paths are f32 and agree (coupled 8-agent Nash and an
    # AL-constrained batch land on identical costs, with the fused loop
    # ~11x faster end-to-end on the coupled example), so 'auto' fuses them.
    al_free = specs.eq_dim == 0 and specs.ineq_dim == 0
    if (
        fused in ("auto", True)
        and lane_forward
        and specs.derivative_mode == "ad"
        and (
            (specs.context is None and al_free)
            or fused is True
            or not interpret          # TPU: fuse coupled + AL solves too
        )
        and _lane_cost_traceable(specs, nx, nu)
        and _lane_constraints_traceable(specs, nx, nu)
    ):
        return _solve_ilqr_batched_fused(
            specs, config, jax.default_backend() == "cpu", use_boxqp
        )

    # Fused in-kernel-AD linearization (opt-in: measured slower than the
    # XLA-fused vmapped linearizer on v5e for jvp-through-RK4 Jacobians, but
    # kept for problems whose linearization fragments into many tiny XLA
    # kernels).  Exact substitute only in 'ad' derivative mode.
    lane_linearize = (
        linearize == "pallas" and lane_forward and specs.derivative_mode == "ad"
    )
    if lane_linearize:
        lane_linearize = _lane_cost_traceable(specs, nx, nu)

    us0 = specs.initial_controls
    if lane_forward:
        from ..ops.forward_select_pallas import rollout_select

        xs0, cost0 = rollout_select(specs, specs.initial_state, us0, interpret)
        xs0 = xs0.astype(dtype)
        cost0 = cost0.astype(dtype)
    else:
        xs0 = jax.vmap(lambda s: s.rollout(s.initial_controls))(specs)
        cost0 = jax.vmap(lambda s, x, u: s.cost(x, u))(specs, xs0, us0)

    eq_mult0 = jnp.zeros((B, T, specs.eq_dim), dtype)
    ineq_mult0 = jnp.zeros((B, T, specs.ineq_dim), dtype)
    rho0 = jnp.full((B,), config.penalty, dtype)
    merit0 = jax.vmap(
        lambda s, x, u, e, i, r: compute_merit(s, config, x, u, e, i, r)
    )(specs, xs0, us0, eq_mult0, ineq_mult0, rho0)

    # Quadratic-cost hoisting: trajectory-independent Hessians leave the loop
    # (auto-detected or verified at trace time).  The probe reads only
    # static callables and SHAPES, but context shape must be the
    # single-problem [T, ...] layout, so strip the batch axis first.
    spec_one = jax.tree_util.tree_map(
        lambda x: x[0] if getattr(x, "ndim", 0) > 0 else x, specs
    )
    hess0 = phixx0 = None
    if resolve_cost_structure(spec_one, config)[0]:
        hess0, phixx0 = jax.vmap(_cost_hessians)(specs, xs0, us0)

    def mask(new, old, active):
        """Per-problem freeze: keep old state for converged lanes."""
        expand = active.reshape((B,) + (1,) * (new.ndim - 1))
        return jnp.where(expand, new, old)

    def cond(state):
        it, converged = state[7], state[8]
        return (it < config.max_iterations) & jnp.any(~converged)

    def body(state):
        xs, us, cost, _, eq_mult, ineq_mult, rho, it, converged, eqv, inv = state[:11]
        mu = state[11] if config.ddp else None
        active = ~converged

        # Fresh merit under current multipliers (see solve_ilqr body).
        merit = jax.vmap(
            lambda s, x, u, e, i, r: compute_merit(s, config, x, u, e, i, r)
        )(specs, xs, us, eq_mult, ineq_mult, rho)

        if lane_linearize:
            from ..ops.linearize_pallas import linearize_pallas

            A, Bm, lx, lu, lxx, luu, lux = linearize_pallas(
                specs, xs, us,
                discrete=(config.jacobian_mode == "discrete"),
                interpret=interpret,
            )
            A = A.astype(dtype)
            Bm = Bm.astype(dtype)
            lx, lu, lxx, luu, lux = (
                v.astype(dtype) for v in (lx, lu, lxx, luu, lux)
            )
        else:
            lin = jax.vmap(
                lambda s, x, u, h: _linearize(s, config, x, u, h)
            )(specs, xs, us, hess0)
            A, Bm, lx, lu, lxx, luu, lux = lin[:7]
            hess_dyn = lin[7] if len(lin) > 7 else None
        lx, lu, lxx, luu, lux = jax.vmap(
            lambda s, x, u, a, b, c, d, e, em, im, r: _add_al_terms(
                s, config, x, u, a, b, c, d, e, em, im, r
            )
        )(specs, xs, us, lx, lu, lxx, luu, lux, eq_mult, ineq_mult, rho)

        if backward == "pallas":
            k, K = _batched_backward_pallas(
                specs, config, xs, us, (A, Bm, lx, lu, lxx, luu, lux), interpret,
                phixx_const=phixx0, boxqp=use_boxqp,
            )
        elif backward == "assoc":
            # Time-parallel backward pass (ops/riccati_assoc.py): O(log T)
            # depth -- the long-horizon alternative to the sequential-grid
            # Pallas kernel.  No per-stage regularization ladder.
            from ..ops.riccati_assoc import riccati_backward_assoc

            phix = jax.vmap(lambda s, xT: s.derivs.phix(xT))(specs, xs[:, -1])
            if phixx0 is not None:
                phixx = phixx0
            else:
                phixx = jax.vmap(lambda s, xT: s.derivs.phixx(xT))(specs, xs[:, -1])
                phixx = 0.5 * (phixx + jnp.swapaxes(phixx, -1, -2))
            k, K = riccati_backward_assoc(
                A, Bm, lx, lu, lxx, luu, lux, phix, phixx, reg=config.reg_init
            )
        else:
            if config.ddp:
                k, K = jax.vmap(
                    lambda s, x, a, b, c, d, e, f, g, u, p, hd, m: _backward_pass(
                        s, config, x, a, b, c, d, e, f, g, u,
                        phixx_const=p, hess_dyn=hd, mu0=m,
                    )
                )(specs, xs, A, Bm, lx, lu, lxx, luu, lux, us, phixx0,
                  hess_dyn, mu)
            else:
                k, K = jax.vmap(
                    lambda s, x, a, b, c, d, e, f, g, u, p: _backward_pass(
                        s, config, x, a, b, c, d, e, f, g, u, phixx_const=p
                    )
                )(specs, xs, A, Bm, lx, lu, lxx, luu, lux, us, phixx0)

        if lane_forward:
            from ..ops.forward_select_pallas import forward_select_pallas

            # In-kernel alpha selection: one launch scores every candidate
            # and re-rolls only each lane's winner (reference first-accept
            # order preserved; unconstrained merit == objective).
            alpha_tuple = _alpha_ladder_floats(config.alpha_min)
            xs_sel, us_sel, merit_new, accepted = forward_select_pallas(
                specs, xs, us, k, K, merit, alpha_tuple, interpret,
                eq_mult=eq_mult if specs.eq_dim > 0 else None,
                ineq_mult=ineq_mult if specs.ineq_dim > 0 else None,
                rho=rho if (specs.eq_dim > 0 or specs.ineq_dim > 0) else None,
                act_tol=config.inequality_activation_tolerance,
            )
            merit_new = merit_new.astype(dtype)
            # Rejected lanes keep their previous trajectory bit-exactly.
            xs_new = jnp.where(accepted[:, None, None], xs_sel.astype(dtype), xs)
            us_new = jnp.where(accepted[:, None, None], us_sel.astype(dtype), us)
            merit_new = jnp.where(accepted, merit_new, merit)
            if specs.eq_dim > 0 or specs.ineq_dim > 0:
                # Merit carries AL terms; report the true objective separately
                # (reference: cost recomputed after acceptance, ilqr.hpp:233).
                cost_new = jax.vmap(lambda s, x, u: s.cost(x, u))(
                    specs, xs_new, us_new
                )
            else:
                cost_new = merit_new
        else:
            xs_new, us_new, merit_new = jax.vmap(
                lambda s, x, u, kk, KK, em, im, r, me: _forward_pass(
                    s, config, x, u, kk, KK, em, im, r, me
                )
            )(specs, xs, us, k, K, eq_mult, ineq_mult, rho, merit)
            cost_new = jax.vmap(lambda s, x, u: s.cost(x, u))(specs, xs_new, us_new)

        improvement = merit - merit_new

        eq_viol = jnp.zeros((B,), dtype)
        ineq_viol = jnp.zeros((B,), dtype)
        eq_mult_new, ineq_mult_new = eq_mult, ineq_mult
        if specs.eq_dim > 0:
            g = jax.vmap(
                lambda s, x, u: eval_constraints_horizon(s.equality_constraints, x, u)
            )(specs, xs_new, us_new)
            eq_mult_new = eq_mult + rho[:, None, None] * g
            eq_viol = jnp.sqrt(jnp.sum(g**2, axis=(1, 2)))
        if specs.ineq_dim > 0:
            h = jax.vmap(
                lambda s, x, u: eval_constraints_horizon(s.inequality_constraints, x, u)
            )(specs, xs_new, us_new)
            positive = jnp.maximum(h, 0.0)
            ineq_mult_new = jnp.maximum(ineq_mult + rho[:, None, None] * positive, 0.0)
            ineq_viol = jnp.sqrt(jnp.sum(positive**2, axis=(1, 2)))

        rho_new = jnp.where(
            (eq_viol > config.constraint_tolerance)
            | (ineq_viol > config.constraint_tolerance),
            rho * config.penalty_increase,
            rho,
        )

        newly_converged = (
            (improvement < config.tolerance)
            & (eq_viol < config.constraint_tolerance)
            & (ineq_viol < config.constraint_tolerance)
        )
        if config.ddp:
            # Per-lane Tassa mu schedule (see solve_ilqr).
            accepted = merit_new < merit
            mu_next = jnp.where(
                accepted, mu * 0.5, jnp.maximum(mu, 1e-6) * 10.0
            )
            newly_converged = (
                (accepted & newly_converged) | (~accepted & (mu > 1e8))
            )

        out = (
            mask(xs_new, xs, active),
            mask(us_new, us, active),
            mask(cost_new, cost, active),
            mask(merit_new, merit, active),
            mask(eq_mult_new, eq_mult, active),
            mask(ineq_mult_new, ineq_mult, active),
            mask(rho_new, rho, active),
            it + 1,
            converged | newly_converged,
            mask(eq_viol, eqv, active),
            mask(ineq_viol, inv, active),
        )
        if config.ddp:
            out = out + (mask(mu_next, mu, active),)
        return out

    zeros = jnp.zeros((B,), dtype)
    init = (xs0, us0, cost0, merit0, eq_mult0, ineq_mult0, rho0,
            jnp.asarray(0, jnp.int32), jnp.zeros((B,), bool), zeros, zeros)
    if config.ddp:
        init = init + (zeros,)   # per-lane adaptive mu
    final = jax.lax.while_loop(cond, body, init)
    xs, us, cost, merit, eq_mult, ineq_mult, rho, it, converged, eqv, inv = (
        final[:11]
    )
    return SolveResult(
        states=xs, controls=us, cost=cost,
        iterations=jnp.broadcast_to(it, (B,)), converged=converged,
        merit=merit, eq_violation=eqv, ineq_violation=inv,
    )


@register_solver
class ILQR(SolverBase):
    """Host-side iLQR with the reference's ``set_params``/``solve`` surface."""

    name = "ilqr"
    config_cls = ILQRConfig
    _solve_fn = staticmethod(solve_ilqr)

    @classmethod
    def _solve_batched_fn(cls, specs: OCPSpec, config) -> SolveResult:
        return solve_ilqr_batched(specs, config)
