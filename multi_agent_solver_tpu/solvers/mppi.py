"""MPPI (Model Predictive Path Integral) solver — a TPU-native addition.

The reference has no sampling-based solver (its families are iLQR / CGD /
SQP, solvers/solver.hpp:17-22).  MPPI is included because its execution
shape is TPU-friendly: each outer iteration is ``num_samples`` completely
independent full-horizon rollouts — pure data parallelism with no per-lane
control flow, no line search, no factorization — evaluated as one
``[K, ...]``-batched ``lax.scan``.  Batched problems vmap to ``[B, K, ...]``
with no interaction, so the same code path scales from one OCP to a
mesh-sharded fleet (parallel/mesh.py shards the leading batch axis).

Measured honestly (round 5, scripts/bench_mppi.py on the TPU): the
execution-model fit does NOT make it a throughput solver on smooth
problems — K x iters rollouts per solve is ~50x the fused iLQR's
algorithmic work, and the derivative-free update converges to worse
optima on smooth costs (single-track: 2.3k solves/s at K=64 with median
cost 195 vs iLQR's 141k solves/s at median 153; docs/BENCHMARKS.md
"MPPI vs iLQR").  Its role is GLOBAL exploration on non-smooth or
multimodal landscapes: the cart-pole swing-up example uses an MPPI
global phase to find the upright basin that stalls pure iLQR, then
polishes with iLQR (examples/cartpole_swing_up.py).

Algorithm (information-theoretic MPC, Williams et al., ICRA 2017):
per iteration, sample control perturbations ``eps ~ N(0, diag(sigma^2))``,
roll out ``clip(u + eps)``, score each sample with the trajectory cost plus
a soft constraint penalty, form importance weights
``w_k = softmax(-(S_k - min S) / temperature)`` and update
``u <- clip(u + sum_k w_k eps_k)``.  The update is accepted only if it
improves the (penalized) cost of the *mean* trajectory — a monotone
safeguard the vanilla algorithm lacks; disable with ``monotone=0`` for the
textbook update.

Determinism & batching: the noise key is derived from ``seed`` and the
bit-pattern of the problem's initial state, so a vmapped batch solve gives
every lane its own stream while ``solve()`` on one problem reproduces the
corresponding lane exactly (tested in tests/test_mppi.py).

Constraints: equality/inequality residuals enter the sample scores as a
quadratic penalty ``constraint_penalty * (||g||^2 + ||max(h,0)||^2)`` —
the standard MPPI treatment (it has no dual machinery).  Input boxes are
enforced exactly by clipping samples and the returned plan; state bounds
follow the reference convention (ignored unless folded in via
``state_bounds_al``, which reuses the AL inequality rows as penalties).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ocp import OCPSpec
from ..types import Array, SolverParams, get_param, param_flag
from .base import SolveResult, SolverBase, register_solver


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    max_iterations: int = 50
    tolerance: float = 1e-6
    num_samples: int = 256
    temperature: float = 1.0
    sigma: float = 0.5              # exploration std-dev (broadcast over nu)
    seed: int = 0
    constraint_penalty: float = 1e3
    monotone: bool = True           # accept only improving mean updates
    max_ms: float = 0.0
    enforce_max_ms: bool = False
    state_bounds_al: bool = False
    debug: bool = False

    @classmethod
    def from_params(cls, params: SolverParams) -> "MPPIConfig":
        return cls(
            max_iterations=int(get_param(params, "max_iterations")),
            tolerance=get_param(params, "tolerance"),
            num_samples=int(get_param(params, "samples", 256)),
            temperature=get_param(params, "temperature", 1.0),
            sigma=get_param(params, "sigma", 0.5),
            seed=int(get_param(params, "seed", 0)),
            constraint_penalty=get_param(params, "constraint_penalty", 1e3),
            monotone=not param_flag(params, "no_monotone"),
            max_ms=get_param(params, "max_ms", 0.0),
            enforce_max_ms=param_flag(params, "enforce_max_ms"),
            state_bounds_al=param_flag(params, "state_bounds_al"),
            debug=param_flag(params, "debug"),
        )


def _penalized_cost(spec: OCPSpec, xs: Array, us: Array, penalty: float) -> Array:
    """True objective plus the quadratic soft-constraint penalty."""
    total = spec.cost(xs, us)
    if spec.eq_dim > 0 or spec.ineq_dim > 0:
        def per_stage(x, u):
            p = jnp.asarray(0.0, x.dtype)
            if spec.eq_dim > 0:
                g = spec.equality_constraints(x, u)
                p = p + jnp.sum(g * g)
            if spec.ineq_dim > 0:
                h = spec.inequality_constraints(x, u)
                hp = jnp.maximum(h, 0.0)
                p = p + jnp.sum(hp * hp)
            return p

        total = total + penalty * jnp.sum(jax.vmap(per_stage)(xs[:-1], us))
    return total


def solve_mppi(spec: OCPSpec, config: MPPIConfig) -> SolveResult:
    """Pure functional MPPI solve (jittable, vmappable)."""
    T, nu = spec.horizon_steps, spec.control_dim
    dtype = spec.initial_state.dtype
    K = config.num_samples
    sigma = jnp.broadcast_to(jnp.asarray(config.sigma, dtype), (nu,))

    def clip(u):
        if spec.has_input_bounds:
            return jnp.clip(u, spec.input_lower_bounds, spec.input_upper_bounds)
        return u

    def score(us):
        xs = spec.rollout(us)
        return _penalized_cost(spec, xs, us, config.constraint_penalty)

    # Per-problem noise stream: fold the initial state's bit-pattern into the
    # seed so vmapped lanes decorrelate while staying deterministic.
    x0_bits = jax.lax.bitcast_convert_type(
        jnp.sum(spec.initial_state.astype(jnp.float32)), jnp.int32
    )
    key0 = jax.random.fold_in(jax.random.PRNGKey(config.seed), x0_bits)

    us0 = clip(spec.initial_controls.astype(dtype))
    cost0 = score(us0)

    def cond(state):
        us, cost, it, converged, timed_out = state
        return (it < config.max_iterations) & ~converged & ~timed_out

    def body(state):
        us, cost, it, _, _ = state
        key = jax.random.fold_in(key0, it)
        eps = sigma * jax.random.normal(key, (K, T, nu), dtype)
        # Effective perturbation after the box: keeps the weighted update
        # consistent with what was actually rolled out.
        trials = clip(us[None] + eps)
        eps_eff = trials - us[None]
        scores = jax.vmap(score)(trials)                       # [K]
        shifted = (scores - jnp.min(scores)) / config.temperature
        w = jax.nn.softmax(-shifted)                           # [K]
        us_new = clip(us + jnp.einsum("k,ktu->tu", w, eps_eff))
        cost_new = score(us_new)
        if config.monotone:
            better = cost_new < cost
            us_next = jnp.where(better, us_new, us)
            cost_next = jnp.where(better, cost_new, cost)
        else:
            us_next, cost_next = us_new, cost_new
        converged = jnp.abs(cost - cost_next) < config.tolerance
        if config.debug:
            jax.debug.print(
                "MPPI iter {it}: cost={c} best_sample={b}",
                it=it, c=cost_next, b=jnp.min(scores),
            )
        if config.enforce_max_ms and config.max_ms > 0:
            from .base import deadline_exceeded

            timed_out = deadline_exceeded()
        else:
            timed_out = jnp.asarray(False)
        return us_next, cost_next, it + 1, converged, timed_out

    init = (us0, cost0, jnp.asarray(0, jnp.int32),
            jnp.asarray(False), jnp.asarray(False))
    us, _, it, converged, _ = jax.lax.while_loop(cond, body, init)

    xs = spec.rollout(us)
    true_cost = spec.cost(xs, us)
    return SolveResult(
        states=xs,
        controls=us,
        cost=true_cost,
        iterations=it,
        converged=converged,
        merit=true_cost,
    )


@register_solver
class MPPI(SolverBase):
    """Host-side MPPI with the reference ``set_params``/``solve`` surface."""

    name = "mppi"
    config_cls = MPPIConfig
    _solve_fn = staticmethod(solve_mppi)
