"""Receding-horizon MPC driver: warm-started repeated solves, closed loop.

The reference treats MPC-style warm starting as first-class behaviour --
``OCP::update_initial_with_best`` (ocp.hpp:95-100) is called every Nash sweep
and OSQP workspaces persist across ``solve()`` calls (osqp.hpp:90-110) -- but
ships no closed-loop driver.  This module provides one, TPU-native:

* :func:`mpc_step` -- one receding-horizon step: solve from the measured
  state with the shifted previous plan as warm start, return the first
  control and the next warm start.  Pure and jittable.
* :func:`run_mpc` -- an entire closed-loop simulation as ONE ``lax.scan``:
  plant rollout, solver, and warm-start shifting all stay on-device, so
  thousands of closed-loop simulations batch with ``vmap`` (the MPC
  fleet-simulation use case).

The warm-start shift ``u_warm = [u_1..u_{T-1}, u_{T-1}]`` (repeat-last) is
the standard receding-horizon initialization.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .integrators import integrate_rk4
from .ocp import OCPSpec
from .solvers.base import SolveResult
from .types import Array


class MPCStep(NamedTuple):
    control: Array          # u_0 applied to the plant [nu]
    next_warm_start: Array  # shifted plan for the next step [T, nu]
    result: SolveResult     # full solver output (predicted trajectory etc.)


def shift_warm_start(controls: Array, fill: str = "repeat") -> Array:
    """Shift the plan one step: drop u_0, append a fill control."""
    if fill == "repeat":
        tail = controls[-1:]
    elif fill == "zero":
        tail = jnp.zeros_like(controls[-1:])
    else:
        raise ValueError(f"unknown fill '{fill}'")
    return jnp.concatenate([controls[1:], tail], axis=0)


def mpc_step(
    spec: OCPSpec,
    solve_fn: Callable[[OCPSpec], SolveResult],
    x_measured: Array,
    u_warm: Array,
    fill: str = "repeat",
) -> MPCStep:
    """One receding-horizon step (pure; jit/vmap-friendly)."""
    result = solve_fn(
        spec.replace(initial_state=x_measured, initial_controls=u_warm)
    )
    return MPCStep(
        control=result.controls[0],
        next_warm_start=shift_warm_start(result.controls, fill),
        result=result,
    )


class MPCTrace(NamedTuple):
    states: Array     # closed-loop plant states [N+1, nx]
    controls: Array   # applied controls [N, nu]
    costs: Array      # solver cost per step [N]
    iterations: Array  # solver iterations per step [N]


def run_mpc(
    spec: OCPSpec,
    solve_fn: Callable[[OCPSpec], SolveResult],
    n_steps: int,
    x0: Optional[Array] = None,
    plant_dynamics: Optional[Callable[[Array, Array], Array]] = None,
    plant_dt: Optional[float] = None,
    fill: str = "repeat",
) -> MPCTrace:
    """Closed-loop simulation as a single ``lax.scan``.

    ``plant_dynamics`` defaults to the model dynamics (perfect-model MPC);
    pass a different function to simulate model mismatch.
    """
    x0 = spec.initial_state if x0 is None else x0
    plant = plant_dynamics or spec.dynamics
    dt = spec.dt if plant_dt is None else plant_dt

    def body(carry, _):
        x, u_warm = carry
        step = mpc_step(spec, solve_fn, x, u_warm, fill)
        x_next = integrate_rk4(x, step.control, dt, plant)
        outputs = (x_next, step.control, step.result.cost, step.result.iterations)
        return (x_next, step.next_warm_start), outputs

    (xN, _), (xs, us, costs, iters) = jax.lax.scan(
        body, (x0, spec.initial_controls), None, length=n_steps
    )
    states = jnp.concatenate([x0[None], xs], axis=0)
    return MPCTrace(states=states, controls=us, costs=costs, iterations=iters)


def run_mpc_batched(
    specs: OCPSpec,
    batched_solve_fn: Callable[[OCPSpec], SolveResult],
    n_steps: int,
    plant_dynamics: Optional[Callable[[Array, Array], Array]] = None,
    plant_dt: Optional[float] = None,
    fill: str = "repeat",
) -> MPCTrace:
    """Closed-loop MPC for a whole fleet as one ``lax.scan``.

    ``specs`` carries a leading batch axis ``[B, ...]`` and
    ``batched_solve_fn`` solves the entire batch in one call (e.g.
    ``solve_ilqr_batched``), so each receding-horizon step is ONE fused
    batched solve instead of B independent ones -- the TPU-native shape of
    the MPC fleet-simulation use case (``vmap(run_mpc)`` gives identical
    semantics but routes each lane through the per-problem solver; this
    entry keeps the batch together for the lane-resident fused loop).
    Returns an :class:`MPCTrace` with a leading step axis and a batch axis:
    states ``[N+1, B, nx]``, controls ``[N, B, nu]``, costs ``[N, B]``.
    """
    plant = plant_dynamics or specs.dynamics
    dt = specs.dt if plant_dt is None else plant_dt
    x0 = specs.initial_state                      # [B, nx]

    def body(carry, _):
        x, u_warm = carry                         # [B, nx], [B, T, nu]
        result = batched_solve_fn(
            specs.replace(initial_state=x, initial_controls=u_warm)
        )
        u0 = result.controls[:, 0]                # [B, nu]
        warm = jax.vmap(lambda u: shift_warm_start(u, fill))(result.controls)
        x_next = jax.vmap(lambda xx, uu: integrate_rk4(xx, uu, dt, plant))(x, u0)
        outputs = (x_next, u0, result.cost, result.iterations)
        return (x_next, warm), outputs

    (_, _), (xs, us, costs, iters) = jax.lax.scan(
        body, (x0, specs.initial_controls), None, length=n_steps
    )
    states = jnp.concatenate([x0[None], xs], axis=0)
    return MPCTrace(states=states, controls=us, costs=costs, iterations=iters)


def run_mpc_nash(
    problem,
    strategy,
    n_steps: int,
    plant_dynamics: Optional[Callable[[Array, Array], Array]] = None,
    plant_dt: Optional[float] = None,
    fill: str = "repeat",
) -> MPCTrace:
    """Closed-loop receding-horizon Nash game as one compiled ``lax.scan``.

    Each MPC step runs the strategy's FULL best-response machinery (Jacobi
    sweeps, coupling contexts refreshed from the agents' newest plans,
    line-search/trust-region globalization) on the measured joint state,
    applies every agent's first control to its plant, and shifts the warm
    starts -- interactive driving / coupled-fleet MPC.  The reference can
    neither couple agents nor close the loop; here the entire game-of-games
    stays on-device.

    ``problem``: a homogeneous :class:`MultiAgentProblem` (optionally with
    ``inter_agent_cost``); ``strategy``: any Nash strategy instance from
    :func:`multi_agent_solver_tpu.strategies.make_strategy`.  Returns an
    :class:`MPCTrace` with step-major leaves: states ``[n_steps+1, N, nx]``,
    controls ``[n_steps, N, nu]``, costs ``[n_steps, N]``.
    """
    from .strategies.base import stack_agent_specs

    if not problem.blocks:
        problem.compute_offsets()
    specs = stack_agent_specs(problem)
    specs = strategy._prepare(problem, specs)
    plant = plant_dynamics or specs.dynamics
    dt = specs.dt if plant_dt is None else plant_dt
    x0 = specs.initial_state                   # [N, nx]

    def body(carry, _):
        x, warm = carry
        states, controls, costs = strategy._run_stacked(
            specs.replace(initial_state=x, initial_controls=warm)
        )
        u0 = controls[:, 0]                    # [N, nu]
        new_warm = jax.vmap(lambda u: shift_warm_start(u, fill))(controls)
        x_next = jax.vmap(lambda xx, uu: integrate_rk4(xx, uu, dt, plant))(x, u0)
        return (x_next, new_warm), (x_next, u0, costs)

    jitted = jax.jit(
        lambda x, w: jax.lax.scan(body, (x, w), None, length=n_steps)
    )
    (_, _), (xs, us, costs) = jitted(x0, specs.initial_controls)
    states = jnp.concatenate([x0[None], xs], axis=0)
    return MPCTrace(
        states=states, controls=us, costs=costs,
        iterations=jnp.zeros(costs.shape[0], jnp.int32),
    )
