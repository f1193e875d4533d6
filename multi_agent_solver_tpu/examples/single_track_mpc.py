"""Closed-loop receding-horizon MPC example (beyond the reference).

The reference ships warm-start plumbing (``OCP::update_initial_with_best``,
ocp.hpp:95-100) but no closed-loop driver; this example runs the
single-track lane-follow problem (single_track_ocp.cpp:14-116) in closed
loop with :func:`multi_agent_solver_tpu.mpc.run_mpc`: each step re-solves
from the measured state with the shifted previous plan as warm start, the
first control is applied to the plant, and the whole simulation is ONE
compiled ``lax.scan``.

CLI: ``--steps N`` (default 100), ``--solver ilqr|cgd`` (default ilqr),
``--fleet B`` (simulate B controllers from spread lateral offsets as one
batched program), plus the usual numeric param passthrough.  Output follows
the reference CSV protocol with the CLOSED-LOOP trajectory, so
plot/animate tooling works unchanged.
"""

from __future__ import annotations

import sys

from ._common import Timer, print_available, result_line, run_main

import jax
import jax.numpy as jnp

from ..mpc import run_mpc, run_mpc_batched
from ..solvers import canonical_solver_name, make_solver
from ..utils.cli import parse_solver_options, _parse
from ..utils.csv_io import print_control_trajectory, print_state_trajectory
from .single_track_ocp import create_single_track_lane_following_ocp


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    options = parse_solver_options(argv)
    raw, _, _ = _parse(argv)
    n_steps = int(float(raw.get("steps", 100)))
    fleet = int(float(raw.get("fleet", 1)))
    if options.show_help:
        print("Usage: single_track_mpc [--solver NAME] [--steps N] [--fleet B]\n")
        print_available()
        return 0

    problem = create_single_track_lane_following_ocp()
    params = {"max_iterations": 5, "tolerance": 1e-5, "max_ms": 100}
    params.update(options.extra_params)
    params.pop("steps", None)
    params.pop("fleet", None)
    solver = make_solver(options.solver, params)
    spec = problem.spec()
    solve_fn = lambda s: type(solver)._solve_fn(s, solver.config)

    with Timer() as timer:
        if fleet > 1:
            offsets = jnp.linspace(0.5, 1.5, fleet)
            specs = jax.vmap(
                lambda y: spec.replace(initial_state=spec.initial_state.at[1].set(y))
            )(offsets)
            batched = lambda s: type(solver)._solve_batched_fn(s, solver.config)
            trace = jax.jit(
                lambda: run_mpc_batched(specs, batched, n_steps=n_steps)
            )()
            states = trace.states[:, 0]          # report controller 0
            controls = trace.controls[:, 0]
            closed_loop_cost = float(jnp.sum(trace.costs[:, 0]))
        else:
            trace = jax.jit(lambda: run_mpc(spec, solve_fn, n_steps=n_steps))()
            states = trace.states
            controls = trace.controls
            closed_loop_cost = float(jnp.sum(trace.costs))

    final_lateral = float(states[-1][1])
    print(result_line(
        solver=canonical_solver_name(options.solver),
        steps=n_steps,
        fleet=fleet,
        cost=closed_loop_cost,
        final_lateral_error=final_lateral,
        time_ms=timer.elapsed_ms,
    ))
    print_state_trajectory(None, states, problem.dt, "single_track_mpc")
    print_control_trajectory(None, controls, problem.dt, "single_track_mpc")
    return 0


if __name__ == "__main__":
    raise SystemExit(run_main(main))
