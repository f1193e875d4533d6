"""Multi-agent LQR example: N copies of a linear OCP under any strategy.

Mirrors ``examples/multi_agent_lqr.cpp:21-160``: per agent A=B=I (4x4),
Q=R=Qf=I, x0=[1,0,0,0], T=10, dt=0.1, full analytic derivative set,
params {max_iterations: 100, tolerance: 1e-5, max_ms: 100}.

TPU note: all agents share ONE set of problem functions, so the Nash
strategies take the stacked vmapped path (one compiled executable, agents as
batch lanes) instead of the reference's OpenMP threads.
"""

from __future__ import annotations

import sys

from ._common import Timer, print_available, result_line, run_main

import jax.numpy as jnp

from ..agent import Agent
from ..multi_agent import MultiAgentProblem
from ..ocp import OCP
from ..models import make_linear_dynamics, quadratic_stage_cost, quadratic_terminal_cost
from ..solvers import canonical_solver_name, make_solver
from ..strategies import canonical_strategy_name, make_strategy, solve as solve_strategy
from ..utils.cli import parse_multi_agent_options
from ..utils.csv_io import print_control_trajectory, print_state_trajectory

N_X, N_U, T_STEPS, DT = 4, 4, 10, 0.1


class _LQRProblemFactory:
    """Builds homogeneous LQR OCPs sharing one set of problem functions."""

    def __init__(self, n_x=N_X, n_u=N_U, dt=DT, horizon=T_STEPS):
        self.n_x, self.n_u, self.dt, self.horizon = n_x, n_u, dt, horizon
        A = jnp.eye(n_x)
        B = jnp.eye(n_x, n_u)
        Q = jnp.eye(n_x)
        R = jnp.eye(n_u)
        self.dynamics = make_linear_dynamics(A, B)
        self.stage_cost = quadratic_stage_cost(Q, R)
        self.terminal_cost = quadratic_terminal_cost(Q)
        # Analytic derivatives (multi_agent_lqr.cpp:38-72).
        Qt, Rt = Q + Q.T, R + R.T
        self.fx = lambda x, u: A
        self.fu = lambda x, u: B
        self.lx = lambda x, u, t: Qt @ x
        self.lu = lambda x, u, t: Rt @ u
        self.lxx = lambda x, u, t: Qt
        self.luu = lambda x, u, t: Rt
        self.lux = lambda x, u, t: jnp.zeros((n_u, n_x))
        self.phix = lambda x: Qt @ x
        self.phixx = lambda x: Qt

    def build(self) -> OCP:
        x0 = jnp.zeros(self.n_x).at[0].set(1.0)
        ocp = OCP(
            state_dim=self.n_x,
            control_dim=self.n_u,
            horizon_steps=self.horizon,
            dt=self.dt,
            initial_state=x0,
            dynamics=self.dynamics,
            stage_cost=self.stage_cost,
            terminal_cost=self.terminal_cost,
            dynamics_state_jacobian=self.fx,
            dynamics_control_jacobian=self.fu,
            cost_state_gradient=self.lx,
            cost_control_gradient=self.lu,
            cost_state_hessian=self.lxx,
            cost_control_hessian=self.luu,
            cost_cross_term=self.lux,
            terminal_cost_gradient=self.phix,
            terminal_cost_hessian=self.phixx,
        )
        ocp.initialize_problem()
        ocp.verify_problem()
        return ocp


def build_problem(n_agents: int) -> MultiAgentProblem:
    factory = _LQRProblemFactory()
    problem = MultiAgentProblem()
    for i in range(n_agents):
        problem.add_agent(Agent(i, factory.build()))
    return problem


def main(argv=None) -> int:
    options = parse_multi_agent_options(sys.argv[1:] if argv is None else argv)
    if options.show_help:
        print("Usage: multi_agent_lqr [--agents N] [--solver NAME] "
              "[--strategy NAME] [--max-outer N]\n")
        print_available()
        return 0

    problem = build_problem(options.agents)
    params = {"max_iterations": 100, "tolerance": 1e-5, "max_ms": 100}
    params.update(options.extra_params)   # CLI passthrough (--fused=1 etc.)
    solver = make_solver(options.solver)
    strategy = make_strategy(options.strategy, solver, params, options.max_outer)

    with Timer() as timer:
        solution = solve_strategy(strategy, problem)

    print(result_line(
        solver=canonical_solver_name(options.solver),
        strategy=canonical_strategy_name(options.strategy),
        agents=options.agents,
        cost=float(solution.total_cost),
        time_ms=timer.elapsed_ms,
    ))
    if not problem.blocks:
        problem.compute_offsets()
    for idx, block in enumerate(problem.blocks):
        if idx >= len(solution.states):
            break
        base = f"agent_{block.agent_id}"
        print_state_trajectory(None, solution.states[idx], block.agent.ocp.dt, base)
        print_control_trajectory(None, solution.controls[idx], block.agent.ocp.dt, base)
    return 0


if __name__ == "__main__":
    raise SystemExit(run_main(main))
