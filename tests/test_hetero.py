"""Heterogeneous agents on the stacked (padded) sweep path.

VERDICT item 8: mixed agent types must solve on the vmapped path via
padding + type-indicator states (strategies/hetero.py) and match the
per-agent host loop.  The reference supports per-agent dims natively via
its CPU agent loop (multi_agent_problem.hpp:44-49, nash.hpp:53-90).
"""

import jax.numpy as jnp
import pytest

from multi_agent_solver_tpu import Agent, MultiAgentProblem, OCP
from multi_agent_solver_tpu.models import single_track_model
from multi_agent_solver_tpu.solvers.base import make_solver
from multi_agent_solver_tpu.strategies.base import make_strategy
from multi_agent_solver_tpu.strategies import hetero, nash

from .problems import lqr_ocp, single_track_lane_ocp

PARAMS = {"max_iterations": 40, "tolerance": 1e-6, "max_ms": 10000}


def _shared_lane_cost(x, u, t):
    return 10.0 * x[1] ** 2 + (x[3] - 1.0) ** 2 + 0.1 * (u[0] ** 2 + u[1] ** 2)


def mixed_problem():
    """2 single-track (nx=4, nu=2, bounded) + 1 LQR (nx=2, nu=1, unbounded).

    The two cars share problem functions (one type); the LQR agent is the
    second type -- the reference's mixed-fleet pattern.
    """
    p = MultiAgentProblem()
    p.add_agent(
        Agent(0, single_track_lane_ocp(horizon_steps=20, stage_cost=_shared_lane_cost))
    )
    p.add_agent(Agent(1, lqr_ocp(n_x=2, n_u=1, T=20, dt=0.1)))
    p.add_agent(
        Agent(
            2,
            single_track_lane_ocp(
                horizon_steps=20,
                stage_cost=_shared_lane_cost,
                initial_state=jnp.array([0.0, -1.0, 0.0, 0.5]),
            ),
        )
    )
    return p


def solve_mixed(strategy_name, force_host=False):
    problem = mixed_problem()
    solver = make_solver("ilqr", PARAMS)
    strat = make_strategy(strategy_name, solver, PARAMS, max_outer=3)
    if force_host:
        orig = nash.stack_agent_specs_padded
        nash.stack_agent_specs_padded = lambda pr: (None, None)
        try:
            sol = strat(problem)
        finally:
            nash.stack_agent_specs_padded = orig
    else:
        stacked, meta = hetero.stack_agent_specs_padded(problem)
        assert stacked is not None and meta.n_types == 2
        assert stacked.state_dim == 4 + 2 and stacked.control_dim == 2
        sol = strat(problem)
    return sol


@pytest.mark.parametrize("strategy_name", ["sequential", "trustregion"])
def test_mixed_dims_match_host_loop(strategy_name):
    sol_pad = solve_mixed(strategy_name)
    sol_host = solve_mixed(strategy_name, force_host=True)
    assert sol_pad.total_cost == pytest.approx(sol_host.total_cost, rel=1e-5)
    for a, b in zip(sol_pad.controls, sol_host.controls):
        assert a.shape == b.shape  # true per-agent dims restored
        assert float(jnp.max(jnp.abs(a - b))) < 1e-4


def test_padded_controls_exactly_zero():
    """Padded control dims must be pinned at zero (cost-neutral padding)."""
    problem = mixed_problem()
    solver = make_solver("ilqr", PARAMS)
    strat = make_strategy("sequential", solver, PARAMS, max_outer=2)
    stacked, meta = hetero.stack_agent_specs_padded(problem)
    strat(problem)
    # Agent 1 (LQR, nu=1) occupies a nu=2 lane internally; its returned
    # controls are sliced back to nu=1 and its cost must not include any
    # padding regularization -- cross-check against a pure LQR solve.
    solo = lqr_ocp(n_x=2, n_u=1, T=20, dt=0.1)
    make_solver("ilqr", PARAMS).solve(solo)
    assert problem.blocks[1].agent.ocp.best_cost == pytest.approx(
        solo.best_cost, rel=1e-6
    )


def _coupled_fleet(duplicate_type: bool, n=4):
    """Head-on fleet; optionally split into two *artificially* distinct types
    (identical physics, distinct function objects) to force the padded path.
    """

    def make_stage():
        def stage_cost(x, u, t):
            return x[1] ** 2 + (x[3] - 2.0) ** 2 + 0.05 * (u[0] ** 2 + u[1] ** 2)

        return stage_cost

    stage_a = make_stage()
    stage_b = make_stage() if duplicate_type else stage_a

    # Same-direction convoy on adjacent lanes: smooth mutual repulsion with a
    # unique, well-conditioned equilibrium (a chaotic head-on game would
    # amplify benign f64 path differences into different equilibria).
    problem = MultiAgentProblem()
    for i in range(n):
        x0 = [-1.5 * i, 0.25 * i, 0.0, 2.0]
        ocp = OCP(
            state_dim=4,
            control_dim=2,
            horizon_steps=15,
            dt=0.25,
            initial_state=jnp.asarray(x0, jnp.float64),
            dynamics=single_track_model,
            stage_cost=stage_a if i % 2 == 0 else stage_b,
            input_lower_bounds=jnp.array([-0.6, -2.0]),
            input_upper_bounds=jnp.array([0.6, 2.0]),
        )
        ocp.initialize_problem()
        problem.add_agent(Agent(i, ocp))

    def collision_cost(x_i, x_j, t):
        d2 = (x_i[0] - x_j[0]) ** 2 + (x_i[1] - x_j[1]) ** 2
        return 5.0 * jnp.exp(-d2 / 2.0)

    problem.inter_agent_cost = collision_cost
    return problem


def test_coupled_heterogeneous_matches_homogeneous():
    """Coupled game with two (physically identical) agent types: the padded
    coupled sweep must reproduce the homogeneous coupled sweep."""
    results = []
    for dup in (False, True):
        problem = _coupled_fleet(duplicate_type=dup)
        stacked, meta = hetero.stack_agent_specs_padded(problem)
        if dup:
            assert stacked is not None and meta.n_types == 2
        else:
            assert stacked is None  # homogeneous: unpadded fast path
        solver = make_solver("ilqr", PARAMS)
        strat = make_strategy("sequential", solver, PARAMS, max_outer=3)
        results.append(strat(problem))
    hom, het_sol = results
    assert het_sol.total_cost == pytest.approx(hom.total_cost, rel=1e-5)
    # The padded Riccati runs 6-dim algebra vs 4-dim, so iterates differ in
    # the last few digits; the equilibrium (costs above) is the assertion,
    # controls just need to be the same solution.
    for a, b in zip(hom.controls, het_sol.controls):
        assert float(jnp.max(jnp.abs(a - b))) < 1e-2


def test_unpaddable_mix_falls_back_to_host():
    """Different horizons cannot be padded; uncoupled falls back to the host
    loop, coupled raises the documented error."""
    p = MultiAgentProblem()
    p.add_agent(Agent(0, lqr_ocp(n_x=2, n_u=1, T=10, dt=0.1)))
    p.add_agent(Agent(1, lqr_ocp(n_x=3, n_u=2, T=12, dt=0.1)))
    stacked, meta = hetero.stack_agent_specs_padded(p)
    assert stacked is None
    solver = make_solver("ilqr", PARAMS)
    strat = make_strategy("sequential", solver, PARAMS, max_outer=2)
    sol = strat(p)  # host loop still solves it
    assert jnp.isfinite(sol.total_cost)

    p2 = MultiAgentProblem()
    p2.add_agent(Agent(0, lqr_ocp(n_x=2, n_u=1, T=10, dt=0.1)))
    p2.add_agent(Agent(1, lqr_ocp(n_x=3, n_u=2, T=12, dt=0.1)))
    p2.inter_agent_cost = lambda xi, xj, t: 0.0 * xi[0]
    with pytest.raises(NotImplementedError):
        make_strategy("sequential", make_solver("ilqr", PARAMS), PARAMS, 2)(p2)
