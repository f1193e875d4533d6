"""Inter-agent coupling tests (capability beyond the reference).

Two cars drive toward each other head-on; a soft collision-avoidance
coupling cost must make the Nash best-response sweeps (and the centralized
joint solve) separate their paths.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multi_agent_solver_tpu import (
    Agent,
    MultiAgentProblem,
    OCP,
    make_solver,
    make_strategy,
    solve_multi_agent,
)
from multi_agent_solver_tpu.models import single_track_model

PARAMS = {"max_iterations": 30, "tolerance": 1e-6, "max_ms": 1e9}


def _head_on_problem(coupled: bool) -> MultiAgentProblem:
    """Car 0 drives +x from (-8, 0); car 1 drives -x from (+8, 0.0)."""

    def stage_cost(x, u, t):
        # Follow own lane (y=0) at speed 2; mild control effort.
        return 1.0 * x[1] ** 2 + (x[3] - 2.0) ** 2 + 0.05 * (u[0] ** 2 + u[1] ** 2)

    def make(agent_id, x0):
        ocp = OCP(
            state_dim=4, control_dim=2, horizon_steps=20, dt=0.25,
            initial_state=jnp.asarray(x0, jnp.float64),
            dynamics=single_track_model,
            stage_cost=stage_cost,
            input_lower_bounds=jnp.array([-0.6, -2.0]),
            input_upper_bounds=jnp.array([0.6, 2.0]),
        )
        ocp.initialize_problem()
        return Agent(agent_id, ocp)

    problem = MultiAgentProblem()
    problem.add_agent(make(0, [-8.0, 0.0, 0.0, 2.0]))
    problem.add_agent(make(1, [8.0, 0.0, jnp.pi, 2.0]))

    if coupled:
        def collision_cost(x_i, x_j, t):
            d2 = (x_i[0] - x_j[0]) ** 2 + (x_i[1] - x_j[1]) ** 2
            return 30.0 * jnp.exp(-d2 / 4.0)

        problem.inter_agent_cost = collision_cost
    return problem


def _min_distance(solution) -> float:
    a = np.array(solution.states[0])[:, :2]
    b = np.array(solution.states[1])[:, :2]
    return float(np.sqrt(((a - b) ** 2).sum(axis=1)).min())


class TestCoupledNash:
    def test_uncoupled_cars_collide(self):
        problem = _head_on_problem(coupled=False)
        strategy = make_strategy("sequential", make_solver("ilqr"), PARAMS, 3)
        sol = solve_multi_agent(strategy, problem)
        assert _min_distance(sol) < 1.0  # they drive straight through each other

    def test_coupled_sequential_avoids_collision(self):
        problem = _head_on_problem(coupled=True)
        strategy = make_strategy("sequential", make_solver("ilqr"), PARAMS, 6)
        sol = solve_multi_agent(strategy, problem)
        assert _min_distance(sol) > 1.5, f"min distance {_min_distance(sol)}"

    def test_coupled_trustregion_avoids_collision(self):
        problem = _head_on_problem(coupled=True)
        strategy = make_strategy("trustregion", make_solver("ilqr"), PARAMS, 8)
        sol = solve_multi_agent(strategy, problem)
        assert _min_distance(sol) > 1.2, f"min distance {_min_distance(sol)}"

    def test_coupled_centralized_avoids_collision(self):
        problem = _head_on_problem(coupled=True)
        strategy = make_strategy(
            "centralized", make_solver("ilqr"), {**PARAMS, "max_iterations": 60}, 1
        )
        sol = solve_multi_agent(strategy, problem)
        assert _min_distance(sol) > 1.2, f"min distance {_min_distance(sol)}"

    def test_coupled_osqp_shooting_avoids_collision(self):
        """The QP solver family accepts context costs (round-2): coupling
        enters the shooting SQP through the cost-derivative stacks."""
        problem = _head_on_problem(coupled=True)
        strategy = make_strategy("sequential", make_solver("osqp"), PARAMS, 6)
        sol = solve_multi_agent(strategy, problem)
        assert _min_distance(sol) > 1.2, f"min distance {_min_distance(sol)}"

    def test_coupled_osqp_collocation_avoids_collision(self):
        problem = _head_on_problem(coupled=True)
        strategy = make_strategy(
            "sequential", make_solver("osqp_collocation"),
            {**PARAMS, "step_limit": 5.0}, 6,
        )
        sol = solve_multi_agent(strategy, problem)
        assert _min_distance(sol) > 1.2, f"min distance {_min_distance(sol)}"

    def test_knn_coupling_matches_all_pairs_for_two_agents(self):
        """coupling_neighbors=1 on a 2-agent game IS all-pairs coupling."""
        p_all = _head_on_problem(coupled=True)
        s1 = make_strategy("sequential", make_solver("ilqr"), PARAMS, 4)
        sol_all = solve_multi_agent(s1, p_all)

        p_knn = _head_on_problem(coupled=True)
        p_knn.coupling_neighbors = 1
        s2 = make_strategy("sequential", make_solver("ilqr"), PARAMS, 4)
        sol_knn = solve_multi_agent(s2, p_knn)
        np.testing.assert_allclose(sol_knn.total_cost, sol_all.total_cost,
                                   rtol=1e-9)

    def test_knn_coupling_scales_to_many_agents(self):
        """K-nearest contexts keep large coupled games on the fused path
        (all-pairs contexts would trip the VMEM gate and, at O(N) per agent,
        O(N^2) memory overall)."""
        from multi_agent_solver_tpu.examples.multi_agent_single_track import (
            build_problem,
        )

        problem = build_problem(64, coupling=25.0)
        problem.coupling_neighbors = 4
        strategy = make_strategy(
            "sequential", make_solver("ilqr"),
            {"max_iterations": 10, "tolerance": 1e-5, "max_ms": 1e9}, 2,
        )
        sol = solve_multi_agent(strategy, problem)
        assert np.isfinite(sol.total_cost)
        assert len(sol.states) == 64

    def test_coupled_costs_reported_against_final_plans(self):
        problem = _head_on_problem(coupled=True)
        strategy = make_strategy("sequential", make_solver("ilqr"), PARAMS, 5)
        sol = solve_multi_agent(strategy, problem)
        # Manually recompute agent 0's cost vs agent 1's final plan.
        spec0 = problem.blocks[0].agent.ocp.spec()
        xs0 = np.array(sol.states[0])
        us0 = np.array(sol.controls[0])
        base = float(
            sum(
                spec0.stage_cost(jnp.asarray(xs0[t]), jnp.asarray(us0[t]), t)
                for t in range(20)
            )
        )
        other = np.array(sol.states[1])[:-1, :2]
        own = xs0[:-1, :2]
        d2 = ((own - other) ** 2).sum(axis=1)
        coupling = float((30.0 * np.exp(-d2 / 4.0)).sum())
        np.testing.assert_allclose(sol.costs[0], base + coupling, rtol=1e-5)
