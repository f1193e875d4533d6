"""Multi-agent problem container and the centralized joint-OCP builder.

TPU-native analogue of the reference's ``multi_agent_problem.hpp:24-128``:
agents are id-sorted into contiguous state/control blocks, and
``build_global_ocp`` stacks them into one block-diagonal joint OCP whose
dynamics and costs evaluate every agent's callbacks on its slice.

Improvements over the reference (documented limitations at
multi_agent_problem.hpp:76-92):

* the joint OCP's derivatives come from AD of the stacked functions, so the
  global Jacobians are exact block-diagonal -- the reference drops per-agent
  analytic Jacobians and falls back to full finite differences;
* per-agent *state* bounds are concatenated into global state bounds (the
  reference drops them); input bounds are merged whenever every agent has
  them, exactly like the reference.

Like the reference, per-agent functional eq/ineq constraints are not lifted
into the joint OCP yet, and there are no inter-agent coupling terms (agents
interact only through the strategy layer).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from .agent import Agent
from .ocp import OCP, cost_of


@dataclasses.dataclass
class AgentBlockInfo:
    """Offsets of one agent inside the stacked joint problem
    (reference: multi_agent_problem.hpp:14-22)."""

    agent_id: int
    state_offset: int
    control_offset: int
    state_dim: int
    control_dim: int
    agent: Agent


class MultiAgentProblem:
    """Collection of agents + block bookkeeping (multi_agent_problem.hpp:24-128)."""

    def __init__(self):
        self.agents: List[Agent] = []
        self.blocks: List[AgentBlockInfo] = []
        self.total_state_dim = 0
        self.total_control_dim = 0
        # Optional pairwise coupling: ``inter_agent_cost(x_i, x_j, t)`` added
        # for every ordered pair i != j.  The reference has NO inter-agent
        # coupling anywhere (agents only interact through the strategy layer,
        # multi_agent_problem.hpp:76-92); with this set, the centralized
        # strategy solves the truly coupled joint OCP and the Nash strategies
        # play a real best-response game against the others' current plans.
        # Requires homogeneous agents.
        self.inter_agent_cost = None
        # Optional sparsification for large games: couple each agent only to
        # its K nearest neighbours (Euclidean distance over
        # ``coupling_distance_dims`` of the state) instead of all N-1 others.
        # Contexts shrink from O(N) to O(K) per agent, keeping the fused
        # kernel path viable for thousands of agents; exact for
        # finite-range/decaying couplings like collision costs.
        # None = all-pairs.
        self.coupling_neighbors = None
        self.coupling_distance_dims = (0, 1)

    def add_agent(self, agent: Agent) -> None:
        self.agents.append(agent)

    def compute_offsets(self) -> None:
        """Sort agents by id and assign contiguous offsets
        (multi_agent_problem.hpp:37-50)."""
        self.blocks = []
        state_offset = 0
        control_offset = 0
        for agent in sorted(self.agents, key=lambda a: a.id):
            nx, nu = agent.state_dim(), agent.control_dim()
            self.blocks.append(
                AgentBlockInfo(agent.id, state_offset, control_offset, nx, nu, agent)
            )
            state_offset += nx
            control_offset += nu
        self.total_state_dim = state_offset
        self.total_control_dim = control_offset

    def build_global_ocp(self) -> OCP:
        """Stack all agents into one block-diagonal joint OCP
        (multi_agent_problem.hpp:52-127)."""
        if not self.blocks:
            self.compute_offsets()
        blocks = self.blocks
        if not blocks:
            raise ValueError("MultiAgentProblem has no agents")

        horizon = blocks[0].agent.ocp.horizon_steps   # taken from the first block
        dt = blocks[0].agent.ocp.dt                   # (multi_agent_problem.hpp:66-69)

        slices = [
            (
                b.state_offset,
                b.state_offset + b.state_dim,
                b.control_offset,
                b.control_offset + b.control_dim,
                b.agent.ocp,
            )
            for b in blocks
        ]

        def global_dynamics(x, u):
            return jnp.concatenate(
                [ocp.dynamics(x[xs:xe], u[us:ue]) for xs, xe, us, ue, ocp in slices]
            )

        inter = self.inter_agent_cost
        n_agents = len(blocks)
        uniform_dims = all(
            b.state_dim == blocks[0].state_dim and b.control_dim == blocks[0].control_dim
            for b in blocks
        )

        def global_stage_cost(x, u, t):
            total = 0.0
            for xs, xe, us, ue, ocp in slices:
                total = total + ocp.stage_cost(x[xs:xe], u[us:ue], t)
            if inter is not None:
                # Directed pair sum, matching the Nash per-agent convention
                # (each agent pays its coupling to every other agent).
                if uniform_dims and n_agents > 1:
                    # Vectorized over (agent, other) pairs: the trace stays
                    # O(1) in agent count (the unrolled double loop makes
                    # compilation O(N^2) and intractable past a few dozen
                    # agents).  Self-pairs are excluded by indexing, never
                    # evaluated -- masking them after the fact would leak
                    # NaN gradients through 1/distance-style couplings.
                    import numpy as _np

                    xa = x.reshape(n_agents, -1)
                    others = jnp.asarray(
                        _np.stack(
                            [
                                [j for j in range(n_agents) if j != i]
                                for i in range(n_agents)
                            ]
                        )
                    )  # [N, N-1]
                    pair = jax.vmap(
                        lambda xi, js: jax.vmap(lambda xj: inter(xi, xj, t))(xa[js])
                    )(xa, others)  # [N, N-1]
                    total = total + jnp.sum(pair)
                else:
                    for i, (xs_i, xe_i, *_rest) in enumerate(slices):
                        for j, (xs_j, xe_j, *_rest2) in enumerate(slices):
                            if i != j:
                                total = total + inter(x[xs_i:xe_i], x[xs_j:xe_j], t)
            return total

        def global_terminal_cost(x):
            total = 0.0
            for xs, xe, us, ue, ocp in slices:
                total = total + ocp.terminal_cost(x[xs:xe])
            return total

        initial_state = jnp.concatenate(
            [jnp.asarray(b.agent.ocp.initial_state) for b in blocks]
        )

        # Input bounds merged only when EVERY agent has them (parity with
        # multi_agent_problem.hpp:76-92); state bounds merged when every agent
        # has them (improvement -- reference drops state bounds entirely).
        def merge_bounds(lower_name: str, upper_name: str):
            lowers = [getattr(b.agent.ocp, lower_name) for b in blocks]
            uppers = [getattr(b.agent.ocp, upper_name) for b in blocks]
            if all(l is not None for l in lowers) and all(u is not None for u in uppers):
                return jnp.concatenate(lowers), jnp.concatenate(uppers)
            return None, None

        in_lower, in_upper = merge_bounds("input_lower_bounds", "input_upper_bounds")
        st_lower, st_upper = merge_bounds("state_lower_bounds", "state_upper_bounds")

        # Warm start: concatenate per-agent warm starts when shapes line up.
        warm = None
        if all(
            b.agent.ocp.initial_controls is not None
            and b.agent.ocp.initial_controls.shape == (horizon, b.control_dim)
            for b in blocks
        ):
            warm = jnp.concatenate(
                [jnp.asarray(b.agent.ocp.initial_controls) for b in blocks], axis=1
            )

        global_ocp = OCP(
            state_dim=self.total_state_dim,
            control_dim=self.total_control_dim,
            horizon_steps=horizon,
            dt=dt,
            initial_state=initial_state,
            dynamics=global_dynamics,
            stage_cost=global_stage_cost,
            terminal_cost=global_terminal_cost,
            input_lower_bounds=in_lower,
            input_upper_bounds=in_upper,
            state_lower_bounds=st_lower,
            state_upper_bounds=st_upper,
            initial_controls=warm,
        )
        global_ocp.initialize_problem()   # multi_agent_problem.hpp:124-125
        global_ocp.verify_problem()
        return global_ocp

    def scatter_global_result(self, global_ocp: OCP) -> None:
        """Scatter joint best trajectories back into each agent's OCP and
        recompute per-agent costs (reference: centralized.hpp:27-36)."""
        import numpy as np

        # One host fetch; per-agent slices of a device array each dispatch a
        # device op (a round-trip over remote backends).
        X = np.asarray(global_ocp.best_states)
        U = np.asarray(global_ocp.best_controls)
        for b in self.blocks:
            xs, xe = b.state_offset, b.state_offset + b.state_dim
            us, ue = b.control_offset, b.control_offset + b.control_dim
            agent_ocp = b.agent.ocp
            states = X[:, xs:xe]
            controls = U[:, us:ue]
            cost = cost_of(agent_ocp.spec(), jnp.asarray(states), jnp.asarray(controls))
            agent_ocp.set_result(states, controls, float(cost))
