"""CSV trajectory protocol and CLI parsing tests.

The CSV stdout protocol (example_utils.hpp:123-167) is the integration
interface consumed by plot/animate/compare tooling; these tests pin its
format, and the CLI tests pin the reference parser's behaviours
(cli.hpp:15-25, 87-110, 126-260).
"""

import io
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from multi_agent_solver_tpu.utils.cli import (
    parse_multi_agent_options,
    parse_rocket_options,
    parse_solver_options,
)
from multi_agent_solver_tpu.utils.csv_io import (
    print_control_trajectory,
    print_state_trajectory,
)

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
from plot_example import parse_sections  # noqa: E402


class TestCSVProtocol:
    def test_state_section_format(self):
        states = jnp.array([[0.0, 1.0], [0.5, 2.0], [1.0, 3.0]])
        buf = io.StringIO()
        print_state_trajectory(buf, states, 0.1, "demo")
        lines = buf.getvalue().splitlines()
        assert lines[0] == "demo_states"
        assert lines[1] == "time,x0,x1"
        assert lines[2] == "0,0,1"
        assert lines[3] == "0.1,0.5,2"
        assert buf.getvalue().endswith("\n\n")  # blank-line terminated

    def test_control_section_format(self):
        controls = jnp.array([[0.25], [-0.5]])
        buf = io.StringIO()
        print_control_trajectory(buf, controls, 0.5, "demo")
        lines = buf.getvalue().splitlines()
        assert lines[0] == "demo_controls"
        assert lines[1] == "time,u0"
        assert lines[2] == "0,0.25"
        assert lines[3] == "0.5,-0.5"

    def test_zero_dt_uses_index(self):
        buf = io.StringIO()
        print_state_trajectory(buf, jnp.ones((2, 1)), 0.0, "x")
        assert buf.getvalue().splitlines()[2].startswith("0,")
        assert buf.getvalue().splitlines()[3].startswith("1,")

    def test_empty_trajectory_prints_nothing(self):
        buf = io.StringIO()
        print_state_trajectory(buf, jnp.zeros((0, 2)), 0.1, "x")
        assert buf.getvalue() == ""

    def test_roundtrip_through_tooling_parser(self):
        """What the examples emit, scripts/plot_example.py must parse back."""
        states = jnp.asarray(np.random.RandomState(0).randn(5, 3))
        controls = jnp.asarray(np.random.RandomState(1).randn(4, 2))
        buf = io.StringIO()
        print_state_trajectory(buf, states, 0.1, "agent_0")
        print_control_trajectory(buf, controls, 0.1, "agent_0")
        sections = parse_sections(buf.getvalue())
        assert set(sections) == {"agent_0_states", "agent_0_controls"}
        headers, data = sections["agent_0_states"]
        assert headers == ["time", "x0", "x1", "x2"]
        np.testing.assert_allclose(data[:, 1:], np.array(states), rtol=1e-5)


class TestCLI:
    def test_solver_options_defaults(self):
        opts = parse_solver_options([])
        assert opts.solver == "ilqr" and not opts.show_help

    def test_equals_and_space_syntax(self):
        assert parse_solver_options(["--solver", "cgd"]).solver == "cgd"
        assert parse_solver_options(["--solver=cgd"]).solver == "cgd"

    def test_underscore_normalization(self):
        """cli.hpp:15-25: '_' normalizes to '-' after '--'."""
        opts = parse_multi_agent_options(["--max_outer", "7"])
        assert opts.max_outer == 7

    def test_multi_agent_defaults_and_positional(self):
        opts = parse_multi_agent_options([])
        assert (opts.agents, opts.max_outer, opts.solver, opts.strategy) == (
            10, 10, "ilqr", "centralized",
        )
        assert parse_multi_agent_options(["7"]).agents == 7
        assert parse_multi_agent_options(["7", "--agents", "3"]).agents == 3

    def test_rocket_options(self):
        opts = parse_rocket_options([])
        assert opts.solver == "osqp" and not opts.dump_traces
        assert parse_rocket_options(["--dump"]).dump_traces

    def test_multistart_and_coupling_extensions(self):
        assert parse_solver_options([]).multistart == 1
        assert parse_solver_options(["--multistart", "32"]).multistart == 32
        assert parse_rocket_options(["--multistart=8"]).multistart == 8
        assert parse_multi_agent_options(["--coupling", "25"]).coupling == 25.0

    def test_extra_params_passthrough(self):
        """Unknown numeric options become SolverParams entries (dashes map
        back to underscore param names); non-numeric unknowns pass through
        as strings (enum-style params like --colloc_init=hold)."""
        opts = parse_solver_options(["--fused=1", "--step-limit", "2.5"])
        assert opts.extra_params == {"fused": 1.0, "step_limit": 2.5}
        opts = parse_multi_agent_options(
            ["--coupling", "25", "--boxqp=1", "--name", "bob"]
        )
        assert opts.extra_params == {"boxqp": 1.0, "name": "bob"}
        assert parse_solver_options(["--colloc_init=hold"]).extra_params == {
            "colloc_init": "hold"
        }
        assert parse_rocket_options(["--step_limit=1"]).extra_params == {
            "step_limit": 1.0
        }

    def test_help_flag(self):
        assert parse_solver_options(["--help"]).show_help
        assert parse_multi_agent_options(["-h"]).show_help
