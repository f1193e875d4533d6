"""Example CLI parsing, mirroring the reference's hand-rolled parser.

Reference: ``examples/cli.hpp``.  Behaviour preserved:

* ``--opt value`` and ``--opt=value`` both accepted (cli.hpp:87-110);
* underscores in option names normalize to dashes (cli.hpp:15-25), so
  ``--max_outer`` == ``--max-outer``;
* ``SolverOptions``: ``--solver`` (default "ilqr"), ``--help`` (cli.hpp:126-159);
* ``MultiAgentOptions``: ``--agents`` (default 10, also positional),
  ``--solver`` (default "ilqr"), ``--strategy`` (default "centralized"),
  ``--max-outer`` (default 10) (cli.hpp:161-220);
* ``RocketOptions``: ``--solver`` (default "osqp"), ``--dump`` flag
  (cli.hpp:222-260).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple


def _normalize_option(name: str) -> str:
    return name.replace("_", "-")


def _parse(argv: List[str]) -> Tuple[Dict[str, str], List[str], bool]:
    """Returns (options, positionals, show_help)."""
    options: Dict[str, str] = {}
    positionals: List[str] = []
    show_help = False
    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg in ("-h", "--help"):
            show_help = True
        elif arg.startswith("--"):
            body = arg[2:]
            if "=" in body:
                key, value = body.split("=", 1)
                options[_normalize_option(key)] = value
            else:
                key = _normalize_option(body)
                if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                    options[key] = argv[i + 1]
                    i += 1
                else:
                    options[key] = ""   # bare flag
        else:
            positionals.append(arg)
        i += 1
    return options, positionals, show_help


def _extra_params(options: Dict[str, str], known: Tuple[str, ...]) -> Dict[str, float]:
    """Unknown numeric ``--key value`` options become SolverParams entries.

    The reference passes tuning through a ``SolverParams`` string->double map
    (types.hpp:57); this lets any example CLI forward e.g. ``--fused=1``,
    ``--boxqp=1`` or ``--step-limit=1`` to the solver the same way (dashes
    map back to the underscore param names).  Extension beyond the
    reference's double-only map: non-numeric values are kept as strings so
    enum-style params (``--colloc_init=hold``) pass through too.
    """
    extra: Dict[str, float] = {}
    for key, value in options.items():
        if key in known:
            continue
        try:
            extra[key.replace("-", "_")] = float(value)
        except ValueError:
            extra[key.replace("-", "_")] = value
    return extra


@dataclasses.dataclass
class SolverOptions:
    solver: str = "ilqr"
    # Extension beyond the reference CLI: race N random warm starts as batch
    # lanes and keep the best (1 = reference behaviour).
    multistart: int = 1
    extra_params: Dict[str, float] = dataclasses.field(default_factory=dict)
    show_help: bool = False


@dataclasses.dataclass
class MultiAgentOptions:
    agents: int = 10
    max_outer: int = 10
    solver: str = "ilqr"
    strategy: str = "centralized"
    # Extension beyond the reference CLI: inter-agent collision-avoidance
    # coupling weight (0 disables, reproducing the reference's uncoupled
    # agents).
    coupling: float = 0.0
    extra_params: Dict[str, float] = dataclasses.field(default_factory=dict)
    show_help: bool = False


@dataclasses.dataclass
class RocketOptions:
    solver: str = "osqp"
    dump_traces: bool = False
    multistart: int = 1
    extra_params: Dict[str, float] = dataclasses.field(default_factory=dict)
    show_help: bool = False


def parse_solver_options(argv: List[str]) -> SolverOptions:
    options, _, show_help = _parse(argv)
    return SolverOptions(
        solver=options.get("solver", "ilqr"),
        multistart=int(options.get("multistart", 1)),
        extra_params=_extra_params(options, ("solver", "multistart")),
        show_help=show_help,
    )


def parse_multi_agent_options(argv: List[str]) -> MultiAgentOptions:
    options, positionals, show_help = _parse(argv)
    agents = int(options.get("agents", positionals[0] if positionals else 10))
    return MultiAgentOptions(
        agents=agents,
        max_outer=int(options.get("max-outer", 10)),
        solver=options.get("solver", "ilqr"),
        strategy=options.get("strategy", "centralized"),
        coupling=float(options.get("coupling", 0.0)),
        extra_params=_extra_params(
            options, ("agents", "max-outer", "solver", "strategy", "coupling")
        ),
        show_help=show_help,
    )


def parse_rocket_options(argv: List[str]) -> RocketOptions:
    options, _, show_help = _parse(argv)
    return RocketOptions(
        solver=options.get("solver", "osqp"),
        dump_traces="dump" in options,
        multistart=int(options.get("multistart", 1)),
        extra_params=_extra_params(options, ("solver", "dump", "multistart")),
        show_help=show_help,
    )
