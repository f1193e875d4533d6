"""Core type aliases and parameter handling for the TPU-native multi-agent solver.

This is the TPU-first analogue of the reference's ``types.hpp``
(``include/multi_agent_solver/types.hpp:14-57``).  Instead of Eigen typedefs and
``std::function`` aliases, problems are expressed as pure JAX functions over
``jax.Array`` values, and all trajectory data is **time-major**:

* ``State``              -- shape ``[nx]``
* ``Control``            -- shape ``[nu]``
* ``StateTrajectory``    -- shape ``[T+1, nx]``  (reference: ``nx x (T+1)`` column-major)
* ``ControlTrajectory``  -- shape ``[T, nu]``    (reference: ``nu x T``)

Time-major layout is the natural layout for ``lax.scan`` over the horizon and
for batching extra leading axes with ``vmap`` / ``shard_map``.

``SolverParams`` remains a plain ``{name: float}`` mapping for drop-in
compatibility with the reference's ``std::unordered_map<std::string,double>``
(``types.hpp:57``); solvers convert it into typed config dataclasses.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional

import jax

Array = jax.Array

# Functional interfaces (reference: types.hpp:21-38).  All are pure functions.
#   MotionModel:          f(x, u) -> dx/dt          (continuous-time dynamics)
#   StageCostFunction:    l(x, u, t) -> scalar      (t is an int32 time index)
#   TerminalCostFunction: lT(x) -> scalar
#   ObjectiveFunction:    J(X, U) -> scalar         (X: [T+1,nx], U: [T,nu])
#   ConstraintsFunction:  g(x, u) -> [m]            (per-stage residual vector)
MotionModel = Callable[[Array, Array], Array]
StageCostFunction = Callable[[Array, Array, Array], Array]
TerminalCostFunction = Callable[[Array], Array]
ObjectiveFunction = Callable[[Array, Array], Array]
ConstraintsFunction = Callable[[Array, Array], Array]

# Whole-horizon control gradient (reference: ControlGradient / GradientComputer,
# types.hpp:18,54-56): dJ/dU with U time-major [T, nu].
ControlGradient = Array
GradientComputer = Callable[[Array, Array, MotionModel, ObjectiveFunction, float], Array]

SolverParams = Mapping[str, float]


def get_param(params: SolverParams, key: str, default: Optional[float] = None) -> float:
    """Look up ``key`` in a reference-style parameter map.

    Mirrors the required-key ``params.at(...)`` behaviour of the reference
    solvers (``ilqr.hpp:42-44``): raises ``KeyError`` when ``default`` is None
    and the key is missing; otherwise returns the default.
    """
    if key in params:
        return float(params[key])
    if default is None:
        raise KeyError(f"required solver parameter '{key}' missing")
    return default


def param_flag(params: SolverParams, key: str) -> bool:
    """Boolean flag semantics of the reference: present and > 0.5 (ilqr.hpp:45)."""
    return key in params and float(params[key]) > 0.5


class Colors:
    """ANSI color codes (reference: types.hpp:60-66)."""

    RED = "\033[31m"
    GREEN = "\033[32m"
    YELLOW = "\033[33m"
    BLUE = "\033[34m"
    RESET = "\033[0m"


def print_color(text: str, color: str = Colors.RESET) -> None:
    print(f"{color}{text}{Colors.RESET}")
