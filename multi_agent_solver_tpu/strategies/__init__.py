"""Multi-agent coordination strategies (centralized + Nash best-response).

The analogue of the reference's ``strategies/strategy.hpp`` variant +
visitor: ``make_strategy(name, solver, params, max_outer)`` constructs by
canonical name; ``solve(strategy, problem)`` runs it.
"""

from .base import (
    available_strategy_names,
    canonical_strategy_name,
    collect_solution,
    make_strategy,
    register_strategy,
    solve,
)
from .centralized import CentralizedStrategy
from .nash import (
    LineSearchNashStrategy,
    SequentialNashStrategy,
    TrustRegionNashStrategy,
)

__all__ = [
    "available_strategy_names",
    "canonical_strategy_name",
    "collect_solution",
    "make_strategy",
    "register_strategy",
    "solve",
    "CentralizedStrategy",
    "LineSearchNashStrategy",
    "SequentialNashStrategy",
    "TrustRegionNashStrategy",
]
