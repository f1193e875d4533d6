"""Multi-agent solution container (reference: solution.hpp:9-15)."""

from __future__ import annotations

import dataclasses
from typing import List

from .types import Array


@dataclasses.dataclass
class Solution:
    """Per-agent trajectories and costs plus the total."""

    states: List[Array] = dataclasses.field(default_factory=list)    # each [T+1, nx]
    controls: List[Array] = dataclasses.field(default_factory=list)  # each [T, nu]
    costs: List[float] = dataclasses.field(default_factory=list)
    total_cost: float = 0.0
