"""CSV stdout trajectory protocol, byte-compatible with the reference.

Reference: ``examples/example_utils.hpp:123-167``.  Sections look like::

    <base>_states
    time,x0,x1,...
    0,0,1,0,0
    0.1,...
    <blank line>

``<base>_controls`` likewise with ``u0,u1,...`` headers.  One row per
timestep at ``t = index * dt`` (or the raw index when dt <= 0).  The
downstream scripts (``plot_example.py``, ``animate_example.py``,
``compare_solvers.py``) parse exactly this format.
"""

from __future__ import annotations

import sys
from typing import IO, Optional

import numpy as np


def _format_value(v: float) -> str:
    """Match C++ ostream default formatting (6 significant digits)."""
    return f"{v:.6g}"


def print_state_trajectory(stream: Optional[IO], states, dt: float, label: str) -> None:
    """``<label>_states`` section (example_utils.hpp:123-145).

    ``states`` is time-major ``[T+1, nx]``.
    """
    stream = stream or sys.stdout
    states = np.asarray(states)
    if states.size == 0:
        return
    stream.write(f"{label}_states\n")
    stream.write("time" + "".join(f",x{i}" for i in range(states.shape[1])) + "\n")
    for idx, row in enumerate(states):
        t = idx * dt if dt > 0.0 else float(idx)
        stream.write(
            _format_value(t) + "".join("," + _format_value(v) for v in row) + "\n"
        )
    stream.write("\n")


def print_control_trajectory(stream: Optional[IO], controls, dt: float, label: str) -> None:
    """``<label>_controls`` section (example_utils.hpp:148-167)."""
    stream = stream or sys.stdout
    controls = np.asarray(controls)
    if controls.size == 0:
        return
    stream.write(f"{label}_controls\n")
    stream.write("time" + "".join(f",u{i}" for i in range(controls.shape[1])) + "\n")
    for idx, row in enumerate(controls):
        t = idx * dt if dt > 0.0 else float(idx)
        stream.write(_format_value(t) + "".join(
            "," + _format_value(v) for v in row
        ) + "\n")
    stream.write("\n")
