"""Dynamics model library (pure JAX functions + analytic Jacobians)."""

from .pendulum import pendulum_dynamics, pendulum_state_jacobian, pendulum_control_jacobian
from .rocket import (
    RocketParameters,
    make_rocket_dynamics,
    make_rocket_state_jacobian,
    make_rocket_control_jacobian,
)
from .single_track import (
    single_track_model,
    single_track_state_jacobian,
    single_track_control_jacobian,
)
from .cartpole import (
    cartpole_dynamics,
    cartpole_swing_up_stage_cost,
    cartpole_swing_up_terminal_cost,
)
from .dynamic_bicycle import dynamic_bicycle_model
from .quadrotor import quadrotor_dynamics, HOVER_THRUST
from .quadrotor_rotor import quadrotor_rotor_dynamics, HOVER_ROTOR_THRUST
from .lqr import make_linear_dynamics, quadratic_stage_cost, quadratic_terminal_cost

__all__ = [
    "pendulum_dynamics",
    "pendulum_state_jacobian",
    "pendulum_control_jacobian",
    "RocketParameters",
    "make_rocket_dynamics",
    "make_rocket_state_jacobian",
    "make_rocket_control_jacobian",
    "cartpole_dynamics",
    "cartpole_swing_up_stage_cost",
    "cartpole_swing_up_terminal_cost",
    "dynamic_bicycle_model",
    "quadrotor_dynamics",
    "HOVER_THRUST",
    "quadrotor_rotor_dynamics",
    "HOVER_ROTOR_THRUST",
    "single_track_model",
    "single_track_state_jacobian",
    "single_track_control_jacobian",
    "make_linear_dynamics",
    "quadratic_stage_cost",
    "quadratic_terminal_cost",
]
