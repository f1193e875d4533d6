"""Multi-start solving: race random warm starts as batch lanes, keep the best.

Nonconvex problems (the pendulum swing-up is the reference's showcase,
pendulum_swing_up.cpp:29-152) trap local-descent solvers in poor basins; the
reference mitigates with a single hand-tuned sinusoidal initial guess.  On
TPU, solving N initial guesses costs barely more than one -- they are batch
lanes of the same compiled program -- so multi-start is the idiomatic fix.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ocp import OCPSpec
from ..solvers.base import SolveResult


def random_control_starts(
    key: jax.Array,
    spec: OCPSpec,
    n_starts: int,
    scale: Optional[float] = None,
    include_warm_start: bool = True,
) -> jax.Array:
    """Sample ``[n_starts, T, nu]`` smooth random control initializations.

    Sinusoids with random amplitude/frequency/phase per control channel
    (generalizing the reference's symmetry-breaking sinusoid,
    pendulum_swing_up.cpp:110-115).  Amplitudes default to 40% of the input
    range (or ``scale``).  Lane 0 keeps the spec's own warm start when
    ``include_warm_start`` so multi-start never does worse.
    """
    T, nu = spec.initial_controls.shape
    dtype = spec.initial_controls.dtype

    if scale is None:
        if spec.has_input_bounds:
            amp = 0.4 * (spec.input_upper_bounds - spec.input_lower_bounds) / 2.0
            center = (spec.input_upper_bounds + spec.input_lower_bounds) / 2.0
        else:
            amp = jnp.ones((nu,), dtype)
            center = jnp.zeros((nu,), dtype)
    else:
        amp = jnp.full((nu,), scale, dtype)
        center = jnp.zeros((nu,), dtype)

    k_amp, k_freq, k_phase = jax.random.split(key, 3)
    amps = amp * jax.random.uniform(k_amp, (n_starts, 1, nu), dtype, 0.2, 1.0)
    freqs = jax.random.uniform(k_freq, (n_starts, 1, nu), dtype, 0.5, 3.0)
    phases = jax.random.uniform(k_phase, (n_starts, 1, nu), dtype, 0.0, 2.0 * jnp.pi)
    ts = (jnp.arange(T, dtype=dtype) * spec.dt)[None, :, None]
    starts = center + amps * jnp.sin(2.0 * jnp.pi * freqs * ts + phases)

    if include_warm_start:
        starts = starts.at[0].set(spec.initial_controls)
    return starts


def multistart_solve(
    solve_batched_fn: Callable[[OCPSpec], SolveResult],
    spec: OCPSpec,
    starts: jax.Array,
) -> SolveResult:
    """Solve every start as a batch lane and return the lowest-cost result."""
    n = starts.shape[0]
    specs = jax.tree_util.tree_map(
        lambda leaf: jnp.broadcast_to(leaf, (n,) + leaf.shape), spec
    ).replace(initial_controls=starts)
    results = solve_batched_fn(specs)
    best = jnp.argmin(results.cost)
    return jax.tree_util.tree_map(lambda leaf: leaf[best], results)


def multistart_solve_host(solver, problem, n_starts: int, seed: int = 0) -> SolveResult:
    """Host-level multi-start using a reference-style solver object: builds
    random starts, races them, and writes the best back into ``problem``
    (the same mutation contract as ``solver.solve``)."""
    spec = problem.spec()
    starts = random_control_starts(jax.random.PRNGKey(seed), spec, n_starts)
    solver_cls = type(solver)
    result = multistart_solve(
        lambda specs: solver_cls._solve_batched_fn(specs, solver.config),
        spec, starts,
    )
    problem.set_result(result.states, result.controls, result.cost)
    return result
