"""Per-kernel timing of the lane-resident fused iLQR loop on the TPU.

Times the kernel launches of one fused iteration in isolation plus the
full 10-iteration solve, with chained distinct inputs (the tunnel caches
repeated identical calls).  This is the tool that decides which kernel to
optimize next; env B sets the batch (default 32768).

Two configurations (env STATIONARY):

* ``STATIONARY=0`` -- the round-2/3 path: separate linearize /
  Riccati-with-terminal / forward-select launches per iteration.
* ``STATIONARY=1`` (default; the production bench.py config since round 4)
  -- the stationary-fusedlin path: ONE riccati_fusedlin launch
  (linearizes in-kernel, reads (x, u) + time-constant Hessian blocks)
  plus the forward-select launch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_cpu_prefer_vector_width" not in _flags:
    os.environ["XLA_FLAGS"] = f"{_flags} --xla_cpu_prefer_vector_width=128".strip()

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _single_track_spec
from multi_agent_solver_tpu.solvers.ilqr import (
    ILQRConfig,
    _alpha_ladder_floats,
    solve_ilqr_batched,
)
from multi_agent_solver_tpu.ops.forward_select_pallas import (
    LANE, SUB, TILE, _to_lanes, forward_select_pallas_tiled,
)
from multi_agent_solver_tpu.ops.linearize_pallas import linearize_pallas_tiled
from multi_agent_solver_tpu.ops.riccati_pallas import riccati_backward_pallas_tiled

B = int(os.environ.get("B", "32768"))
REPS = int(os.environ.get("REPS", "10"))
# Production defaults (bench.py): lane fold 8, short 3-rung ladder.  Set
# FOLD=1 / LADDER=full for the round-2 configuration.
FOLD = int(os.environ.get("FOLD", "8"))
LADDER = os.environ.get("LADDER", "short")

spec = _single_track_spec(dtype=jnp.float32)
config = ILQRConfig(max_iterations=10, tolerance=1e-5,
                    alpha_ladder=(1.0, 0.5, 0.125) if LADDER == "short" else None,
                    lane_fold=FOLD)
T, nx, nu = spec.horizon_steps, spec.state_dim, spec.control_dim
SUBL = SUB * FOLD
nb = B // (SUBL * LANE)
assert nb > 0, "B must be >= FOLD * 1024"
f32 = jnp.float32

rng = np.random.RandomState(0)
x0 = np.zeros((B, 4), np.float32)
x0[:, 1] = rng.uniform(0.5, 1.5, B)
x0 = jnp.asarray(x0)

pack = lambda arr: _to_lanes(arr.astype(f32), B, SUBL)
x0_l = pack(x0)
us_l = jnp.zeros((nb, T, nu, SUBL, LANE), f32)
lb_l = pack(jnp.broadcast_to(spec.input_lower_bounds, (B, nu)))
ub_l = pack(jnp.broadcast_to(spec.input_upper_bounds, (B, nu)))
alphas = (
    (1.0, 0.5, 0.125) if LADDER == "short"
    else _alpha_ladder_floats(config.alpha_min)
)
vxx_dummy = jnp.zeros((nb, nx, nx, SUBL, LANE), f32)

# A plausible mid-solve trajectory: roll the initial controls.
x0_bc = jnp.broadcast_to(x0_l[:, None], (nb, T, nx, SUBL, LANE))
zk = jnp.zeros((nb, T, nu, SUBL, LANE), f32)
zK = jnp.zeros((nb, T, nu, nx, SUBL, LANE), f32)
spec_nb = spec.replace(input_lower_bounds=None, input_upper_bounds=None)
xs_tail_l, _, obj_l, _ = jax.jit(
    lambda xb: forward_select_pallas_tiled(
        spec_nb, jnp.broadcast_to(xb[:, None], (nb, T, nx, SUBL, LANE)), us_l,
        zk, zK, jnp.full((nb, SUBL, LANE), jnp.inf, f32), lb_l, ub_l,
        (0.0,), False,
    )
)(x0_l)
xs_stage_l = jnp.concatenate([x0_l[:, None], xs_tail_l[:, :-1]], axis=1)


def timeit(name, fn, *args, perturb_idx=0):
    # NOTE: every large array must be an ARGUMENT of fn, not a closure
    # capture -- captured arrays are baked into the program as constants and
    # the remote-compile request blows past the tunnel's size limit (413).
    """Chained-input timing: arg[perturb_idx] is nudged by a scalar derived
    from the previous rep's output."""
    jitted = jax.jit(fn)
    out = jitted(*args)
    acc = jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0] * 1e-20
    float(acc)
    times = []
    for _ in range(REPS):
        newargs = list(args)
        newargs[perturb_idx] = args[perturb_idx] + acc
        t0 = time.perf_counter()
        out = jitted(*newargs)
        acc = jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0] * 1e-20
        float(acc)
        times.append(time.perf_counter() - t0)
    ms = float(np.median(times)) * 1e3
    print(f"{name:38s} {ms:9.2f} ms")
    return out, ms


STATIONARY = os.environ.get("STATIONARY", "1") == "1"

if STATIONARY:
    from multi_agent_solver_tpu.ops.riccati_pallas import (
        riccati_fusedlin_pallas_tiled,
    )

    # Time-constant Hessian blocks, hoisted once like the fused loop does.
    hess_l = jax.jit(
        lambda x, u: linearize_pallas_tiled(spec, x, u, True, False)[4:]
    )(x0_l[:, None], us_l[:, :1])

    def _fusedlin(xs_stage, us, xs_tail, *hess):
        return riccati_fusedlin_pallas_tiled(
            xs_stage, us, *hess, xs_tail[:, -1],
            dynamics=spec.dynamics, stage_cost=spec.stage_cost,
            terminal_fn=spec.terminal_cost, dt=spec.dt, discrete=True,
            reg_init=config.reg_init, reg_factor=config.reg_factor,
            reg_levels=config.reg_levels, interpret=False,
        )

    (k_l, K_l), t_ric = timeit(
        "riccati_fusedlin_pallas_tiled", _fusedlin,
        xs_stage_l, us_l, xs_tail_l, *hess_l,
    )
    t_lin = 0.0
else:
    lin, t_lin = timeit(
        "linearize_pallas_tiled",
        lambda xs, us: linearize_pallas_tiled(spec, xs, us, True, False),
        xs_stage_l, us_l,
    )

    def _riccati(xs, *lin_args):
        return riccati_backward_pallas_tiled(
            *lin_args, xs[:, -1], vxx_dummy,
            reg_init=config.reg_init, reg_factor=config.reg_factor,
            reg_levels=config.reg_levels, interpret=False,
            terminal_fn=spec.terminal_cost,
        )

    (k_l, K_l), t_ric = timeit(
        "riccati_backward_pallas_tiled", _riccati, xs_tail_l, *lin
    )


def _select(xs_stage, us, k, K, merit):
    return forward_select_pallas_tiled(
        spec, xs_stage, us, k, K, merit, lb_l, ub_l, alphas, False
    )


_, t_sel = timeit(
    f"forward_select_pallas_tiled ({len(alphas) + 1} rolls)", _select,
    xs_stage_l, us_l, k_l, K_l, obj_l,
)

per_iter = t_lin + t_ric + t_sel
print(f"{'sum of one iteration':38s} {per_iter:9.2f} ms")


def _full(xb):
    specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(xb)
    return solve_ilqr_batched(specs, config).cost


_, t_full = timeit("full fused solve (10 iters)", _full, x0)
print(f"{'implied glue + tile/untile':38s} {t_full - 10 * per_iter:9.2f} ms")
print(f"batch={B} solves/s={B / (t_full / 1e3):.0f}")
