"""Pallas TPU kernel: fused iLQR forward pass (all line-search alphas).

The XLA forward pass costs ~0.5 ms per horizon step at batch 4096 because
each RK4 stage, feedback update, clamp and stage-cost evaluation becomes a
separate tiny kernel inside the scan.  This kernel runs the entire feedback
rollout -- every candidate alpha of every problem as one vector lane -- in a
single launch:

* grid ``(lane_tiles, T)``: the sequential TPU grid is the time axis;
* per-(alpha, problem) lanes pack into ``(8, 128)`` register tiles;
* the carry (current state, accumulated cost) lives in VMEM scratch;
* **the user's dynamics and cost functions are traced directly inside the
  kernel** on lane-shaped states ``x[nx, 8, 128]``: any function built from
  indexing + elementwise jnp ops (every model in this framework, and most
  OCPs) vectorizes unchanged.  Lane-traceability is probed once at trace
  time with ``jax.eval_shape``; incompatible problems fall back to the XLA
  path automatically.

The same kernel performs plain rollouts (alpha = 0, zero gains).
Constrained problems (AL merit terms) currently use the XLA forward pass.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Array

SUB, LANE = 8, 128
TILE = SUB * LANE


def lane_traceable(fn: Callable, arg_shapes, out_shape) -> bool:
    """True when ``fn`` evaluates correctly on lane-shaped ``[dim, 8, 128]``
    arguments (indexing + elementwise functions do; matrix-algebra ones don't).
    """
    try:
        args = [
            jax.ShapeDtypeStruct(tuple(s) + (SUB, LANE), jnp.float32)
            for s in arg_shapes
        ]
        out = jax.eval_shape(fn, *args)
        expected = tuple(out_shape) + (SUB, LANE)
        if tuple(out.shape) == expected:
            return True
        # Scalar-valued costs (e.g. a constant terminal cost) broadcast
        # against lane arrays inside the kernel.
        return out_shape == () and tuple(out.shape) == ()
    except Exception:
        return False


def spec_supports_lane_forward(spec, context_inner=None) -> bool:
    """Probe dynamics/stage/terminal for lane tracing.

    ``context_inner``: inner shape of the per-stage context (e.g. ``(N-1,
    nx)`` for coupled Nash) when the spec carries one; the stage cost is then
    probed with a lane-shaped context argument.
    """
    nx, nu = spec.state_dim, spec.control_dim
    # AL-constrained problems are supported when the constraint functions
    # themselves lane-trace (small residual dims).
    for cons, dim in ((spec.equality_constraints, spec.eq_dim),
                      (spec.inequality_constraints, spec.ineq_dim)):
        if dim > 0:
            if dim > 8 or not lane_traceable(cons, [(nx,), (nu,)], (dim,)):
                return False
    if spec.context is not None and context_inner is None:
        return False
    if context_inner is not None:
        # Context blocks stream per grid step as [*inner, 8, 128] f32 tiles
        # (double-buffered); keep them well under the ~16 MB VMEM budget.
        elems = 1
        for d in context_inner:
            elems *= d
        if elems * TILE * 4 > 2 * 1024 * 1024:
            return False
    dyn_ok = lane_traceable(spec.dynamics, [(nx,), (nu,)], (nx,))
    if context_inner is not None:
        stage_ok = lane_traceable(
            lambda x, u, c: spec.stage_cost(x, u, jnp.asarray(0), c),
            [(nx,), (nu,), tuple(context_inner)], (),
        )
    else:
        stage_ok = lane_traceable(
            lambda x, u: spec.stage_cost(x, u, jnp.asarray(0)), [(nx,), (nu,)], ()
        )
    term_ok = lane_traceable(spec.terminal_cost, [(nx,)], ())
    return dyn_ok and stage_ok and term_ok


def _make_kernel(T, nx, nu, dt, dynamics, stage_cost, terminal_cost, has_bounds):
    def rk4(x, u):
        k1 = dynamics(x, u)
        k2 = dynamics(x + (0.5 * dt) * k1, u)
        k3 = dynamics(x + (0.5 * dt) * k2, u)
        k4 = dynamics(x + dt * k3, u)
        return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    def kernel(xref_ref, uref_ref, k_ref, K_ref, alpha_ref, x0_ref,
               lb_ref, ub_ref, xs_out, us_out, cost_out, x_s, cost_s):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            x_s[...] = x0_ref[0]
            cost_s[...] = jnp.zeros((SUB, LANE), jnp.float32)

        x = x_s[...]                      # [nx, 8, 128]
        x_ref = xref_ref[0, 0]            # [nx, 8, 128]
        u_ref = uref_ref[0, 0]            # [nu, 8, 128]
        k_t = k_ref[0, 0]                 # [nu, 8, 128]
        K_t = K_ref[0, 0]                 # [nu, nx, 8, 128]
        alpha = alpha_ref[0]              # [8, 128]

        dx = x - x_ref
        u_rows = []
        for i in range(nu):
            feedback = sum(K_t[i, j] * dx[j] for j in range(nx))
            u_i = u_ref[i] + alpha * k_t[i] + feedback
            if has_bounds:                # ilqr.hpp:213-214 per-step clamp
                u_i = jnp.minimum(jnp.maximum(u_i, lb_ref[0, i]), ub_ref[0, i])
            u_rows.append(u_i)
        u = jnp.stack(u_rows, axis=0)     # [nu, 8, 128]

        # astype guards: user cost/dynamics functions may upcast to f64 under
        # jax_enable_x64 (e.g. via result_type(float)); refs are f32.
        f32 = jnp.float32
        cost_s[...] = (cost_s[...] + stage_cost(x, u, t)).astype(f32)
        x_next = rk4(x, u).astype(f32)

        xs_out[0, 0] = x_next
        us_out[0, 0] = u.astype(f32)
        x_s[...] = x_next

        @pl.when(t == T - 1)
        def _():
            cost_out[0] = (cost_s[...] + terminal_cost(x_next)).astype(f32)

    return kernel


@functools.partial(jax.jit, static_argnames=("spec_static", "interpret"))
def _forward_lanes(spec_static, xref, uref, k, K, alpha, x0, lb, ub, interpret):
    """All arrays lane-tiled: leading dim nl (lane tiles), trailing (8, 128)."""
    T, nx, nu, dt, dynamics, stage_cost, terminal_cost, has_bounds = spec_static
    nl = x0.shape[0]

    kernel = _make_kernel(T, nx, nu, dt, dynamics, stage_cost, terminal_cost, has_bounds)

    tspec = lambda *inner: pl.BlockSpec(
        (1, 1) + inner + (SUB, LANE),
        lambda b, t: (b, t) + (0,) * len(inner) + (0, 0),
        memory_space=pltpu.VMEM,
    )
    cspec = lambda *inner: pl.BlockSpec(
        (1,) + inner + (SUB, LANE),
        lambda b, t: (b,) + (0,) * len(inner) + (0, 0),
        memory_space=pltpu.VMEM,
    )

    xs, us, cost = pl.pallas_call(
        kernel,
        grid=(nl, T),
        in_specs=[
            tspec(nx), tspec(nu), tspec(nu), tspec(nu, nx),
            cspec(), cspec(nx), cspec(nu), cspec(nu),
        ],
        out_specs=[tspec(nx), tspec(nu), cspec()],
        out_shape=[
            jax.ShapeDtypeStruct((nl, T, nx, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nl, T, nu, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nl, SUB, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, SUB, LANE), jnp.float32),
            pltpu.VMEM((SUB, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(xref, uref, k, K, alpha, x0, lb, ub)
    return xs, us, cost


def _to_lanes(x: Array, n_lanes_total: int):
    """[L, rest...] -> [nl, rest..., 8, 128]"""
    x = jnp.moveaxis(x, 0, -1)
    x = x.reshape(x.shape[:-1] + (n_lanes_total // TILE, SUB, LANE))
    return jnp.moveaxis(x, -3, 0)


def _from_lanes(x: Array, L: int):
    """[nl, rest..., 8, 128] -> [L, rest...]"""
    x = jnp.moveaxis(x, 0, -3)
    x = x.reshape(x.shape[:-3] + (-1,))
    return jnp.moveaxis(x, -1, 0)[:L]


def forward_pass_pallas(
    spec,
    xs: Array,        # [B, T+1, nx] reference trajectory
    us: Array,        # [B, T, nu] reference controls
    k: Array,         # [B, T, nu]
    K: Array,         # [B, T, nu, nx]
    alphas: Array,    # [A] candidate step sizes
    interpret: bool = False,
) -> Tuple[Array, Array, Array]:
    """All-alpha batched feedback rollout.

    Returns ``xs_cand [B, A, T+1, nx]``, ``us_cand [B, A, T, nu]``,
    ``costs [B, A]`` (total objective of each candidate).
    """
    B, Tp1, nx = xs.shape
    T = Tp1 - 1
    nu = us.shape[-1]
    A = alphas.shape[0]
    L = B * A
    pad = (-L) % TILE
    Lp = L + pad

    dtype = jnp.float32
    rep = lambda x: jnp.broadcast_to(x[:, None], (B, A) + x.shape[1:]).reshape(
        (L,) + x.shape[1:]
    )

    def padded(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            )
        return x.astype(dtype)

    def pack(arr):  # [L, T, d...] -> [nl, T, d..., 8, 128]
        return _to_lanes(padded(arr), Lp)

    xref_l = pack(rep(xs[:, :-1]))
    uref_l = pack(rep(us))
    k_l = pack(rep(k))
    K_l = pack(rep(K))
    alpha_l = _to_lanes(padded(jnp.tile(alphas, (B,)).reshape(L)), Lp)    # [nl,8,128]
    x0_l = _to_lanes(padded(rep(xs[:, 0])), Lp)                            # [nl,nx,8,128]

    has_bounds = spec.has_input_bounds
    if has_bounds:
        lb = jnp.broadcast_to(spec.input_lower_bounds, (B, nu))
        ub = jnp.broadcast_to(spec.input_upper_bounds, (B, nu))
    else:
        lb = jnp.zeros((B, nu), dtype)
        ub = jnp.zeros((B, nu), dtype)
    lb_l = _to_lanes(padded(rep(lb)), Lp)
    ub_l = _to_lanes(padded(rep(ub)), Lp)

    spec_static = (
        T, nx, nu, spec.dt, spec.dynamics, spec.stage_cost, spec.terminal_cost,
        has_bounds,
    )
    xs_l, us_l, cost_l = _forward_lanes(
        spec_static, xref_l, uref_l, k_l, K_l, alpha_l, x0_l, lb_l, ub_l, interpret
    )

    xs_tail = _from_lanes(xs_l, L).reshape(B, A, T, nx)
    us_cand = _from_lanes(us_l, L).reshape(B, A, T, nu)
    costs = _from_lanes(cost_l, L).reshape(B, A)

    x0_cand = jnp.broadcast_to(xs[:, None, :1], (B, A, 1, nx))
    xs_cand = jnp.concatenate([x0_cand, xs_tail], axis=2)
    return xs_cand.astype(xs.dtype), us_cand.astype(us.dtype), costs.astype(xs.dtype)


def rollout_pallas(spec, x0: Array, us: Array, interpret: bool = False):
    """Plain batched rollout + cost via the same kernel (alpha=0, zero gains).

    Returns ``xs [B, T+1, nx]``, ``costs [B]``.
    """
    B, T, nu = us.shape
    nx = x0.shape[-1]
    zeros_k = jnp.zeros((B, T, nu), jnp.float32)
    zeros_K = jnp.zeros((B, T, nu, nx), jnp.float32)
    xs_ref = jnp.broadcast_to(x0[:, None, :], (B, T + 1, nx))
    # Plain rollouts never clamp (reference: integrate_horizon applies raw
    # controls) -- drop the bounds so the kernel's clamp is disabled.
    unbounded = spec.replace(input_lower_bounds=None, input_upper_bounds=None)
    xs_cand, us_cand, costs = forward_pass_pallas(
        unbounded, xs_ref, us, zeros_k, zeros_K, jnp.zeros((1,), jnp.float32),
        interpret=interpret,
    )
    return xs_cand[:, 0], costs[:, 0]
