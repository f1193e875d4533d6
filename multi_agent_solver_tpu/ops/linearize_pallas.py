"""Pallas TPU kernel: fused whole-horizon linearization via in-kernel AD.

Computes every stage's dynamics Jacobians (A, B) and cost derivatives
(lx, lu, lxx, luu, lux) for all (problem, timestep) pairs in ONE launch.
There is no sequential dependency, so the grid is a flat tiling of
``B * T`` lanes packed into ``(8, 128)`` register tiles.

Derivatives are **forward-mode AD traced inside the kernel**: columns of A/B
come from ``jax.jvp`` of the (lane-traced) dynamics or RK4 step map against
lane-shaped basis tangents, gradients from jvps of the stage cost, and
Hessians from nested jvp-over-jvp -- all of which lower to pure elementwise
arithmetic.  For the smooth analytic-Jacobian problems in this framework the
results are bit-comparable to the user-supplied oracles.

Requires lane-traceable dynamics and stage cost (see
forward_pallas.spec_supports_lane_forward); callers fall back to the vmapped
XLA linearizer otherwise.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Array

SUB, LANE = 8, 128
TILE = SUB * LANE


def _basis(n: int, j: int, like: Array) -> Array:
    """Lane-shaped basis vector e_j of length n (no scatter ops)."""
    zeros = jnp.zeros_like(like[0])
    ones = jnp.ones_like(like[0])
    return jnp.stack([ones if i == j else zeros for i in range(n)], axis=0)


def _make_kernel(nx, nu, dt, dynamics, stage_cost, discrete: bool,
                 has_context: bool = False, hessians: bool = True):
    def step_map(x, u):
        if not discrete:
            return dynamics(x, u)
        k1 = dynamics(x, u)
        k2 = dynamics(x + (0.5 * dt) * k1, u)
        k3 = dynamics(x + (0.5 * dt) * k2, u)
        k4 = dynamics(x + dt * k3, u)
        return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    def kernel(x_ref, u_ref, t_ref, *rest):
        if has_context:
            ctx_ref = rest[0]
            rest = rest[1:]
        if hessians:
            (A_out, B_out, lx_out, lu_out, lxx_out, luu_out, lux_out) = rest
        else:
            (A_out, B_out, lx_out, lu_out) = rest
        x = x_ref[0]          # [nx, 8, 128]
        u = u_ref[0]          # [nu, 8, 128]
        t = t_ref[0]          # [8, 128] float (cast of the int time index)
        lanes = jnp.zeros_like(t)   # broadcast helper: scalar costs -> lanes
        if has_context:
            ctx_t = ctx_ref[0]
            base_stage = stage_cost
            stage_cost_t = lambda a, b, tt: base_stage(a, b, tt, ctx_t)
        else:
            stage_cost_t = stage_cost

        # Dynamics Jacobians: one jvp per input column.
        for j in range(nx):
            _, col = jax.jvp(lambda xx: step_map(xx, u), (x,), (_basis(nx, j, x),))
            for i in range(nx):
                A_out[0, i, j] = col[i]
        for j in range(nu):
            _, col = jax.jvp(lambda uu: step_map(x, uu), (u,), (_basis(nu, j, u),))
            for i in range(nx):
                B_out[0, i, j] = col[i]

        # Cost gradients: jvp of the scalar stage cost.
        def lgrad_x(xx, uu, j):
            _, g = jax.jvp(lambda a: stage_cost_t(a, uu, t), (xx,), (_basis(nx, j, x),))
            return g + lanes

        def lgrad_u(xx, uu, j):
            _, g = jax.jvp(lambda a: stage_cost_t(xx, a, t), (uu,), (_basis(nu, j, u),))
            return g + lanes

        for j in range(nx):
            lx_out[0, j] = lgrad_x(x, u, j)
        for j in range(nu):
            lu_out[0, j] = lgrad_u(x, u, j)

        if not hessians:
            # Quadratic-cost hoisting (solvers/ilqr.py fused path): the
            # Hessian stacks are trajectory-independent and were computed
            # once before the iteration loop -- skip their nested-jvp chains
            # AND their 28-of-58 share of the output blocks entirely.
            return

        # Hessians: jvp of the gradient (forward-over-forward).
        for i in range(nx):
            for j in range(i, nx):
                _, h = jax.jvp(
                    lambda a: lgrad_x(a, u, i), (x,), (_basis(nx, j, x),)
                )
                lxx_out[0, i, j] = h + lanes
                if i != j:
                    lxx_out[0, j, i] = h + lanes
        for i in range(nu):
            for j in range(i, nu):
                _, h = jax.jvp(
                    lambda a: lgrad_u(x, a, i), (u,), (_basis(nu, j, u),)
                )
                luu_out[0, i, j] = h + lanes
                if i != j:
                    luu_out[0, j, i] = h + lanes
        for i in range(nu):       # lux[i, j] = d^2 l / du_i dx_j
            for j in range(nx):
                _, h = jax.jvp(
                    lambda a: lgrad_u(a, u, i), (x,), (_basis(nx, j, x),)
                )
                lux_out[0, i, j] = h + lanes

    return kernel


def _to_lanes(x: Array, Lp: int):
    x = jnp.moveaxis(x, 0, -1)
    x = x.reshape(x.shape[:-1] + (Lp // TILE, SUB, LANE))
    return jnp.moveaxis(x, -3, 0)


def _from_lanes(x: Array, L: int):
    x = jnp.moveaxis(x, 0, -3)
    x = x.reshape(x.shape[:-3] + (-1,))
    return jnp.moveaxis(x, -1, 0)[:L]


def linearize_pallas_tiled(
    spec,
    xs_stage_l: Array,   # [nb, T, nx, 8, 128] stage states x_0..x_{T-1}, lane layout
    us_l: Array,         # [nb, T, nu, 8, 128]
    discrete: bool,
    interpret: bool = False,
    ctx_l: Array = None,  # [nb, T, C..., 8, 128] per-step cost context
    hessians: bool = True,
) -> Tuple[Array, ...]:
    """Whole-horizon linearization directly in the riccati/select lane layout.

    Same in-kernel forward-mode AD as :func:`linearize_pallas`, but the grid
    is ``(nb, T)`` with problems on the trailing ``(8, 128)`` lanes -- the
    SAME layout the fused Riccati kernel consumes -- so the fused iteration
    loop (solvers/ilqr.py fused path) passes stacks between kernels with
    zero layout conversions.  With ``ctx_l`` the stage cost is the 4-arg
    context form (inter-agent coupling); context is a constant w.r.t. the
    jvp tangents.  Outputs ``(A, B, lx, lu, lxx, luu, lux)``, each
    ``[nb, T, ..., 8, 128]``; with ``hessians=False`` only
    ``(A, B, lx, lu)`` (quadratic-cost hoisting -- the caller supplies
    precomputed Hessian stacks).
    """
    nb, T, nx = xs_stage_l.shape[:3]
    nu = us_l.shape[2]
    sub = xs_stage_l.shape[-2]      # 8, or a folded multiple of 8 (lane_fold)
    has_context = ctx_l is not None
    kernel = _make_kernel(nx, nu, spec.dt, spec.dynamics, spec.stage_cost,
                          discrete, has_context=has_context,
                          hessians=hessians)

    # Reuse the flat kernel body: block index (b, t) feeds one (8, 128) tile.
    tspec = lambda *inner: pl.BlockSpec(
        (1, 1) + inner + (sub, LANE),
        lambda b, t: (b, t) + (0,) * len(inner) + (0, 0),
        memory_space=pltpu.VMEM,
    )

    def kernel2(*refs):
        # Adapt refs: _make_kernel indexes [0, ...]; here blocks are [1, 1, ...].
        class _View:
            def __init__(self, ref):
                self.ref = ref
            def __getitem__(self, idx):
                return self.ref[(0,) + (idx if isinstance(idx, tuple) else (idx,))]
            def __setitem__(self, idx, val):
                # Interpret-mode CPU x64 can promote cost tangents to f64;
                # the output refs are always f32.
                val = jnp.asarray(val, jnp.float32)
                self.ref[(0,) + (idx if isinstance(idx, tuple) else (idx,))] = val
        kernel(*map(_View, refs))

    t_l = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.float32)[None, :, None, None], (nb, T, sub, LANE)
    )
    ctx_inputs, ctx_specs = [], []
    if has_context:
        ctx_inputs.append(ctx_l.astype(jnp.float32))
        ctx_specs.append(tspec(*tuple(ctx_l.shape[2:-2])))
    out_specs = [tspec(nx, nx), tspec(nx, nu), tspec(nx), tspec(nu)]
    out_shape = [
        jax.ShapeDtypeStruct((nb, T, nx, nx, sub, LANE), jnp.float32),
        jax.ShapeDtypeStruct((nb, T, nx, nu, sub, LANE), jnp.float32),
        jax.ShapeDtypeStruct((nb, T, nx, sub, LANE), jnp.float32),
        jax.ShapeDtypeStruct((nb, T, nu, sub, LANE), jnp.float32),
    ]
    if hessians:
        out_specs += [tspec(nx, nx), tspec(nu, nu), tspec(nu, nx)]
        out_shape += [
            jax.ShapeDtypeStruct((nb, T, nx, nx, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, T, nu, nu, sub, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, T, nu, nx, sub, LANE), jnp.float32),
        ]
    outs = pl.pallas_call(
        kernel2,
        grid=(nb, T),
        in_specs=[tspec(nx), tspec(nu), tspec()] + ctx_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(xs_stage_l.astype(jnp.float32), us_l.astype(jnp.float32), t_l, *ctx_inputs)
    return tuple(outs)


def terminal_derivs_tiled(spec, xT_l: Array, interpret: bool = False):
    """In-kernel terminal cost gradient/Hessian on lane-layout states.

    ``xT_l [nb, nx, 8, 128]`` -> ``(phix [nb, nx, 8, 128],
    phixx [nb, nx, nx, 8, 128])`` (symmetrized), via the same
    forward-over-forward jvp machinery as the stage linearizer.
    """
    nb, nx = xT_l.shape[:2]
    terminal = spec.terminal_cost

    def kernel(x_ref, gx_out, hxx_out):
        x = x_ref[0]
        lanes = jnp.zeros_like(x[0])   # broadcast helper: scalar costs -> lanes

        def grad_j(xx, j):
            _, g = jax.jvp(terminal, (xx,), (_basis(nx, j, x),))
            return jnp.asarray(g + lanes, jnp.float32)

        for j in range(nx):
            gx_out[0, j] = grad_j(x, j)
        for i in range(nx):
            for j in range(i, nx):
                _, h = jax.jvp(lambda a: grad_j(a, i), (x,), (_basis(nx, j, x),))
                hxx_out[0, i, j] = jnp.asarray(h + lanes, jnp.float32)
                if i != j:
                    hxx_out[0, j, i] = jnp.asarray(h + lanes, jnp.float32)

    cspec = lambda *inner: pl.BlockSpec(
        (1,) + inner + (SUB, LANE),
        lambda b: (b,) + (0,) * len(inner) + (0, 0),
        memory_space=pltpu.VMEM,
    )
    gx, hxx = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[cspec(nx)],
        out_specs=[cspec(nx), cspec(nx, nx)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, nx, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nb, nx, nx, SUB, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(xT_l.astype(jnp.float32))
    return gx, hxx


def linearize_pallas(
    spec,
    xs: Array,    # [B, T+1, nx]
    us: Array,    # [B, T, nu]
    discrete: bool,
    interpret: bool = False,
) -> Tuple[Array, ...]:
    """Returns (A, B, lx, lu, lxx, luu, lux), each ``[B, T, ...]``."""
    B, Tp1, nx = xs.shape
    T = Tp1 - 1
    nu = us.shape[-1]
    L = B * T
    pad = (-L) % TILE
    Lp = L + pad

    def flat(arr):  # [B, T, d...] -> [L, d...]
        return arr.reshape((L,) + arr.shape[2:])

    def padded(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
        return x.astype(jnp.float32)

    x_l = _to_lanes(padded(flat(xs[:, :-1])), Lp)
    u_l = _to_lanes(padded(flat(us)), Lp)
    ts = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32)[None], (B, T))
    t_l = _to_lanes(padded(flat(ts)), Lp)

    nl = Lp // TILE
    kernel = _make_kernel(nx, nu, spec.dt, spec.dynamics, spec.stage_cost, discrete)

    cspec = lambda *inner: pl.BlockSpec(
        (1,) + inner + (SUB, LANE),
        lambda b: (b,) + (0,) * len(inner) + (0, 0),
        memory_space=pltpu.VMEM,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nl,),
        in_specs=[cspec(nx), cspec(nu), cspec()],
        out_specs=[
            cspec(nx, nx), cspec(nx, nu), cspec(nx), cspec(nu),
            cspec(nx, nx), cspec(nu, nu), cspec(nu, nx),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nl, nx, nx, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nl, nx, nu, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nl, nx, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nl, nu, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nl, nx, nx, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nl, nu, nu, SUB, LANE), jnp.float32),
            jax.ShapeDtypeStruct((nl, nu, nx, SUB, LANE), jnp.float32),
        ],
        interpret=interpret,
    )(x_l, u_l, t_l)

    def unflat(arr, inner):
        return _from_lanes(arr, L).reshape((B, T) + inner)

    A = unflat(outs[0], (nx, nx))
    Bm = unflat(outs[1], (nx, nu))
    lx = unflat(outs[2], (nx,))
    lu = unflat(outs[3], (nu,))
    lxx = unflat(outs[4], (nx, nx))
    luu = unflat(outs[5], (nu, nu))
    lux = unflat(outs[6], (nu, nx))
    return A, Bm, lx, lu, lxx, luu, lux
