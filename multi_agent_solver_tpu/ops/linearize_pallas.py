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


def _make_kernel(nx, nu, dt, dynamics, stage_cost, discrete: bool):
    def step_map(x, u):
        if not discrete:
            return dynamics(x, u)
        k1 = dynamics(x, u)
        k2 = dynamics(x + (0.5 * dt) * k1, u)
        k3 = dynamics(x + (0.5 * dt) * k2, u)
        k4 = dynamics(x + dt * k3, u)
        return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    def kernel(x_ref, u_ref, t_ref, A_out, B_out, lx_out, lu_out,
               lxx_out, luu_out, lux_out):
        x = x_ref[0]          # [nx, 8, 128]
        u = u_ref[0]          # [nu, 8, 128]
        t = t_ref[0]          # [8, 128] float (cast of the int time index)

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
            _, g = jax.jvp(lambda a: stage_cost(a, uu, t), (xx,), (_basis(nx, j, x),))
            return g

        def lgrad_u(xx, uu, j):
            _, g = jax.jvp(lambda a: stage_cost(xx, a, t), (uu,), (_basis(nu, j, u),))
            return g

        for j in range(nx):
            lx_out[0, j] = lgrad_x(x, u, j)
        for j in range(nu):
            lu_out[0, j] = lgrad_u(x, u, j)

        # Hessians: jvp of the gradient (forward-over-forward).
        for i in range(nx):
            for j in range(i, nx):
                _, h = jax.jvp(
                    lambda a: lgrad_x(a, u, i), (x,), (_basis(nx, j, x),)
                )
                lxx_out[0, i, j] = h
                if i != j:
                    lxx_out[0, j, i] = h
        for i in range(nu):
            for j in range(i, nu):
                _, h = jax.jvp(
                    lambda a: lgrad_u(x, a, i), (u,), (_basis(nu, j, u),)
                )
                luu_out[0, i, j] = h
                if i != j:
                    luu_out[0, j, i] = h
        for i in range(nu):       # lux[i, j] = d^2 l / du_i dx_j
            for j in range(nx):
                _, h = jax.jvp(
                    lambda a: lgrad_u(a, u, i), (x,), (_basis(nx, j, x),)
                )
                lux_out[0, i, j] = h

    return kernel


def _to_lanes(x: Array, Lp: int):
    x = jnp.moveaxis(x, 0, -1)
    x = x.reshape(x.shape[:-1] + (Lp // TILE, SUB, LANE))
    return jnp.moveaxis(x, -3, 0)


def _from_lanes(x: Array, L: int):
    x = jnp.moveaxis(x, 0, -3)
    x = x.reshape(x.shape[:-3] + (-1,))
    return jnp.moveaxis(x, -1, 0)[:L]


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
