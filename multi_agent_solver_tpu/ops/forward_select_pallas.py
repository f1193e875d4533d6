"""Pallas TPU kernel: forward line search with IN-KERNEL alpha selection.

The first-generation forward kernel (ops/forward_pallas.py) replicates every
per-problem array across the candidate alphas (10x HBM traffic) and returns
all candidates for an XLA-side argmax/gather -- profiling shows the
replication copies and pads cost as much as the kernel itself.  This kernel
keeps lanes = problems and runs a TWO-PHASE grid over time:

* phase 1 (grid steps 0..T-1): carry ALL alpha candidates' states
  concurrently in a VMEM scratch ``[A, nx, 8, 128]``, accumulating each
  candidate's total cost;
* between phases (first step of phase 2): add terminal costs, pick each
  lane's winning alpha -- the LARGEST candidate whose cost beats the
  incoming merit, exactly the reference's decreasing-first-accept order
  (ilqr.hpp:199-228); lanes with no winner select alpha = 0, whose feedback
  rollout reproduces the reference trajectory identically (u = u_ref when
  x == x_ref), so every output is well-defined without masking;
* phase 2 (grid steps T..2T-1): re-roll only the selected alpha and write
  the accepted trajectory, controls, cost and accept flag.

Total compute is A+1 rollouts (vs A before) but HBM traffic drops from
O(A * T * nx) to O(T * nx) and the XLA-side select/gather disappears.
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


def _make_kernel(T, nx, nu, A, alphas, dt, dynamics, stage_cost, terminal_cost,
                 has_bounds, has_context,
                 eq_fn=None, eq_dim=0, ineq_fn=None, ineq_dim=0, act_tol=1e-6,
                 emit_lin=False, lin_discrete=True, sub=SUB, stage_out=False,
                 tu=1):
    f32 = jnp.float32

    def rk4(x, u):
        k1 = dynamics(x, u)
        k2 = dynamics(x + (0.5 * dt) * k1, u)
        k3 = dynamics(x + (0.5 * dt) * k2, u)
        k4 = dynamics(x + dt * k3, u)
        return (x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)).astype(f32)

    def rk4_raw(x, u):
        # Un-cast variant for jvp (astype would drop f64 tangents oddly).
        k1 = dynamics(x, u)
        k2 = dynamics(x + (0.5 * dt) * k1, u)
        k3 = dynamics(x + (0.5 * dt) * k2, u)
        k4 = dynamics(x + dt * k3, u)
        return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    def control(x, x_ref, u_ref, k_t, K_t, alpha, lb, ub):
        dx = x - x_ref
        rows = []
        for i in range(nu):
            u_i = u_ref[i] + alpha * k_t[i] + sum(
                K_t[i, j] * dx[j] for j in range(nx)
            )
            if has_bounds:
                u_i = jnp.minimum(jnp.maximum(u_i, lb[i]), ub[i])
            rows.append(u_i.astype(f32))
        return jnp.stack(rows, axis=0)

    has_al = eq_dim > 0 or ineq_dim > 0

    def kernel(xref_ref, uref_ref, k_ref, K_ref, merit_ref, lb_ref, ub_ref,
               *rest):
        if has_context:
            ctx_ref = rest[0]
            rest = rest[1:]
        eq_mult_ref = ineq_mult_ref = rho_ref = None
        if eq_dim > 0:
            eq_mult_ref = rest[0]
            rest = rest[1:]
        if ineq_dim > 0:
            ineq_mult_ref = rest[0]
            rest = rest[1:]
        if has_al:
            rho_ref = rest[0]
            rest = rest[1:]
        active_ref = xT_ref = xT_out = keep_s = None
        if stage_out:
            active_ref, xT_ref = rest[:2]
            rest = rest[2:]
            (xs_out, us_out, cost_out, accept_out, xT_out,
             xA_s, costA_s, x2_s, alpha_s, keep_s) = rest
        elif emit_lin:
            (xs_out, us_out, cost_out, accept_out,
             A_out, B_out, lx_out, lu_out, lxx_out, luu_out, lux_out,
             xA_s, costA_s, x2_s, alpha_s) = rest
        else:
            (xs_out, us_out, cost_out, accept_out,
             xA_s, costA_s, x2_s, alpha_s) = rest

        def al_terms(x, u, i=0):
            """AL merit terms with the inequality activation mask
            (reference compute_merit, ilqr.hpp:386-403)."""
            total = jnp.zeros((sub, LANE), jnp.float32)
            rho = rho_ref[0]
            if eq_dim > 0:
                g = eq_fn(x, u)          # [m, 8, 128]
                lam = eq_mult_ref[0, i]  # [m, 8, 128]
                for m in range(eq_dim):
                    total = total + lam[m] * g[m] + 0.5 * rho * g[m] * g[m]
            if ineq_dim > 0:
                h = ineq_fn(x, u)
                lam = ineq_mult_ref[0, i]
                for m in range(ineq_dim):
                    active = (h[m] > -act_tol).astype(jnp.float32)
                    s = jnp.maximum(h[m], 0.0) * active
                    total = total + (lam[m] * active) * s + 0.5 * rho * s * s
            return total

        g = pl.program_id(1)
        P1 = T // tu                    # phase-1 grid steps
        phase1 = g < P1

        lb = lb_ref[0]
        ub = ub_ref[0]

        def sub_refs(i):
            """Per-sub-step block slices (time-unroll: blocks carry ``tu``
            consecutive time slices; ``i`` is the static sub-step index)."""
            x_ref = xref_ref[0, i]
            u_ref = uref_ref[0, i]
            k_t = k_ref[0, i]
            K_t = K_ref[0, i]
            if has_context:
                ctx_t = ctx_ref[0, i]
                stage = lambda x, u, tt: stage_cost(x, u, tt, ctx_t)
            else:
                stage = stage_cost
            return x_ref, u_ref, k_t, K_t, stage

        @pl.when(g == 0)
        def _():
            for a in range(A):
                xA_s[a] = xref_ref[0, 0]  # trial state starts at x_ref[0] == x0
            costA_s[...] = jnp.zeros((A, sub, LANE), f32)

        @pl.when(phase1)
        def _():
            for i in range(tu):
                x_ref, u_ref, k_t, K_t, stage = sub_refs(i)
                t_eff = g * tu + i
                if stage_out:
                    # The outputs alias the reference buffers, and Pallas
                    # writes the output VMEM block back whenever the block
                    # index advances.  Seed the phase-1 write-backs with the
                    # reference values so they are no-ops; phase 2
                    # overwrites the same blocks with the selection.
                    xs_out[0, i] = x_ref
                    us_out[0, i] = u_ref
                for a in range(A):
                    x = xA_s[a]
                    u = control(x, x_ref, u_ref, k_t, K_t,
                                jnp.float32(alphas[a]), lb, ub)
                    step_cost = stage(x, u, t_eff)
                    if has_al:
                        step_cost = step_cost + al_terms(x, u, i)
                    costA_s[a] = (costA_s[a] + step_cost).astype(f32)
                    xA_s[a] = rk4(x, u)

        @pl.when(g == P1)
        def _():
            merit = merit_ref[0]
            sel = jnp.zeros((sub, LANE), f32)
            found = jnp.zeros((sub, LANE), jnp.bool_)
            best_cost = merit
            # Iterate from smallest alpha up so the LARGEST improving alpha
            # is applied last (reference first-accept order).
            for a in range(A - 1, -1, -1):
                total = (costA_s[a] + terminal_cost(xA_s[a])).astype(f32)
                ok = total < merit
                if stage_out:
                    # Frozen (converged) lanes never accept: the whole-lane
                    # freeze mask moves INSIDE the kernel, replacing the
                    # XLA-side full-stack jnp.where copies of the loop body.
                    ok = jnp.logical_and(ok, active_ref[0] > 0.5)
                sel = jnp.where(ok, jnp.float32(alphas[a]), sel)
                best_cost = jnp.where(ok, total, best_cost)
                found = jnp.logical_or(found, ok)
            alpha_s[...] = sel
            cost_out[0] = best_cost
            accept_out[0] = found.astype(f32)
            if stage_out:
                keep_s[...] = found.astype(f32)
            x2_s[...] = xref_ref[0, 0]  # phase-2 rollout restarts at x0

        @pl.when(~phase1)
        def _():
            for i in range(tu):
                x_ref, u_ref, k_t, K_t, stage = sub_refs(i)
                x = x2_s[...]
                u = control(x, x_ref, u_ref, k_t, K_t, alpha_s[...], lb, ub)
                x_next = rk4(x, u)
                if stage_out:
                    # STAGE-layout output: write x_t (the pre-step state),
                    # masked in-kernel against the incoming reference --
                    # rejected and frozen lanes get verbatim (x_ref, u_ref)
                    # copies, so the loop body needs no accept-select pass
                    # and no concat([x0, xs_tail[:-1]]) shift next
                    # iteration.
                    keep = keep_s[...] > 0.5
                    xs_out[0, i] = jnp.where(keep[None], x, x_ref)
                    us_out[0, i] = jnp.where(keep[None], u, u_ref)

                    if i == tu - 1:
                        @pl.when(g == 2 * P1 - 1)
                        def _():
                            xT_out[0] = jnp.where(keep[None], x_next,
                                                  xT_ref[0])
                else:
                    xs_out[0, i] = x_next
                    us_out[0, i] = u
                x2_s[...] = x_next

            if emit_lin:
                # Emit the NEXT iteration's linearization at the accepted
                # (x, u): the separate linearize launch and its HBM re-read
                # of the trajectory disappear from the fused loop.
                lanes = jnp.zeros_like(x[0])
                w = lambda v: jnp.asarray(v + lanes, f32)

                def basis(n, j, like):
                    return jnp.stack(
                        [jnp.ones_like(like[0]) if i == j else
                         jnp.zeros_like(like[0]) for i in range(n)], axis=0
                    )

                step = rk4_raw if lin_discrete else dynamics
                for j in range(nx):
                    _, col = jax.jvp(lambda xx: step(xx, u), (x,), (basis(nx, j, x),))
                    for i in range(nx):
                        A_out[0, 0, i, j] = w(col[i])
                for j in range(nu):
                    _, col = jax.jvp(lambda uu: step(x, uu), (u,), (basis(nu, j, u),))
                    for i in range(nx):
                        B_out[0, 0, i, j] = w(col[i])

                tf = g - P1  # stage index within phase 2 (emit_lin => tu == 1)
                def lgrad_x(xx, uu, j):
                    _, g = jax.jvp(lambda a: stage(a, uu, tf), (xx,), (basis(nx, j, x),))
                    return g + lanes

                def lgrad_u(xx, uu, j):
                    _, g = jax.jvp(lambda a: stage(xx, a, tf), (uu,), (basis(nu, j, u),))
                    return g + lanes

                for j in range(nx):
                    lx_out[0, 0, j] = w(lgrad_x(x, u, j))
                for j in range(nu):
                    lu_out[0, 0, j] = w(lgrad_u(x, u, j))
                for i in range(nx):
                    for j in range(i, nx):
                        _, h = jax.jvp(lambda a: lgrad_x(a, u, i), (x,),
                                       (basis(nx, j, x),))
                        lxx_out[0, 0, i, j] = w(h)
                        if i != j:
                            lxx_out[0, 0, j, i] = w(h)
                for i in range(nu):
                    for j in range(i, nu):
                        _, h = jax.jvp(lambda a: lgrad_u(x, a, i), (u,),
                                       (basis(nu, j, u),))
                        luu_out[0, 0, i, j] = w(h)
                        if i != j:
                            luu_out[0, 0, j, i] = w(h)
                for i in range(nu):
                    for j in range(nx):
                        _, h = jax.jvp(lambda a: lgrad_u(a, u, i), (x,),
                                       (basis(nx, j, x),))
                        lux_out[0, 0, i, j] = w(h)

    return kernel


def _to_lanes(x: Array, Lp: int, sub: int = SUB):
    x = jnp.moveaxis(x, 0, -1)
    x = x.reshape(x.shape[:-1] + (Lp // (sub * LANE), sub, LANE))
    return jnp.moveaxis(x, -3, 0)


def _from_lanes(x: Array, L: int):
    x = jnp.moveaxis(x, 0, -3)
    x = x.reshape(x.shape[:-3] + (-1,))
    return jnp.moveaxis(x, -1, 0)[:L]


def forward_select_pallas_tiled(
    spec,
    xref_l: Array,     # [nl, T, nx, 8, 128] reference states x_0..x_{T-1}
    uref_l: Array,     # [nl, T, nu, 8, 128]
    k_l: Array,        # [nl, T, nu, 8, 128]
    K_l: Array,        # [nl, T, nu, nx, 8, 128]
    merit_l: Array,    # [nl, 8, 128] merit to beat (-inf lanes never accept)
    lb_l: Array,       # [nl, nu, 8, 128] absolute bounds (zeros if unbounded)
    ub_l: Array,
    alphas: Tuple[float, ...],
    interpret: bool = False,
    ctx_l: Array = None,        # [nl, T, C..., 8, 128]
    eq_mult_l: Array = None,    # [nl, T, eq_dim, 8, 128]
    ineq_mult_l: Array = None,
    rho_l: Array = None,        # [nl, 8, 128]
    act_tol: float = 1e-6,
    emit_lin: bool = False,
    lin_discrete: bool = True,
    active_l: Array = None,     # [nl, 8, 128] 1.0 = lane still active
    xT_l: Array = None,         # [nl, nx, 8, 128] incoming terminal state
    time_unroll: int = 1,       # time steps per grid step (must divide T)
):
    """Select kernel on pre-tiled lane-layout stacks (the fused-loop entry).

    Returns ``(xs_tail_l [nl, T, nx, 8, 128]`` holding x_1..x_T,
    ``us_l [nl, T, nu, 8, 128]``, ``merit_new_l [nl, 8, 128]``,
    ``accept_l [nl, 8, 128]`` (1.0 = accepted)`` -- no layout conversions.

    With ``emit_lin``, seven more outputs follow: the stage linearization
    ``(A, B, lx, lu, lxx, luu, lux)`` of the accepted trajectory, computed
    by in-kernel forward-mode AD during the phase-2 re-roll -- feeding the
    NEXT iteration's Riccati kernel with no separate linearize launch.

    With ``active_l``/``xT_l`` (stage-out mode, round 5): the states output
    switches to STAGE layout ``x_0..x_{T-1}`` and a fifth output carries the
    new terminal state ``[nl, nx, 8, 128]`` -- the exact layout the Riccati
    kernel consumes, so the fused loop's per-iteration
    ``concat([x0, xs_tail[:-1]])`` shift disappears.  Accept/freeze masking
    happens in-kernel (rejected or inactive lanes write verbatim
    ``x_ref``/``u_ref``/``xT_ref`` copies and keep their merit), replacing
    the loop body's full-stack ``jnp.where`` passes.  Returns
    ``(xs_stage_l, us_l, merit_new_l, accept_l, xT_new_l)``.
    """
    nl, T, nx = xref_l.shape[:3]
    nu = uref_l.shape[2]
    sub = xref_l.shape[-2]          # 8, or a folded multiple of 8 (lane_fold)
    A = len(alphas)
    dtype = jnp.float32
    has_bounds = spec.has_input_bounds
    has_context = ctx_l is not None
    eq_dim = spec.eq_dim if eq_mult_l is not None else 0
    ineq_dim = spec.ineq_dim if ineq_mult_l is not None else 0
    ctx_inner = tuple(ctx_l.shape[2:-2]) if has_context else ()
    stage_out = active_l is not None
    assert not (stage_out and emit_lin), "stage_out and emit_lin are exclusive"
    assert not stage_out or xT_l is not None
    # Time-unroll: process ``tu`` consecutive time steps per grid step --
    # halves (at tu=2) the grid-step count and the per-step DMA round
    # trips of the sequential phases.  Must divide T; emit_lin stays tu=1.
    tu = max(1, int(time_unroll))
    if T % tu or emit_lin:
        tu = 1

    kernel = _make_kernel(
        T, nx, nu, A, tuple(float(a) for a in alphas), spec.dt,
        spec.dynamics, spec.stage_cost, spec.terminal_cost, has_bounds,
        has_context,
        eq_fn=spec.equality_constraints, eq_dim=eq_dim,
        ineq_fn=spec.inequality_constraints, ineq_dim=ineq_dim,
        act_tol=act_tol, emit_lin=emit_lin, lin_discrete=lin_discrete,
        sub=sub, stage_out=stage_out, tu=tu,
    )

    P1 = T // tu
    tmod = lambda g: jnp.where(g >= P1, g - P1, g)
    tspec = lambda *inner: pl.BlockSpec(
        (1, tu) + inner + (sub, LANE),
        lambda b, g: (b, tmod(g)) + (0,) * len(inner) + (0, 0),
        memory_space=pltpu.VMEM,
    )
    cspec = lambda *inner: pl.BlockSpec(
        (1,) + inner + (sub, LANE),
        lambda b, t: (b,) + (0,) * len(inner) + (0, 0),
        memory_space=pltpu.VMEM,
    )

    extra_inputs, extra_specs = [], []
    if has_context:
        extra_inputs.append(ctx_l.astype(dtype))
        extra_specs.append(tspec(*ctx_inner))
    if eq_dim > 0:
        extra_inputs.append(eq_mult_l.astype(dtype))
        extra_specs.append(tspec(eq_dim))
    if ineq_dim > 0:
        extra_inputs.append(ineq_mult_l.astype(dtype))
        extra_specs.append(tspec(ineq_dim))
    if eq_dim > 0 or ineq_dim > 0:
        extra_inputs.append(rho_l.astype(dtype))
        extra_specs.append(cspec())

    lin_specs, lin_shapes = [], []
    if emit_lin:
        for inner in ((nx, nx), (nx, nu), (nx,), (nu,), (nx, nx), (nu, nu),
                      (nu, nx)):
            lin_specs.append(tspec(*inner))
            lin_shapes.append(
                jax.ShapeDtypeStruct((nl, T) + inner + (sub, LANE), dtype)
            )

    extra_out_specs, extra_out_shapes, extra_scratch = [], [], []
    io_aliases = {}
    if stage_out:
        extra_inputs += [active_l.astype(dtype), xT_l.astype(dtype)]
        extra_specs += [cspec(), cspec(nx)]
        extra_out_specs = [cspec(nx)]
        extra_out_shapes = [jax.ShapeDtypeStruct((nl, nx, sub, LANE), dtype)]
        extra_scratch = [pltpu.VMEM((sub, LANE), dtype)]   # keep_s
        # In-place updates: the stage-out kernel overwrites the reference
        # trajectory buffers (xref -> xs, uref -> us, xT -> xT_new).  Safe:
        # each xref/uref block's last read is the SAME phase-2 grid step
        # that writes it, and the while-loop carry then forwards the buffer
        # with no XLA copy pass (measured ~1.5 ms/iteration of %copy at
        # batch 262k).
        xT_idx = 7 + len(extra_inputs) - 1
        io_aliases = {0: 0, 1: 1, xT_idx: 4}

    return pl.pallas_call(
        kernel,
        grid=(nl, 2 * P1),
        in_specs=[
            tspec(nx), tspec(nu), tspec(nu), tspec(nu, nx),
            cspec(), cspec(nu), cspec(nu),
        ] + extra_specs,
        out_specs=([tspec(nx), tspec(nu), cspec(), cspec()]
                   + extra_out_specs + lin_specs),
        out_shape=([
            jax.ShapeDtypeStruct((nl, T, nx, sub, LANE), dtype),
            jax.ShapeDtypeStruct((nl, T, nu, sub, LANE), dtype),
            jax.ShapeDtypeStruct((nl, sub, LANE), dtype),
            jax.ShapeDtypeStruct((nl, sub, LANE), dtype),
        ] + extra_out_shapes + lin_shapes),
        scratch_shapes=[
            pltpu.VMEM((A, nx, sub, LANE), dtype),
            pltpu.VMEM((A, sub, LANE), dtype),
            pltpu.VMEM((nx, sub, LANE), dtype),
            pltpu.VMEM((sub, LANE), dtype),
        ] + extra_scratch,
        input_output_aliases=io_aliases,
        interpret=interpret,
    )(xref_l.astype(dtype), uref_l.astype(dtype), k_l.astype(dtype),
      K_l.astype(dtype), merit_l.astype(dtype), lb_l.astype(dtype),
      ub_l.astype(dtype), *extra_inputs)


def forward_select_pallas(
    spec,
    xs: Array,        # [B, T+1, nx] reference trajectory
    us: Array,        # [B, T, nu] reference controls
    k: Array,         # [B, T, nu]
    K: Array,         # [B, T, nu, nx]
    merit: Array,     # [B] current merit to beat
    alphas: Tuple[float, ...],
    interpret: bool = False,
    eq_mult: Array = None,     # [B, T, eq_dim] AL multipliers (constrained)
    ineq_mult: Array = None,   # [B, T, ineq_dim]
    rho: Array = None,         # [B] penalty parameter
    act_tol: float = 1e-6,
):
    """Returns accepted ``xs_new [B, T+1, nx]``, ``us_new [B, T, nu]``,
    ``merit_new [B]``, ``accepted [B] (bool)``.

    Unaccepted lanes reproduce the reference trajectory/controls exactly
    (alpha = 0 feedback rollout) and keep their incoming merit.
    """
    B, Tp1, nx = xs.shape
    T = Tp1 - 1
    nu = us.shape[-1]
    A = len(alphas)
    pad = (-B) % TILE
    Bp = B + pad
    dtype = jnp.float32

    def padded(x):
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
        return x.astype(dtype)

    pack = lambda arr: _to_lanes(padded(arr), Bp)

    xref_l = pack(xs[:, :-1])
    uref_l = pack(us)
    k_l = pack(k)
    K_l = pack(K)
    # Pad lanes' merit with -inf so padded lanes never "accept".
    merit_p = jnp.concatenate(
        [merit.astype(dtype), jnp.full((pad,), -jnp.inf, dtype)]
    ) if pad else merit.astype(dtype)
    merit_l = _to_lanes(merit_p, Bp)

    has_bounds = spec.has_input_bounds
    if has_bounds:
        lb = jnp.broadcast_to(spec.input_lower_bounds, (B, nu))
        ub = jnp.broadcast_to(spec.input_upper_bounds, (B, nu))
    else:
        lb = jnp.zeros((B, nu), dtype)
        ub = jnp.zeros((B, nu), dtype)
    lb_l = _to_lanes(padded(lb), Bp)
    ub_l = _to_lanes(padded(ub), Bp)

    has_context = spec.context is not None
    ctx_l = pack(spec.context) if has_context else None

    eq_dim, ineq_dim = spec.eq_dim, spec.ineq_dim
    eq_mult_l = pack(eq_mult) if eq_dim > 0 else None
    ineq_mult_l = pack(ineq_mult) if ineq_dim > 0 else None
    rho_l = None
    if eq_dim > 0 or ineq_dim > 0:
        rho_p = jnp.concatenate([rho.astype(dtype), jnp.ones((pad,), dtype)]) if pad \
            else rho.astype(dtype)
        rho_l = _to_lanes(rho_p, Bp)

    xs_l, us_l, cost_l, accept_l = forward_select_pallas_tiled(
        spec, xref_l, uref_l, k_l, K_l, merit_l, lb_l, ub_l,
        alphas, interpret,
        ctx_l=ctx_l, eq_mult_l=eq_mult_l, ineq_mult_l=ineq_mult_l,
        rho_l=rho_l, act_tol=act_tol,
    )

    xs_tail = _from_lanes(xs_l, B)                   # [B, T, nx]
    us_new = _from_lanes(us_l, B).astype(us.dtype)
    merit_new = _from_lanes(cost_l, B).astype(merit.dtype)
    accepted = _from_lanes(accept_l, B) > 0.5
    xs_new = jnp.concatenate([xs[:, :1].astype(xs_tail.dtype), xs_tail], axis=1)
    return xs_new.astype(xs.dtype), us_new, merit_new, accepted


def rollout_select(spec, x0: Array, us: Array, interpret: bool = False):
    """Plain batched rollout + cost via the select kernel (context-aware).

    alpha = 0 with zero gains makes the phase-2 rollout apply ``us`` raw;
    bounds are stripped so nothing clamps (reference plain rollouts never
    clamp).  Returns ``xs [B, T+1, nx]``, ``costs [B]``.
    """
    B, T, nu = us.shape
    nx = x0.shape[-1]
    zeros_k = jnp.zeros((B, T, nu), jnp.float32)
    zeros_K = jnp.zeros((B, T, nu, nx), jnp.float32)
    xs_ref = jnp.broadcast_to(x0[:, None, :], (B, T + 1, nx))
    # Plain rollout: no clamp, no AL terms -- the cost is the raw objective.
    plain = spec.replace(
        input_lower_bounds=None, input_upper_bounds=None,
        equality_constraints=None, inequality_constraints=None,
        eq_dim=0, ineq_dim=0,
    )
    merit_inf = jnp.full((B,), jnp.inf, jnp.float32)
    xs_new, _, costs, _ = forward_select_pallas(
        plain, xs_ref, us, zeros_k, zeros_K, merit_inf, (0.0,), interpret
    )
    return xs_new, costs
