"""Pallas TPU kernel: the whole iLQR Riccati backward pass in ONE launch.

Why: XLA compiles each backward-scan step into ~40 separate 5-100us kernels
(tiny dot_generals become reduce-fusions with poor lane utilization), so a
T=80 recursion over a 4096-problem batch costs ~76 ms despite ~1 ms of actual
arithmetic.  This kernel runs the entire recursion in a single ``pallas_call``:

* grid ``(batch_tiles, T)`` -- the TPU grid is sequential, so the ``t`` axis
  IS the time recursion; Pallas double-buffers the per-step HBM->VMEM loads
  automatically;
* batch lanes live in the trailing ``(8, 128)`` dims of every block -- each
  elementwise op is exactly one full vector register over 1024 problems;
* all small-dimension (nx, nu <= 4) linear algebra is unrolled Python loops
  over lane-shaped values: contractions, Sylvester positive-definiteness
  tests for the regularization ladder (bit-matching the reference's
  ``q_uu += reg*I; reg *= 10`` retries, ilqr.hpp:172-183), and Gauss-Jordan
  inversion of the regularized ``q_uu``;
* the value-function carry ``(v_x, v_xx)`` persists in VMEM scratch across
  grid steps of the same batch tile.

Layout contract: callers pass batch-first arrays ``[B, T, ...]``; this module
reshapes to ``[nb, T, ..., 8, 128]`` tiles (padding B up to a multiple of
1024) and restores ``[B, T, ...]`` outputs.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Array

SUB, LANE = 8, 128
TILE = SUB * LANE  # 1024 problems per grid row


def _det_rect(M, rows, cols) -> Array:
    """Determinant of M[rows][:, cols] (len(rows) == len(cols))."""
    n = len(rows)
    if n == 1:
        return M[rows[0]][cols[0]]
    total = None
    r0 = rows[0]
    for pos, c in enumerate(cols):
        rest_cols = [cc for cc in cols if cc != c]
        m = _det_rect(M, rows[1:], rest_cols)
        term = M[r0][c] * m
        if total is None:
            total = term
        elif pos % 2 == 0:
            total = total + term
        else:
            total = total - term
    return total


def _gauss_jordan_solve(Q: List[List[Array]], rhs: List[List[Array]], n: int, m: int):
    """Solve Q X = rhs for lane-valued small matrices, unrolled, no pivoting
    (Q is SPD after regularization, so diagonal pivots are safe)."""
    A = [[Q[i][j] for j in range(n)] for i in range(n)]
    X = [[rhs[i][j] for j in range(m)] for i in range(n)]
    for col in range(n):
        inv_piv = 1.0 / A[col][col]
        for j in range(col, n):
            A[col][j] = A[col][j] * inv_piv
        for j in range(m):
            X[col][j] = X[col][j] * inv_piv
        for row in range(n):
            if row == col:
                continue
            factor = A[row][col]
            for j in range(col, n):
                A[row][j] = A[row][j] - factor * A[col][j]
            for j in range(m):
                X[row][j] = X[row][j] - factor * X[col][j]
    return X


def _boxqp_lane_gains(q_uu_reg, q_u, q_ux, lb, ub, nu, nx):
    """Exact box-QP gains on lane-valued data (ops/boxqp.py in-kernel).

    Enumerates all 3^nu free/at-lower/at-upper configurations, solves each
    free subsystem with the unrolled Gauss-Jordan, and selects the first
    configuration whose KKT conditions hold -- all branch-free lane
    arithmetic.  Clamped dims get zero feedback rows (control-limited DDP).
    """
    import itertools

    FREE, AT_LB, AT_UB = 0, 1, 2
    zeros = 0.0 * q_u[0]
    best_k = [zeros for _ in range(nu)]
    best_K = [[zeros for _ in range(nx)] for _ in range(nu)]
    found = zeros > 1.0   # all-False lane mask

    for config in itertools.product((FREE, AT_LB, AT_UB), repeat=nu):
        free = [i for i in range(nu) if config[i] == FREE]
        clamped = [i for i in range(nu) if config[i] != FREE]
        v = [lb[i] if config[i] == AT_LB else (ub[i] if config[i] == AT_UB else zeros)
             for i in range(nu)]

        du = list(v)
        K = [[zeros for _ in range(nx)] for _ in range(nu)]
        if free:
            sub = [[q_uu_reg[i][j] for j in free] for i in free]
            rhs = [
                [q_u[i] + sum(q_uu_reg[i][c] * v[c] for c in clamped)]
                + [q_ux[i][j] for j in range(nx)]
                for i in free
            ]
            sol = _gauss_jordan_solve(sub, rhs, len(free), nx + 1)
            for pos, i in enumerate(free):
                du[i] = -sol[pos][0]
                for j in range(nx):
                    K[i][j] = -sol[pos][1 + j]

        grad = [q_u[i] + sum(q_uu_reg[i][j] * du[j] for j in range(nu))
                for i in range(nu)]
        ok = zeros <= 0.0  # all-True
        for i in range(nu):
            if config[i] == FREE:
                ok = jnp.logical_and(ok, jnp.logical_and(du[i] >= lb[i], du[i] <= ub[i]))
            elif config[i] == AT_LB:
                ok = jnp.logical_and(ok, grad[i] >= 0.0)
            else:
                ok = jnp.logical_and(ok, grad[i] <= 0.0)

        take = jnp.logical_and(ok, jnp.logical_not(found))
        for i in range(nu):
            best_k[i] = jnp.where(take, du[i], best_k[i])
            for j in range(nx):
                best_K[i][j] = jnp.where(take, K[i][j], best_K[i][j])
        found = jnp.logical_or(found, ok)

    # Degenerate fallback (mirrors ops/boxqp.py:102-107): unconstrained
    # Newton step clipped to the box, full feedback.
    rhs = [[q_u[i]] + [q_ux[i][j] for j in range(nx)] for i in range(nu)]
    sol = _gauss_jordan_solve(q_uu_reg, rhs, nu, nx + 1)
    for i in range(nu):
        unc = jnp.clip(-sol[i][0], lb[i], ub[i])
        best_k[i] = jnp.where(found, best_k[i], unc)
        for j in range(nx):
            best_K[i][j] = jnp.where(found, best_K[i][j], -sol[i][1 + j])
    return best_k, best_K


def _terminal_into_scratch(terminal_fn, xT, nx, vx_s, vxx_s):
    """Write phix/phixx of ``terminal_fn`` at lane-valued ``xT`` into the
    value-function scratch (forward-over-forward jvp, symmetrized)."""
    lanes = jnp.zeros_like(xT[0])

    def basis(j):
        return jnp.stack(
            [jnp.ones_like(lanes) if i == j else lanes for i in range(nx)],
            axis=0,
        )

    def grad_j(xx, j):
        _, g = jax.jvp(terminal_fn, (xx,), (basis(j),))
        return jnp.asarray(g + lanes, jnp.float32)

    for j in range(nx):
        vx_s[j] = grad_j(xT, j)
    for i in range(nx):
        for j in range(i, nx):
            _, h = jax.jvp(lambda a: grad_j(a, i), (xT,), (basis(j),))
            h = jnp.asarray(h + lanes, jnp.float32)
            vxx_s[i, j] = h
            if i != j:
                vxx_s[j, i] = h


def _stage_core(A, Bm, lx, lu, lxx, luu, lux, v_x, v_xx,
                nx, nu, sub, reg_levels, boxqp, lb, ub):
    """One Riccati stage on lane-valued small matrices: Q-terms, the
    regularization ladder, (box-)gains, and the value recursion
    (ilqr.hpp:106-192).  ``A``/``lxx``-style args are indexable as
    ``A[i, j]`` lane arrays; returns ``(k_t, K_t, new_vx, new_vxx)``."""
    # Q-terms (ilqr.hpp:115-119), unrolled.
    q_x = [lx[j] + sum(A[i, j] * v_x[i] for i in range(nx)) for j in range(nx)]
    q_u = [lu[j] + sum(Bm[i, j] * v_x[i] for i in range(nx)) for j in range(nu)]
    # vA[i][j] = (v_xx @ A)[i, j]
    vA = [[sum(v_xx[i][kk] * A[kk, j] for kk in range(nx)) for j in range(nx)]
          for i in range(nx)]
    q_xx = [[lxx[i, j] + sum(A[kk, i] * vA[kk][j] for kk in range(nx))
             for j in range(nx)] for i in range(nx)]
    q_ux = [[lux[i, j] + sum(Bm[kk, i] * vA[kk][j] for kk in range(nx))
             for j in range(nx)] for i in range(nu)]
    vB = [[sum(v_xx[i][kk] * Bm[kk, j] for kk in range(nx)) for j in range(nu)]
          for i in range(nx)]
    q_uu = [[luu[i, j] + sum(Bm[kk, i] * vB[kk][j] for kk in range(nx))
             for j in range(nu)] for i in range(nu)]

    # Regularization ladder: smallest cumulative level whose shifted q_uu
    # passes Sylvester's criterion (== reference's LLT retry loop).
    def minors_ok(shift):
        Qs = [[q_uu[i][j] + (shift if i == j else 0.0) for j in range(nu)]
              for i in range(nu)]
        ok = Qs[0][0] > 0.0
        for kdim in range(2, nu + 1):
            ok = jnp.logical_and(
                ok, _det_rect(Qs, list(range(kdim)), list(range(kdim))) > 0.0
            )
        return ok

    best = jnp.full((sub, LANE), reg_levels[-1], jnp.float32)
    for level in reversed(reg_levels):
        best = jnp.where(minors_ok(level), jnp.float32(level), best)

    q_uu_reg = [[q_uu[i][j] + (best if i == j else 0.0) for j in range(nu)]
                for i in range(nu)]

    if boxqp:
        # Exact box-constrained gains (control-limited DDP) on the lanes.
        k_t, K_t = _boxqp_lane_gains(q_uu_reg, q_u, q_ux, lb, ub, nu, nx)
    else:
        # Solve for gains: [k | K] = q_uu_reg^{-1} [q_u | q_ux].
        rhs = [[q_u[i]] + [q_ux[i][j] for j in range(nx)] for i in range(nu)]
        sol = _gauss_jordan_solve(q_uu_reg, rhs, nu, nx + 1)
        k_t = [-sol[i][0] for i in range(nu)]
        K_t = [[-sol[i][1 + j] for j in range(nx)] for i in range(nu)]

    # Value recursion (ilqr.hpp:188-192).
    q_uu_k = [sum(q_uu[i][j] * k_t[j] for j in range(nu)) for i in range(nu)]
    new_vx = [
        q_x[j]
        + sum(K_t[u][j] * q_u[u] for u in range(nu))
        + sum(q_ux[u][j] * k_t[u] for u in range(nu))
        + sum(K_t[u][j] * q_uu_k[u] for u in range(nu))
        for j in range(nx)
    ]
    KQ = [[sum(K_t[u][i] * q_ux[u][j] for u in range(nu)) for j in range(nx)]
          for i in range(nx)]
    KqK = [[sum(K_t[u][i] * sum(q_uu[u][v] * K_t[v][j] for v in range(nu))
                for u in range(nu)) for j in range(nx)] for i in range(nx)]
    new_vxx = [[q_xx[i][j] + KQ[i][j] + KQ[j][i] + KqK[i][j] for j in range(nx)]
               for i in range(nx)]
    return k_t, K_t, new_vx, new_vxx


def _make_kernel(T: int, nx: int, nu: int, reg_levels: Sequence[float],
                 boxqp: bool = False, terminal_fn=None, sub: int = SUB):
    def kernel(*refs):
        if boxqp:
            (A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref,
             lb_ref, ub_ref, vx0_ref, vxx0_ref, k_ref, K_ref, vx_s, vxx_s) = refs
        else:
            (A_ref, B_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref,
             vx0_ref, vxx0_ref, k_ref, K_ref, vx_s, vxx_s) = refs
        t_idx = pl.program_id(1)

        @pl.when(t_idx == 0)
        def _():
            if terminal_fn is None:
                vx_s[...] = vx0_ref[0]
                vxx_s[...] = vxx0_ref[0]
            else:
                # In-kernel terminal derivatives (fused-loop mode):
                # vx0_ref carries x_T lanes, vxx0_ref is an unused dummy.
                _terminal_into_scratch(terminal_fn, vx0_ref[0], nx, vx_s, vxx_s)

        A = A_ref[0, 0]      # [nx, nx, 8, 128]
        Bm = B_ref[0, 0]     # [nx, nu, 8, 128]
        lx = lx_ref[0, 0]    # [nx, 8, 128]
        lu = lu_ref[0, 0]    # [nu, 8, 128]
        lxx = lxx_ref[0, 0]
        luu = luu_ref[0, 0]
        lux = lux_ref[0, 0]  # [nu, nx, 8, 128]
        v_x = [vx_s[i] for i in range(nx)]
        v_xx = [[vxx_s[i, j] for j in range(nx)] for i in range(nx)]

        lb = [lb_ref[0, 0, i] for i in range(nu)] if boxqp else None
        ub = [ub_ref[0, 0, i] for i in range(nu)] if boxqp else None
        k_t, K_t, new_vx, new_vxx = _stage_core(
            A, Bm, lx, lu, lxx, luu, lux, v_x, v_xx,
            nx, nu, sub, reg_levels, boxqp, lb, ub,
        )

        # Write outputs and carry (symmetrized, ilqr.hpp:192).
        for i in range(nu):
            k_ref[0, 0, i] = k_t[i]
            for j in range(nx):
                K_ref[0, 0, i, j] = K_t[i][j]
        for j in range(nx):
            vx_s[j] = new_vx[j]
        for i in range(nx):
            for j in range(nx):
                vxx_s[i, j] = 0.5 * (new_vxx[i][j] + new_vxx[j][i])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("reg_init", "reg_factor", "reg_levels", "interpret",
                     "terminal_fn", "hess_tconst"),
)
def riccati_backward_pallas_tiled(
    A_l: Array,     # [nb, T, nx, nx, 8, 128] lane layout
    B_l: Array,     # [nb, T, nx, nu, 8, 128]
    lx_l: Array, lu_l: Array, lxx_l: Array, luu_l: Array, lux_l: Array,
    vx_l: Array,    # [nb, nx, 8, 128]
    vxx_l: Array,   # [nb, nx, nx, 8, 128]
    reg_init: float = 1e-6,
    reg_factor: float = 10.0,
    reg_levels: int = 16,
    interpret: bool = False,
    lb_l: Array = None,   # [nb, T, nu, 8, 128] delta bounds -> in-kernel box QP
    ub_l: Array = None,
    terminal_fn=None,     # lane-traceable terminal cost: vx_l carries x_T
    hess_tconst: bool = False,
):
    """Riccati kernel on pre-tiled lane-layout stacks (the fused-loop entry).

    Identical kernel to :func:`riccati_backward_pallas` without the
    tile/untile layout conversions; returns ``k [nb, T, nu, 8, 128]``,
    ``K [nb, T, nu, nx, 8, 128]``.  With ``terminal_fn``, ``vx_l`` carries
    the terminal states ``x_T`` and phix/phixx are derived in-kernel at the
    first grid step (one launch fewer in the fused loop); ``vxx_l`` is then
    an ignored dummy.

    ``hess_tconst``: the cost-Hessian stacks ``lxx/luu/lux`` carry a
    SINGLETON time axis (``[nb, 1, ...]``) and every grid step reads block
    ``(b, 0)`` -- Pallas skips the refetch when consecutive steps map to the
    same block, so a stationary quadratic cost (solvers/ilqr.py
    ``quadratic_cost`` + ``stationary_cost``) cuts the kernel's per-step HBM
    reads from 58 to 30 (8, 128)-tiles at nx=4, nu=2.
    """
    nb, T, nx = A_l.shape[:3]
    nu = B_l.shape[3]
    sub = A_l.shape[-2]             # 8, or a folded multiple of 8 (lane_fold)
    dtype = jnp.float32
    boxqp = lb_l is not None

    levels = tuple(
        float(reg_init * (reg_factor**j - 1.0) / (reg_factor - 1.0))
        for j in range(reg_levels)
    )
    kernel = _make_kernel(T, nx, nu, levels, boxqp=boxqp, terminal_fn=terminal_fn, sub=sub)

    rev = lambda b, t: (b, T - 1 - t)
    spec = lambda *inner: pl.BlockSpec(
        (1, 1) + inner + (sub, LANE),
        lambda b, t: rev(b, t) + (0,) * len(inner) + (0, 0),
        memory_space=pltpu.VMEM,
    )
    # Time-constant Hessian blocks: always block (b, 0); consecutive grid
    # steps map to the same region, so Pallas fetches it once per batch row.
    hspec = (
        (lambda *inner: pl.BlockSpec(
            (1, 1) + inner + (sub, LANE),
            lambda b, t: (b, 0) + (0,) * len(inner) + (0, 0),
            memory_space=pltpu.VMEM,
        ))
        if hess_tconst else spec
    )
    spec0 = lambda *inner: pl.BlockSpec(
        (1,) + inner + (sub, LANE),
        lambda b, t: (b,) + (0,) * len(inner) + (0, 0),
        memory_space=pltpu.VMEM,
    )
    bound_inputs = (lb_l.astype(dtype), ub_l.astype(dtype)) if boxqp else ()
    bound_specs = [spec(nu), spec(nu)] if boxqp else []

    inputs = tuple(
        x.astype(dtype)
        for x in (A_l, B_l, lx_l, lu_l, lxx_l, luu_l, lux_l)
    ) + bound_inputs + (vx_l.astype(dtype), vxx_l.astype(dtype))
    return pl.pallas_call(
        kernel,
        grid=(nb, T),
        in_specs=[
            spec(nx, nx), spec(nx, nu), spec(nx), spec(nu),
            hspec(nx, nx), hspec(nu, nu), hspec(nu, nx),
            *bound_specs,
            spec0(nx), spec0(nx, nx),
        ],
        out_specs=[spec(nu), spec(nu, nx)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, T, nu, sub, LANE), dtype),
            jax.ShapeDtypeStruct((nb, T, nu, nx, sub, LANE), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, sub, LANE), dtype),
            pltpu.VMEM((nx, nx, sub, LANE), dtype),
        ],
        interpret=interpret,
    )(*inputs)


class _M2:
    """2-D ``[i, j]`` indexable view over a list of lists of lane arrays
    (duck-types the ``A[i, j]`` access pattern of a block-ref slice)."""

    def __init__(self, rows):
        self._rows = rows

    def __getitem__(self, ij):
        return self._rows[ij[0]][ij[1]]


def _make_fusedlin_kernel(T, nx, nu, reg_levels, dt, dynamics, stage_cost,
                          discrete, terminal_fn, sub, boxqp, tu=1):
    """Riccati stage kernel that LINEARIZES IN-KERNEL (stationary-cost path).

    Instead of consuming precomputed ``A/B/lx/lu`` stacks, each grid step
    reads only ``(x_t, u_t)`` (6 lane tiles at nx=4, nu=2 instead of 30) and
    derives the dynamics Jacobians and cost gradients by the same in-kernel
    forward-mode jvps the standalone linearize kernel uses.  The jvp chains
    are independent of the value-recursion carry, so they fill issue slots
    the sequential dependency chain leaves idle -- and the separate
    linearize launch (plus its HBM round trip for A/B/lx/lu) disappears.
    Cost Hessians arrive as time-constant blocks (stationary quadratic
    cost), fetched once per batch row.

    ``tu`` (time-unroll, round 5): each grid step carries ``tu`` consecutive
    time slices and runs the stage recursion over them latest-first --
    identical arithmetic, 1/tu the grid steps and per-step DMA round trips
    (the same trade the select kernel's ``time_unroll`` makes).
    """

    def step_map(x, u):
        if not discrete:
            return dynamics(x, u)
        k1 = dynamics(x, u)
        k2 = dynamics(x + (0.5 * dt) * k1, u)
        k3 = dynamics(x + (0.5 * dt) * k2, u)
        k4 = dynamics(x + dt * k3, u)
        return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    def kernel(*refs):
        if boxqp:
            (x_ref, u_ref, lxx_ref, luu_ref, lux_ref, lb_ref, ub_ref,
             xT_ref, k_ref, K_ref, vx_s, vxx_s) = refs
        else:
            (x_ref, u_ref, lxx_ref, luu_ref, lux_ref,
             xT_ref, k_ref, K_ref, vx_s, vxx_s) = refs
        t_idx = pl.program_id(1)

        @pl.when(t_idx == 0)
        def _():
            _terminal_into_scratch(terminal_fn, xT_ref[0], nx, vx_s, vxx_s)

        def basis(n, j, like):
            zeros = jnp.zeros_like(like[0])
            ones = jnp.ones_like(like[0])
            return jnp.stack(
                [ones if i == j else zeros for i in range(n)], axis=0
            )

        f32 = lambda v: jnp.asarray(v, jnp.float32)
        # The value-function carry flows latest-first THROUGH the unrolled
        # sub-steps in registers; scratch only bridges grid steps.
        v_x = [vx_s[i] for i in range(nx)]
        v_xx = [[vxx_s[i, j] for j in range(nx)] for i in range(nx)]

        for s in range(tu - 1, -1, -1):
            x = x_ref[0, s]      # [nx, sub, 128]
            u = u_ref[0, s]      # [nu, sub, 128]
            lanes = jnp.zeros_like(x[0])
            # The grid runs time-blocks reversed; block t_idx holds real
            # times [(P-1-t_idx)*tu .. +tu-1] with P = T//tu, processed
            # latest (s = tu-1) first.
            t_lane = lanes + (
                jnp.asarray(T - tu, jnp.float32)
                - jnp.asarray(float(tu), jnp.float32) * t_idx.astype(jnp.float32)
                + jnp.asarray(float(s), jnp.float32)
            )

            A = [[None] * nx for _ in range(nx)]
            for j in range(nx):
                _, col = jax.jvp(lambda xx: step_map(xx, u), (x,),
                                 (basis(nx, j, x),))
                for i in range(nx):
                    A[i][j] = f32(col[i])
            Bm = [[None] * nu for _ in range(nx)]
            for j in range(nu):
                _, col = jax.jvp(lambda uu: step_map(x, uu), (u,),
                                 (basis(nu, j, u),))
                for i in range(nx):
                    Bm[i][j] = f32(col[i])
            lx = []
            for j in range(nx):
                _, g = jax.jvp(
                    lambda a: stage_cost(a, u, t_lane), (x,), (basis(nx, j, x),)
                )
                lx.append(f32(g + lanes))
            lu = []
            for j in range(nu):
                _, g = jax.jvp(
                    lambda a: stage_cost(x, a, t_lane), (u,), (basis(nu, j, u),)
                )
                lu.append(f32(g + lanes))

            lb = [lb_ref[0, s, i] for i in range(nu)] if boxqp else None
            ub = [ub_ref[0, s, i] for i in range(nu)] if boxqp else None
            k_t, K_t, new_vx, new_vxx = _stage_core(
                _M2(A), _M2(Bm), lx, lu,
                lxx_ref[0, 0], luu_ref[0, 0], lux_ref[0, 0],
                v_x, v_xx, nx, nu, sub, reg_levels, boxqp, lb, ub,
            )

            for i in range(nu):
                k_ref[0, s, i] = k_t[i]
                for j in range(nx):
                    K_ref[0, s, i, j] = K_t[i][j]
            v_x = new_vx
            v_xx = [
                [0.5 * (new_vxx[i][j] + new_vxx[j][i]) for j in range(nx)]
                for i in range(nx)
            ]

        for j in range(nx):
            vx_s[j] = v_x[j]
        for i in range(nx):
            for j in range(nx):
                vxx_s[i, j] = v_xx[i][j]

    return kernel


def riccati_fusedlin_pallas_tiled(
    xs_stage_l: Array,   # [nb, T, nx, sub, 128] stage states x_0..x_{T-1}
    us_l: Array,         # [nb, T, nu, sub, 128]
    lxx_l: Array,        # [nb, 1, nx, nx, sub, 128] time-constant Hessians
    luu_l: Array,        # [nb, 1, nu, nu, sub, 128]
    lux_l: Array,        # [nb, 1, nu, nx, sub, 128]
    xT_l: Array,         # [nb, nx, sub, 128] terminal states
    *,
    dynamics,
    stage_cost,
    terminal_fn,
    dt: float,
    discrete: bool,
    reg_init: float = 1e-6,
    reg_factor: float = 10.0,
    reg_levels: int = 16,
    interpret: bool = False,
    lb_l: Array = None,   # [nb, T, nu, sub, 128] delta bounds -> in-kernel box QP
    ub_l: Array = None,
    time_unroll: int = 1,  # time steps per grid step (must divide T)
):
    """Backward pass with in-kernel linearization (stationary-cost fused path).

    Returns ``k [nb, T, nu, sub, 128]``, ``K [nb, T, nu, nx, sub, 128]``
    identical to ``linearize + riccati_backward_pallas_tiled(hess_tconst)``
    -- same jvp arithmetic, same stage recursion -- but reads (x, u) instead
    of precomputed (A, B, lx, lu) stacks and needs no separate linearize
    launch.  See :func:`_make_fusedlin_kernel`.
    """
    nb, T, nx = xs_stage_l.shape[:3]
    nu = us_l.shape[2]
    sub = xs_stage_l.shape[-2]
    dtype = jnp.float32
    boxqp = lb_l is not None
    tu = max(1, int(time_unroll))
    # boxqp stays tu=1: the in-kernel active-set gain solve is a large
    # traced body, and unrolling it 2x sent the interpret-mode compile of
    # the boxqp equivalence test from minutes to >40 min for a ~3% kernel
    # win the boxqp path doesn't need.
    if T % tu or boxqp:
        tu = 1
    P = T // tu

    levels = tuple(
        float(reg_init * (reg_factor**j - 1.0) / (reg_factor - 1.0))
        for j in range(reg_levels)
    )
    kernel = _make_fusedlin_kernel(
        T, nx, nu, levels, dt, dynamics, stage_cost, discrete,
        terminal_fn, sub, boxqp, tu=tu,
    )

    rev = lambda b, t: (b, P - 1 - t)
    spec = lambda *inner: pl.BlockSpec(
        (1, tu) + inner + (sub, LANE),
        lambda b, t: rev(b, t) + (0,) * len(inner) + (0, 0),
        memory_space=pltpu.VMEM,
    )
    hspec = lambda *inner: pl.BlockSpec(
        (1, 1) + inner + (sub, LANE),
        lambda b, t: (b, 0) + (0,) * len(inner) + (0, 0),
        memory_space=pltpu.VMEM,
    )
    spec0 = lambda *inner: pl.BlockSpec(
        (1,) + inner + (sub, LANE),
        lambda b, t: (b,) + (0,) * len(inner) + (0, 0),
        memory_space=pltpu.VMEM,
    )
    bound_inputs = (lb_l.astype(dtype), ub_l.astype(dtype)) if boxqp else ()
    bound_specs = [spec(nu), spec(nu)] if boxqp else []

    inputs = (
        xs_stage_l.astype(dtype), us_l.astype(dtype),
        lxx_l.astype(dtype), luu_l.astype(dtype), lux_l.astype(dtype),
    ) + bound_inputs + (xT_l.astype(dtype),)
    return pl.pallas_call(
        kernel,
        grid=(nb, P),
        in_specs=[
            spec(nx), spec(nu),
            hspec(nx, nx), hspec(nu, nu), hspec(nu, nx),
            *bound_specs,
            spec0(nx),
        ],
        out_specs=[spec(nu), spec(nu, nx)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, T, nu, sub, LANE), dtype),
            jax.ShapeDtypeStruct((nb, T, nu, nx, sub, LANE), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nx, sub, LANE), dtype),
            pltpu.VMEM((nx, nx, sub, LANE), dtype),
        ],
        interpret=interpret,
    )(*inputs)


@functools.partial(
    jax.jit,
    static_argnames=("reg_init", "reg_factor", "reg_levels", "interpret"),
)
def riccati_backward_pallas(
    A: Array,      # [B, T, nx, nx] continuous or discrete Jacobians
    Bm: Array,     # [B, T, nx, nu]
    lx: Array,     # [B, T, nx]
    lu: Array,     # [B, T, nu]
    lxx: Array,    # [B, T, nx, nx]
    luu: Array,    # [B, T, nu, nu]
    lux: Array,    # [B, T, nu, nx]
    vx0: Array,    # [B, nx]      terminal value gradient
    vxx0: Array,   # [B, nx, nx]  terminal value Hessian (symmetrized)
    reg_init: float = 1e-6,
    reg_factor: float = 10.0,
    reg_levels: int = 16,
    interpret: bool = False,
    lb: Array = None,   # [B, T, nu] delta lower bounds -> box-QP gains
    ub: Array = None,   # [B, T, nu] delta upper bounds
):
    """Batched Riccati backward pass; returns ``k [B, T, nu]``, ``K [B, T, nu, nx]``.

    With ``lb``/``ub`` (delta bounds around the current controls), each
    stage's gains solve the exact box-constrained QP in-kernel
    (control-limited DDP) instead of the unconstrained system.
    """
    B, T, nx, _ = A.shape
    nu = Bm.shape[-1]
    dtype = jnp.float32
    boxqp = lb is not None

    pad = (-B) % TILE
    if pad:
        padder = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
        A, Bm, lx, lu, lxx, luu, lux, vx0, vxx0 = map(
            padder, (A, Bm, lx, lu, lxx, luu, lux, vx0, vxx0)
        )
        if boxqp:
            lb, ub = padder(lb), padder(ub)
    Bp = B + pad
    nb = Bp // TILE

    def to_tiles(x, inner_shape):
        # [Bp, T, *inner] -> [nb, T, *inner, 8, 128]
        x = jnp.moveaxis(x.astype(dtype), 0, -1)              # [T, *inner, Bp]
        x = x.reshape(x.shape[:-1] + (nb, SUB, LANE))
        return jnp.moveaxis(x, -3, 0)                          # [nb, T, *inner, 8, 128]

    def to_tiles0(x):
        # [Bp, *inner] -> [nb, *inner, 8, 128]
        x = jnp.moveaxis(x.astype(dtype), 0, -1)
        x = x.reshape(x.shape[:-1] + (nb, SUB, LANE))
        return jnp.moveaxis(x, -3, 0)

    A_t = to_tiles(A, (nx, nx))
    B_t = to_tiles(Bm, (nx, nu))
    lx_t = to_tiles(lx, (nx,))
    lu_t = to_tiles(lu, (nu,))
    lxx_t = to_tiles(lxx, (nx, nx))
    luu_t = to_tiles(luu, (nu, nu))
    lux_t = to_tiles(lux, (nu, nx))
    vx_t = to_tiles0(vx0)
    vxx_t = to_tiles0(vxx0)

    bound_tiles = (to_tiles(lb, (nu,)), to_tiles(ub, (nu,))) if boxqp else ()

    k_tiles, K_tiles = riccati_backward_pallas_tiled(
        A_t, B_t, lx_t, lu_t, lxx_t, luu_t, lux_t, vx_t, vxx_t,
        reg_init=reg_init, reg_factor=reg_factor, reg_levels=reg_levels,
        interpret=interpret,
        lb_l=bound_tiles[0] if boxqp else None,
        ub_l=bound_tiles[1] if boxqp else None,
    )

    def from_tiles(x, inner):
        # [nb, T, *inner, 8, 128] -> [B, T, *inner]
        x = jnp.moveaxis(x, 0, -3)                      # [T, *inner, nb, 8, 128]
        x = x.reshape(x.shape[:-3] + (Bp,))
        return jnp.moveaxis(x, -1, 0)[:B]

    k = from_tiles(k_tiles, (nu,))
    K = from_tiles(K_tiles, (nu, nx))
    return k, K
