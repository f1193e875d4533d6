"""Block-tridiagonal SPD solves by cyclic reduction, TPU-native.

The ADMM KKT matrix of a trajectory QP,

    K = diag(P + sigma) + A' diag(rho) A,

is block tridiagonal whenever the constraint rows couple at most two
consecutive stage-variable blocks (shooting: rows over [x_t, u_t, x_{t+1}];
trapezoidal collocation: rows over [dx_t, du_t, dx_{t+1}, du_{t+1}]).  The
reference hands this to OSQP's sparse LDL^T (osqp.hpp:15); a dense factor
(admm_qp.py) is O((T nb)^3) and dies on long horizons or stacked agents.

A sequential block LDL^T would be O(T nb^3) but latency-bound on TPU (T
dependent steps of tiny matrix ops).  **Cyclic reduction** instead
eliminates all odd-indexed blocks simultaneously -- one batched step per
level, log2(T) levels, every step dense batched matmuls on the MXU:

    level:  D'_k = D_2k - L_{2k-1} D_{2k-1}^-1 L_{2k-1}' - L_2k' D_{2k+1}^-1 L_2k
            L'_k = -L_{2k+1} D_{2k+1}^-1 L_2k
    solve:  b'_k = b_2k - L_{2k-1} D_{2k-1}^-1 b_{2k-1} - L_2k' D_{2k+1}^-1 b_{2k+1}
    back:   x_j  = D_j^-1 (b_j - L_{j-1} x_{j-1} - L_j' x_{j+1})   (odd j)

Each reduced system is a Schur complement of an SPD matrix, so every D
stays SPD and the recursion is numerically stable (Buzbee-Golub-Nielson).

Convention: ``D`` [N, nb, nb] diagonal blocks, ``L`` [N-1, nb, nb] with
``K[i+1, i] = L[i]`` (sub-diagonal; the super-diagonal is its transpose).
``bt_factor`` precomputes the per-level inverses once; ``bt_solve`` then
costs ~4 log2(N) batched matmuls -- the shape ADMM needs (one factor, many
solves).  Everything is jit/vmap-compatible (levels are a static Python
loop; shapes halve deterministically).
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..types import Array
from .small import spd_inv_unrolled


def _inv_spd(X: Array) -> Array:
    """SPD block inverse: unrolled Cholesky for small static n (the 40x-slow
    batched-tiny-LU pitfall, ops/small.py::spd_inv_unrolled), generic LU
    beyond the unroll's sweet spot.

    The unroll emits ~n^3 traced scalar ops, so it only pays when a LARGE
    batch amortizes them on the VPU.  At example scale (batch ~1-10 stage
    blocks, n ~ 30 for a 10-agent global OCP) the unrolled trace/compile
    dominated the whole solve -- measured 39 s compile / 9.4 s trace for
    ONE centralized-osqp LQR cell, ~5 s of it tracing 8 unrolled 30x30
    inverses -- while a plain LU at that batch is microseconds.  Gate:
    unroll only for genuinely tiny blocks, or batches big enough to hit
    the batched-tiny-LU pitfall the unroll exists to avoid (round 3:
    [40960, 6, 6] measured 99 ms LU vs sub-ms unrolled)."""
    n = X.shape[-1]
    batch_elems = 1
    for s in X.shape[:-2]:
        batch_elems *= int(s)
    if n <= 8 or (batch_elems >= 1024 and n <= 32):
        return spd_inv_unrolled(X)
    return jnp.linalg.inv(X)


class BTLevel(NamedTuple):
    dinv_odd: Array   # [n_odd, nb, nb] inverses of odd diagonal blocks
    L: Array          # [N-1, nb, nb] this level's sub-diagonal blocks


class BTFactor(NamedTuple):
    levels: Tuple[BTLevel, ...]
    root_inv: Array   # [N_f*nb, N_f*nb] inverse of the final small system


def _dense_from_blocks(D: Array, L: Array) -> Array:
    """Assemble the dense matrix (for the root system / testing)."""
    N, nb = D.shape[0], D.shape[1]
    K = jnp.zeros((N * nb, N * nb), D.dtype)
    for i in range(N):
        K = K.at[i * nb:(i + 1) * nb, i * nb:(i + 1) * nb].set(D[i])
    for i in range(N - 1):
        K = K.at[(i + 1) * nb:(i + 2) * nb, i * nb:(i + 1) * nb].set(L[i])
        K = K.at[i * nb:(i + 1) * nb, (i + 1) * nb:(i + 2) * nb].set(
            jnp.swapaxes(L[i], -1, -2)
        )
    return K


_ROOT_N = 2   # stop recursion at <= 2 blocks


def bt_factor(D: Array, L: Array) -> BTFactor:
    """Precompute cyclic-reduction levels for K x = b solves."""
    levels: List[BTLevel] = []
    while D.shape[0] > _ROOT_N:
        N, nb = D.shape[0], D.shape[1]
        n_odd = N // 2
        n_even = N - n_odd

        D_odd = D[1::2]                                   # [n_odd, nb, nb]
        dinv_odd = _inv_spd(D_odd)
        levels.append(BTLevel(dinv_odd=dinv_odd, L=L))

        # L_{2k-1} exists for k >= 1; L_{2k} exists for 2k <= N-2.
        L_lo = L[0::2][: n_odd]                           # L_{2k}
        L_hi = L[1::2]                                    # L_{2k+1} == L_{2k-1} shifted
        Dp = D[0::2]
        # K[2k, 2k+1] = L_{2k}^T ; K[2k+1, 2k] = L_{2k}:
        # right term  = L_{2k}^T Dinv_{2k+1} L_{2k}
        t_right = jnp.einsum("kba,kbc,kcd->kad", L_lo, dinv_odd, L_lo)
        # left term (k >= 1) = L_{2k-1} Dinv_{2k-1} L_{2k-1}^T;
        # L_{2k-1} for k = 1, 2, ... are rows L[1], L[3], ... = L[1::2],
        # and Dinv_{2k-1} = dinv_odd[k-1].
        L_left = L[1::2]
        dinv_left = dinv_odd[: L_left.shape[0]]
        t_left = jnp.einsum("kab,kbc,kdc->kad", L_left, dinv_left, L_left)

        Dp = Dp.at[: t_right.shape[0]].add(-t_right)
        Dp = Dp.at[1:1 + t_left.shape[0]].add(-t_left)

        # L'_k = K'[2k+2, 2k] = -K[2k+2,2k+1] Dinv_{2k+1} K[2k+1,2k]
        #      = -L_{2k+1} Dinv_{2k+1} L_{2k}
        n_Lp = n_even - 1
        Lp = -jnp.einsum(
            "kab,kbc,kcd->kad",
            L_hi[:n_Lp], dinv_odd[:n_Lp], L_lo[:n_Lp],
        )
        D, L = Dp, Lp

    root = _dense_from_blocks(D, L)
    return BTFactor(levels=tuple(levels), root_inv=_inv_spd(root))


def bt_solve(factor: BTFactor, b: Array) -> Array:
    """Solve K x = b given a cyclic-reduction factor.  ``b``: [N, nb]."""
    stack: List[Tuple[Array, Array, Array]] = []  # (b_full, dinv_odd, L)
    for lvl in factor.levels:
        N = b.shape[0]
        n_odd = N // 2
        dinv_odd, L = lvl.dinv_odd, lvl.L
        stack.append((b, dinv_odd, L))

        L_lo = L[0::2][:n_odd]
        L_left = L[1::2]
        dinv_left = dinv_odd[: L_left.shape[0]]

        db_odd = jnp.einsum("kab,kb->ka", dinv_odd, b[1::2])
        bp = b[0::2]
        # right term: K[2k,2k+1] Dinv b_{2k+1} = L_{2k}^T Dinv b
        t_right = jnp.einsum("kba,kb->ka", L_lo, db_odd[: L_lo.shape[0]])
        # left term: L_{2k-1} Dinv b_{2k-1}
        t_left = jnp.einsum("kab,kb->ka", L_left, db_odd[: L_left.shape[0]])
        bp = bp.at[: t_right.shape[0]].add(-t_right)
        bp = bp.at[1:1 + t_left.shape[0]].add(-t_left)
        b = bp

    N_f, nb = b.shape
    x = (factor.root_inv @ b.reshape(-1)).reshape(N_f, nb)

    for b_full, dinv_odd, L in reversed(stack):
        N = b_full.shape[0]
        n_odd = N // 2
        x_even = x                                        # [n_even, nb]
        rhs_odd = b_full[1::2]
        # x_odd_j, j = 2k+1: b_j - L_{2k} x_{2k} - L_{2k+1}^T x_{2k+2}
        L_lo = L[0::2][:n_odd]
        L_hi = L[1::2]
        rhs_odd = rhs_odd - jnp.einsum("kab,kb->ka", L_lo, x_even[:n_odd])
        t_up = jnp.einsum("kba,kb->ka", L_hi, x_even[1:1 + L_hi.shape[0]])
        rhs_odd = rhs_odd.at[: t_up.shape[0]].add(-t_up)
        x_odd = jnp.einsum("kab,kb->ka", dinv_odd, rhs_odd)

        x_full = jnp.zeros_like(b_full)
        x_full = x_full.at[0::2].set(x_even)
        x_full = x_full.at[1::2].set(x_odd)
        x = x_full
    return x
