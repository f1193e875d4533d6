"""Structured trajectory-QP backend vs the dense ADMM backend and the oracle."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_agent_solver_tpu.ops.block_tridiag import bt_factor, bt_solve
from multi_agent_solver_tpu.solvers.admm_qp import ADMMConfig, INFTY, solve_box_qp
from multi_agent_solver_tpu.solvers.traj_qp import (
    TrajQP,
    _kkt_blocks,
    solve_traj_box_qp,
)

from . import reference_mirror as mirror


def random_traj_qp(rng, N=7, nb=5, nr=3, with_boxes=True, allow_ranged=True):
    """A feasible stage-banded QP (its dense equivalent is returned too).

    ``allow_ranged=False`` keeps every banded row an equality -- the shape
    both SQP transcriptions produce and the IP backend requires.
    """
    P = np.abs(rng.normal(1.0, 0.4, (N, nb))) + 0.1
    q = rng.normal(0.0, 1.0, (N, nb))
    C = rng.normal(0.0, 0.6, (N - 1, nr, nb))
    Cp = rng.normal(0.0, 0.6, (N - 1, nr, nb))

    w_f = rng.uniform(-0.4, 0.4, (N, nb))          # feasibility anchor
    r_at = np.einsum("trb,tb->tr", C, w_f[:-1]) + np.einsum("trb,tb->tr", Cp, w_f[1:])
    r_lb = r_at.copy()
    r_ub = r_at.copy()
    # half the banded rows become ranged rows, the rest stay equalities
    ranged = (rng.uniform(size=r_at.shape) < 0.5) if allow_ranged else \
        np.zeros(r_at.shape, bool)
    r_lb = np.where(ranged, r_at - np.abs(rng.normal(0.5, 0.2, r_at.shape)), r_lb)
    r_ub = np.where(ranged, r_at + np.abs(rng.normal(0.5, 0.2, r_at.shape)), r_ub)
    if with_boxes:
        z_lb = w_f - np.abs(rng.normal(0.8, 0.3, (N, nb))) - 0.05
        z_ub = w_f + np.abs(rng.normal(0.8, 0.3, (N, nb))) + 0.05
    else:
        z_lb = np.full((N, nb), -INFTY)
        z_ub = np.full((N, nb), INFTY)

    qp = TrajQP(*(jnp.asarray(a) for a in (P, q, C, Cp, r_lb, r_ub, z_lb, z_ub)))

    # Dense equivalent.
    n = N * nb
    A = np.zeros(((N - 1) * nr + n, n))
    for t in range(N - 1):
        A[t * nr:(t + 1) * nr, t * nb:(t + 1) * nb] = C[t]
        A[t * nr:(t + 1) * nr, (t + 1) * nb:(t + 2) * nb] = Cp[t]
    A[(N - 1) * nr:, :] = np.eye(n)
    lb = np.concatenate([r_lb.reshape(-1), z_lb.reshape(-1)])
    ub = np.concatenate([r_ub.reshape(-1), z_ub.reshape(-1)])
    return qp, (P.reshape(-1), q.reshape(-1), A, lb, ub)


TIGHT = ADMMConfig(max_iterations=40000, eps_abs=1e-10, eps_rel=1e-10)


def test_structured_matches_oracle_and_dense():
    rng = np.random.default_rng(3)
    for trial in range(3):
        qp, (P, q, A, lb, ub) = random_traj_qp(rng)
        w_star, _ = mirror.solve_qp_oracle(P, q, A, lb, ub)

        sol_s = solve_traj_box_qp(qp, TIGHT)
        np.testing.assert_allclose(
            np.asarray(sol_s.w).reshape(-1), w_star, rtol=1e-6, atol=1e-7
        )

        sol_d = solve_box_qp(
            jnp.asarray(P), jnp.asarray(q), jnp.asarray(A),
            jnp.asarray(lb), jnp.asarray(ub), TIGHT,
        )
        np.testing.assert_allclose(
            np.asarray(sol_d.x), np.asarray(sol_s.w).reshape(-1),
            rtol=1e-6, atol=1e-6,
        )


def test_structured_without_scaling():
    rng = np.random.default_rng(11)
    qp, (P, q, A, lb, ub) = random_traj_qp(rng, N=4, nb=3, nr=2)
    w_star, _ = mirror.solve_qp_oracle(P, q, A, lb, ub)
    cfg = ADMMConfig(max_iterations=40000, eps_abs=1e-10, eps_rel=1e-10, scaling_iters=0)
    sol = solve_traj_box_qp(qp, cfg)
    np.testing.assert_allclose(np.asarray(sol.w).reshape(-1), w_star, rtol=1e-6, atol=1e-7)


def test_structured_vmaps():
    """Batched lanes (the Nash-sweep shape) go through vmap."""
    rng = np.random.default_rng(5)
    qps = [random_traj_qp(rng, N=5, nb=4, nr=2)[0] for _ in range(3)]
    batched = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qps)
    cfg = ADMMConfig(max_iterations=8000, eps_abs=1e-8, eps_rel=1e-8)
    sols = jax.vmap(lambda b: solve_traj_box_qp(b, cfg))(batched)
    for i, qp in enumerate(qps):
        single = solve_traj_box_qp(qp, cfg)
        np.testing.assert_allclose(
            np.asarray(sols.w[i]), np.asarray(single.w), rtol=1e-5, atol=1e-6
        )


def test_kkt_blocks_match_dense():
    """Block-tridiag KKT assembly equals diag(P+sigma) + A' rho A."""
    rng = np.random.default_rng(9)
    qp, (P, q, A, lb, ub) = random_traj_qp(rng, N=6, nb=4, nr=3)
    N, nb = qp.q.shape
    rho_r = jnp.asarray(np.abs(rng.normal(1.0, 0.5, qp.r_lb.shape)) + 0.1)
    rho_b = jnp.asarray(np.abs(rng.normal(1.0, 0.5, qp.z_lb.shape)) + 0.1)
    sigma = 1e-6
    D, L = _kkt_blocks(qp.P_diag, qp.C, qp.Cp, rho_r, rho_b, sigma)

    rho = np.concatenate([np.asarray(rho_r).reshape(-1), np.asarray(rho_b).reshape(-1)])
    K = np.diag(P + sigma) + (A.T * rho) @ A
    for i in range(N):
        np.testing.assert_allclose(
            np.asarray(D[i]), K[i * nb:(i + 1) * nb, i * nb:(i + 1) * nb], atol=1e-12
        )
    for i in range(N - 1):
        np.testing.assert_allclose(
            np.asarray(L[i]), K[(i + 1) * nb:(i + 2) * nb, i * nb:(i + 1) * nb], atol=1e-12
        )
    # And the off-band is exactly zero.
    Kb = np.zeros_like(K)
    for i in range(N):
        Kb[i * nb:(i + 1) * nb, i * nb:(i + 1) * nb] = 1
    for i in range(N - 1):
        Kb[(i + 1) * nb:(i + 2) * nb, i * nb:(i + 1) * nb] = 1
        Kb[i * nb:(i + 1) * nb, (i + 1) * nb:(i + 2) * nb] = 1
    assert np.allclose(K * (1 - Kb), 0.0)

    # Factor/solve round trip.
    b = rng.normal(size=(N, nb))
    x = np.asarray(bt_solve(bt_factor(D, L), jnp.asarray(b)))
    np.testing.assert_allclose(
        x.reshape(-1), np.linalg.solve(K, b.reshape(-1)), rtol=1e-9, atol=1e-10
    )
