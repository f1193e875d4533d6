"""Time-parallel Riccati (associative scan) vs the sequential lax.scan pass."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multi_agent_solver_tpu.ops.riccati_assoc import riccati_backward_assoc

from .test_pallas_riccati import _random_problem, _scan_backward


@pytest.mark.parametrize("T", [8, 128, 512])
def test_matches_scan_to_1e6(T):
    p = _random_problem(1, B=3, T=T, nx=4, nu=2)
    p = {k: jnp.asarray(v, jnp.float64) for k, v in p.items()}
    k_a, K_a = riccati_backward_assoc(
        p["A"], p["Bm"], p["lx"], p["lu"], p["lxx"], p["luu"], p["lux"],
        p["vx0"], p["vxx0"],
    )
    k_r, K_r = jax.vmap(_scan_backward)(
        p["A"], p["Bm"], p["lx"], p["lu"], p["lxx"], p["luu"], p["lux"],
        p["vx0"], p["vxx0"],
    )
    np.testing.assert_allclose(np.asarray(k_a), np.asarray(k_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(K_a), np.asarray(K_r), atol=1e-6)


def test_cross_terms_and_dimensions():
    p = _random_problem(2, B=2, T=33, nx=6, nu=3)
    k_a, K_a = riccati_backward_assoc(
        p["A"], p["Bm"], p["lx"], p["lu"], p["lxx"], p["luu"], p["lux"],
        p["vx0"], p["vxx0"],
    )
    k_r, K_r = jax.vmap(_scan_backward)(
        p["A"], p["Bm"], p["lx"], p["lu"], p["lxx"], p["luu"], p["lux"],
        p["vx0"], p["vxx0"],
    )
    np.testing.assert_allclose(np.asarray(k_a), np.asarray(k_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(K_a), np.asarray(K_r), atol=1e-6)


def test_batched_ilqr_assoc_backward_solves_single_track():
    from multi_agent_solver_tpu.solvers.ilqr import ILQRConfig, solve_ilqr_batched

    from .problems import single_track_lane_ocp

    spec = single_track_lane_ocp().spec()
    specs = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), spec)
    config = ILQRConfig(max_iterations=100, tolerance=1e-6)
    r_assoc = solve_ilqr_batched(specs, config, backward="assoc")
    r_scan = solve_ilqr_batched(specs, config, backward="scan")
    np.testing.assert_allclose(
        np.asarray(r_assoc.cost), np.asarray(r_scan.cost), rtol=1e-5
    )
