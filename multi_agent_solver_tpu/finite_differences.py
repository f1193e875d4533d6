"""Finite-difference derivative oracles with reference-parity epsilons.

TPU-native analogue of the reference's ``finite_differences.hpp``.  The
defaults everywhere else in this framework are exact automatic derivatives
(see :mod:`multi_agent_solver_tpu.derivatives`); this module exists for

1. **parity testing** against the C++ reference, which uses central finite
   differences by default (``finite_differences.hpp:17-346``), with its exact
   epsilon choices:

   * shooting cost gradient: ``eps = max(1e-6, 1e-8*|u|)``  (line 32)
   * dynamics Jacobians:     ``eps = 1e-6``                 (lines 57, 81)
   * cost gradients:         ``eps = 1e-6``                 (lines 114, 128)
   * cost Hessians:          ``eps = 1e-5`` diagonal 3-point + 4-point cross
     (lines 143, 181, 231)
   * cross term / constraint Jacobians: ``eps = 1e-6``      (lines 270, 299)

2. problems whose callbacks are not differentiable by JAX.

Unlike the reference's entry-by-entry loops, every probe direction is batched
with ``vmap`` so one XLA launch evaluates the whole stencil -- the TPU-native
formulation of the same numerics.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from .integrators import integrate_horizon, integrate_rk4
from .types import Array


def safe_eval(fn, *args) -> Array:
    """Map non-finite cost values to 0.0 (reference: finite_differences.hpp:94-107)."""
    value = fn(*args)
    return jnp.where(jnp.isfinite(value), value, 0.0)


def fd_jacobian(fn: Callable[[Array], Array], x: Array, eps: float = 1e-6) -> Array:
    """Central-difference Jacobian of ``fn`` at ``x``: shape ``[len(fn(x)), len(x)]``.

    All ``2n`` probe evaluations are batched via ``vmap`` (one fused launch)
    instead of the reference's per-column loop (finite_differences.hpp:53-92).
    """
    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype) * eps
    f_plus = jax.vmap(lambda d: fn(x + d))(eye)   # [n, m]
    f_minus = jax.vmap(lambda d: fn(x - d))(eye)  # [n, m]
    return ((f_plus - f_minus) / (2.0 * eps)).T


def fd_gradient(fn: Callable[[Array], Array], x: Array, eps: float = 1e-6) -> Array:
    """Central-difference gradient of a scalar function (finite_differences.hpp:110-136)."""
    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype) * eps
    f_plus = jax.vmap(lambda d: fn(x + d))(eye)
    f_minus = jax.vmap(lambda d: fn(x - d))(eye)
    return (f_plus - f_minus) / (2.0 * eps)


def fd_hessian(fn: Callable[[Array], Array], x: Array, eps: float = 1e-5) -> Array:
    """Reference-style Hessian: 3-point diagonal + 4-point off-diagonal stencil
    (finite_differences.hpp:138-210), evaluated as batched probes.
    """
    n = x.shape[0]
    eye = jnp.eye(n, dtype=x.dtype) * eps
    sfn = lambda y: safe_eval(fn, y)

    f0 = sfn(x)
    f_plus = jax.vmap(lambda d: sfn(x + d))(eye)
    f_minus = jax.vmap(lambda d: sfn(x - d))(eye)
    diag = (f_plus - 2.0 * f0 + f_minus) / (eps * eps)

    # Off-diagonal 4-point stencil over all (i, j) pairs.
    di = eye[:, None, :]  # [n, 1, n]
    dj = eye[None, :, :]  # [1, n, n]
    probe = lambda s_i, s_j: jax.vmap(jax.vmap(lambda a, b: sfn(x + a + b)))(
        jnp.broadcast_to(s_i * di, (n, n, n)), jnp.broadcast_to(s_j * dj, (n, n, n))
    )
    f_pp = probe(1.0, 1.0)
    f_pm = probe(1.0, -1.0)
    f_mp = probe(-1.0, 1.0)
    f_mm = probe(-1.0, -1.0)
    off = (f_pp - f_pm - f_mp + f_mm) / (4.0 * eps * eps)

    return jnp.where(jnp.eye(n, dtype=bool), jnp.diag(diag), off)


def fd_cross_term(
    fn_xu: Callable[[Array, Array], Array], x: Array, u: Array, eps: float = 1e-6
) -> Array:
    """4-point mixed-partial stencil d^2 l / du dx: shape ``[nu, nx]``
    (finite_differences.hpp:263-287).
    """
    n, m = x.shape[0], u.shape[0]
    ex = jnp.eye(n, dtype=x.dtype) * eps
    eu = jnp.eye(m, dtype=u.dtype) * eps
    sfn = lambda a, b: safe_eval(fn_xu, a, b)

    def entry(du, dx):
        f_pp = sfn(x + dx, u + du)
        f_pm = sfn(x - dx, u + du)
        f_mp = sfn(x + dx, u - du)
        f_mm = sfn(x - dx, u - du)
        return (f_pp - f_pm - f_mp + f_mm) / (4.0 * eps * eps)

    return jax.vmap(lambda du: jax.vmap(lambda dx: entry(du, dx))(ex))(eu)


def finite_differences_gradient(
    initial_state: Array,
    controls: Array,
    dynamics,
    objective_function,
    dt: float,
) -> Array:
    """Central-difference gradient of the total cost w.r.t. every control entry.

    Reference: ``finite_differences_gradient`` (finite_differences.hpp:17-48):
    each entry perturbs one ``(t, i)`` control element and performs two full
    horizon rollouts, with ``eps = max(1e-6, 1e-8 * |u_ti|)``.

    Here all ``2*T*nu`` rollouts run as ONE batched ``vmap`` over the
    perturbation axis -- the scan over time remains sequential but every lane
    of the VPU carries a different perturbed rollout.  Shape in/out:
    ``controls`` is ``[T, nu]``, result is ``[T, nu]``.
    """
    T, nu = controls.shape
    flat = controls.reshape(-1)
    eps = jnp.maximum(1e-6, 1e-8 * jnp.abs(flat))  # [T*nu]
    basis = jnp.eye(T * nu, dtype=controls.dtype) * eps[:, None]

    def rollout_cost(u_flat):
        u = u_flat.reshape(T, nu)
        xs = integrate_horizon(initial_state, u, dt, dynamics, integrate_rk4)
        return objective_function(xs, u)

    cost_plus = jax.vmap(lambda d: rollout_cost(flat + d))(basis)
    cost_minus = jax.vmap(lambda d: rollout_cost(flat - d))(basis)
    grad = (cost_plus - cost_minus) / (2.0 * eps)
    return grad.reshape(T, nu)
