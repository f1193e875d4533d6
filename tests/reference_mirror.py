"""NumPy oracle mirroring the C++ reference algorithms step-for-step.

The C++ reference cannot be built in this environment (no Eigen available), so
parity tests validate the JAX solvers against this independently written NumPy
transcription of the reference's *algorithms* (cited per function).  Pure
NumPy doubles, sequential loops -- deliberately the opposite architecture of
the TPU framework, so agreement is meaningful.

Trajectories here are time-major to match the JAX side.
"""

from __future__ import annotations

import numpy as np


def rk4_step(f, x, u, dt):
    """integrator.hpp:19-28."""
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def rollout(f, x0, U, dt):
    """integrator.hpp:31-48."""
    T = U.shape[0]
    X = np.zeros((T + 1, x0.shape[0]))
    X[0] = x0
    for t in range(T):
        X[t + 1] = rk4_step(f, X[t], U[t], dt)
    return X


def trajectory_cost(stage, terminal, X, U):
    """ocp.hpp:14-28."""
    c = 0.0
    for t in range(U.shape[0]):
        c += stage(X[t], U[t], t)
    return c + terminal(X[-1])


def fd_shooting_gradient(f, x0, U, objective, dt):
    """finite_differences.hpp:17-48: central diff, eps = max(1e-6, 1e-8|u|)."""
    g = np.zeros_like(U)
    for t in range(U.shape[0]):
        for i in range(U.shape[1]):
            eps = max(1e-6, 1e-8 * abs(U[t, i]))
            Up = U.copy(); Up[t, i] += eps
            Um = U.copy(); Um[t, i] -= eps
            cp = objective(rollout(f, x0, Up, dt), Up)
            cm = objective(rollout(f, x0, Um, dt), Um)
            g[t, i] = (cp - cm) / (2.0 * eps)
    return g


def armijo(f, x0, U, g, objective, dt):
    """line_search.hpp:30-70."""
    alpha, beta, c1 = 1.0, 0.5, 1e-6
    cost_ref = objective(rollout(f, x0, U, dt), U)
    dir_deriv = -np.sum(g * g)
    while True:
        Ut = U - alpha * g
        if objective(rollout(f, x0, Ut, dt), Ut) <= cost_ref + c1 * alpha * dir_deriv:
            return alpha
        alpha *= beta
        if alpha < 1e-8:
            return alpha


def cgd_solve(f, stage, terminal, x0, U0, dt, max_iterations,
              input_lower=None, input_upper=None):
    """Mirror of the reference CGD on an unconstrained problem (cgd.hpp:47-117;
    the convergence break is debug-gated there, so it always runs
    max_iterations).  Returns (X, U, cost)."""
    objective = lambda X, U: trajectory_cost(stage, terminal, X, U)
    U = U0.copy()
    X = rollout(f, x0, U, dt)
    cost = objective(X, U)
    for _ in range(max_iterations):
        g = fd_shooting_gradient(f, x0, U, objective, dt)
        alpha = armijo(f, x0, U, g, objective, dt)
        Ut = U - alpha * g
        if input_lower is not None and input_upper is not None:
            Ut = np.clip(Ut, input_lower, input_upper)
        Xt = rollout(f, x0, Ut, dt)
        ct = objective(Xt, Ut)
        if ct < cost:
            U, X, cost = Ut, Xt, ct
    return X, U, cost


def ilqr_solve(
    f,
    fx,
    fu,
    stage,
    terminal,
    lx,
    lu,
    lxx,
    luu,
    lux,
    phix,
    phixx,
    x0,
    U0,
    dt,
    max_iterations,
    tolerance,
    input_lower=None,
    input_upper=None,
):
    """Unconstrained-path mirror of the reference AL-iLQR (ilqr.hpp:58-273).

    ``fx``/``fu`` are whatever Jacobians the caller supplies -- pass the
    continuous-time ones for exact reference parity (ilqr.hpp:106-107).
    Returns (X, U, cost, merit_history).
    """
    T = U0.shape[0]
    nx = x0.shape[0]
    nu = U0.shape[1]

    X = rollout(f, x0, U0, dt)
    U = U0.copy()
    cost = trajectory_cost(stage, terminal, X, U)
    merit = cost  # no constraints: merit == objective (ilqr.hpp:379-384)
    history = [merit]

    for _ in range(max_iterations):
        v_x = phix(X[-1])
        v_xx = phixx(X[-1])
        v_xx = 0.5 * (v_xx + v_xx.T)

        ks = np.zeros((T, nu))
        Ks = np.zeros((T, nu, nx))
        for t in range(T - 1, -1, -1):
            A = fx(X[t], U[t])
            B = fu(X[t], U[t])
            q_x = lx(X[t], U[t], t) + A.T @ v_x
            q_u = lu(X[t], U[t], t) + B.T @ v_x
            q_xx = lxx(X[t], U[t], t) + A.T @ v_xx @ A
            q_ux = lux(X[t], U[t], t) + B.T @ v_xx @ A
            q_uu = luu(X[t], U[t], t) + B.T @ v_xx @ B

            q_uu_reg = q_uu.copy()
            reg = 1e-6
            while True:  # ilqr.hpp:172-183
                try:
                    np.linalg.cholesky(q_uu_reg)
                    break
                except np.linalg.LinAlgError:
                    q_uu_reg = q_uu_reg + reg * np.eye(nu)
                    reg *= 10.0
            q_uu_inv = np.linalg.inv(q_uu_reg)
            k_t = -q_uu_inv @ q_u
            K_t = -q_uu_inv @ q_ux

            v_x = q_x + K_t.T @ q_u + q_ux.T @ k_t + K_t.T @ q_uu @ k_t
            v_xx = q_xx + K_t.T @ q_ux + q_ux.T @ K_t + K_t.T @ q_uu @ K_t
            v_xx = 0.5 * (v_xx + v_xx.T)
            ks[t] = k_t
            Ks[t] = K_t

        # Forward line search (ilqr.hpp:195-228)
        alpha = 1.0
        best_merit = merit
        best_X, best_U = X, U
        while alpha >= 1e-3:
            Xt = np.zeros_like(X)
            Ut = np.zeros_like(U)
            Xt[0] = x0
            for t in range(T):
                du = alpha * ks[t] + Ks[t] @ (Xt[t] - X[t])
                Ut[t] = U[t] + du
                if input_lower is not None and input_upper is not None:
                    Ut[t] = np.clip(Ut[t], input_lower, input_upper)
                Xt[t + 1] = rk4_step(f, Xt[t], Ut[t], dt)
            m = trajectory_cost(stage, terminal, Xt, Ut)
            if m < best_merit:
                best_merit = m
                best_X, best_U = Xt, Ut
                break
            alpha *= 0.5

        improvement = merit - best_merit
        X, U = best_X, best_U
        cost = trajectory_cost(stage, terminal, X, U)
        merit = best_merit
        history.append(merit)
        if improvement < tolerance:
            break

    return X, U, cost, history
