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


# ---------------------------------------------------------------------------
# QP family (osqp.hpp / osqp_collocation.hpp)
# ---------------------------------------------------------------------------

QP_INFTY = 1e30


def solve_qp_oracle(P_diag, q, A, lb, ub, tol=1e-9, max_iter=200000):
    """Exact solution of  min 1/2 z'diag(P)z + q'z  s.t.  lb <= Az <= ub.

    The reference runs OSQP with polish enabled (osqp.hpp:49-54,
    osqp_collocation.hpp:106-113), i.e. ADMM followed by an active-set KKT
    refinement that lands on the exact optimum.  This oracle mirrors that:
    ADMM (sigma/alpha/rho and the eq-row rho scaling are OSQP's defaults)
    in chunks, each followed by a polish attempt whose result is accepted
    only when it passes an exact KKT check.  Strict convexity (the
    reference floors every Hessian diagonal) makes the optimum unique, so
    the oracle value is THE reference answer up to float64 roundoff.
    """
    n = q.shape[0]
    m = lb.shape[0]
    sigma, alpha, rho_bar = 1e-6, 1.6, 0.1
    is_eq = np.abs(ub - lb) < 1e-12
    rho = np.where(is_eq, rho_bar * 1e3, rho_bar)

    def kkt_ok(x, y):
        # Relative stationarity/feasibility scalings (OSQP's own convergence
        # criteria are relative the same way): badly-scaled Jacobians (the
        # rocket's thrust/m^2 reaches 2.5e4) make absolute 1e-7 unattainable
        # in f64 even for the exact KKT solve's roundoff.
        Ax = A @ x
        prim_scale = 1e-7 * max(1.0, np.max(np.abs(Ax)))
        if np.any(Ax < lb - prim_scale) or np.any(Ax > ub + prim_scale):
            return False
        dual_scale = max(
            1.0, np.max(np.abs(q)), np.max(np.abs(P_diag * x)),
            np.max(np.abs(A.T @ y)),
        )
        if np.max(np.abs(P_diag * x + q + A.T @ y)) > 1e-7 * dual_scale:
            return False
        comp_ub = (y > 1e-9) & ~is_eq
        comp_lb = (y < -1e-9) & ~is_eq
        comp_scale = 10.0 * prim_scale
        if np.any(np.abs(Ax[comp_ub] - ub[comp_ub]) > comp_scale):
            return False
        if np.any(np.abs(Ax[comp_lb] - lb[comp_lb]) > comp_scale):
            return False
        return True

    def _kkt_solve(active, z_ref):
        """Regularized KKT solve pinning the active rows at their nearer
        finite bound (OSQP polish linear algebra + iterative refinement)."""
        Aa = A[active]
        zb = z_ref[active]
        pin_ub = (ub[active] - zb) <= (zb - lb[active])
        ba = np.where(pin_ub, ub[active], lb[active])
        ba = np.where(np.abs(ba) >= QP_INFTY, lb[active], ba)
        ba = np.where(is_eq[active], lb[active], ba)
        ka = Aa.shape[0]
        delta = 1e-8
        K = np.block([
            [np.diag(P_diag + delta), Aa.T],
            [Aa, -delta * np.eye(ka)],
        ])
        rhs = np.concatenate([-q, ba])
        try:
            sol = np.linalg.solve(K, rhs)
            for _ in range(3):  # iterative refinement (OSQP polish style)
                r = rhs - K @ sol
                r[:n] += delta * sol[:n]          # un-regularized residual
                r[n:] -= delta * sol[n:]
                sol = sol + np.linalg.solve(K, r)
        except np.linalg.LinAlgError:
            return None
        x_p = sol[:n]
        y_p = np.zeros(m)
        y_p[active] = sol[n:]
        return x_p, y_p

    def polish(x, y, z, active=None):
        """Active-set refinement: solve the KKT system for a guessed active
        set, accept only on the exact KKT check, else drop wrong-signed
        duals / add violated rows and re-solve (up to 6 rounds).  Degenerate
        QPs (the rocket pins ~all variables through 2.5e4-magnitude rows)
        need the refinement; well-behaved ones accept on round one, which is
        exactly the old single-shot behavior."""
        scale_z = max(1.0, np.max(np.abs(z)))
        if active is None:
            at_lb = (z - lb <= 1e-7 * scale_z) & (y < 0.0)
            at_ub = (ub - z <= 1e-7 * scale_z) & (y > 0.0)
            active = at_lb | at_ub | is_eq
        z_ref = z
        for _ in range(6):
            if not np.any(active):
                x_p = -q / P_diag
                return (x_p, np.zeros(m)) if kkt_ok(x_p, np.zeros(m)) else None
            sol = _kkt_solve(active, z_ref)
            if sol is None:
                return None
            x_p, y_p = sol
            if kkt_ok(x_p, y_p):
                return x_p, y_p
            z_p = A @ x_p
            sz = max(1.0, np.max(np.abs(z_p)))
            near_lb = z_p - lb <= 1e-7 * sz
            near_ub = ub - z_p <= 1e-7 * sz
            # Candidate 2: wrong-signed duals on inequality rows zeroed
            # (degeneracy noise); certified by the same exact check.
            y_z = y_p.copy()
            wrong = ~is_eq & ((near_lb & (y_p > 0.0)) | (near_ub & (y_p < 0.0)))
            y_z[wrong] = 0.0
            if kkt_ok(x_p, y_z):
                return x_p, y_z
            viol = (z_p < lb - 1e-7 * sz) | (z_p > ub + 1e-7 * sz)
            new_active = (active & ~wrong) | viol | is_eq
            if np.array_equal(new_active, active):
                return None
            active = new_active
            z_ref = z_p
        return None

    # Modified Ruiz equilibration (what OSQP's scaling=10 setting does,
    # osqp.hpp:53): iteratively scale variables (D) and constraint rows (E)
    # toward unit infinity-norms, plus a cost scaling c.  ADMM runs on the
    # scaled problem; polish and the exact KKT check stay in ORIGINAL
    # coordinates, so equilibration only helps convergence, never changes
    # the certified answer.  Without it the rocket QP (P spanning 1e-6..2,
    # gradient -15 on a 1e-6-curvature variable, 1e30 bounds) stalls.
    D = np.ones(n)
    E = np.ones(m)
    c = 1.0
    Ps, qs, As = P_diag.copy(), q.copy(), A.copy()
    for _ in range(10):
        col = np.maximum(np.abs(Ps), np.abs(As).max(axis=0))
        col[col == 0.0] = 1.0
        d = 1.0 / np.sqrt(col)
        row = np.abs(As * d[None, :]).max(axis=1)
        row[row == 0.0] = 1.0
        e = 1.0 / np.sqrt(row)
        Ps *= d * d
        qs *= d
        As = (As * d[None, :]) * e[:, None]
        gamma = 1.0 / max(np.mean(np.abs(Ps)), np.max(np.abs(qs)), 1e-12)
        Ps *= gamma
        qs *= gamma
        c *= gamma
        D *= d
        E *= e
    lbs = np.clip(E * lb, -QP_INFTY, QP_INFTY)
    ubs = np.clip(E * ub, -QP_INFTY, QP_INFTY)
    rho_s = np.where(is_eq, rho_bar * 1e3, rho_bar)

    M = np.diag(Ps + sigma) + (As.T * rho_s) @ As
    L = np.linalg.cholesky(M)

    def chol_solve(b):
        return np.linalg.solve(L.T, np.linalg.solve(L, b))

    x = np.zeros(n)
    y = np.zeros(m)
    z = np.clip(As @ x, lbs, ubs)
    chunk = 2000
    for _ in range(max_iter // chunk):
        for _ in range(chunk):
            rhs = sigma * x - qs + As.T @ (rho_s * z - y)
            x_t = chol_solve(rhs)
            z_t = As @ x_t
            x = alpha * x_t + (1.0 - alpha) * x
            z_rel = alpha * z_t + (1.0 - alpha) * z
            z_new = np.clip(z_rel + y / rho_s, lbs, ubs)
            y = y + rho_s * (z_rel - z_new)
            z = z_new
        res = polish(D * x, E * y / c, z / E)
        if res is not None:
            return res

    # Fallback basin for QPs where ADMM stalls (the rocket shooting QP is
    # degenerate: its exact optimum pins nearly every variable to a bound
    # through 2.5e4-magnitude equality rows).  A generic NLP solver supplies
    # an approximate primal point; the active set is read off it, duals are
    # estimated by least squares, and polish() re-solves the KKT system.
    # The result is accepted ONLY if it passes the same exact KKT check as
    # the ADMM path, so certification is unchanged.
    from scipy import optimize, sparse

    nlp = optimize.minimize(
        lambda v: 0.5 * v @ (P_diag * v) + q @ v,
        np.zeros(n),
        jac=lambda v: P_diag * v + q,
        hess=lambda v: sparse.diags(P_diag),
        method="trust-constr",
        constraints=[optimize.LinearConstraint(
            sparse.csr_matrix(A), np.maximum(lb, -QP_INFTY), np.minimum(ub, QP_INFTY)
        )],
        options={"maxiter": 3000, "gtol": 1e-12, "xtol": 1e-16},
    )
    x_s = nlp.x
    z_s = A @ x_s
    sz = max(1.0, np.max(np.abs(z_s)))
    act = (z_s - lb <= 1e-6 * sz) | (ub - z_s <= 1e-6 * sz) | is_eq
    res = polish(x_s, np.zeros(m), z_s, active=act)
    if res is not None:
        return res
    raise RuntimeError("QP oracle failed to converge")


def osqp_shooting_solve(
    f, fx, fu, stage, terminal,
    lx, lu, lxx, luu, phix, phixx,
    x0, U0, dt, max_iterations, tolerance,
    state_lower=None, state_upper=None,
    input_lower=None, input_upper=None,
):
    """Mirror of the reference shooting SQP (osqp.hpp:62-198).

    Builds the reference's crude QP model exactly: diagonal-only Hessian
    floored at max(diag + reg, 1e-6) (osqp.hpp:283-307, reg stays 0 because
    the QP layer never fails here), dynamics rows x_{t+1} - A_t x_t - B_t u_t
    with lb = ub = 0 using the CONTINUOUS-time Jacobians and no affine
    defect (osqp.hpp:344-361), identity bound rows on every state/control
    (osqp.hpp:363-407; note x_0 is NOT pinned to the initial state).  Outer
    loop per osqp.hpp:122-198.  Returns (X, U, cost, n_iters).
    """
    T = U0.shape[0]
    nx = x0.shape[0]
    nu = U0.shape[1]
    Ns, n = T + 1, (T + 1) * nx + T * nu
    n_dyn = T * nx

    objective = lambda X, U: trajectory_cost(stage, terminal, X, U)

    U = U0.copy()
    X = rollout(f, x0, U, dt)
    cost = objective(X, U)

    def bounds_rows():
        lbs, ubs = [], []
        for t in range(Ns):
            lbs.append(state_lower if state_lower is not None else -QP_INFTY * np.ones(nx))
            ubs.append(state_upper if state_upper is not None else QP_INFTY * np.ones(nx))
        for t in range(T):
            lbs.append(input_lower if input_lower is not None else -QP_INFTY * np.ones(nu))
            ubs.append(input_upper if input_upper is not None else QP_INFTY * np.ones(nu))
        return np.concatenate(lbs), np.concatenate(ubs)

    lb_bnd, ub_bnd = bounds_rows()
    it_done = 0
    for it in range(max_iterations):
        it_done = it + 1
        # assemble_hessian (osqp.hpp:272-311), reg = 0
        P = np.empty(n)
        for t in range(T):
            P[t * nx:(t + 1) * nx] = np.maximum(
                np.diag(lxx(X[t], U[min(t, T - 1)], t)), 1e-6
            )
        P[T * nx:Ns * nx] = np.maximum(np.diag(phixx(X[T])), 1e-6)
        for t in range(T):
            P[Ns * nx + t * nu:Ns * nx + (t + 1) * nu] = np.maximum(
                np.diag(luu(X[t], U[t], t)), 1e-6
            )
        # assemble_gradient (osqp.hpp:314-330)
        g = np.zeros(n)
        for t in range(T):
            g[t * nx:(t + 1) * nx] = lx(X[t], U[t], t)
        g[T * nx:Ns * nx] = phix(X[T])
        for t in range(T):
            g[Ns * nx + t * nu:Ns * nx + (t + 1) * nu] = lu(X[t], U[t], t)
        # assemble_constraints (osqp.hpp:333-376)
        A_mat = np.zeros((n_dyn + Ns * nx + T * nu, n))
        for t in range(T):
            r0 = t * nx
            A_mat[r0:r0 + nx, (t + 1) * nx:(t + 2) * nx] = np.eye(nx)
            A_mat[r0:r0 + nx, t * nx:(t + 1) * nx] -= fx(X[t], U[t])
            A_mat[r0:r0 + nx, Ns * nx + t * nu:Ns * nx + (t + 1) * nu] -= fu(X[t], U[t])
        A_mat[n_dyn:n_dyn + Ns * nx + T * nu, :Ns * nx + T * nu] += np.eye(Ns * nx + T * nu)
        lbv = np.concatenate([np.zeros(n_dyn), lb_bnd])
        ubv = np.concatenate([np.zeros(n_dyn), ub_bnd])

        z_opt, _ = solve_qp_oracle(P, g, A_mat, lbv, ubv)
        u_cand = z_opt[Ns * nx:].reshape(T, nu)
        d_u = U - u_cand                              # osqp.hpp:168
        alpha = armijo(f, x0, U, d_u, objective, dt)  # osqp.hpp:170
        U_new = U - alpha * d_u
        X_new = rollout(f, x0, U_new, dt)
        cost_new = objective(X_new, U_new)

        if abs(cost - cost_new) < tolerance:          # osqp.hpp:177-185
            U, X, cost = U_new, X_new, cost_new
            break
        if cost_new < cost:                           # osqp.hpp:186-191
            U, X, cost = U_new, X_new, cost_new
        else:                                         # osqp.hpp:192-197
            break
    return X, U, cost, it_done


def osqp_collocation_solve(
    f, fx, fu, stage, terminal,
    lx, lu, lxx, luu, phix, phixx,
    x0, U0, dt, max_iterations, tolerance, reg=1e-6,
    state_lower=None, state_upper=None,
    input_lower=None, input_upper=None,
):
    """Mirror of the reference trapezoidal collocation SQP
    (osqp_collocation.hpp:244-510).

    Delta-form decision vector [dx_1..dx_T, du_0..du_{T-1}]; diagonal
    Hessians with the convexification shift |min diag| + reg when
    min(diag) + reg < 0 (osqp_collocation.hpp:274-283); trapezoidal defect
    equality rows (osqp_collocation.hpp:358-389); delta-form bound rows
    (osqp_collocation.hpp:398-421); full steps, stop on ||delta|| <
    tolerance (osqp_collocation.hpp:470-501).  Returns (X, U, cost, iters).
    """
    T = U0.shape[0]
    nx = x0.shape[0]
    nu = U0.shape[1]
    n = T * nx + T * nu
    n_dyn = T * nx

    def convexify(Qd):
        mn = Qd.min()
        if mn + reg < 0.0:
            return Qd + (abs(mn) + reg)
        return Qd

    U = U0.copy()
    X = rollout(f, x0, U, dt)
    X[0] = x0

    it_done = 0
    for it in range(max_iterations):
        it_done = it + 1
        # gradient (osqp_collocation.hpp:246-254)
        g = np.zeros(n)
        for t in range(1, T):
            g[(t - 1) * nx:t * nx] = lx(X[t], U[min(t, T - 1)], t)
        g[(T - 1) * nx:T * nx] = phix(X[T])
        for t in range(T):
            g[T * nx + t * nu:T * nx + (t + 1) * nu] = lu(X[t], U[t], t)
        # diagonal Hessian (osqp_collocation.hpp:256-340)
        P = np.empty(n)
        for t in range(1, T):
            P[(t - 1) * nx:t * nx] = convexify(
                np.diag(lxx(X[t], U[min(t, T - 1)], t))
            )
        P[(T - 1) * nx:T * nx] = convexify(np.diag(phixx(X[T])))
        for t in range(T):
            P[T * nx + t * nu:T * nx + (t + 1) * nu] = convexify(
                np.diag(luu(X[t], U[t], t))
            )
        # dynamics knots (osqp_collocation.hpp:342-356)
        Fx = [fx(X[t], U[min(t, T - 1)]) for t in range(T + 1)]
        Fu = [fu(X[t], U[min(t, T - 1)]) for t in range(T + 1)]
        fv = [f(X[t], U[min(t, T - 1)]) for t in range(T + 1)]
        # trapezoidal rows (osqp_collocation.hpp:358-389)
        A_mat = np.zeros((n_dyn + T * nx + T * nu, n))
        lbv = np.zeros(n_dyn + T * nx + T * nu)
        ubv = np.zeros_like(lbv)
        for t in range(T):
            r0 = t * nx
            defect = X[t + 1] - X[t] - 0.5 * dt * (fv[t] + fv[t + 1])
            lbv[r0:r0 + nx] = -defect
            ubv[r0:r0 + nx] = -defect
            A_mat[r0:r0 + nx, t * nx:(t + 1) * nx] = np.eye(nx) - 0.5 * dt * Fx[t + 1]
            if t > 0:
                A_mat[r0:r0 + nx, (t - 1) * nx:t * nx] = -np.eye(nx) - 0.5 * dt * Fx[t]
            A_mat[r0:r0 + nx, T * nx + t * nu:T * nx + (t + 1) * nu] = -0.5 * dt * Fu[t]
            if t + 1 < T:
                A_mat[r0:r0 + nx, T * nx + (t + 1) * nu:T * nx + (t + 2) * nu] = (
                    -0.5 * dt * Fu[t + 1]
                )
        # bound identity rows (osqp_collocation.hpp:398-421)
        A_mat[n_dyn:, :] = np.eye(T * nx + T * nu)
        for t in range(1, T + 1):
            r = n_dyn + (t - 1) * nx
            lbv[r:r + nx] = (state_lower - X[t]) if state_lower is not None else -QP_INFTY
            ubv[r:r + nx] = (state_upper - X[t]) if state_upper is not None else QP_INFTY
        for t in range(T):
            r = n_dyn + T * nx + t * nu
            lbv[r:r + nu] = (input_lower - U[t]) if input_lower is not None else -QP_INFTY
            ubv[r:r + nu] = (input_upper - U[t]) if input_upper is not None else QP_INFTY

        delta, _ = solve_qp_oracle(P, g, A_mat, lbv, ubv)
        # apply full step (osqp_collocation.hpp:486-494)
        for t in range(T):
            X[t + 1] += delta[t * nx:(t + 1) * nx]
            U[t] += delta[T * nx + t * nu:T * nx + (t + 1) * nu]
        if np.linalg.norm(delta) < tolerance:
            break
    cost = trajectory_cost(stage, terminal, X, U)      # osqp_collocation.hpp:503
    return X, U, cost, it_done
