"""Component-level timing of the nx=12 quadrotor scan-route solve (TPU).

VERDICT r3 item 6: split one batched quadrotor solve (batch 8192, T=40,
10 iterations) into its phases -- linearize / Riccati backward scan /
forward line-search pass -- to decide where the 4.9k solves/s route's time
goes.  Same chained-input timing methodology as bench.py.

Usage: B=8192 python scripts/profile_quadrotor.py
"""

import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_cpu_prefer_vector_width" not in _flags:
    os.environ["XLA_FLAGS"] = f"{_flags} --xla_cpu_prefer_vector_width=128".strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_quadrotor import build  # noqa: E402  (problem definition)
from multi_agent_solver_tpu.solvers.ilqr import (  # noqa: E402
    ILQRConfig, _backward_pass, _forward_pass, _linearize,
)

B = int(os.environ.get("B", "8192"))
T = int(os.environ.get("T", "40"))
REPS = int(os.environ.get("REPS", "5"))


def timeit(name, fn, *args):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    acc = jnp.ravel(leaf)[0] * 1e-12
    float(acc)
    ts = []
    a0 = args[0]
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(a0 + acc, *args[1:])
        leaf = jax.tree_util.tree_leaves(out)[0]
        acc = jnp.ravel(leaf)[0] * 1e-12
        float(acc)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"{name:>34}: {dt * 1e3:8.2f} ms  ({B / dt:,.0f}/s)")
    return dt


def main():
    solve_batch, x0 = build(B, T, 10)

    # Full solve for reference.
    t_full = timeit("full solve (10 iters)", solve_batch, x0)

    # Phase probes at a plausible mid-solve trajectory (the spec below is
    # bench_quadrotor.build's problem, restated because build closes over it).
    from multi_agent_solver_tpu.ocp import OCP
    from multi_agent_solver_tpu.models import quadrotor_dynamics, HOVER_THRUST

    w = jnp.array([4.0, 4.0, 4.0, 1.0, 1.0, 1.0,
                   2.0, 2.0, 2.0, 0.1, 0.1, 0.1], jnp.float32)
    u_hover = jnp.array([HOVER_THRUST, 0.0, 0.0, 0.0], jnp.float32)
    ru = jnp.array([0.1, 1.0, 1.0, 1.0], jnp.float32)

    ocp = OCP(
        state_dim=12, control_dim=4, horizon_steps=T, dt=0.05,
        initial_state=jnp.zeros(12, jnp.float32).at[0].set(1.0),
        dynamics=quadrotor_dynamics,
        stage_cost=lambda x, u, t: jnp.sum(w * x * x)
        + jnp.sum(ru * (u - u_hover) ** 2),
        terminal_cost=lambda x: 10.0 * jnp.sum(w * x * x),
        initial_controls=jnp.tile(u_hover, (T, 1)),
    )
    ocp.initialize_problem()
    spec = ocp.spec()
    config = ILQRConfig(max_iterations=10, tolerance=1e-6)

    us = jnp.tile(u_hover, (B, T, 1)) + 0.01
    xs = jax.jit(jax.vmap(lambda x0_, u_: spec.replace(initial_state=x0_).rollout(u_)))(x0, us)

    zeros = jnp.zeros((B, T, 0), jnp.float32)
    rho = jnp.full((B,), 10.0, jnp.float32)

    lin = jax.jit(jax.vmap(lambda X, U: _linearize(spec, config, X, U)))
    t_lin = timeit("linearize (AD step Jacobians)", lin, xs, us)
    A, Bm, lx, lu, lxx, luu, lux = jax.block_until_ready(lin(xs, us))

    bwd = jax.jit(jax.vmap(
        lambda X, a, b, c, d, e, f, g: _backward_pass(
            spec, config, X, a, b, c, d, e, f, g)
    ))
    t_bwd = timeit("Riccati backward (lax.scan)", bwd,
                   xs, A, Bm, lx, lu, lxx, luu, lux)
    k, K = bwd(xs, A, Bm, lx, lu, lxx, luu, lux)

    merit = jax.jit(jax.vmap(lambda X, U: spec.cost(X, U)))(xs, us)
    fwd = jax.jit(jax.vmap(
        lambda X, U, kk, KK, m: _forward_pass(
            spec, config, X, U, kk, KK, zeros[0], zeros[0], rho[0], m)
    ))
    t_fwd = timeit("forward pass (10-alpha ladder)", fwd, xs, us, k, K, merit)

    per_iter = t_lin + t_bwd + t_fwd
    print(f"\nphase sum x 10 iters = {per_iter * 10 * 1e3:.1f} ms "
          f"vs full solve {t_full * 1e3:.1f} ms "
          f"(gap = rollout/merit/glue)")
    print(f"split per iteration: linearize {t_lin / per_iter:.0%}, "
          f"backward {t_bwd / per_iter:.0%}, forward {t_fwd / per_iter:.0%}")


if __name__ == "__main__":
    main()
