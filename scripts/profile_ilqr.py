"""Component-level timing of the batched iLQR solve on the TPU chip."""

import os, time, sys

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_cpu_prefer_vector_width" not in _flags:
    os.environ["XLA_FLAGS"] = f"{_flags} --xla_cpu_prefer_vector_width=128".strip()

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _single_track_spec
from multi_agent_solver_tpu.solvers.ilqr import (
    ILQRConfig, solve_ilqr, _linearize, _add_al_terms, _backward_pass, _forward_pass,
    compute_merit,
)

B = int(os.environ.get("B", "4096"))
spec = _single_track_spec(dtype=jnp.float32)
config = ILQRConfig(max_iterations=10, tolerance=1e-5)

rng = np.random.RandomState(0)
x0 = np.zeros((B, 4), np.float32)
x0[:, 1] = rng.uniform(0.5, 1.5, B)
x0 = jnp.asarray(x0)


def timeit(name, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:30s} {dt*1e3:8.2f} ms")
    return out


specs = jax.vmap(lambda s0: spec.replace(initial_state=s0))(x0)

rollout = jax.jit(jax.vmap(lambda s: s.rollout(s.initial_controls)))
xs = timeit("rollout", rollout, specs)
us = specs.initial_controls

lin = jax.jit(jax.vmap(lambda s, x, u: _linearize(s, config, x, u), in_axes=(0, 0, 0)))
A, Bm, lx, lu, lxx, luu, lux = timeit("linearize", lin, specs, xs, us)

bwd = jax.jit(jax.vmap(
    lambda s, x, a, b, c, d, e, f, g: _backward_pass(s, config, x, a, b, c, d, e, f, g),
    in_axes=(0,) * 9,
))
k, K = timeit("backward_pass", bwd, specs, xs, A, Bm, lx, lu, lxx, luu, lux)

rho = jnp.full((B,), 10.0, jnp.float32)
eq = jnp.zeros((B, 80, 0), jnp.float32)
ineq = jnp.zeros((B, 80, 0), jnp.float32)
merit = jax.jit(jax.vmap(
    lambda s, x, u, e, i, r: compute_merit(s, config, x, u, e, i, r), in_axes=(0,) * 6
))(specs, xs, us, eq, ineq, rho)

fwd = jax.jit(jax.vmap(
    lambda s, x, u, kk, KK, e, i, r, me: _forward_pass(s, config, x, u, kk, KK, e, i, r, me),
    in_axes=(0,) * 9,
))
timeit("forward_pass(10 alphas)", fwd, specs, xs, us, k, K, eq, ineq, rho, merit)

full = jax.jit(jax.vmap(lambda s: solve_ilqr(s, config)))
timeit("full solve (10 iters)", full, specs, n=2)
print(f"batch={B}")
