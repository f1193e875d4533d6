"""Test configuration: CPU backend with 8 virtual devices, float64.

* Tests run on CPU (x64) so numerical parity with the C++ reference's doubles
  can be asserted tightly; TPU runs use f32/bf16 and are benchmarked
  separately.
* ``--xla_cpu_prefer_vector_width=128`` works around a heap-corruption
  miscompile in this environment's jaxlib CPU backend (f64 pad/fusion at the
  default vector width 512 aborts with malloc/free errors or returns
  nondeterministic garbage).
* 8 virtual host devices back the multi-chip sharding tests.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
for flag in (
    "--xla_cpu_prefer_vector_width=128",
    "--xla_force_host_platform_device_count=8",
):
    if flag.split("=")[0] not in _flags:
        _flags = f"{_flags} {flag}".strip()
os.environ["XLA_FLAGS"] = _flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# NOTE: this environment's jax build hardwires jax_platforms to "axon,cpu",
# overriding the JAX_PLATFORMS env var -- computations silently land on the
# tunneled TPU (and its device-to-host transfers can hang).  Pin via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
