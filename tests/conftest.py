"""Test config: CPU backend, 8 virtual devices for mesh tests, float64 parity.

Some installed pytest plugins (jaxtyping) import jax before this conftest
runs, so env vars alone are too late for JAX_PLATFORMS/JAX_ENABLE_X64.  The
backend itself is still uninitialized at conftest time, so configure through
jax.config, which takes effect at first backend use.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_ENABLE_X64"] = "true"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on CPU; backend was initialized before conftest")
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
