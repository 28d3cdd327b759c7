"""Test config: CPU backend, 8 virtual devices for mesh tests, float64 parity.

Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_ENABLE_X64"] = "true"
# persistent compilation cache: test configs recompile identically across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gst_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
