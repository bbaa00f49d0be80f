"""Test config: force CPU with an 8-device virtual mesh (SURVEY §4: multi-
device tests via xla_force_host_platform_device_count) so sharding tests run
without TPUs.

NOTE: this environment's sitecustomize registers an `axon` TPU backend and
forces JAX_PLATFORMS=axon, so the env var alone is not enough — we must also
jax.config.update after import. Tests must never touch the (single, tunneled)
TPU chip; bench.py is the only TPU entry point.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# Persistent compilation cache: the suite's cost is dominated by XLA CPU
# compiles of render waves; caching them across runs keeps the default gate
# fast (first run pays, every later run loads). VERDICT r3 #9.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
