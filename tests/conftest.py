"""Test config: run everything on CPU with 8 virtual devices.

Pallas kernels run with interpret=True on CPU; multi-chip sharding tests use
the 8 virtual host devices.  Must configure before any backend initializes
(the environment pre-sets jax_platforms to the axon TPU plugin, so we
override via jax.config, which wins over the env var).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache: the fast tier's cost is dominated by
# recompiling the same small jits every run; a warm cache cuts repeat
# `make test-fast` runs substantially.  Safe for correctness (keyed on
# HLO); delete .pytest_jax_cache to force cold compiles.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", ".pytest_jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_enable_xla_caches",
                      "xla_gpu_per_fusion_autotune_cache_dir")
except Exception:  # older jax: flag names differ — cache is best-effort
    pass
