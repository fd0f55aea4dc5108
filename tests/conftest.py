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
