"""Test config: force CPU with 8 virtual devices so sharding/multi-chip tests
run anywhere, and keep fp32 matmuls for numerical parity tests.

Note: this machine's sitecustomize imports jax at interpreter startup and
registers a TPU plugin, so env vars set here are too late — we override
through jax.config instead (backend resolution is lazy, so this works as
long as no test module touches devices at import time).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
