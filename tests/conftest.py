"""Test harness: force the CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware.

Note: this environment's axon TPU plugin calls
``jax.config.update("jax_platforms", "axon,cpu")`` during interpreter startup
(sitecustomize), which overrides the JAX_PLATFORMS env var — so the config
must be forced back to cpu *after* importing jax."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is dominated by XLA compiles (2-core
# host); cached repeat runs are several times faster. Keyed per machine —
# XLA:CPU AOT results from a different host's ISA fail to load (or SIGILL).
from jrc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
