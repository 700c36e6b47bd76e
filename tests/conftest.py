"""Test harness: force the CPU backend with 8 virtual devices so the full
sharding story runs anywhere; the real-TPU path is exercised by bench.py.

Note: this environment's sitecustomize registers an `axon` TPU plugin and
forces `jax_platforms=axon,cpu` from inside register(), so the env var
alone is not enough — we must override the config after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
