"""Test harness config: run on a virtual 8-device CPU mesh.

Mirrors the driver's multi-chip dry-run environment: sharding/pjit tests get
8 XLA host-platform devices without TPU hardware (SURVEY.md §4 test plan).

NOTE: this machine pins JAX_PLATFORMS=axon via sitecustomize, so the env var
alone is not enough — `jax.config.update` must run before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is compile-dominated (full ViT/train
# graphs); warm reruns skip XLA compilation entirely.
jax.config.update("jax_compilation_cache_dir", "/tmp/whmr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
