"""Test harness config: run on a virtual 8-device CPU mesh.

Mirrors the driver's multi-chip dry-run environment: sharding/pjit tests get
8 XLA host-platform devices without TPU hardware (SURVEY.md §4 test plan).

NOTE: this machine pins JAX_PLATFORMS=axon via sitecustomize, so the env var
alone is not enough — `jax.config.update` must run before any backend use.
"""

import os
import re

# Force EXACTLY 8 devices: an inherited count (e.g. left over from a
# dryrun_multichip experiment) would silently shrink the test mesh and
# break the documented dp=4 x tp=2 sharding tests.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" in flags:
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "--xla_force_host_platform_device_count=8", flags,
    )
else:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is compile-dominated (full ViT/train
# graphs); warm reruns skip XLA compilation entirely. Shared helper so the
# cache path/threshold stay in lockstep with bench.py and the CLIs.
from whmr_tpu.utils.profiling import enable_compile_cache

enable_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
