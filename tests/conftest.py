"""Test harness: force CPU with 8 virtual devices (multi-chip sharding tests
without hardware) and a persistent compilation cache.

NOTE: this image force-registers a remote-TPU ('axon') PJRT backend via
sitecustomize; jax.config.update('jax_platforms', 'cpu') AFTER import is
the only reliable way to keep tests off the TPU tunnel.
"""
import os

os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
# Key the persistent cache by this host's CPU flags: XLA:CPU AOT results
# compiled on a host with different features (e.g. amx/avx512 extras)
# load with "could lead to SIGILL" warnings and can kill the process
# silently mid-suite when such an entry is actually executed.
import hashlib


def _cpu_cache_dir():
    try:
        flags = [l for l in open("/proc/cpuinfo") if l.startswith("flags")][0]
    except (OSError, IndexError):
        flags = "unknown"
    tag = hashlib.sha1(flags.encode()).hexdigest()[:12]
    return f"/tmp/ttsx_jax_cache_{tag}"


jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest
import numpy as np


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def np_rng():
    return np.random.default_rng(0)
