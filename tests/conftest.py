"""Test configuration.

Tests run on CPU; multi-device shard_map/pjit paths are exercised on a
virtual 8-device CPU mesh in dedicated subprocesses (the reference repo has
no distributed code at all; that suite is new capability). The env vars MUST
be set before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

# NOTE on multi-device testing: this box has a single CPU core, and forcing
# --xla_force_host_platform_device_count=8 process-wide oversubscribes XLA's
# per-device thread pools (~7x wall-clock blowup on every test). Sharding
# tests therefore run in dedicated *subprocesses* that set the flag themselves
# (see tests/test_sharding.py), keeping the rest of the suite single-device.

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel) in a way that
# overrides the env var; force the CPU backend explicitly or every compile
# and transfer round-trips through the tunnel (~10 s each).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache to amortize XLA:CPU compiles across runs.
# The dir is keyed by the host's CPU feature set: XLA:CPU AOT blobs embed
# machine features, and /tmp outlives VM migrations here — loading an entry
# compiled on a previous (different-featured) host SIGABRTs the process.
import hashlib  # noqa: E402


def _cpu_cache_dir():
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(
                (ln for ln in f if ln.startswith("flags")), "unknown"
            )
    except OSError:
        flags = "unknown"
    tag = hashlib.md5(flags.encode()).hexdigest()[:10]
    return f"/tmp/nf_cpu_jax_cache_{tag}"


jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(10)
