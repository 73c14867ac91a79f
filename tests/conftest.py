"""Test harness configuration.

Forces an 8-device virtual CPU platform BEFORE jax initializes so every test
can exercise multi-chip sharding (mesh/pjit/shard_map paths) without TPU
hardware — JAX's standard fake-multi-device mechanism.
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon site customization re-forces JAX_PLATFORMS=axon (a tunneled TPU);
# jax.config wins over the env var, so pin the platform explicitly too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat test runs skip XLA recompiles
_CACHE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "mmrp_jax_cache")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
try:  # CPU-backend executable caching is gated separately
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
except (AttributeError, ValueError):
    pass

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped on purpose: a session-scoped generator couples every
    # test to the number of draws all EARLIER tests made, so adding a test
    # anywhere reshuffles the data of every test after it (measured: a
    # tolerance-tuned kernel test failed purely from stream shift)
    import numpy as np

    return np.random.default_rng(2709)
