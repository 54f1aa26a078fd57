"""Test configuration: run everything on 8 virtual CPU devices.

This is the fake-backend substitute for multi-chip hardware (SURVEY.md
section 4): sharding/collective tests get a real 8-device mesh without TPUs,
and all numerics run deterministic float32 on CPU.
"""

import os
import sys

# make `import immunostruct_tpu` / `import tests.*` work regardless of the
# directory pytest is invoked from
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Force CPU even when the environment pre-selects a TPU platform
# (JAX_PLATFORMS=axon under the tunnel); tests must be hermetic and fast.
# The site customization may import jax before this file runs, so the env
# var alone is not enough — explicitly update the config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for sharding tests"

# persistent compilation cache: the suite compiles many full-model programs;
# warm runs skip recompilation entirely
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
