"""Test harness setup: force CPU JAX with 8 virtual devices so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4: fake an 8-device mesh
via --xla_force_host_platform_device_count)."""
import os

# Must run before the first `import jax` anywhere in the test session.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The hosting environment may pin JAX_PLATFORMS to a hardware plugin via
# sitecustomize; force the CPU backend explicitly so tests always run on the
# 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent XLA compilation cache: the suite is dominated by CPU
# compiles of near-identical tiny train steps; warm reruns cut wall time
# several-fold.  Keyed by jaxlib version + flags, so it is safe across
# upgrades; delete the directory to force cold compiles.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_key():
    return jax.random.key(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
