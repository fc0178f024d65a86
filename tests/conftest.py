"""Test harness: force an 8-virtual-device CPU platform.

The driver benches on one real TPU chip; tests run everywhere on a faked
8-device CPU mesh (the standard JAX substitute for multi-chip CI — see
SURVEY.md §4d).

Note: this image registers a TPU PJRT plugin from sitecustomize and forces
``jax_platforms="axon,cpu"`` — a plain JAX_PLATFORMS env var is overridden,
so we must re-force CPU via jax.config *before any backend initializes*.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_programs_between_modules():
    """Free compiled executables after each test module.

    The full suite compiles hundreds of CPU programs in one process;
    past ~130 tests jaxlib's CPU JIT segfaulted *inside a later
    compile* (observed at test_voxel_map::test_match_respects_mask,
    crash in backend_compile_and_load — an accumulation bug, not a test
    bug: the same module passes in isolation).  Dropping executable
    references between modules caps the number of live loaded programs.
    Cross-module compile reuse is minimal, so this costs little time."""
    yield
    jax.clear_caches()
