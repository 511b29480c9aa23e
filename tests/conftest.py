"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by forcing
the host platform and splitting it into 8 XLA devices (the strategy the
reference cannot test at all — it has no distributed backend, see
SURVEY.md §2.3). Must run before the first `import jax`.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image pins JAX_PLATFORMS=axon at a level that can win over the env
# var; force the platform through the config API as well.
import gc  # noqa: E402

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules: the full suite
    accumulates hundreds of CPU executables (8 virtual devices x
    interpret-mode Pallas programs) and has segfaulted inside XLA's
    backend_compile after ~70 tests; per-module cache clearing keeps
    the one-process `pytest tests/` run viable."""
    yield
    jax.clear_caches()
    gc.collect()
