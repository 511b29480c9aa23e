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
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
