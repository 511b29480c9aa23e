"""taichi_mpm_tpu — a TPU-native MLS-MPM framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
yuanming-hu/taichi_mpm (MLS-MPM + CPIC two-way rigid coupling,
SIGGRAPH 2018). See SURVEY.md for the component-by-component map.
"""

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core import levelset
from taichi_mpm_tpu.core.adaptive import AsyncMPM
from taichi_mpm_tpu.core.solver import MPM, mechanical_energy
from taichi_mpm_tpu.core.state import Particles, empty_particles


def __getattr__(name):
    # lazy: parallel.driver pulls in the shard_map machinery
    if name in ("DistributedMPM", "DistributedAsyncMPM"):
        from taichi_mpm_tpu.parallel import driver

        return getattr(driver, name)
    raise AttributeError(name)


__version__ = "0.3.0"

__all__ = [
    "MPM",
    "AsyncMPM",
    "DistributedMPM",
    "DistributedAsyncMPM",
    "SimConfig",
    "Particles",
    "empty_particles",
    "mechanical_energy",
    "levelset",
]
