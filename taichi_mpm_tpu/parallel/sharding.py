"""Multi-chip SPMD execution over a jax.sharding.Mesh.

The reference is single-process shared-memory (TBB); it has *no*
distributed backend (vestigial `#ifdef TC_USE_MPI`, mpm.cpp:6-8). This
module is where the TPU build adds one (SURVEY.md §2.3 / §5):

Stage 1 (this file, v1): particle data parallelism — particles are
sharded over the mesh, each shard scatters to a local grid, and the grid
is reduced with psum (the exact analog of the reference's per-thread
impulse accumulators, generalized across chips). Grid ops are computed
redundantly per shard (they are cheap relative to transfers). Correct
for any particle distribution; grid memory is replicated.

Stage 2 (spatial domain decomposition with ppermute halo exchange and
ragged all-to-all particle migration) builds on the blocked layout in
taichi_mpm_tpu.ops and replaces the psum here for large grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core import transfer
from taichi_mpm_tpu.core.state import Particles


def make_mesh(n_devices: int | None = None, axis: str = "shard") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_particles(p: Particles, mesh: Mesh, axis: str = "shard") -> Particles:
    """Place particle arrays sharded on their leading (capacity) axis.

    Capacity must be divisible by the mesh size; pad before calling.
    """
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, p)


def sharded_substep(p: Particles, t, cfg: SimConfig, colliders, dt, axis: str):
    """One substep inside shard_map: local P2G -> psum grid -> local G2P."""
    grid = transfer.p2g(p, cfg, dt)  # local particles only
    grid = jax.lax.psum(grid, axis)  # combine shards' scatters
    grid_v, _ = transfer.grid_update(grid, cfg, colliders, t, dt)
    p = transfer.g2p(p, grid_v, cfg, dt)
    return p, t + dt


def build_sharded_frame(
    cfg: SimConfig, colliders, n_substeps: int, mesh: Mesh, axis: str = "shard"
):
    """Jitted multi-device frame function over `mesh`."""
    from jax import shard_map

    pspec = P(axis)
    replicated = P()

    def local_frame(p: Particles, t):
        def body(carry, _):
            pp, tt = carry
            pp, tt = sharded_substep(pp, tt, cfg, colliders, cfg.base_dt, axis)
            return (pp, tt), None

        (p, t), _ = jax.lax.scan(body, (p, t), None, length=n_substeps)
        return p, t

    # every particle array sharded on axis 0; t replicated
    p_specs = Particles(
        x=pspec, v=pspec, F=pspec, C=pspec, aux=pspec, mass=pspec,
        vol=pspec, mat=pspec, params=pspec, active=pspec,
        states=pspec, bdist=pspec, bnormal=pspec, near_b=pspec,
    )
    fn = shard_map(
        local_frame,
        mesh=mesh,
        in_specs=(p_specs, replicated),
        out_specs=(p_specs, replicated),
        check_vma=False,
    )
    return jax.jit(fn)
