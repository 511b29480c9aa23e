"""Multi-chip blocked pipeline: per-shard Pallas/record machinery with
record-plane halo exchange must match the single-chip blocked path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.core import levelset
from taichi_mpm_tpu.ops.blocked import sort_particles, total_blocks_padded
from taichi_mpm_tpu.ops.substep import blocked_substep
from taichi_mpm_tpu.parallel.spatial import shard_spatially
from taichi_mpm_tpu.parallel.spatial_blocked import build_spatial_blocked_frame


def _scene(res=32, n=600, vel_x=1.0):
    rng = np.random.default_rng(0)
    sim = MPM(res=(res, res, res), base_delta_t=2e-4, gravity=(0.0, -10.0, 0.0))
    x0 = rng.uniform(0.06, 0.94, size=(n, 3)).astype(np.float32)
    sim.add_particles("jelly", pos=x0, density=1000.0, E=1e4, nu=0.3)
    sim._finalize()
    v = np.zeros((n, 3), np.float32)
    v[:, 0] = vel_x
    p = dataclasses.replace(sim.particles, v=jnp.asarray(v))
    return sim, p


@pytest.mark.parametrize("n_shards", [2, 4])
def test_matches_single_chip_blocked(n_shards):
    sim, p = _scene()
    cfg = sim.cfg
    colliders = (
        levelset.box_domain(
            lo=(0.1, 0.1, 0.1), hi=(0.9, 0.9, 0.9), friction=0.3
        ),
    )
    dt = cfg.base_dt

    # single-chip reference (per-substep sort)
    p_ref = p
    t = jnp.float32(0.0)
    for _ in range(8):
        (p_ref, t), _ = blocked_substep(
            p_ref, t, cfg, colliders, dt, interpret=True,
            max_active_blocks=min(1024, total_blocks_padded(cfg)),
        )
    xr = np.asarray(p_ref.x)[np.asarray(p_ref.active)]

    mesh = Mesh(np.asarray(jax.devices()[:n_shards]), ("x",))
    ps = shard_spatially(p, cfg, mesh, slack=2.0)
    frame = build_spatial_blocked_frame(
        cfg, colliders, 8, mesh, K=512, budget=64, interpret=True
    )
    ps2, t2, dropped, n_act = frame(ps, jnp.float32(0.0))
    assert int(dropped) == 0
    assert int(n_act) <= 512
    xs = np.asarray(ps2.x)[np.asarray(ps2.active)]
    assert xr.shape == xs.shape
    a = xr[np.lexsort(xr.T)]
    b = xs[np.lexsort(xs.T)]
    np.testing.assert_allclose(a, b, atol=1e-6)
