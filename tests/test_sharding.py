"""Multi-device correctness: N-shard run must match single-device run.

(The multi-host test the reference never had — SURVEY.md §4.)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from taichi_mpm_tpu.parallel.sharding import (
    build_sharded_frame,
    make_mesh,
    shard_particles,
)
from taichi_mpm_tpu.core.solver import frame_fn
from taichi_mpm_tpu.scenes import benchmark_cube


def _scene(cap):
    sim = benchmark_cube(cells=4, res=16, material="jelly", E=2e4, nu=0.35)
    sim._finalize(capacity=cap)
    return sim


def test_sharded_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest should provide 8 cpu devices"
    n = 4**3 * 8
    cap = ((n + 7) // 8) * 8
    sim = _scene(cap)
    n_sub = 5

    p_single, t_single = jax.jit(
        lambda p, t: frame_fn(p, t, sim.cfg, tuple(sim.colliders), sim.cfg.base_dt, n_sub)
    )(sim.particles, jnp.float32(0.0))

    mesh = make_mesh(8)
    p_sh = shard_particles(sim.particles, mesh)
    frame = build_sharded_frame(sim.cfg, tuple(sim.colliders), n_sub, mesh)
    p_multi, t_multi = frame(p_sh, jnp.float32(0.0))

    np.testing.assert_allclose(
        np.asarray(p_multi.x), np.asarray(p_single.x), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(p_multi.v), np.asarray(p_single.v), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p_multi.F), np.asarray(p_single.F), atol=1e-5
    )
