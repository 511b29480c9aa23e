"""Bucketed (per-block adaptive dt) frames under shard_map
(parallel/async_spatial) must reproduce the single-chip bucketed frame
(ops/async_bucketed): same block levels (cross-shard neighbor
monotonicity), same tick/resort schedule (global predicates), same
committed-update count, positions equal up to summation order."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.state import empty_particles
from taichi_mpm_tpu.materials import models as materials
from taichi_mpm_tpu.ops import packed
from taichi_mpm_tpu.ops.async_bucketed import MAXLEV, bucketed_frame
from taichi_mpm_tpu.parallel.async_spatial import (
    build_bucketed_spatial_frame,
    run_bucketed_spatial_frames,
)
from taichi_mpm_tpu.parallel.spatial import shard_spatially

UNIT = 5e-4
FRAME = UNIT * (1 << MAXLEV)


def _blob(rng, lo, hi, n, E):
    mid, par, _ = materials.pack_params("elastic", E=E, nu=0.3)
    x = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    params = np.broadcast_to(np.asarray(par, np.float32), (n, 8))
    return x, params, mid


def _make(blobs, seed=0, vel=None):
    rng = np.random.default_rng(seed)
    cfg = SimConfig(res=(32, 32, 32), base_dt=1e-3,
                    gravity=(0.0, 0.0, 0.0))
    xs, ps = [], []
    mid = None
    for lo, hi, n, E in blobs:
        x, params, mid = _blob(rng, lo, hi, n, E)
        xs.append(x)
        ps.append(params)
    x = np.concatenate(xs)
    params = np.concatenate(ps)
    n = x.shape[0]
    if vel is None:
        v = 0.1 * np.random.default_rng(seed + 1).standard_normal(
            (n, 3)
        ).astype(np.float32)
    else:
        v = np.tile(np.asarray([vel], np.float32), (n, 1))
    p = empty_particles(n, 3)
    p = dataclasses.replace(
        p,
        x=p.x.at[:].set(x),
        v=p.v.at[:].set(v),
        mat=p.mat.at[:].set(mid),
        params=p.params.at[:].set(params),
        mass=p.mass.at[:].set(1e-3),
        vol=p.vol.at[:].set(1e-6),
        active=p.active.at[:].set(True),
    )
    return p, cfg.with_materials([mid])


# blobs ADJACENT across the 2-shard boundary (x = 0.5): the level
# grading between the soft and stiff regions must propagate through
# the cross-shard monotonicity exchange
SOFT = ((0.15, 0.3, 0.3), (0.49, 0.7, 0.7), 1600, 4e3)
STIFF = ((0.51, 0.4, 0.4), (0.80, 0.6, 0.6), 400, 4e5)


def _sorted_xv(p):
    a = np.asarray(p.active)
    x = np.asarray(p.x)[a]
    v = np.asarray(p.v)[a]
    o = np.lexsort(x.T)
    return x[o], v[o]


def test_bucketed_sharded_matches_single_chip():
    """Mixed-level scene straddling the shard boundary: 2-shard
    bucketed frames == single-chip bucketed frame — identical committed
    update count (levels + tick schedule parity) and matching state."""
    p, cfg = _make([SOFT, STIFF])
    p1, t1, n_up1, n_sel1, n_act1, info1 = bucketed_frame(
        p, jnp.float32(0.0), cfg, (), FRAME, UNIT, K=512, budget=4096,
        K_ctx=768, interpret=True, fused=True,
    )
    assert int(np.asarray(n_sel1).max()) <= 4096 and int(n_act1) <= 768

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("x",))
    ps = shard_spatially(p, cfg, mesh, slack=2.0)
    ps2, t2, n_up2, state = run_bucketed_spatial_frames(
        ps, jnp.float32(0.0), cfg, (), FRAME, UNIT, mesh, n_frames=1,
        K=512, budget=4096, K_ctx=768, mig_budget=128, interpret=True,
    )
    assert int(n_up2) == int(n_up1)  # schedule + level parity
    x1, v1 = _sorted_xv(p1)
    x2, v2 = _sorted_xv(ps2)
    assert x1.shape == x2.shape  # zero loss
    np.testing.assert_allclose(x1, x2, atol=1e-5)
    np.testing.assert_allclose(v1, v2, atol=5e-4)
    np.testing.assert_allclose(float(t1), float(t2), atol=1e-7)


def test_bucketed_sharded_resort_and_migration():
    """A fast homogeneous blob drifts > 0.45 cells mid-frame ACROSS the
    shard boundary: the sharded bucketed frame must lazy re-sort
    in-device, migrate at the resort, and still match the single-chip
    bucketed frame (which re-sorts on the same global schedule)."""
    p, cfg = _make([((0.30, 0.3, 0.3), (0.55, 0.7, 0.7), 1200, 4e3)],
                   vel=(1.0, 0.0, 0.0))
    p1, t1, n_up1, n_sel1, n_act1, info1 = bucketed_frame(
        p, jnp.float32(0.0), cfg, (), FRAME, UNIT, K=512, budget=2048,
        K_ctx=768, interpret=True, fused=True,
    )
    assert int(info1["n_resorts"]) >= 1  # the drift trigger fired

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("x",))
    ps = shard_spatially(p, cfg, mesh, slack=3.0)
    frame = build_bucketed_spatial_frame(
        cfg, (), FRAME, UNIT, mesh, K=512, budget=2048, K_ctx=768,
        mig_budget=512, interpret=True,
    )
    (ps2, t2, n_up2, n_sel2, n_actc, n_actm, needed,
     n_sorts2) = frame(ps, jnp.float32(0.0))
    assert int(needed) <= 512 and int(np.asarray(n_sel2).max()) <= 2048
    assert int(n_sorts2) == int(info1["n_resorts"])  # same schedule
    assert int(n_up2) == int(n_up1)
    x1, v1 = _sorted_xv(p1)
    x2, v2 = _sorted_xv(ps2)
    assert x1.shape == x2.shape
    np.testing.assert_allclose(x1, x2, atol=1e-5)
    np.testing.assert_allclose(v1, v2, atol=5e-4)


def test_distributed_async_driver_matches_single_chip():
    """DistributedAsyncMPM (the bucketed scheduler through the MPM
    scene API over a 2-shard slab mesh) == AsyncMPM(per_block=True):
    identical committed-update counts and matching state."""
    from taichi_mpm_tpu import AsyncMPM, DistributedAsyncMPM

    def scene(cls, **kw):
        rng = np.random.default_rng(7)
        sim = cls(res=(32, 32, 32), base_delta_t=1e-3,
                  frame_dt=UNIT * (1 << MAXLEV), unit_delta_t=UNIT,
                  gravity=(0.0, 0.0, 0.0), **kw)
        soft = rng.uniform((0.15, 0.3, 0.3), (0.49, 0.7, 0.7),
                           (1200, 3)).astype(np.float32)
        stiff = rng.uniform((0.51, 0.4, 0.4), (0.80, 0.6, 0.6),
                            (300, 3)).astype(np.float32)
        sim.add_particles("elastic", pos=soft, vel=(0.1, -0.05, 0.02),
                          E=4e3, nu=0.3, density=1000)
        sim.add_particles("elastic", pos=stiff, vel=(-0.1, 0.05, 0.0),
                          E=4e5, nu=0.3, density=1000)
        return sim

    ref = scene(AsyncMPM, per_block=True)
    ref.step()
    x1, v1 = _sorted_xv(ref.particles)

    sim = scene(DistributedAsyncMPM, n_shards=2,
                budgets=[4096] * (MAXLEV + 1), K_ctx=768)
    sim.step()
    assert sim.update_counter == ref.update_counter
    x2, v2 = _sorted_xv(sim.particles)
    assert x1.shape == x2.shape  # zero loss through shard + migrate
    np.testing.assert_allclose(x1, x2, atol=1e-5)
    np.testing.assert_allclose(v1, v2, atol=5e-4)
