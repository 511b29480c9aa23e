"""DistributedMPM: the user-facing multichip driver must reproduce the
single-chip production pipeline through the plain MPM scene API."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from taichi_mpm_tpu import DistributedMPM
from taichi_mpm_tpu.core import levelset
from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.ops import packed
from taichi_mpm_tpu.ops.blocked import total_blocks_padded


def _make_scene(cls, n=600, **kw):
    rng = np.random.default_rng(42)
    sim = cls(res=(32, 32, 32), base_delta_t=2e-4, frame_dt=2e-3,
              gravity=(0.0, -10.0, 0.0), **kw)
    sim.add_collider(
        levelset.box_domain(lo=(0.1, 0.1, 0.1), hi=(0.9, 0.9, 0.9),
                            friction=0.3)
    )
    x0 = rng.uniform(0.15, 0.85, size=(n, 3)).astype(np.float32)
    sim.add_particles("jelly", pos=x0, vel=(1.0, 0.0, 0.0),
                      density=1000.0, E=1e4, nu=0.3)
    return sim


def test_distributed_matches_single_chip_fused():
    """3 frames through DistributedMPM (balanced slabs, fused packed
    pipeline, 2 shards) == the single-chip fused packed frame."""
    n_frames, n = 3, 600
    sim = _make_scene(DistributedMPM, n=n, n_shards=2)
    for _ in range(n_frames):
        sim.step()
    xs = sim.positions()
    assert xs.shape == (n, 3)  # zero loss through shard + migrate

    # single-chip oracle: same scene through the fused packed frame
    ref = _make_scene(MPM, n=n)
    ref._finalize()
    K = -(-min(1024, total_blocks_padded(ref.cfg)) // 64) * 64
    p, t = ref.particles, jnp.float32(0.0)
    n_sub = max(1, int(round(ref.frame_dt / ref.cfg.base_dt)))
    for _ in range(n_frames):
        p, t, _, _, _ = packed.packed_frame(
            p, t, ref.cfg, tuple(ref.colliders), ref.cfg.base_dt, n_sub,
            K, interpret=True, fused=True,
        )
    xr = np.asarray(p.x)[np.asarray(p.active)]
    np.testing.assert_allclose(
        xr[np.lexsort(xr.T)], xs[np.lexsort(xs.T)], atol=1e-5
    )


def test_distributed_source_injection_and_accessors():
    """add_particles after stepping (a source) re-shards and keeps
    simulating with zero loss; energy/velocities accessors work on the
    sharded state."""
    sim = _make_scene(DistributedMPM, n=400, n_shards=2, capacity=1024)
    sim.step()
    e0 = sim.energy()
    assert np.isfinite(e0)
    n2 = sim.add_particles(
        "jelly",
        pos=np.full((50, 3), 0.25, np.float32)
        + np.random.default_rng(1).uniform(0, 0.1, (50, 3)).astype(np.float32),
        density=1000.0, E=1e4, nu=0.3,
    )
    assert n2 == 50
    sim.step()
    assert sim.positions().shape == (450, 3)
    assert sim.velocities().shape == (450, 3)
    assert np.isfinite(sim.positions()).all()


def test_distributed_cpic_matches_single_chip():
    """A coupled (CPIC) scene through DistributedMPM == the single-chip
    pytree CPIC blocked frame (the packed CPIC differential tolerance,
    tests/test_spatial_blocked.py)."""
    from taichi_mpm_tpu.rigid.cpic_blocked import cpic_blocked_frame
    from taichi_mpm_tpu.rigid.mesh import plate_mesh

    def scene(cls, **kw):
        rng = np.random.default_rng(3)
        sim = cls(res=(32, 32, 32), base_delta_t=2e-4, frame_dt=12e-4,
                  gravity=(0, -10.0, 0), penalty=1e3, **kw)
        pos = rng.uniform(0.25, 0.75, size=(400, 3)).astype(np.float32)
        sim.add_particles("jelly", pos=pos, vel=(1.0, -0.5, 0), E=1e4,
                          nu=0.3, density=1000)
        sim.add_particles(
            "rigid", mesh=plate_mesh(half_u=0.22, half_v=0.22, axis=1),
            scripted_position=lambda t: (0.5, 0.4, 0.5),
            scripted_rotation=lambda t: (0.0, 0.0, 0.0),
            codimensional=True, friction=0.2,
        )
        return sim

    sim = scene(DistributedMPM, n_shards=2)
    sim.step()
    xs = sim.positions()
    b2 = sim.bodies

    ref = scene(MPM)
    ref._finalize()
    p1, b1, t1, *_ = cpic_blocked_frame(
        ref.particles, ref.bodies, jnp.float32(0.0), ref.cfg,
        ref.rigid_scene, ref.cfg.base_dt, 6, K=512, near_budget=512,
        b1=1024, interpret=True,
    )
    xr = np.asarray(p1.x)[np.asarray(p1.active)]
    assert xr.shape == xs.shape
    np.testing.assert_allclose(
        xr[np.lexsort(xr.T)], xs[np.lexsort(xs.T)], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b1.vel), np.asarray(b2.vel), atol=1e-5
    )


def test_distributed_mesh2d_matches_single_chip_fused():
    """DistributedMPM over a 2-D (2, 2) pencil mesh == the single-chip
    fused packed frame."""
    n_frames, n = 2, 600
    sim = _make_scene(DistributedMPM, n=n, mesh_shape=(2, 2))
    for _ in range(n_frames):
        sim.step()
    xs = sim.positions()
    assert xs.shape == (n, 3)

    ref = _make_scene(MPM, n=n)
    ref._finalize()
    K = -(-min(1024, total_blocks_padded(ref.cfg)) // 64) * 64
    p, t = ref.particles, jnp.float32(0.0)
    n_sub = max(1, int(round(ref.frame_dt / ref.cfg.base_dt)))
    for _ in range(n_frames):
        p, t, _, _, _ = packed.packed_frame(
            p, t, ref.cfg, tuple(ref.colliders), ref.cfg.base_dt, n_sub,
            K, interpret=True, fused=True,
        )
    xr = np.asarray(p.x)[np.asarray(p.active)]
    np.testing.assert_allclose(
        xr[np.lexsort(xr.T)], xs[np.lexsort(xs.T)], atol=1e-5
    )


def test_distributed_cpic_mesh2d_matches_single_chip():
    """A coupled scene through DistributedMPM on a balanced 2-D pencil
    mesh == the single-chip pytree CPIC blocked frame."""
    from taichi_mpm_tpu.rigid.cpic_blocked import cpic_blocked_frame
    from taichi_mpm_tpu.rigid.mesh import plate_mesh

    def scene(cls, **kw):
        rng = np.random.default_rng(3)
        sim = cls(res=(32, 32, 32), base_delta_t=2e-4, frame_dt=12e-4,
                  gravity=(0, -10.0, 0), penalty=1e3, **kw)
        pos = rng.uniform(0.25, 0.75, size=(400, 3)).astype(np.float32)
        sim.add_particles("jelly", pos=pos, vel=(1.0, -0.5, 0), E=1e4,
                          nu=0.3, density=1000)
        sim.add_particles(
            "rigid", mesh=plate_mesh(half_u=0.22, half_v=0.22, axis=1),
            scripted_position=lambda t: (0.5, 0.4, 0.5),
            scripted_rotation=lambda t: (0.0, 0.0, 0.0),
            codimensional=True, friction=0.2,
        )
        return sim

    sim = scene(DistributedMPM, mesh_shape=(2, 2))
    assert sim.mesh2d and sim.balanced  # res 32 / S 2 leaves r_max = 1
    sim.step()
    xs = sim.positions()
    b2 = sim.bodies

    ref = scene(MPM)
    ref._finalize()
    p1, b1, t1, *_ = cpic_blocked_frame(
        ref.particles, ref.bodies, jnp.float32(0.0), ref.cfg,
        ref.rigid_scene, ref.cfg.base_dt, 6, K=512, near_budget=512,
        b1=1024, interpret=True,
    )
    xr = np.asarray(p1.x)[np.asarray(p1.active)]
    assert xr.shape == xs.shape
    np.testing.assert_allclose(
        xr[np.lexsort(xr.T)], xs[np.lexsort(xs.T)], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b1.vel), np.asarray(b2.vel), atol=1e-5
    )
