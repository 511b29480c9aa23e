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
    ps2, t2, needed, n_act = frame(ps, jnp.float32(0.0))
    assert int(needed) <= 64  # no budget overflow (nothing dropped)
    assert int(n_act) <= 512
    xs = np.asarray(ps2.x)[np.asarray(ps2.active)]
    assert xr.shape == xs.shape
    a = xr[np.lexsort(xr.T)]
    b = xs[np.lexsort(xs.T)]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_migration_budget_autogrow():
    """A starved migration budget must auto-grow and re-run with ZERO
    particle loss (VERDICT r1 #7; the reference never loses particles
    to threading, mpm.cpp:770-918)."""
    from taichi_mpm_tpu.parallel.spatial_blocked import (
        run_spatial_blocked_frames,
    )

    sim, p = _scene(n=400, vel_x=6.0)  # fast x-drift => many migrants
    cfg = sim.cfg
    colliders = (
        levelset.box_domain(
            lo=(0.08, 0.08, 0.08), hi=(0.92, 0.92, 0.92), friction=0.0
        ),
    )
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    ps = shard_spatially(p, cfg, mesh, slack=3.0)
    n0 = int(np.asarray(ps.active).sum())
    p2, t2, caps = run_spatial_blocked_frames(
        ps, jnp.float32(0.0), cfg, colliders, 10, mesh, n_frames=3,
        K=512, budget=2, interpret=True,
    )
    assert int(np.asarray(p2.active).sum()) == n0  # zero loss
    assert caps["budget"] > 2  # it actually grew


def test_cpic_multichip_matches_single_chip():
    """Coupled CPIC transfers under shard_map (replicated rigids, psum
    impulses, local-frame CDF, lazy sort) must match the single-chip
    CPIC blocked frame — VERDICT r1 #2."""
    from taichi_mpm_tpu.parallel.spatial_blocked import (
        build_spatial_cpic_frame,
    )
    from taichi_mpm_tpu.rigid.cpic_blocked import cpic_blocked_frame
    from taichi_mpm_tpu.rigid.mesh import plate_mesh

    rng = np.random.default_rng(3)
    sim = MPM(res=(32, 32, 32), base_delta_t=2e-4, gravity=(0, -10.0, 0),
              penalty=1e3)
    pos = rng.uniform(0.25, 0.75, size=(400, 3)).astype(np.float32)
    sim.add_particles("jelly", pos=pos, vel=(1.0, -0.5, 0), E=1e4, nu=0.3,
                      density=1000)
    sim.add_particles(
        "rigid", mesh=plate_mesh(half_u=0.22, half_v=0.22, axis=1),
        scripted_position=lambda t: (0.5, 0.4, 0.5),
        scripted_rotation=lambda t: (0.0, 0.0, 0.0),
        codimensional=True, friction=0.2,
    )
    sim._finalize()
    cfg, scene, b0 = sim.cfg, sim.rigid_scene, sim.bodies
    n_sub = 6

    p1, b1, t1, n_act, n_near, n_coarse, _, _, _ = cpic_blocked_frame(
        sim.particles, b0, jnp.float32(0.0), cfg, scene, cfg.base_dt,
        n_sub, K=512, near_budget=512, b1=1024, interpret=True,
    )
    assert int(n_near) <= 512 and int(n_coarse) <= 1024

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("x",))
    ps = shard_spatially(sim.particles, cfg, mesh, slack=2.0)
    frame = build_spatial_cpic_frame(
        cfg, scene, n_sub, mesh, K=512, budget=64, near_budget=512,
        b1=1024, interpret=True,
    )
    ps2, b2, t2, needed, na, nn, nc, _ = frame(ps, b0, jnp.float32(0.0))
    assert int(needed) <= 64
    assert int(nn) <= 512 and int(nc) <= 1024

    a1 = np.asarray(p1.active)
    a2 = np.asarray(ps2.active)
    assert a1.sum() == a2.sum()
    x1 = np.asarray(p1.x)[a1]
    x2 = np.asarray(ps2.x)[a2]
    o1, o2 = np.lexsort(x1.T), np.lexsort(x2.T)
    np.testing.assert_allclose(x1[o1], x2[o2], atol=1e-5)
    v1 = np.asarray(p1.v)[a1][o1]
    v2 = np.asarray(ps2.v)[a2][o2]
    np.testing.assert_allclose(v1, v2, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(b1.vel), np.asarray(b2.vel), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b1.omega), np.asarray(b2.omega), atol=1e-5
    )


def test_balanced_slabs_match_and_rebalance():
    """Load-balanced slabs: a heavily clustered scene must (a) stay
    exactly equal to the single-chip blocked path while boundaries
    move, and (b) actually move the boundaries toward the cluster so
    per-shard active work evens out (the chip-level analog of the
    reference's TBB work-stealing block dispatch, mpm.cpp:919-1014)."""
    from taichi_mpm_tpu.parallel.spatial_blocked import (
        balanced_bounds_host,
        run_spatial_balanced_frames,
        shard_spatially_bounds,
    )
    from taichi_mpm_tpu.ops.substep import blocked_frame

    rng = np.random.default_rng(7)
    sim = MPM(res=(64, 32, 32), base_delta_t=2e-4,
              gravity=(0.0, -10.0, 0.0))
    n = 800
    # cluster in the left 20% of x: a uniform split leaves one shard
    # with ~everything
    x0 = np.empty((n, 3), np.float32)
    x0[:, 0] = rng.uniform(0.03, 0.20, n)
    x0[:, 1] = rng.uniform(0.2, 0.8, n)
    x0[:, 2] = rng.uniform(0.2, 0.8, n)
    sim.add_particles("jelly", pos=x0, density=1000.0, E=1e4, nu=0.3)
    sim._finalize()
    cfg = sim.cfg
    v = np.zeros((n, 3), np.float32)
    v[:, 0] = 3.0  # rightward drift: boundaries must keep adapting
    p = dataclasses.replace(sim.particles, v=jnp.asarray(v))
    colliders = (
        levelset.box_domain(
            lo=(0.02, 0.05, 0.05), hi=(0.98, 0.95, 0.95), friction=0.3
        ),
    )
    n_sub, n_frames = 6, 3

    p_ref = sim.particles
    p_ref = dataclasses.replace(p_ref, v=jnp.asarray(v))
    t = jnp.float32(0.0)
    for _ in range(n_frames):
        p_ref, t, _, _ = blocked_frame(
            p_ref, t, cfg, colliders, cfg.base_dt, n_sub,
            min(1024, total_blocks_padded(cfg)), interpret=True,
        )
    xr = np.asarray(p_ref.x)[np.asarray(p_ref.active)]

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("x",))
    r = 3  # CB=16, S=2: uniform gap 8 -> r_max = 3
    bounds0 = balanced_bounds_host(p, cfg, 2, r)
    assert bounds0[1] < 8  # host init already shifted toward cluster
    ps = shard_spatially_bounds(p, cfg, mesh, bounds0, slack=2.0)
    ps2, t2, state = run_spatial_balanced_frames(
        ps, jnp.float32(0.0), cfg, colliders, n_sub, mesh,
        n_frames=n_frames, K=512, budget=256, r=r, interpret=True,
    )
    xs = np.asarray(ps2.x)[np.asarray(ps2.active)]
    assert xr.shape == xs.shape  # zero loss
    np.testing.assert_allclose(
        xr[np.lexsort(xr.T)], xs[np.lexsort(xs.T)], atol=1e-5
    )
    bounds = np.asarray(state["bounds"])
    assert bounds[0] == 0 and bounds[-1] == 16
    assert bounds[1] <= 8 - 1  # still biased toward the cluster
    # balance quality: local active counts within the r-limited ideal
    cap_l = ps2.x.shape[0] // 2
    act = np.asarray(ps2.active)
    n_left = act[:cap_l].sum()
    hist = np.asarray(state["hist"])
    ideal_left = hist[: bounds[1]].sum()
    assert n_left == ideal_left  # ownership == boundary split


def test_cpic_packed_multichip_matches_single_chip():
    """The PACKED-carry multichip CPIC frame (fused bulk transfers per
    shard, rigid/cpic_packed under shard_map) must match the
    single-chip pytree CPIC blocked frame bit-for-tolerance."""
    from taichi_mpm_tpu.parallel.spatial_blocked import (
        build_spatial_cpic_packed_frame,
    )
    from taichi_mpm_tpu.rigid.cpic_blocked import cpic_blocked_frame
    from taichi_mpm_tpu.rigid.mesh import plate_mesh

    rng = np.random.default_rng(3)
    sim = MPM(res=(32, 32, 32), base_delta_t=2e-4, gravity=(0, -10.0, 0),
              penalty=1e3)
    pos = rng.uniform(0.25, 0.75, size=(400, 3)).astype(np.float32)
    sim.add_particles("jelly", pos=pos, vel=(1.0, -0.5, 0), E=1e4, nu=0.3,
                      density=1000)
    sim.add_particles(
        "rigid", mesh=plate_mesh(half_u=0.22, half_v=0.22, axis=1),
        scripted_position=lambda t: (0.5, 0.4, 0.5),
        scripted_rotation=lambda t: (0.0, 0.0, 0.0),
        codimensional=True, friction=0.2,
    )
    sim._finalize()
    cfg, scene, b0 = sim.cfg, sim.rigid_scene, sim.bodies
    n_sub = 6

    p1, b1, t1, n_act, n_near, n_coarse, _, _, _ = cpic_blocked_frame(
        sim.particles, b0, jnp.float32(0.0), cfg, scene, cfg.base_dt,
        n_sub, K=512, near_budget=512, b1=1024, interpret=True,
    )

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("x",))
    ps = shard_spatially(sim.particles, cfg, mesh, slack=2.0)
    frame = build_spatial_cpic_packed_frame(
        cfg, scene, n_sub, mesh, K=512, budget=64, near_budget=512,
        b1=1024, interpret=True,
    )
    ps2, b2, t2, needed, na, nn, nc, _ = frame(ps, b0, jnp.float32(0.0))
    assert int(needed) <= 64
    assert int(nn) <= 512 and int(nc) <= 1024

    a1 = np.asarray(p1.active)
    a2 = np.asarray(ps2.active)
    assert a1.sum() == a2.sum()
    x1 = np.asarray(p1.x)[a1]
    x2 = np.asarray(ps2.x)[a2]
    o1, o2 = np.lexsort(x1.T), np.lexsort(x2.T)
    np.testing.assert_allclose(x1[o1], x2[o2], atol=1e-5)
    v1 = np.asarray(p1.v)[a1][o1]
    v2 = np.asarray(ps2.v)[a2][o2]
    np.testing.assert_allclose(v1, v2, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(b1.vel), np.asarray(b2.vel), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b1.omega), np.asarray(b2.omega), atol=1e-5
    )


def test_cpic_packed_balanced_matches_single_chip():
    """Balanced slabs under the PACKED multichip CPIC frame: a
    left-clustered jelly stream pushed through a scripted plate must
    stay equal to the single-chip CPIC blocked path while the slab
    boundary adapts to the rightward drift."""
    from taichi_mpm_tpu.parallel.spatial_blocked import (
        balanced_bounds_host,
        run_spatial_cpic_packed_balanced_frames,
        shard_spatially_bounds,
    )
    from taichi_mpm_tpu.rigid.cpic_blocked import cpic_blocked_frame
    from taichi_mpm_tpu.rigid.mesh import plate_mesh

    rng = np.random.default_rng(5)
    sim = MPM(res=(64, 32, 32), base_delta_t=2e-4, gravity=(0, -4.0, 0),
              penalty=1e3)
    n = 500
    x0 = np.empty((n, 3), np.float32)
    x0[:, 0] = rng.uniform(0.05, 0.25, n)  # left cluster
    x0[:, 1] = rng.uniform(0.35, 0.65, n)
    x0[:, 2] = rng.uniform(0.35, 0.65, n)
    sim.add_particles("jelly", pos=x0, vel=(2.0, 0.0, 0.0), E=1e4, nu=0.3,
                      density=1000)
    sim.add_particles(
        "rigid", mesh=plate_mesh(half_u=0.2, half_v=0.2, axis=0),
        scripted_position=lambda t: (0.3, 0.5, 0.5),
        scripted_rotation=lambda t: (0.0, 0.0, 0.0),
        codimensional=True, friction=0.2,
    )
    sim._finalize()
    cfg, scene, b0 = sim.cfg, sim.rigid_scene, sim.bodies
    n_sub, n_frames = 6, 3

    p1, b1, t1 = sim.particles, b0, jnp.float32(0.0)
    for _ in range(n_frames):
        p1, b1, t1, _, n_near, n_coarse, _, _, _ = cpic_blocked_frame(
            p1, b1, t1, cfg, scene, cfg.base_dt, n_sub, K=512,
            near_budget=512, b1=1024, interpret=True,
        )
        assert int(n_near) <= 512 and int(n_coarse) <= 1024

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("x",))
    r = 3  # CB=16, S=2: uniform gap 8 -> r_max = 3
    bounds0 = balanced_bounds_host(sim.particles, cfg, 2, r)
    assert bounds0[1] < 8  # host init biased toward the cluster
    ps = shard_spatially_bounds(sim.particles, cfg, mesh, bounds0,
                                slack=2.5)
    ps2, b2, t2, state = run_spatial_cpic_packed_balanced_frames(
        ps, b0, jnp.float32(0.0), cfg, scene, n_sub, mesh,
        n_frames=n_frames, K=512, budget=128, near_budget=512, b1=1024,
        r=r, interpret=True,
    )

    a1 = np.asarray(p1.active)
    a2 = np.asarray(ps2.active)
    assert a1.sum() == a2.sum()
    x1 = np.asarray(p1.x)[a1]
    x2 = np.asarray(ps2.x)[a2]
    o1, o2 = np.lexsort(x1.T), np.lexsort(x2.T)
    np.testing.assert_allclose(x1[o1], x2[o2], atol=1e-5)
    v1 = np.asarray(p1.v)[a1][o1]
    v2 = np.asarray(ps2.v)[a2][o2]
    np.testing.assert_allclose(v1, v2, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(b1.vel), np.asarray(b2.vel), atol=1e-5
    )
    bounds = np.asarray(state["bounds"])
    assert bounds[0] == 0 and bounds[-1] == 16


def test_packed_multichip_matches_single_chip_fused():
    """The PLAIN packed-carry multichip frame (the fully-fused
    production substep per shard) must match the single-chip fused
    packed frame: same lazy-sort schedule (pmax'd drift == global
    drift), record-plane exchange only reorders the halo summation."""
    from taichi_mpm_tpu.ops import packed
    from taichi_mpm_tpu.parallel.spatial_blocked import (
        build_spatial_packed_frame,
    )

    sim, p = _scene()
    cfg = sim.cfg
    colliders = (
        levelset.box_domain(
            lo=(0.1, 0.1, 0.1), hi=(0.9, 0.9, 0.9), friction=0.3
        ),
    )
    n_sub = 8

    Kref = -(-min(1024, total_blocks_padded(cfg)) // 64) * 64
    p_ref, t_ref, _, _, _ = packed.packed_frame(
        p, jnp.float32(0.0), cfg, colliders, cfg.base_dt, n_sub,
        Kref, interpret=True, fused=True,
    )
    a_ref = np.asarray(p_ref.active)
    xr = np.asarray(p_ref.x)[a_ref]

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("x",))
    ps = shard_spatially(p, cfg, mesh, slack=2.0)
    frame = build_spatial_packed_frame(
        cfg, colliders, n_sub, mesh, K=512, budget=64, interpret=True
    )
    ps2, t2, needed, n_act = frame(ps, jnp.float32(0.0))
    assert int(needed) <= 64 and int(n_act) <= 512
    a2 = np.asarray(ps2.active)
    xs = np.asarray(ps2.x)[a2]
    assert xr.shape == xs.shape  # zero loss
    o1, o2 = np.lexsort(xr.T), np.lexsort(xs.T)
    np.testing.assert_allclose(xr[o1], xs[o2], atol=2e-6)
    v1 = np.asarray(p_ref.v)[a_ref][o1]
    v2 = np.asarray(ps2.v)[a2][o2]
    np.testing.assert_allclose(v1, v2, atol=1e-4)


def test_packed_balanced_multichip_matches_and_rebalances():
    """Balanced slabs under the PLAIN packed multichip frame: a
    left-clustered drifting scene stays equal to the single-chip fused
    frame while the boundary adapts (run via the auto-grow runner)."""
    from taichi_mpm_tpu.ops import packed
    from taichi_mpm_tpu.parallel.spatial_blocked import (
        balanced_bounds_host,
        run_spatial_packed_frames,
        shard_spatially_bounds,
    )

    rng = np.random.default_rng(9)
    sim = MPM(res=(64, 32, 32), base_delta_t=2e-4,
              gravity=(0.0, -10.0, 0.0))
    n = 700
    x0 = np.empty((n, 3), np.float32)
    x0[:, 0] = rng.uniform(0.03, 0.20, n)  # left cluster
    x0[:, 1] = rng.uniform(0.2, 0.8, n)
    x0[:, 2] = rng.uniform(0.2, 0.8, n)
    sim.add_particles("jelly", pos=x0, density=1000.0, E=1e4, nu=0.3)
    sim._finalize()
    cfg = sim.cfg
    v = np.zeros((n, 3), np.float32)
    v[:, 0] = 3.0  # rightward drift: bounds must keep adapting
    p = dataclasses.replace(sim.particles, v=jnp.asarray(v))
    colliders = (
        levelset.box_domain(
            lo=(0.02, 0.05, 0.05), hi=(0.98, 0.95, 0.95), friction=0.3
        ),
    )
    n_sub, n_frames = 6, 3

    p_ref, t = p, jnp.float32(0.0)
    for _ in range(n_frames):
        p_ref, t, _, _, _ = packed.packed_frame(
            p_ref, t, cfg, colliders, cfg.base_dt, n_sub,
            -(-min(1024, total_blocks_padded(cfg)) // 64) * 64,
            interpret=True, fused=True,
        )
    xr = np.asarray(p_ref.x)[np.asarray(p_ref.active)]

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("x",))
    r = 3  # CB=16, S=2: uniform gap 8 -> r_max = 3
    bounds0 = balanced_bounds_host(p, cfg, 2, r)
    assert bounds0[1] < 8  # host init biased toward the cluster
    ps = shard_spatially_bounds(p, cfg, mesh, bounds0, slack=2.5)
    ps2, t2, state = run_spatial_packed_frames(
        ps, jnp.float32(0.0), cfg, colliders, n_sub, mesh,
        n_frames=n_frames, K=512, budget=128, r=r, interpret=True,
    )
    xs = np.asarray(ps2.x)[np.asarray(ps2.active)]
    assert xr.shape == xs.shape  # zero loss
    np.testing.assert_allclose(
        xr[np.lexsort(xr.T)], xs[np.lexsort(xs.T)], atol=1e-5
    )
    bounds = np.asarray(state["bounds"])
    assert bounds[0] == 0 and bounds[-1] == 16
    # ownership == boundary split
    cap_l = ps2.x.shape[0] // 2
    act = np.asarray(ps2.active)
    hist = np.asarray(state["hist"])
    assert act[:cap_l].sum() == hist[: bounds[1]].sum()
