"""2-D (x, y) pencil decomposition must match the single-chip blocked
path: two sequential single-axis record exchanges (corners compose),
two-round migration, lazy sort with a 2-D pmax drift predicate."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from taichi_mpm_tpu.core import levelset
from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.ops.blocked import total_blocks_padded
from taichi_mpm_tpu.ops.substep import blocked_substep
from taichi_mpm_tpu.parallel.spatial_mesh2d import (
    build_spatial_mesh2d_frame,
    shard_pencils,
)


def _scene(res=32, n=700, vel=(1.5, 1.0, 0.0)):
    rng = np.random.default_rng(1)
    sim = MPM(res=(res, res, res), base_delta_t=2e-4, gravity=(0.0, -10.0, 0.0))
    x0 = rng.uniform(0.08, 0.92, size=(n, 3)).astype(np.float32)
    sim.add_particles("jelly", pos=x0, density=1000.0, E=1e4, nu=0.3)
    sim._finalize()
    v = np.broadcast_to(np.asarray(vel, np.float32), (n, 3)).copy()
    p = dataclasses.replace(sim.particles, v=jnp.asarray(v))
    return sim, p


def test_cpic_mesh2d_matches_single_chip():
    """Coupled CPIC transfers on the 2-D pencil mesh (replicated rigids,
    psum over both axes, two-round exchange/migration) must match the
    single-chip CPIC blocked frame."""
    from taichi_mpm_tpu.parallel.spatial_mesh2d import (
        build_spatial_cpic_mesh2d_frame,
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

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    ps = shard_pencils(sim.particles, cfg, mesh, slack=3.0)
    frame = build_spatial_cpic_mesh2d_frame(
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


@pytest.mark.parametrize("shape", [(2, 2), (4, 2)])
def test_mesh2d_matches_single_chip(shape):
    sim, p = _scene()
    cfg = sim.cfg
    colliders = (
        levelset.box_domain(lo=(0.1, 0.1, 0.1), hi=(0.9, 0.9, 0.9),
                            friction=0.3),
    )
    dt = cfg.base_dt
    n_sub = 8

    p_ref = p
    t = jnp.float32(0.0)
    for _ in range(n_sub):
        (p_ref, t), _ = blocked_substep(
            p_ref, t, cfg, colliders, dt, interpret=True,
            max_active_blocks=min(1024, total_blocks_padded(cfg)),
        )
    xr = np.asarray(p_ref.x)[np.asarray(p_ref.active)]

    devs = np.asarray(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    mesh = Mesh(devs, ("x", "y"))
    ps = shard_pencils(p, cfg, mesh, slack=3.0)
    frame = build_spatial_mesh2d_frame(
        cfg, colliders, n_sub, mesh, K=512, budget=64, interpret=True
    )
    ps2, t2, needed, n_act = frame(ps, jnp.float32(0.0))
    assert int(needed) <= 64
    assert int(n_act) <= 512
    xs = np.asarray(ps2.x)[np.asarray(ps2.active)]
    assert xr.shape == xs.shape
    a = xr[np.lexsort(xr.T)]
    b = xs[np.lexsort(xs.T)]
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_balanced_pencils_match_and_rebalance():
    """Load-balanced rectilinear pencils: a corner-clustered scene must
    (a) stay exactly equal to the single-chip blocked path while the
    per-axis boundaries move, and (b) bias both axes' boundaries toward
    the cluster (the 2-D generalization of the balanced-slab test)."""
    from taichi_mpm_tpu.ops.substep import blocked_frame
    from taichi_mpm_tpu.parallel.spatial_mesh2d import (
        balanced_bounds2d_host,
        run_spatial_balanced_mesh2d_frames,
        shard_pencils_bounds,
    )

    rng = np.random.default_rng(11)
    sim = MPM(res=(64, 64, 32), base_delta_t=2e-4,
              gravity=(0.0, 0.0, -10.0))
    n = 800
    # cluster in the low-x, low-y corner; a uniform 2x2 split leaves one
    # pencil with ~everything
    x0 = np.empty((n, 3), np.float32)
    x0[:, 0] = rng.uniform(0.03, 0.20, n)
    x0[:, 1] = rng.uniform(0.03, 0.20, n)
    x0[:, 2] = rng.uniform(0.3, 0.7, n)
    sim.add_particles("jelly", pos=x0, density=1000.0, E=1e4, nu=0.3)
    sim._finalize()
    cfg = sim.cfg
    v = np.zeros((n, 3), np.float32)
    v[:, 0] = 3.0  # diagonal drift: both axes must keep adapting
    v[:, 1] = 2.0
    p = dataclasses.replace(sim.particles, v=jnp.asarray(v))
    colliders = (
        levelset.box_domain(
            lo=(0.02, 0.02, 0.05), hi=(0.98, 0.98, 0.95), friction=0.3
        ),
    )
    n_sub, n_frames = 6, 3

    p_ref = dataclasses.replace(sim.particles, v=jnp.asarray(v))
    t = jnp.float32(0.0)
    for _ in range(n_frames):
        p_ref, t, _, _ = blocked_frame(
            p_ref, t, cfg, colliders, cfg.base_dt, n_sub,
            min(1024, total_blocks_padded(cfg)), interpret=True,
        )
    xr = np.asarray(p_ref.x)[np.asarray(p_ref.active)]

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    r = 3  # CB=16 per axis, S=2: uniform gap 8 -> r_max = 3
    bx0, by0 = balanced_bounds2d_host(p, cfg, (2, 2), r, r)
    assert bx0[1] < 8 and by0[1] < 8  # host init shifted to the corner
    ps = shard_pencils_bounds(p, cfg, mesh, bx0, by0, slack=2.5)
    ps2, t2, state = run_spatial_balanced_mesh2d_frames(
        ps, jnp.float32(0.0), cfg, colliders, n_sub, mesh,
        n_frames=n_frames, K=512, budget=256, rx=r, ry=r, interpret=True,
    )
    xs = np.asarray(ps2.x)[np.asarray(ps2.active)]
    assert xr.shape == xs.shape  # zero loss
    np.testing.assert_allclose(
        xr[np.lexsort(xr.T)], xs[np.lexsort(xs.T)], atol=1e-5
    )
    bx = np.asarray(state["bounds_x"])
    by = np.asarray(state["bounds_y"])
    assert bx[0] == 0 and bx[-1] == 16 and by[0] == 0 and by[-1] == 16
    assert bx[1] <= 7 and by[1] <= 7  # still biased toward the cluster
    # ownership == boundary split on both axes: shard (0, 0)'s active
    # count equals the histogram mass of its rectangle's x/y marginals
    # intersected -- check the x-marginal via the left column of shards
    cap_l = ps2.x.shape[0] // 4
    act = np.asarray(ps2.active)
    n_s00 = act[:cap_l].sum()
    n_s01 = act[cap_l : 2 * cap_l].sum()
    hx = np.asarray(state["hist_x"])
    assert n_s00 + n_s01 == hx[: bx[1]].sum()


def test_packed_pencils_match_single_chip_fused():
    """The PACKED-carry pencil frame (fully-fused substep per shard,
    two-axis exchange hooked between merge and grid update) must match
    the single-chip fused packed frame."""
    from taichi_mpm_tpu.ops import packed
    from taichi_mpm_tpu.parallel.spatial_mesh2d import (
        build_spatial_packed_mesh2d_frame,
    )

    sim, p = _scene()
    cfg = sim.cfg
    colliders = (
        levelset.box_domain(lo=(0.1, 0.1, 0.1), hi=(0.9, 0.9, 0.9),
                            friction=0.3),
    )
    n_sub = 8

    Kref = -(-min(1024, total_blocks_padded(cfg)) // 64) * 64
    p_ref, t_ref, _, _, _ = packed.packed_frame(
        p, jnp.float32(0.0), cfg, colliders, cfg.base_dt, n_sub, Kref,
        interpret=True, fused=True,
    )
    a_ref = np.asarray(p_ref.active)
    xr = np.asarray(p_ref.x)[a_ref]

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    ps = shard_pencils(p, cfg, mesh, slack=3.0)
    frame = build_spatial_packed_mesh2d_frame(
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


def test_cpic_packed_pencils_match_single_chip():
    """The PACKED CPIC pencil frame (fused bulk transfers per shard,
    impulses psum'd over both axes) must match the single-chip CPIC
    blocked frame at the packed-CPIC differential tolerance."""
    from taichi_mpm_tpu.parallel.spatial_mesh2d import (
        build_spatial_cpic_packed_mesh2d_frame,
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

    p1, b1, t1, _, n_near, n_coarse, _, _, _ = cpic_blocked_frame(
        sim.particles, b0, jnp.float32(0.0), cfg, scene, cfg.base_dt,
        n_sub, K=512, near_budget=512, b1=1024, interpret=True,
    )

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    ps = shard_pencils(sim.particles, cfg, mesh, slack=3.0)
    frame = build_spatial_cpic_packed_mesh2d_frame(
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


def test_cpic_packed_balanced_pencils_match_single_chip():
    """The full matrix cell — PACKED CPIC pencils over per-axis
    balanced bounds: a corner-clustered coupled scene stays equal to
    the single-chip CPIC blocked path while both axes' boundaries bias
    toward the cluster."""
    from taichi_mpm_tpu.parallel.spatial_mesh2d import (
        balanced_bounds2d_host,
        run_spatial_cpic_packed_balanced_mesh2d_frames,
        shard_pencils_bounds,
    )
    from taichi_mpm_tpu.rigid.cpic_blocked import cpic_blocked_frame
    from taichi_mpm_tpu.rigid.mesh import plate_mesh

    rng = np.random.default_rng(13)
    sim = MPM(res=(64, 64, 32), base_delta_t=2e-4,
              gravity=(0, 0, -4.0), penalty=1e3)
    n = 500
    x0 = np.empty((n, 3), np.float32)
    x0[:, 0] = rng.uniform(0.05, 0.22, n)  # low-x, low-y corner
    x0[:, 1] = rng.uniform(0.05, 0.22, n)
    x0[:, 2] = rng.uniform(0.4, 0.7, n)
    sim.add_particles("jelly", pos=x0, vel=(2.0, 1.5, 0.0), E=1e4,
                      nu=0.3, density=1000)
    sim.add_particles(
        "rigid", mesh=plate_mesh(half_u=0.15, half_v=0.15, axis=0),
        scripted_position=lambda t: (0.32, 0.15, 0.55),
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

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    r = 3  # CB=16 per axis, S=2: gap 8 -> r_max 3
    bx0, by0 = balanced_bounds2d_host(sim.particles, cfg, (2, 2), r, r)
    assert bx0[1] < 8 and by0[1] < 8
    ps = shard_pencils_bounds(sim.particles, cfg, mesh, bx0, by0,
                              slack=2.5)
    ps2, b2, t2, state = run_spatial_cpic_packed_balanced_mesh2d_frames(
        ps, b0, jnp.float32(0.0), cfg, scene, n_sub, mesh,
        n_frames=n_frames, K=512, budget=128, near_budget=512, b1=1024,
        rx=r, ry=r, interpret=True,
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
    bx = np.asarray(state["bounds_x"])
    by = np.asarray(state["bounds_y"])
    assert bx[0] == 0 and bx[-1] == 16 and by[0] == 0 and by[-1] == 16
    assert bx[1] <= 7 and by[1] <= 7  # biased toward the corner


def test_packed_balanced_pencils_match_and_rebalance():
    """The PACKED pencil frame over per-axis balanced bounds: the
    corner-clustered drifting scene must stay equal to the single-chip
    FUSED packed frame while both axes' boundaries bias toward the
    cluster (the fused twin of test_balanced_pencils_match_and_
    rebalance)."""
    from taichi_mpm_tpu.ops import packed
    from taichi_mpm_tpu.parallel.spatial_mesh2d import (
        balanced_bounds2d_host,
        run_spatial_packed_balanced_mesh2d_frames,
        shard_pencils_bounds,
    )

    rng = np.random.default_rng(11)
    sim = MPM(res=(64, 64, 32), base_delta_t=2e-4,
              gravity=(0.0, 0.0, -10.0))
    n = 800
    x0 = np.empty((n, 3), np.float32)
    x0[:, 0] = rng.uniform(0.03, 0.20, n)
    x0[:, 1] = rng.uniform(0.03, 0.20, n)
    x0[:, 2] = rng.uniform(0.3, 0.7, n)
    sim.add_particles("jelly", pos=x0, density=1000.0, E=1e4, nu=0.3)
    sim._finalize()
    cfg = sim.cfg
    v = np.zeros((n, 3), np.float32)
    v[:, 0] = 3.0
    v[:, 1] = 2.0
    p = dataclasses.replace(sim.particles, v=jnp.asarray(v))
    colliders = (
        levelset.box_domain(
            lo=(0.02, 0.02, 0.05), hi=(0.98, 0.98, 0.95), friction=0.3
        ),
    )
    n_sub, n_frames = 6, 3

    p_ref = dataclasses.replace(sim.particles, v=jnp.asarray(v))
    t = jnp.float32(0.0)
    Kref = -(-min(1024, total_blocks_padded(cfg)) // 64) * 64
    for _ in range(n_frames):
        p_ref, t, _, _, _ = packed.packed_frame(
            p_ref, t, cfg, colliders, cfg.base_dt, n_sub, Kref,
            interpret=True, fused=True,
        )
    a_ref = np.asarray(p_ref.active)
    xr = np.asarray(p_ref.x)[a_ref]

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("x", "y"))
    r = 3  # CB=16 per axis, S=2: uniform gap 8 -> r_max = 3
    bx0, by0 = balanced_bounds2d_host(p, cfg, (2, 2), r, r)
    assert bx0[1] < 8 and by0[1] < 8
    ps = shard_pencils_bounds(p, cfg, mesh, bx0, by0, slack=2.5)
    ps2, t2, state = run_spatial_packed_balanced_mesh2d_frames(
        ps, jnp.float32(0.0), cfg, colliders, n_sub, mesh,
        n_frames=n_frames, K=512, budget=128, rx=r, ry=r, interpret=True,
    )
    a2 = np.asarray(ps2.active)
    xs = np.asarray(ps2.x)[a2]
    assert xr.shape == xs.shape  # zero loss
    o1, o2 = np.lexsort(xr.T), np.lexsort(xs.T)
    np.testing.assert_allclose(xr[o1], xs[o2], atol=1e-5)
    v1 = np.asarray(p_ref.v)[a_ref][o1]
    v2 = np.asarray(ps2.v)[a2][o2]
    np.testing.assert_allclose(v1, v2, atol=5e-4)
    bx = np.asarray(state["bounds_x"])
    by = np.asarray(state["bounds_y"])
    assert bx[0] == 0 and bx[-1] == 16 and by[0] == 0 and by[-1] == 16
    assert bx[1] <= 7 and by[1] <= 7  # biased toward the cluster
