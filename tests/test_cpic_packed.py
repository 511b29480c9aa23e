"""Packed CPIC path (rigid/cpic_packed) vs the pytree blocked path.

The packed CPIC substep moves the bulk transfers onto the flat
channel-major state (fused P2G, packed G2P+finish) while the sparse
corrections run on a budget-sized mini view; these tests pin it to
cpic_blocked_frame the same way that path is pinned to the oracle
colored transfers (tests/test_cpic.py::TestCPICBlocked)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taichi_mpm_tpu.core.solver import MPM
from taichi_mpm_tpu.rigid.cpic_blocked import cpic_blocked_frame
from taichi_mpm_tpu.rigid.cpic_packed import cpic_packed_frame
from taichi_mpm_tpu.rigid.mesh import paddle_wheel_mesh, plate_mesh


def _plate_scene(vel=(0.0, -0.5, 0.0), seed=3, n=220, penalty=1e3):
    rng = np.random.default_rng(seed)
    sim = MPM(res=(16, 16, 16), base_delta_t=2e-4, gravity=(0, -10.0, 0),
              penalty=penalty)
    pos = rng.uniform(0.3, 0.7, size=(n, 3)).astype(np.float32)
    sim.add_particles("jelly", pos=pos, vel=vel, E=1e4, nu=0.3,
                      density=1000)
    sim.add_particles(
        "rigid", mesh=plate_mesh(half_u=0.25, half_v=0.25, axis=1),
        scripted_position=lambda t: (0.5, 0.45, 0.5),
        scripted_rotation=lambda t: (0.0, 0.0, 0.0),
        codimensional=True, friction=0.2,
    )
    sim._finalize()
    return sim


def _compare(sim, n_sub, Kr=0, K=128, near=256, b1=1024):
    cfg, scene, b0 = sim.cfg, sim.rigid_scene, sim.bodies
    args = (sim.particles, b0, jnp.float32(0.0), cfg, scene, cfg.base_dt,
            n_sub, K, near, b1, Kr)
    p1, b1_, t1, na1, nn1, nc1, nr1, ns1, pl1 = cpic_blocked_frame(
        *args, interpret=True
    )
    p2, b2_, t2, na2, nn2, nc2, nr2, ns2, pl2 = cpic_packed_frame(
        *args, interpret=True
    )
    assert int(nn1) <= near and int(nc1) <= b1  # budgets honored
    assert int(nn2) <= near and int(nc2) <= b1
    assert int(ns1) == int(ns2)  # same lazy-resort schedule
    assert int(pl1) == int(pl2)  # same plasticity/cutting counters
    a1, a2 = np.asarray(p1.active), np.asarray(p2.active)
    np.testing.assert_array_equal(a1, a2)  # same stable sort order
    np.testing.assert_allclose(
        np.asarray(p2.x)[a2], np.asarray(p1.x)[a1], atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(p2.v)[a2], np.asarray(p1.v)[a1], atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(p2.F)[a2], np.asarray(p1.F)[a1], atol=5e-5
    )
    np.testing.assert_array_equal(
        np.asarray(p2.states)[a2], np.asarray(p1.states)[a1]
    )
    np.testing.assert_allclose(
        np.asarray(p2.near_b)[a2], np.asarray(p1.near_b)[a1]
    )
    np.testing.assert_allclose(
        np.asarray(b2_.vel), np.asarray(b1_.vel), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b2_.omega), np.asarray(b1_.omega), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(b2_.pos), np.asarray(b1_.pos), atol=1e-6
    )


@pytest.mark.parametrize("Kr", [0, 128])
def test_packed_matches_blocked_plate(Kr):
    """Dense AND record-sparse CDF variants of the packed path."""
    _compare(_plate_scene(), n_sub=5, Kr=Kr)


def test_packed_matches_blocked_with_resort():
    """Fast drift forces mid-frame lazy re-sorts; the packed path must
    track the pytree path across them (same drift accounting)."""
    vdrift = 0.1 / (2e-4 * 16.0)  # ~0.1 cells/substep
    _compare(_plate_scene(vel=(vdrift, -0.5, 0.0), seed=7), n_sub=8)


def test_two_d_carry_matches_flat():
    """The 2-D (NCH, Pw) carry (the MPM driver's form — the fused
    kernels' native layout) must be BITWISE identical to the flat
    carry: same math, same op order, only the state layout differs."""
    sim = _plate_scene(vel=(0.1 / (2e-4 * 16.0), -0.5, 0.0), seed=5)
    cfg, scene, b0 = sim.cfg, sim.rigid_scene, sim.bodies
    args = (sim.particles, b0, jnp.float32(0.0), cfg, scene, cfg.base_dt,
            6, 128, 256, 1024, 128)
    r1 = cpic_packed_frame(*args, interpret=True, two_d=False)
    r2 = cpic_packed_frame(*args, interpret=True, two_d=True)
    p1, p2 = r1[0], r2[0]
    for f in ("x", "v", "F", "C", "active", "states", "bdist", "near_b"):
        np.testing.assert_array_equal(
            np.asarray(getattr(p2, f)), np.asarray(getattr(p1, f)), err_msg=f
        )
    for k in range(1, len(r1)):
        for l1, l2 in zip(jax.tree_util.tree_leaves(r1[k]),
                          jax.tree_util.tree_leaves(r2[k])):
            np.testing.assert_array_equal(np.asarray(l2), np.asarray(l1))


def test_packed_wheel_two_way():
    """Free wheel spun up by falling particles: two-way impulses and
    advance must match (water-wheel physics, scripts/mls-cpic)."""
    rng = np.random.default_rng(11)
    sim = MPM(res=(16, 16, 16), base_delta_t=2e-4, gravity=(0, -10.0, 0),
              penalty=1e3)
    pos = np.empty((200, 3), np.float32)
    pos[:, 0] = rng.uniform(0.55, 0.65, 200)  # offset stream -> torque
    pos[:, 1] = rng.uniform(0.6, 0.8, 200)
    pos[:, 2] = rng.uniform(0.45, 0.55, 200)
    sim.add_particles("water", pos=pos, vel=(0, -1.0, 0), density=1000)
    sim.add_particles(
        "rigid", mesh=paddle_wheel_mesh(n_paddles=4, outer=0.18),
        initial_position=(0.5, 0.4, 0.5), rotation_axis=(0, 0, 1),
        codimensional=True, friction=0.1, density=40.0,
    )
    sim._finalize()
    _compare(sim, n_sub=6, Kr=128)
    # and through the MPM driver (fused default): wheel reacts
    sim2_frames = 3
    for _ in range(sim2_frames):
        sim.step()
    assert np.isfinite(np.asarray(sim.particles.x)).all()
