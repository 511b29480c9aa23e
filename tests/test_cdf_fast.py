"""Unit tests for the round-4 CPIC fast paths (rigid/cdf.py,
rigid/body.py): packed single-plane CDF lookups, the dilated stencil-tag
plane, the lazy rigid page map's check plane, and the masked (gather/
scatter-free) small-R impulse forms. Each is pinned against the
straightforward form it replaces (reference behavior:
/root/reference/src/rigid_transfer.cpp:18-117 rasterize,
/root/reference/src/transfer.cpp:228-254 impulse accumulation)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.transfer import stencil_offsets
from taichi_mpm_tpu.math.kernels import bspline_weights
from taichi_mpm_tpu.rigid import cdf
from taichi_mpm_tpu.rigid.body import (
    RigidBodies,
    accumulate_impulses,
    accumulate_impulses_masked,
    velocity_at,
    velocity_at_masked,
)


def _cfg3(res=32):
    return SimConfig(res=(res, res, res), active_materials=(1,))


def _random_records(rng, cfg, Kr, n_occ, num_rigids):
    """A plausible random RecordNodeCDF: n_occ occupied block records
    with random tags/dist/rid on a random subset of lanes."""
    from taichi_mpm_tpu.ops import blocked

    total = blocked.total_blocks_padded(cfg)
    bids = np.sort(rng.choice(total, size=n_occ, replace=False))
    rids = np.full((Kr,), total, np.int32)
    rids[:n_occ] = bids
    rslot = np.full((total + 1,), Kr, np.int32)
    rslot[bids] = np.arange(n_occ)

    N = Kr * 64 + 1
    has = np.zeros((N,), bool)
    occ_rows = rng.random((n_occ, 64)) < 0.3
    # real rasterize never writes out-of-grid nodes (inb mask): zero
    # any lane whose node coords fall outside grid_nodes
    nbp = blocked.num_blocks_padded(cfg)
    bz = bids % nbp[2]
    by = (bids // nbp[2]) % nbp[1]
    bx = bids // (nbp[2] * nbp[1])
    lane = np.arange(64)
    lx, ly, lz = lane // 16, (lane // 4) % 4, lane % 4
    nx = bx[:, None] * 4 + lx[None, :]
    ny = by[:, None] * 4 + ly[None, :]
    nz = bz[:, None] * 4 + lz[None, :]
    gn = cfg.grid_nodes
    ingrid = (nx < gn[0]) & (ny < gn[1]) & (nz < gn[2])
    occ_rows = occ_rows & ingrid
    has[: n_occ * 64] = occ_rows.reshape(-1)
    rid = np.where(has, rng.integers(0, num_rigids, size=N), -1).astype(np.int32)
    q = rng.integers(0, 1 << 22, size=N).astype(np.int32)
    dist = np.where(has, q.astype(np.float32) / cdf._DIST_SCALE * cfg.dx, 0.0)
    key = np.where(has, (q << 8) | (rid + 1), cdf._KEY_INF).astype(np.int32)
    # tags: 2 bits per rigid, tag of the owning rid always set
    states = np.zeros((N,), np.int32)
    tag = rng.integers(2, 4, size=N)
    states = np.where(has, tag << (2 * rid.clip(0)), 0).astype(np.int32)
    states[-1] = 0
    rid[-1] = -1
    dist[-1] = 0.0
    key[-1] = cdf._KEY_INF
    return cdf.RecordNodeCDF(
        jnp.asarray(dist), jnp.asarray(rid), jnp.asarray(states),
        jnp.asarray(rids), jnp.asarray(rslot), Kr, cfg,
        num_rigids=num_rigids, key=jnp.asarray(key),
    )


class TestPackedPlane:
    @pytest.mark.parametrize("R", [1, 2, 3])
    def test_record_lookup_matches_unpacked(self, R):
        rng = np.random.default_rng(0)
        cfg = _cfg3()
        nc = _random_records(rng, cfg, Kr=16, n_occ=12, num_rigids=R)
        nc_plain = cdf.RecordNodeCDF(
            nc.dist, nc.rid, nc.states, nc.rids, nc.rslot_map, nc.Kr,
            cfg, num_rigids=None,
        )
        assert nc.pk is not None and nc_plain.pk is None
        idx = jnp.asarray(
            rng.integers(-2, cfg.grid_nodes[0] + 2, size=(500, 3)),
            jnp.int32,
        )
        inb = jnp.all(
            (idx >= 0) & (idx < jnp.asarray(cfg.grid_nodes)), -1
        )
        s1, r1, d1 = nc.lookup(idx, inb)
        s2, r2, d2 = nc_plain.lookup(idx, inb)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        # pk decodes the raw key with the same expression: bitwise
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    def test_r4_falls_back_to_planes(self):
        rng = np.random.default_rng(1)
        cfg = _cfg3()
        nc = _random_records(rng, cfg, Kr=8, n_occ=6, num_rigids=4)
        assert nc.pk is None  # states would overlap the rid bits

    def test_dense_lookup_matches_unpacked(self):
        rng = np.random.default_rng(2)
        cfg = SimConfig(res=(16, 16, 16), active_materials=(1,))
        N = 1
        for n in cfg.grid_nodes:
            N *= n
        has = rng.random(N) < 0.2
        rid = np.where(has, rng.integers(0, 2, size=N), -1).astype(np.int32)
        q = rng.integers(0, 1 << 22, size=N).astype(np.int32)
        dist = np.where(has, q.astype(np.float32) / cdf._DIST_SCALE * cfg.dx, 0.0)
        key = np.where(has, (q << 8) | (rid + 1), cdf._KEY_INF).astype(np.int32)
        states = np.where(has, 2 << (2 * rid.clip(0)), 0).astype(np.int32)
        a = cdf.DenseNodeCDF(jnp.asarray(dist), jnp.asarray(rid),
                             jnp.asarray(states), cfg, num_rigids=2,
                             key=jnp.asarray(key))
        b = cdf.DenseNodeCDF(jnp.asarray(dist), jnp.asarray(rid),
                             jnp.asarray(states), cfg)
        idx = jnp.asarray(rng.integers(0, 16, size=(300, 3)), jnp.int32)
        inb = jnp.ones((300,), bool)
        s1, r1, d1 = a.lookup(idx, inb)
        s2, r2, d2 = b.lookup(idx, inb)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


class TestStencilTagged:
    def test_record_matches_27_lookups(self):
        """stencil_tagged == OR over the quadratic stencil of
        (states != 0), for centers whose block is on-record."""
        rng = np.random.default_rng(3)
        cfg = _cfg3()
        nc = _random_records(rng, cfg, Kr=32, n_occ=20, num_rigids=2)
        # sample positions inside occupied blocks (the exactness
        # precondition: center block on-record)
        from taichi_mpm_tpu.ops import blocked
        nbp = blocked.num_blocks_padded(cfg)
        occ = np.asarray(nc.rids[:20])
        bz = occ % nbp[2]
        by = (occ // nbp[2]) % nbp[1]
        bx = occ // (nbp[2] * nbp[1])
        corner = np.stack([bx, by, bz], -1) * 4
        P = 400
        pick = rng.integers(0, 20, size=P)
        pos = corner[pick] + rng.uniform(0.5, 3.5, size=(P, 3))
        base, _, _ = bspline_weights(2, jnp.asarray(pos, jnp.float32))
        center = base + 1

        fast = nc.stencil_tagged(center)
        slow = jnp.zeros((P,), bool)
        for off in stencil_offsets(3, 2):
            nidx = base + jnp.asarray(off, jnp.int32)
            inb = jnp.all(
                (nidx >= 0) & (nidx < jnp.asarray(cfg.grid_nodes)), -1
            )
            s, _, _ = nc.lookup(nidx, inb)
            slow = slow | (s != 0)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))

    def test_dense_matches_27_lookups(self):
        rng = np.random.default_rng(4)
        cfg = SimConfig(res=(16, 16, 16), active_materials=(1,))
        N = 1
        for n in cfg.grid_nodes:
            N *= n
        states = np.where(rng.random(N) < 0.05, 2, 0).astype(np.int32)
        nc = cdf.DenseNodeCDF(
            jnp.zeros((N,)), jnp.full((N,), -1, jnp.int32),
            jnp.asarray(states), cfg, num_rigids=1,
        )
        P = 300
        pos = rng.uniform(0.2, 15.8, size=(P, 3)).astype(np.float32)
        base, _, _ = bspline_weights(2, jnp.asarray(pos))
        fast = nc.stencil_tagged(base + 1)
        slow = jnp.zeros((P,), bool)
        for off in stencil_offsets(3, 2):
            nidx = base + jnp.asarray(off, jnp.int32)
            inb = jnp.all(
                (nidx >= 0) & (nidx < jnp.asarray(cfg.grid_nodes)), -1
            )
            s, _, _ = nc.lookup(nidx, inb)
            slow = slow | (s != 0)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(slow))


class TestLazyRigidMap:
    def test_checked_map_matches_and_chk_covers(self):
        rng = np.random.default_rng(5)
        cfg = _cfg3()
        xb = jnp.asarray(rng.uniform(0.3, 0.7, size=(100, 3)), jnp.float32)
        from taichi_mpm_tpu.ops.blocked import total_blocks_padded
        Kr = total_blocks_padded(cfg)  # no truncation in this test
        r1, m1, n1 = cdf.rigid_page_map(xb, cfg, Kr)
        r2, m2, n2, chk = cdf.rigid_page_map_checked(
            xb, cfg, Kr, dilate=4, chk_dilate=1
        )
        assert int(n2) <= Kr
        # dilate=4 is a superset of dilate=1
        s1 = set(np.asarray(r1)[: int(n1)].tolist())
        s2 = set(np.asarray(r2)[: int(n2)].tolist())
        assert s1 <= s2
        # every bp block is in chk, and chk blocks are all mapped
        from taichi_mpm_tpu.ops import blocked
        bid = blocked.block_id_of(xb, cfg)
        assert bool(jnp.all(chk[bid]))
        chk_ids = np.nonzero(np.asarray(chk)[:-1])[0]
        assert set(chk_ids.tolist()) <= s2

    def test_legacy_default_unchanged(self):
        rng = np.random.default_rng(6)
        cfg = _cfg3()
        xb = jnp.asarray(rng.uniform(0.2, 0.8, size=(64, 3)), jnp.float32)
        r1, m1, n1 = cdf.rigid_page_map(xb, cfg, 256)
        r2, m2, n2, _ = cdf.rigid_page_map_checked(xb, cfg, 256, dilate=1)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        assert int(n1) == int(n2)

    def test_prologue_stale_gate_rebuilds_inline(self):
        """ADVICE r4 (medium): the lazy map's between-substep staleness
        check runs on pre-rigidify bodies, but rigid_prologue moves
        bodies before rasterizing — a crossing in that gap must NOT
        silently drop CDF writes. The prologue's use-time gate (chk
        verified on the post-rigidify positions, inline cond rebuild)
        must make a deliberately-stale cached map produce a CDF
        identical to the fresh build — while the ungated 3-tuple form
        demonstrably corrupts it (proving the test has teeth)."""
        import dataclasses

        from taichi_mpm_tpu.core.solver import MPM
        from taichi_mpm_tpu.ops import blocked
        from taichi_mpm_tpu.rigid.body import boundary_particle_world
        from taichi_mpm_tpu.rigid.cpic_blocked import rigid_prologue
        from taichi_mpm_tpu.rigid.mesh import plate_mesh

        rng = np.random.default_rng(11)
        # res 64 (16 blocks/axis) + a small plate: the displaced map's
        # dilate-4 footprint must genuinely MISS the true bp blocks
        # (at low res the dilation covers the whole domain and the map
        # can never go stale)
        sim = MPM(res=(64, 64, 64), base_delta_t=2e-4,
                  gravity=(0, -10.0, 0))
        sim.add_particles(
            "jelly",
            pos=rng.uniform(0.4, 0.6, size=(32, 3)).astype(np.float32),
            E=1e4, nu=0.3, density=1000,
        )
        sim.add_particles(
            "rigid", mesh=plate_mesh(half_u=0.05, half_v=0.05, axis=1),
            scripted_position=lambda t: (0.5, 0.45, 0.5),
            scripted_rotation=lambda t: (0.0, 0.0, 0.0),
            codimensional=True, friction=0.2,
        )
        sim._finalize()
        cfg, scene, bodies = sim.cfg, sim.rigid_scene, sim.bodies
        dt = cfg.base_dt
        Kr = blocked.total_blocks_padded(cfg)  # ample, no overflow

        _, ncdf_ref, _, xb = rigid_prologue(
            bodies, scene, cfg, cfg, dt, Kr
        )

        # a map cached from bodies >4 blocks away in x: its dilate-4
        # record set and chk plane miss the actual bp blocks entirely
        far = dataclasses.replace(
            bodies, pos=bodies.pos + jnp.asarray([0.4, 0.0, 0.0])
        )
        xb_far, _, _ = boundary_particle_world(
            far, scene.bp_rid, scene.bp_offset, scene.bp_normal,
            scene.bp_elem,
        )
        rids, rslot, nr, chk = cdf.rigid_page_map_checked(
            xb_far, cfg, Kr, dilate=4, chk_dilate=1
        )
        assert not bool(jnp.all(chk[blocked.block_id_of(xb, cfg)]))

        nodes = cfg.grid_nodes
        ii = jnp.stack(jnp.meshgrid(
            *[jnp.arange(n) for n in nodes], indexing="ij"
        ), -1).reshape(-1, 3)
        inb = jnp.ones((ii.shape[0],), bool)
        s_ref, r_ref, d_ref = ncdf_ref.lookup(ii, inb)

        # gated (4-tuple): identical to the fresh build
        _, ncdf_g, _, _ = rigid_prologue(
            bodies, scene, cfg, cfg, dt, Kr, rmap=(rids, rslot, nr, chk)
        )
        s_g, r_g, d_g = ncdf_g.lookup(ii, inb)
        np.testing.assert_array_equal(np.asarray(s_g), np.asarray(s_ref))
        np.testing.assert_array_equal(np.asarray(r_g), np.asarray(r_ref))
        np.testing.assert_allclose(np.asarray(d_g), np.asarray(d_ref))

        # ungated (3-tuple): the stale map drops writes
        _, ncdf_b, _, _ = rigid_prologue(
            bodies, scene, cfg, cfg, dt, Kr, rmap=(rids, rslot, nr)
        )
        s_b, _, _ = ncdf_b.lookup(ii, inb)
        assert not np.array_equal(np.asarray(s_b), np.asarray(s_ref))


class TestMaskedBodyForms:
    def _bodies(self, R=3):
        rng = np.random.default_rng(7)
        return RigidBodies(
            pos=jnp.asarray(rng.normal(size=(R, 3)), jnp.float32),
            vel=jnp.asarray(rng.normal(size=(R, 3)), jnp.float32),
            rot=jnp.asarray([[1.0, 0, 0, 0]] * R, jnp.float32),
            omega=jnp.asarray(rng.normal(size=(R, 3)), jnp.float32),
            mass_inv=jnp.ones((R,), jnp.float32),
            inertia_inv=jnp.tile(jnp.eye(3)[None], (R, 1, 1)),
            friction=jnp.asarray(rng.random((R, 2)), jnp.float32),
            restitution=jnp.zeros((R,), jnp.float32),
            rotation_axis=jnp.zeros((R, 3), jnp.float32),
            linear_damping=jnp.zeros((R,), jnp.float32),
            angular_damping=jnp.zeros((R,), jnp.float32),
        )

    def test_velocity_at_masked(self):
        b = self._bodies()
        rng = np.random.default_rng(8)
        rid = jnp.asarray(rng.integers(-1, 3, size=200), jnp.int32)
        x = jnp.asarray(rng.normal(size=(200, 3)), jnp.float32)
        vm = velocity_at_masked(b, rid, x)
        vg = velocity_at(b, jnp.clip(rid, 0, 2), x)
        m = np.asarray(rid) >= 0
        np.testing.assert_array_equal(np.asarray(vm)[m], np.asarray(vg)[m])
        np.testing.assert_array_equal(np.asarray(vm)[~m], 0.0)

    def test_accumulate_impulses_masked(self):
        b = self._bodies()
        rng = np.random.default_rng(9)
        n = 500
        rid = jnp.asarray(rng.integers(0, 3, size=n), jnp.int32)
        J = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        at = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        valid = jnp.asarray(rng.random(n) < 0.7)
        J1, t1 = accumulate_impulses(b, rid, J, at, valid)
        J2, t2 = accumulate_impulses_masked(b, rid, J, at, valid)
        np.testing.assert_allclose(np.asarray(J2), np.asarray(J1),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t1),
                                   rtol=1e-5, atol=1e-6)
