"""Adaptive time stepping (AsyncMPM redesign) tests."""

import numpy as np
import jax.numpy as jnp

from taichi_mpm_tpu.core.adaptive import AsyncMPM, dt_limit, snap_pot
from taichi_mpm_tpu.core.solver import MPM


def _block(res=64):
    return np.stack(
        np.meshgrid(np.linspace(0.4, 0.6, 8), np.linspace(0.6, 0.8, 8)), -1
    ).reshape(-1, 2)


class TestDtLimit:
    def test_snap_pot(self):
        assert float(snap_pot(jnp.float32(3e-4), 1e-6, 1e-3)) == np.float32(1e-6 * 256)
        assert float(snap_pot(jnp.float32(1e-9), 1e-6, 1e-3)) == np.float32(1e-6)
        assert float(snap_pot(jnp.float32(1.0), 1e-6, 1e-3)) == np.float32(1e-3)

    def test_stiffer_material_smaller_dt(self):
        # NOTE: jelly/linear are unconstrained by design (reference
        # get_allowed_dt returns 0 = no limit, particles.cpp:418-420);
        # elastic (StVK-Hencky) carries the sound-speed CFL limit.
        a = MPM(res=(64, 64))
        a.add_particles("elastic", pos=_block(), E=1e4, nu=0.3)
        a._finalize()
        b = MPM(res=(64, 64))
        b.add_particles("elastic", pos=_block(), E=1e6, nu=0.3)
        b._finalize()
        da = float(dt_limit(a.particles, a.cfg))
        db = float(dt_limit(b.particles, b.cfg))
        assert db < da  # 100x stiffer -> ~10x smaller allowed dt
        assert db < da / 5

    def test_velocity_shrinks_dt(self):
        a = MPM(res=(64, 64))
        a.add_particles("jelly", pos=_block(), E=1e4, nu=0.3)
        a._finalize()
        b = MPM(res=(64, 64))
        b.add_particles("jelly", pos=_block(), vel=(0, -50.0), E=1e4, nu=0.3)
        b._finalize()
        assert float(dt_limit(b.particles, b.cfg)) < float(dt_limit(a.particles, a.cfg))


class TestAsyncMPM:
    def test_matches_fixed_fine_dt(self):
        pos = _block()
        sim = AsyncMPM(res=(64, 64), base_delta_t=1e-3, frame_dt=5e-3, unit_delta_t=1e-6)
        sim.add_particles("jelly", pos=pos, E=5e4, nu=0.3)
        for _ in range(6):
            sim.step()
        ref = MPM(res=(64, 64), base_delta_t=2e-5, frame_dt=5e-3)
        ref.add_particles("jelly", pos=pos, E=5e4, nu=0.3)
        for _ in range(6):
            ref.step()
        assert np.abs(sim.positions() - ref.positions()).max() < 2e-3
        # adaptive should take far fewer substeps than the fine-dt run
        assert sim.last_substeps < 5e-3 / 2e-5

    def test_update_counter_accumulates(self):
        sim = AsyncMPM(res=(64, 64), base_delta_t=1e-3, frame_dt=2e-3)
        sim.add_particles("jelly", pos=_block(), E=5e4, nu=0.3)
        sim.step()
        assert sim.update_counter == sim.last_substeps * 64


class TestPackedAdaptive:
    def test_packed_adaptive_matches_oracle_adaptive(self):
        """packed_adaptive_frame (the Pallas-path async, VERDICT r1 #3)
        vs adaptive_frame_fn on the oracle substep: same dt schedule,
        same trajectories."""
        import dataclasses
        import jax.numpy as jnp
        from taichi_mpm_tpu.config import SimConfig
        from taichi_mpm_tpu.core.adaptive import adaptive_frame_fn
        from taichi_mpm_tpu.core.state import empty_particles
        from taichi_mpm_tpu.materials import models as materials
        from taichi_mpm_tpu.ops.packed import packed_adaptive_frame

        rng = np.random.default_rng(0)
        n = 1200
        cfg = SimConfig(res=(32, 32, 32), base_dt=4e-4, gravity=(0.0, -10.0, 0.0))
        mid, params, aux0 = materials.pack_params("elastic", E=2e4, nu=0.35)
        p = empty_particles(n, 3)
        p = dataclasses.replace(
            p,
            x=p.x.at[:].set(rng.uniform(0.25, 0.75, (n, 3)).astype(np.float32)),
            v=p.v.at[:].set(rng.standard_normal((n, 3)).astype(np.float32)),
            mat=p.mat.at[:].set(mid),
            params=p.params.at[:].set(np.asarray(params, np.float32)),
            aux=p.aux.at[:].set(aux0),
            mass=p.mass.at[:].set(1e-3),
            vol=p.vol.at[:].set(1e-6),
            active=p.active.at[:].set(True),
        )
        cfg = cfg.with_materials([mid])
        frame_dt, unit = 2e-3, 1e-6

        p1, t1, n1 = adaptive_frame_fn(
            p, jnp.float32(0.0), cfg, (), frame_dt, unit, cfg.base_dt
        )
        p2, t2, n2, nmax = packed_adaptive_frame(
            p, jnp.float32(0.0), cfg, (), frame_dt, unit, cfg.base_dt, 512,
            interpret=True,
        )
        assert abs(float(t1) - float(t2)) < 1e-6
        x1 = np.asarray(p1.x)[np.asarray(p1.active)]
        x2 = np.asarray(p2.x)[np.asarray(p2.active)]
        o1, o2 = np.lexsort(x1.T), np.lexsort(x2.T)
        assert np.allclose(x1[o1], x2[o2], atol=1e-4)
        # substep counts agree within one (dt schedules can differ by
        # one fp-rounding snap)
        assert abs(int(n1) - int(n2)) <= 1


class TestPerBlockDriver:
    def test_async_mpm_per_block_runs(self):
        """AsyncMPM(per_block=True): the bucketed scheduler through the
        user-facing driver (budget estimation + overflow growth)."""
        rng = np.random.default_rng(0)
        sim = AsyncMPM(res=(32, 32, 32), base_delta_t=1e-3,
                       frame_dt=6.4e-3, unit_delta_t=1e-4,
                       per_block=True, gravity=(0, 0, 0))
        pos = np.concatenate([
            rng.uniform([0.15, 0.3, 0.3], [0.4, 0.6, 0.6], (900, 3)),
            rng.uniform([0.6, 0.4, 0.4], [0.8, 0.6, 0.6], (300, 3)),
        ]).astype(np.float32)
        sim.add_particles("elastic", pos=pos[:900], E=4e3, nu=0.3)
        sim.add_particles("elastic", pos=pos[900:], E=4e5, nu=0.3)
        for _ in range(2):
            sim.step()
        assert sim.update_counter > 0
        x = sim.positions()
        assert np.all(np.isfinite(x)) and len(x) == 1200


class TestSchedulerVisualize:
    def test_visualize_scheduler(self, tmp_path):
        """Async debug output parity (async_visualize.cpp:12-163):
        per-particle dt limits, and block dt levels in per_block mode."""
        rng = np.random.default_rng(0)
        for per_block in (False, True):
            sim = AsyncMPM(res=(32, 32, 32), base_delta_t=1e-3,
                           frame_dt=6.4e-3, unit_delta_t=1e-4,
                           per_block=per_block, gravity=(0, 0, 0))
            sim.add_particles(
                "elastic",
                pos=rng.uniform(0.3, 0.7, (400, 3)).astype(np.float32),
                E=4e3, nu=0.3,
            )
            out = tmp_path / f"sched_{per_block}.bgeo"
            sim.visualize_scheduler(str(out))
            assert out.stat().st_size > 100
            from taichi_mpm_tpu.io.bgeo import read_bgeo

            pos, attrs = read_bgeo(str(out))
            assert len(pos) == 400
            if per_block:
                assert "dt_level" in attrs
                assert attrs["dt_level"].min() >= 0
            else:
                assert "limit" in attrs
                assert np.all(attrs["limit"] > 0)


class TestAdaptiveCPIC:
    """Global adaptive dt over CPIC scenes (VERDICT r4 #5; reference
    AsyncMPM runs the full coupled substep, async_mpm.cpp:330)."""

    def _scenes(self, cls, **kw):
        rng = np.random.default_rng(3)
        from taichi_mpm_tpu.rigid.mesh import plate_mesh

        sim = cls(res=(16, 16, 16), base_delta_t=2e-4,
                  frame_dt=1e-3, gravity=(0, -10.0, 0), **kw)
        pos = rng.uniform(0.3, 0.7, size=(220, 3)).astype(np.float32)
        sim.add_particles("jelly", pos=pos, vel=(0, -0.5, 0), E=1e4,
                          nu=0.3, density=1000)
        sim.add_particles(
            "rigid", mesh=plate_mesh(half_u=0.25, half_v=0.25, axis=1),
            scripted_position=lambda t: (0.5, 0.45, 0.5),
            scripted_rotation=lambda t: (0.0, 0.0, 0.0),
            codimensional=True, friction=0.2,
        )
        return sim

    def test_oracle_adaptive_cpic_matches_fixed(self):
        """unit_delta_t == base_delta_t forces every snapped dt to
        base_dt, so the adaptive coupled frame must reproduce the
        fixed-dt CPIC trajectory."""
        sim = self._scenes(AsyncMPM, unit_delta_t=2e-4)
        ref = self._scenes(MPM)
        for _ in range(3):
            sim.step()
            ref.step()
        assert sim.last_substeps == 5  # frame_dt / base_dt
        assert sim.update_counter == 3 * 5 * 220
        np.testing.assert_allclose(
            np.asarray(sim.t), np.asarray(ref.t), atol=1e-7
        )
        xs, xr = sim.positions(), ref.positions()
        np.testing.assert_allclose(xs, xr, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(sim.bodies.vel), np.asarray(ref.bodies.vel),
            atol=1e-5,
        )

    def test_packed_adaptive_cpic_matches_oracle(self):
        """cpic_packed_adaptive_frame_carry (the production fused-path
        frame) vs adaptive_cpic_frame_fn on the oracle coupled
        substep: same dt schedule, same trajectories."""
        import jax.numpy as jnp

        from taichi_mpm_tpu.core.adaptive import adaptive_cpic_frame_fn
        from taichi_mpm_tpu.ops import packed
        from taichi_mpm_tpu.rigid.cpic_packed import (
            cpic_packed_adaptive_frame_carry,
            cpic_packed_pack_carry,
        )

        sim = self._scenes(MPM)
        sim._finalize()
        cfg, scene, b0 = sim.cfg, sim.rigid_scene, sim.bodies
        frame_dt, unit = 1e-3, 1e-6

        p1, b1, t1, n1 = adaptive_cpic_frame_fn(
            sim.particles, b0, jnp.float32(0.0), cfg, scene, frame_dt,
            unit, cfg.base_dt,
        )
        carry = cpic_packed_pack_carry(sim.particles, cfg, 128)
        carry, b2, t2, _, nn, nc, nr, _, _, n2 = (
            cpic_packed_adaptive_frame_carry(
                carry, b0, jnp.float32(0.0), cfg, scene, frame_dt,
                unit, cfg.base_dt, 128, 256, 1024, 128,
                interpret=True,
            )
        )
        p2 = packed.unpack_particles(carry[0], sim.particles.capacity)
        assert abs(float(t1) - float(t2)) < 1e-7
        assert abs(int(n1) - int(n2)) <= 1
        assert int(nn) <= 256 and int(nc) <= 1024 and int(nr) <= 128
        x1 = np.asarray(p1.x)[np.asarray(p1.active)]
        x2 = np.asarray(p2.x)[np.asarray(p2.active)]
        o1, o2 = np.lexsort(x1.T), np.lexsort(x2.T)
        np.testing.assert_allclose(x1[o1], x2[o2], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(b1.vel), np.asarray(b2.vel), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(b1.pos), np.asarray(b2.pos), atol=1e-6
        )

    def test_adaptive_cpic_takes_fewer_substeps(self):
        """With a tiny unit dt the scheduler may coarsen: substeps per
        frame must never exceed the fixed-dt count and the state stays
        finite."""
        sim = self._scenes(AsyncMPM, unit_delta_t=1e-6)
        for _ in range(3):
            sim.step()
        assert 0 < sim.last_substeps <= 5
        x = sim.positions()
        assert np.all(np.isfinite(x)) and len(x) == 220
