"""Determinism, Dirichlet regions, particle collision resolution,
clean_boundary, diagnostics, general_action — the smaller SURVEY §2/§5
items."""

import numpy as np
import jax.numpy as jnp

from taichi_mpm_tpu.core.levelset import Collider, dirichlet_slab
from taichi_mpm_tpu.core.solver import MPM


def _scene(res=32, **kw):
    sim = MPM(res=(res, res), base_delta_t=1e-4, frame_dt=1e-3, **kw)
    pos = np.stack(
        np.meshgrid(np.linspace(0.3, 0.7, 10), np.linspace(0.4, 0.6, 6)), -1
    ).reshape(-1, 2)
    sim.add_particles("jelly", pos=pos, E=1e4, nu=0.3)
    return sim


class TestDeterminism:
    def test_same_input_same_bits(self):
        """Pure-functional solve: identical runs are bitwise identical
        (the TPU answer to the reference's lock-free-by-coloring races,
        SURVEY.md §5)."""
        a, b = _scene(), _scene()
        for _ in range(5):
            a.step()
            b.step()
        np.testing.assert_array_equal(np.asarray(a.particles.x), np.asarray(b.particles.x))
        np.testing.assert_array_equal(np.asarray(a.particles.F), np.asarray(b.particles.F))


class TestDirichlet:
    def test_slab_pins_velocity(self):
        sim = _scene()
        sim.add_collider(dirichlet_slab(1, 0.55, 1.0, velocity=(0.0, 0.0)))
        for _ in range(20):
            sim.step()
        p = sim.particles
        x = np.asarray(p.x)[np.asarray(p.active)]
        v = np.asarray(p.v)[np.asarray(p.active)]
        hi = x[:, 1] > 0.58
        lo = x[:, 1] < 0.5
        # pinned region barely moves; free region falls under gravity
        assert np.abs(v[hi, 1]).max() < 0.2
        assert v[lo, 1].mean() < -0.1


class TestParticleCollision:
    def test_projection_out_of_obstacle(self):
        from taichi_mpm_tpu.core import levelset

        sim = _scene(particle_collision=True)
        sim.add_collider(levelset.plane((0.0, 0.35), (0.0, 1.0), friction=0.0))
        for _ in range(40):
            sim.step()
        x = sim.positions()
        # particle_collision_resolution keeps everything at/above the plane
        assert x[:, 1].min() > 0.35 - 1e-3


class TestCleanBoundary:
    def test_near_boundary_particles_removed(self):
        sim = _scene(clean_boundary=True)
        # particles within 7 cells of the wall get deactivated
        sim.add_particles(
            "jelly", pos=np.asarray([[0.05, 0.5], [0.5, 0.05]], np.float32),
            E=1e4, nu=0.3,
        )
        n0 = int(np.asarray(sim.particles.count())) if sim.particles is not None else 62
        sim.step()
        p = sim.particles
        x = np.asarray(p.x)
        act = np.asarray(p.active)
        pos_cells = x * sim.cfg.inv_dx
        near = (pos_cells.min(-1) < 7.0) | ((pos_cells - 32).max(-1) > -7.0)
        assert not np.any(act & near)
        assert act.sum() == 60  # interior block survives


class TestDiagnostics:
    def test_frame_profiler(self):
        from taichi_mpm_tpu.diagnostics import FrameProfiler

        prof = FrameProfiler(substeps_per_frame=10)
        sim = _scene()
        for _ in range(3):
            with prof.frame(60):
                sim.step()
        assert prof.update_counter == 3 * 600
        assert prof.particle_steps_per_sec() > 0
        assert "throughput" in prof.report()

    def test_simulate_with_energy(self):
        from taichi_mpm_tpu.diagnostics import simulate_with_energy

        sim = _scene(gravity=(0.0, 0.0))
        e = simulate_with_energy(sim, 3)
        assert e.shape == (3,)
        assert np.all(np.isfinite(e))


class TestGeneralAction:
    def test_save_load_energy(self, tmp_path):
        sim = _scene()
        sim.step()
        path = str(tmp_path / "s.npz")
        sim.general_action("save", path=path)
        e = sim.general_action("calculate_energy")
        sim2 = _scene()
        sim2.general_action("load", path=path)
        assert abs(sim2.general_action("calculate_energy") - e) < 1e-6


class TestEnergyConservation:
    def test_oscillating_jello_energy_bounded(self):
        """Zero-gravity oscillating block: mechanical energy stays within
        ~10% over 30 frames (the reference's oscillating_jello.py
        inspection, made an assertion; explicit MPM + APIC dissipates
        slightly, it must not blow up or drain)."""
        from taichi_mpm_tpu.diagnostics import simulate_with_energy

        sim = MPM(res=(32, 32), base_delta_t=1e-4, frame_dt=2e-3,
                  gravity=(0.0, 0.0))
        pos = np.stack(
            np.meshgrid(np.linspace(0.35, 0.65, 12), np.linspace(0.42, 0.58, 7)), -1
        ).reshape(-1, 2)
        vel = np.zeros_like(pos)
        vel[:, 0] = (pos[:, 0] - 0.5) * 2.0  # stretch mode
        sim.add_particles("jelly", pos=pos, vel=vel, E=5e3, nu=0.3)
        e = simulate_with_energy(sim, 30)
        assert np.all(np.isfinite(e))
        assert e.max() <= e[0] * 1.1 + 1e-12   # no energy gain
        assert e[-1] >= e[0] * 0.5             # not over-dissipated


class TestStageReport:
    def test_stage_report(self):
        """Per-stage substep profiler (TC_PROFILE analog,
        mpm.cpp:464-571) runs and reports every pipeline stage."""
        import numpy as np

        from taichi_mpm_tpu.core.solver import MPM
        from taichi_mpm_tpu.diagnostics import stage_report

        rng = np.random.default_rng(0)
        sim = MPM(res=(32, 32, 32), base_delta_t=2e-4)
        sim.add_particles(
            "jelly", pos=rng.uniform(0.3, 0.7, (2000, 3)).astype(np.float32),
            E=1e4, nu=0.3,
        )
        rep = stage_report(sim, substeps=2, repeats=1)
        for k in ("prep", "p2g", "merge", "grid", "windows", "g2p", "finish"):
            assert k in rep and rep[k] >= 0.0


class TestKernelOrderGuard:
    """The optimized path hardcodes quadratic B-splines; other orders
    must not silently run it (VERDICT r3 weak #5). The reference
    dispatches its generic kernel for non-default orders
    (src/kernel.h:73-166)."""

    def _scene3d(self, **kw):
        sim = MPM(res=(16, 16, 16), base_delta_t=1e-4, frame_dt=1e-3, **kw)
        pos = np.stack(
            np.meshgrid(*[np.linspace(0.4, 0.6, 4)] * 3), -1
        ).reshape(-1, 3)
        sim.add_particles("jelly", pos=pos, E=1e4, nu=0.3)
        return sim

    def test_explicit_optimized_raises(self):
        import pytest

        sim = self._scene3d(optimized=True, kernel_order=1)
        with pytest.raises(ValueError, match="kernel_order"):
            sim.step()

    def test_auto_falls_back_with_warning(self, monkeypatch):
        import pytest
        import taichi_mpm_tpu.core.solver as solver_mod

        sim = self._scene3d(kernel_order=3)
        monkeypatch.setattr(solver_mod.jax, "default_backend", lambda: "tpu")
        with pytest.warns(UserWarning, match="kernel_order"):
            assert sim._use_blocked() is False

    def test_quadratic_unaffected(self, monkeypatch):
        import taichi_mpm_tpu.core.solver as solver_mod

        sim = self._scene3d()
        monkeypatch.setattr(solver_mod.jax, "default_backend", lambda: "tpu")
        assert sim._use_blocked() is True
