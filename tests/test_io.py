"""IO tests: BGEO writer (native == python fallback, roundtrip),
checkpoint/resume bitwise state restoration."""

import os

import numpy as np
import pytest

from taichi_mpm_tpu.io import bgeo as bgeo_mod
from taichi_mpm_tpu.io.bgeo import read_bgeo, write_bgeo


@pytest.fixture
def sample_particles():
    rng = np.random.default_rng(7)
    pos = rng.random((1000, 3)).astype(np.float32)
    attrs = {
        "v": rng.normal(size=(1000, 3)).astype(np.float32),
        "mass": rng.random(1000).astype(np.float32),
    }
    return pos, attrs


class TestBgeo:
    def test_roundtrip(self, tmp_path, sample_particles):
        pos, attrs = sample_particles
        path = str(tmp_path / "a.bgeo")
        write_bgeo(path, pos, attrs)
        rpos, rattrs = read_bgeo(path)
        np.testing.assert_array_equal(rpos, pos)
        np.testing.assert_array_equal(rattrs["v"], attrs["v"])
        np.testing.assert_array_equal(rattrs["mass"], attrs["mass"])

    def test_native_matches_python(self, tmp_path, sample_particles):
        pos, attrs = sample_particles
        p_native = str(tmp_path / "n.bgeo")
        p_py = str(tmp_path / "p.bgeo")
        lib = bgeo_mod._native_lib()
        if lib is None:
            pytest.skip("no native toolchain")
        write_bgeo(p_native, pos, attrs)  # uses native
        norm_pos, n, norm_attrs = bgeo_mod._normalize(pos, attrs)
        bgeo_mod._write_bgeo_py(p_py, norm_pos, n, norm_attrs)
        with open(p_native, "rb") as f1, open(p_py, "rb") as f2:
            assert f1.read() == f2.read()

    def test_2d_embedding(self, tmp_path):
        pos = np.random.default_rng(0).random((10, 2)).astype(np.float32)
        path = str(tmp_path / "b.bgeo")
        write_bgeo(path, pos)
        rpos, _ = read_bgeo(path)
        np.testing.assert_array_equal(rpos[:, :2], pos)
        assert np.all(rpos[:, 2] == 0)

    def test_large_point_count_int_indices(self, tmp_path):
        # > 2^16 points switches the primitive index width
        n = (1 << 16) + 10
        pos = np.zeros((n, 3), np.float32)
        path = str(tmp_path / "c.bgeo")
        write_bgeo(path, pos)
        rpos, _ = read_bgeo(path)
        assert rpos.shape == (n, 3)


class TestCheckpoint:
    def _scene(self):
        from taichi_mpm_tpu.core.solver import MPM
        from taichi_mpm_tpu.rigid.mesh import segment_mesh_2d

        sim = MPM(res=(32, 32), base_delta_t=1e-4, frame_dt=1e-3)
        pos = np.stack(
            np.meshgrid(np.linspace(0.4, 0.6, 6), np.linspace(0.52, 0.6, 4)), -1
        ).reshape(-1, 2)
        sim.add_particles("jelly", pos=pos, E=1e4, nu=0.3)
        sim.add_particles(
            "rigid",
            mesh=segment_mesh_2d((-0.2, 0.0), (0.2, 0.0)),
            initial_position=(0.5, 0.5),
            codimensional=True,
        )
        return sim

    def test_save_load_resume_matches(self, tmp_path):
        path = str(tmp_path / "ckpt.npz")
        a = self._scene()
        for _ in range(3):
            a.step()
        a.save(path)
        for _ in range(3):
            a.step()
        xa = a.positions()
        ba = np.asarray(a.bodies.vel)

        b = self._scene()
        b.load(path)
        for _ in range(3):
            b.step()
        xb = b.positions()
        bb = np.asarray(b.bodies.vel)
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ba, bb)

    def test_capacity_too_small_raises(self, tmp_path):
        from taichi_mpm_tpu.core.solver import MPM

        path = str(tmp_path / "ckpt.npz")
        a = self._scene()
        a.step()
        a.save(path)
        c = MPM(res=(32, 32))
        c.add_particles("jelly", pos=np.full((5, 2), 0.5), E=1e4, nu=0.3)
        with pytest.raises(ValueError, match="capacity"):
            c.load(path)

    def test_resume_into_grown_capacity(self, tmp_path):
        """A snapshot resumes bitwise into a LARGER-capacity scene (the
        natural move after hitting the capacity RuntimeError); extra
        slots stay inactive and free for injection (mpm.cpp:941-958
        rebuilds pools at whatever size the snapshot holds)."""
        path = str(tmp_path / "ckpt.npz")
        a = self._scene()
        for _ in range(3):
            a.step()
        a.save(path)
        snap_cap = a.particles.capacity
        for _ in range(3):
            a.step()
        xa = a.positions()

        b = self._scene()
        b.capacity = 2 * snap_cap
        b.load(path)
        assert b.particles.capacity == 2 * snap_cap
        assert int(np.sum(np.asarray(b.particles.active))) == int(
            np.sum(np.asarray(a.particles.active))
        )
        for _ in range(3):
            b.step()
        xb = b.positions()
        np.testing.assert_array_equal(xa, xb)


class TestRigidMeshOutput:
    def test_visualize_writes_rigid_objs_and_cdf(self, tmp_path):
        """Frame output parity: transformed rigid meshes per frame
        (visualize.cpp:102-154) + CDF debug dumps (mpm.cpp:473-505)."""
        import numpy as np

        from taichi_mpm_tpu.core.solver import MPM
        from taichi_mpm_tpu.rigid.mesh import plate_mesh

        rng = np.random.default_rng(0)
        sim = MPM(res=(16, 16, 16), base_delta_t=2e-4, gravity=(0, -10.0, 0))
        sim.add_particles(
            "jelly", pos=rng.uniform(0.35, 0.6, (100, 3)).astype(np.float32),
            E=1e4, nu=0.3, density=1000,
        )
        sim.add_particles(
            "rigid", mesh=plate_mesh(half_u=0.2, half_v=0.2, axis=1),
            scripted_position=lambda t: (0.5, 0.4 + 0.1 * t, 0.5),
            scripted_rotation=lambda t: (0.0, 0.0, 0.0),
            codimensional=True, friction=0.2,
        )
        sim.step()
        out = tmp_path / "frame0.bgeo"
        sim.visualize(str(out), verbose=True)
        objs = sorted(tmp_path.glob("frame0_rigid_*.obj"))
        assert len(objs) == 1
        txt = objs[0].read_text()
        assert txt.count("v ") > 3 and "f " in txt
        # vertices moved with the scripted body (y ~ 0.4)
        ys = [float(l.split()[2]) for l in txt.splitlines() if l.startswith("v ")]
        assert 0.3 < float(np.mean(ys)) < 0.5

        sim.visualize_cdf(str(tmp_path / "cdf.bgeo"))
        sim.visualize_particle_cdf(str(tmp_path / "pcdf.bgeo"))
        assert (tmp_path / "cdf.bgeo").stat().st_size > 100
        assert (tmp_path / "pcdf.bgeo").exists()
