"""Scene-script smoke tests: the de-facto integration suite (reference
scripts are validated by running, SURVEY.md §2.7). Each script is run
for a few frames in a subprocess on small resolution; pass = finite
state, expected particle behavior, nonzero output."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(
    os.environ,
    JAX_PLATFORMS="cpu",
    PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    XLA_FLAGS=os.environ.get("XLA_FLAGS", ""),
)


def run_script(rel, extra=(), timeout=480):
    cmd = [sys.executable, os.path.join(REPO, rel), "--cpu", *extra]
    res = subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, env=ENV, cwd=REPO
    )
    assert res.returncode == 0, f"{rel} failed:\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}"
    return res.stdout


class TestScripts:
    def test_sand_wheel_2d(self, tmp_path):
        out = run_script(
            "scripts/mls-cpic/sand_wheel_2D.py",
            ["--frames", "3", "--res", "48", "--out", str(tmp_path)],
        )
        assert "frame 00002" in out
        assert len(list(tmp_path.glob("*.bgeo"))) == 3

    def test_colliding_balls_energy(self):
        out = run_script(
            "scripts/benchmark/colliding_balls_energy.py",
            ["--frames", "3", "--res", "32"],
        )
        assert "E=" in out

    def test_async_water(self):
        out = run_script("scripts/async/water.py", ["--frames", "3", "--res", "32"])
        assert "total particle updates:" in out

    def test_mls_mpm88_demo(self):
        cmd = [sys.executable, os.path.join(REPO, "demos/mls_mpm88.py")]
        src = open(os.path.join(REPO, "demos/mls_mpm88.py")).read()
        src = src.replace("range(40)", "range(4)")
        res = subprocess.run(
            [sys.executable, "-c", src], capture_output=True, text=True,
            timeout=480, env=ENV, cwd=REPO,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert "frame 003" in res.stdout

    def test_mls_mpm88_explained_demo(self):
        src = open(os.path.join(REPO, "demos/mls_mpm88_explained.py")).read()
        src = src.replace("range(40)", "range(4)")
        res = subprocess.run(
            [sys.executable, "-c", src], capture_output=True, text=True,
            timeout=480, env=ENV, cwd=REPO,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert "frame 003" in res.stdout

    def test_tetris_demo(self, tmp_path):
        src = open(os.path.join(REPO, "demos/tetris.py")).read()
        src = src.replace("range(60)", "range(3)")
        path = tmp_path / "tetris_short.py"
        path.write_text(src)
        res = subprocess.run(
            [sys.executable, str(path)], capture_output=True, text=True,
            timeout=480, env=ENV, cwd=REPO,
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert "frame 002" in res.stdout


class TestStork:
    def test_stork(self):
        out = run_script("scripts/async/stork.py", ["--frames", "2", "--res", "48"])
        assert "total particle updates:" in out


# Full-inventory smoke coverage (VERDICT r2 task 5): every scene
# script executes for a couple of frames at low resolution — the
# reference's scripts ARE its integration suite (SURVEY.md §2.7), so a
# regression in cutting (banana), motor/stepper (robot), articulated
# source-driven coupling (water_wheel) etc. must surface in CI.

COMMON_RUNNER_SCENES = [
    # (relpath, frames, res, extra) — all print "frame 0000N" per frame
    ("scripts/mls-cpic/banana.py", 2, 48, ()),
    ("scripts/mls-cpic/bunny_split.py", 2, 48, ()),
    # buoyancy: 200 substeps/frame at 120k particles (~6.5 min/frame on
    # a 1-CPU runner); the smoke caps it at 10 substeps via --frame-dt
    ("scripts/mls-cpic/buoyancy.py", 2, 48, ("--frame-dt", "5e-4")),
    ("scripts/mls-cpic/goo_blocks.py", 2, 48, ()),
    ("scripts/mls-cpic/robot.py", 2, 48, ()),
    ("scripts/mls-cpic/robot_reversed.py", 2, 48, ()),
    ("scripts/mls-cpic/sand_paddles.py", 2, 48, ()),
    ("scripts/mls-cpic/sand_stir.py", 2, 48, ()),
    ("scripts/mls-cpic/sand_sweep.py", 2, 48, ()),
    ("scripts/mls-cpic/water_wheel.py", 2, 48, ()),
    ("scripts/benchmark/colliding_balls_3d_test.py", 2, 32, ()),
    ("scripts/benchmark/oscillating_jello.py", 2, 32, ()),
    # texture-modulated per-particle cohesion (mpm.cpp:100-109)
    ("scripts/sand_layers.py", 2, 32, ()),
]

ASYNC_SCENES = [
    ("scripts/async/balls.py", 2, 32),
    ("scripts/async/combo.py", 2, 32),
    ("scripts/async/sand.py", 2, 32),
    ("scripts/async/slope.py", 2, 32),
    # adaptive dt over a CPIC scene (async_mpm.cpp:330 substep reuse)
    ("scripts/async/wheel.py", 2, 64),
]


class TestAllScenes:
    @pytest.mark.parametrize("rel,frames,res,extra", COMMON_RUNNER_SCENES,
                             ids=[s[0].split("/")[-1][:-3]
                                  for s in COMMON_RUNNER_SCENES])
    def test_scene(self, rel, frames, res, extra):
        out = run_script(
            rel,
            ["--frames", str(frames), "--res", str(res), *extra],
            timeout=900,
        )
        assert f"frame {frames - 1:05d}" in out

    @pytest.mark.parametrize("rel,frames,res", ASYNC_SCENES,
                             ids=[s[0].split("/")[-1][:-3]
                                  for s in ASYNC_SCENES])
    def test_async_scene(self, rel, frames, res):
        out = run_script(
            rel, ["--frames", str(frames), "--res", str(res)], timeout=900
        )
        assert "total particle updates:" in out

    def test_benchmark_3d(self):
        env = dict(ENV, BENCHMARK="125")
        res = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/benchmark/benchmark_3d.py"),
             "--cpu", "--frames", "2"],
            capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
        )
        assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
        assert "frame 1" in res.stdout

    def test_multichip_scaling(self):
        env = dict(
            ENV, BENCHMARK="4", SHARDS="2", SUBSTEPS="2", BENCHMARK_REPS="1",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
        )
        res = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts/benchmark/multichip_scaling.py"),
             "--cpu", "--frames", "1"],
            capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
        )
        assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
        assert "2 shards" in res.stdout
