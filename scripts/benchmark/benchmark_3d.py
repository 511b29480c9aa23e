"""Performance harness: the reference's benchmark=125 / benchmark=8000
analytic cube (scripts/benchmark/benchmark_3d.py + mpm.cpp:149-186).
BENCHMARK=125 -> 125k particles, BENCHMARK=8000 -> 8M particles."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time

from common import parse_args

from taichi_mpm_tpu.scenes import benchmark_cube

args = parse_args(frames=10)
benchmark = int(os.environ.get("BENCHMARK", "125"))
cells = 25 if benchmark == 125 else 100
res = 125

sim = benchmark_cube(cells=cells, res=res, material="jelly", E=2e4, nu=0.35)
sim.frame_dt = sim.cfg.base_dt * 20
n = cells**3 * 8
print(f"benchmark={benchmark}: {n} particles, res {res}^3")

import jax

sim.step()
jax.block_until_ready(sim.particles.x)
for f in range(args.frames):
    t0 = time.perf_counter()
    sim.step()
    jax.block_until_ready(sim.particles.x)
    wall = time.perf_counter() - t0
    print(f"frame {f}: {wall*1e3:.1f} ms  "
          f"{n * 20 / wall / 1e6:.1f} M particle-steps/s")
