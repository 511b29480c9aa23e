"""Benchmark: particle-steps/sec on the flagship 3D scene.

Replicates the reference's benchmark harness semantics
(benchmark=125/8000 analytic cube seeding, /root/reference/src/mpm.cpp:149-186,
work metric = particle updates per second, mpm.cpp:436,449).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The default config is the reference's own large benchmark (benchmark=8000:
100^3 cells x 8 ppc = 8M particles, res 125^3); BENCH_CELLS=25 selects the
small one (125k). The value is per-chip throughput; vs_baseline compares it
to the per-chip share of the BASELINE.md target (>=1e9 particle-steps/sec
at 10M particles on a v5p-8, i.e. 1e9/8 per chip — note the target chip is
a v5p with ~3.4x this v5e's HBM bandwidth).
"""

import json
import os
import time

import jax


def main():
    cells = int(os.environ.get("BENCH_CELLS", "100"))  # 100 -> 8M particles
    substeps = int(os.environ.get("BENCH_SUBSTEPS", "20"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))

    from taichi_mpm_tpu.scenes import benchmark_cube

    n_particles = cells**3 * 8
    sim = benchmark_cube(cells=cells, res=125, material="jelly", E=2e4, nu=0.35)
    sim.frame_dt = sim.cfg.base_dt * substeps

    sim.step()  # compile + warmup
    jax.block_until_ready(sim.particles.x)

    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sim.step()
        jax.block_until_ready(sim.particles.x)
        best = min(best, time.perf_counter() - t0)

    pps = n_particles * substeps / best
    print(
        json.dumps(
            {
                "metric": "particle_steps_per_sec",
                "value": pps,
                "unit": "particle-steps/s/chip",
                "vs_baseline": pps / (1e9 / 8),
            }
        )
    )


if __name__ == "__main__":
    main()
