"""Observability: profiling, counters, and throughput reporting.

The reference wraps every substep stage in a hierarchical scope profiler
(TC_PROFILE, mpm.cpp:464-571), counts particle updates as its work
metric (update_counter, mpm.cpp:436,449), and ships microbenchmark
modes (benchmark_rasterize/resample, mpm.cpp:516-524). The TPU
equivalents here:

  * ``FrameProfiler`` — host-side per-frame wall clock + particle-steps
    /sec (the reference's work metric normalized by time), with a
    rolling report like ``print_profile_info``;
  * ``trace`` — context manager around ``jax.profiler.trace`` producing
    an xplane/perfetto trace of the on-device stages (the real
    per-kernel breakdown jit fusing makes host timers blind to);
  * ``device_memory_report`` — live HBM usage per buffer kind.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class FrameProfiler:
    """Wall-clock frame profiler + particle-steps/sec reporter."""

    substeps_per_frame: int = 1
    frames: List[dict] = field(default_factory=list)

    @contextlib.contextmanager
    def frame(self, n_particles: int):
        t0 = time.perf_counter()
        yield
        wall = time.perf_counter() - t0
        self.frames.append(
            dict(
                wall=wall,
                particles=n_particles,
                psteps=n_particles * self.substeps_per_frame,
            )
        )

    @property
    def update_counter(self) -> int:
        """Total particle updates (the reference's work metric)."""
        return int(sum(f["psteps"] for f in self.frames))

    def particle_steps_per_sec(self, skip_first: int = 1) -> float:
        fs = self.frames[skip_first:] or self.frames
        wall = sum(f["wall"] for f in fs)
        return sum(f["psteps"] for f in fs) / max(wall, 1e-12)

    def report(self) -> str:
        if not self.frames:
            return "no frames recorded"
        walls = np.asarray([f["wall"] for f in self.frames])
        lines = [
            f"frames: {len(self.frames)}  "
            f"wall/frame: median {np.median(walls)*1e3:.1f} ms "
            f"(min {walls.min()*1e3:.1f}, max {walls.max()*1e3:.1f})",
            f"particle updates: {self.update_counter:,}",
            f"throughput: {self.particle_steps_per_sec()/1e6:.2f} M particle-steps/s",
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/taichi_mpm_tpu_trace"):
    """On-device op-level trace (view in xprof/tensorboard, or parse the
    .trace.json.gz with any perfetto reader)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"[taichi_mpm_tpu] trace written to {log_dir}")


def device_memory_report(device=None) -> Optional[dict]:
    """Live HBM stats for the given (default first) device, if the
    backend exposes them."""
    import jax

    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return None
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }


def simulate_with_energy(sim, num_frames: int, frame_update=None):
    """Frame loop returning per-frame mechanical energy — the reference's
    conservation diagnostic (simulate_with_energy,
    scripts/async/async_mpm.py:258-281 + calculate_energy,
    mpm.cpp:1078-1110)."""
    energies = []
    for f in range(num_frames):
        if frame_update is not None:
            frame_update(sim, f)
        sim.step()
        energies.append(sim.energy())
    return np.asarray(energies)
