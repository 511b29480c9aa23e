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


def stage_report(sim, substeps: int = 20, repeats: int = 3,
                 interpret: bool = None, only=None) -> dict:
    """Per-stage substep timing on the CURRENT scene — the analog of
    the reference's hierarchical TC_PROFILE tree around every substep
    stage (mpm.cpp:464-571). Each stage is timed as a jitted xN loop
    whose result is reduced to a scalar on device (required on the
    axon tunnel; see CLAUDE.md). Stages: prep (force/affine build),
    p2g kernel, halo merge, grid update, window assembly, g2p kernel,
    finish (plasticity/advect). Returns {stage: ms_per_substep}."""
    import functools
    import time

    import jax
    import jax.numpy as jnp

    from taichi_mpm_tpu.ops import blocked, packed
    from taichi_mpm_tpu.ops import g2p_pallas, p2g_pallas
    from taichi_mpm_tpu.ops.p2g_pallas import BATCH
    from taichi_mpm_tpu.ops.substep import grid_update_flat

    if sim.particles is None or sim._pending:
        sim._finalize()
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    cfg = sim.cfg
    assert cfg.dim == 3, "stage_report profiles the 3D blocked path"
    colliders = tuple(sim.colliders)
    cap = sim._active_block_cap()
    cap = -(-cap // (64 * BATCH)) * 64 * BATCH
    p2g_blocked_batched = functools.partial(
        p2g_pallas.p2g_blocked_batched, interpret=interpret
    )
    g2p_blocked = functools.partial(g2p_pallas.g2p_blocked,
                                    interpret=interpret)
    st = packed.pack_particles(sim.particles)
    st, keys, pm = packed.sort_and_map(st, cfg, cap)
    dt = cfg.base_dt
    pdata, (px, py, pz) = packed.prep_packed(st, keys, cfg, dt)
    tiles = p2g_blocked_batched(pm["s_arr"], pm["e_arr"], pdata)
    rec = blocked.merge_tiles_mm(tiles, pm["nbr"])
    vrec = grid_update_flat(rec, pm["ids"], cfg, colliders, 0.0, dt)
    gtiles = blocked.windows_mm(vrec, pm["nbr"])
    pw = st.shape[0] // packed.NCH
    zero = jnp.zeros((pw,), jnp.float32)
    posg = jnp.stack([px, py, pz] + [zero] * 5, 0)
    keys2d = pm["slot_keys"][None, :]
    nbd = jnp.asarray([cap], jnp.int32)
    pout = g2p_blocked(keys2d, posg, gtiles, nbd)

    def loop(f, arg):
        @jax.jit
        def run(a):
            def body(c, _):
                r = f(a)
                return c + r, None
            c, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=substeps
            )
            return c

        float(run(arg))  # compile
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(arg))
            best = min(best, time.perf_counter() - t0)
        return best / substeps * 1e3

    stages = {
        "prep": (lambda a: packed.prep_packed(a, keys, cfg, dt)[0][0, 0], st),
        "p2g": (
            lambda a: p2g_blocked_batched(pm["s_arr"], pm["e_arr"], a)[0, 0, 0],
            pdata,
        ),
        "merge": (lambda a: blocked.merge_tiles_mm(a, pm["nbr"])[0, 0], tiles),
        "grid": (
            lambda a: grid_update_flat(
                a, pm["ids"], cfg, colliders, 0.0, dt
            )[0, 0],
            rec,
        ),
        "windows": (lambda a: blocked.windows_mm(a, pm["nbr"])[0, 0, 0], vrec),
        "g2p": (
            lambda a: g2p_blocked(keys2d, posg, a, nbd)[0, 0], gtiles
        ),
        "finish": (
            lambda a: packed.finish_packed(
                a, tuple(pout[i] for i in range(12)), cfg, dt
            )[0][0],
            st,
        ),
    }
    if only is not None:
        stages = {k: v for k, v in stages.items() if k in only}
    report = {name: loop(f, arg) for name, (f, arg) in stages.items()}
    report["total_stages"] = sum(report.values())
    if only is not None and not ({"p2g_fused", "g2p_fused"} & set(only)):
        return report

    # fused kernels (prep-in-P2G / finish-in-G2P, ops/fused_pallas).
    # g2p_fused is timed as a self-threading chain (state -> state) so
    # the in-place aliasing behaves as in the real substep.
    from taichi_mpm_tpu.ops import fused_pallas

    st2d = st.reshape(packed.NCH, pw)
    report["p2g_fused"] = loop(
        lambda a: fused_pallas.p2g_fused(
            pm["s_arr"], pm["e_arr"], a, dt, cfg, interpret=interpret
        )[0, 0, 0],
        st2d,
    )

    @jax.jit
    def g2pf_chain(a):
        def body(c, _):
            c, vm, _ = fused_pallas.g2p_fused(
                keys2d, c, gtiles, nbd, dt, cfg, interpret=interpret
            )
            return c, vm[0, 0]
        c, vms = jax.lax.scan(body, a, None, length=substeps)
        return jnp.sum(vms) + c[0, 0]

    float(g2pf_chain(st2d))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(g2pf_chain(st2d))
        best = min(best, time.perf_counter() - t0)
    report["g2p_fused"] = best / substeps * 1e3
    return report


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
