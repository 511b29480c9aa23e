"""Shared runner for the scene scripts (the analog of the reference's
tc.dynamics.MPM python driver, scripts/async/async_mpm.py:18-300):
frame loop, per-frame BGEO output, snapshots, --continue restarts,
profile printing."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(**defaults):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=defaults.get("frames", 60))
    ap.add_argument("--res", type=int, default=defaults.get("res", 0))
    ap.add_argument("--out", type=str, default=defaults.get("out", ""))
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--snapshot-interval", type=int, default=0)
    ap.add_argument("--continue", dest="cont", type=int, default=-1,
                    help="resume from snapshot at this frame")
    ap.add_argument("--verbose-bgeo", action="store_true")
    ap.add_argument("--frame-dt", type=float, default=0.0,
                    help="override the scene's frame_dt (CI smoke runs "
                    "cap substeps/frame on substep-heavy scenes)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    return args


def mpm_class():
    """The scene's solver class: `MPM`; `DistributedMPM` over the
    first SHARDS=N devices; or `AsyncMPM` with ASYNC=1 (global
    POT-snapped adaptive dt — works on CPIC scenes too). Scenes stay
    driver-agnostic — all drivers expose the same API.

    ASYNC knobs: UNIT_DT (min POT unit, default 1e-6) and
    ASYNC_MAX_DT (overrides the scene's base_delta_t as the MAX dt —
    scenes pick base_delta_t for fixed-dt stability, so the adaptive
    scheduler needs a higher ceiling to coarsen into)."""
    import functools

    n = int(os.environ.get("SHARDS", "1"))
    if n > 1:
        from taichi_mpm_tpu.parallel.driver import DistributedMPM

        return functools.partial(DistributedMPM, n_shards=n)
    if os.environ.get("ASYNC", "0") == "1":
        from taichi_mpm_tpu.core.adaptive import AsyncMPM

        unit = float(os.environ.get("UNIT_DT", "1e-6"))
        max_dt = os.environ.get("ASYNC_MAX_DT")

        def cls(*a, **k):
            if max_dt is not None:
                k["base_delta_t"] = float(max_dt)
            k.setdefault("unit_delta_t", unit)
            return AsyncMPM(*a, **k)

        return cls
    from taichi_mpm_tpu.core.solver import MPM

    return MPM


def simulate(sim, args, frame_update=None, print_energy=False):
    """Frame loop with output/snapshots (reference simulate(),
    scripts/async/async_mpm.py:224-256)."""
    import numpy as np

    if getattr(args, "frame_dt", 0.0):
        sim.frame_dt = args.frame_dt
    out = args.out or None
    if out:
        os.makedirs(out, exist_ok=True)
    start = 0
    if args.cont >= 0 and out:
        sim.load(os.path.join(out, f"snapshot_{args.cont:05d}.npz"))
        start = args.cont + 1
    for f in range(start, args.frames):
        if frame_update is not None:
            frame_update(sim, f)
        t0 = time.perf_counter()
        sim.step()
        wall = time.perf_counter() - t0
        n = int(np.asarray(sim.particles.active).sum())
        msg = f"frame {f:05d}  t={float(sim.t):.4f}  particles={n}  wall={wall*1e3:.0f}ms"
        if print_energy:
            msg += f"  E={sim.energy():.5f}"
        print(msg, flush=True)
        if out:
            sim.visualize(
                os.path.join(out, f"{f:05d}.bgeo"), verbose=args.verbose_bgeo
            )
            if args.snapshot_interval and f % args.snapshot_interval == 0:
                sim.save(os.path.join(out, f"snapshot_{f:05d}.npz"))
    return sim
