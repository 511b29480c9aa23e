"""Multi-chip scaling harness: the flagship benchmark cube over an
N-device slab mesh through the blocked Pallas pipeline under shard_map
(the distributed backend the reference lacks; BASELINE.md scaling row).

With real TPU chips present it uses them all; otherwise it forces a
virtual 8-device CPU mesh (xla_force_host_platform_device_count) so the
sharded program, collectives and migration run end-to-end anywhere.

Env knobs:
  SHARDS=N             mesh size (default: all devices)
  BENCHMARK=125|8000   particle count preset (reference mpm.cpp:149-186)
  BALANCED=1           load-balanced slab bounds (default 1)
  PACKED=1             fused packed pipeline per shard (default 1)
  SUBSTEPS=20          substeps per frame (lower for CPU smokes)
"""
import os
import socket
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time


def _tpu_reachable():
    """Decide WITHOUT touching jax: initializing the axon backend with
    the relay down can hang in its native claim-retry loop (or raise,
    depending on failure mode) — probe the relay port like bench.py."""
    if "axon" not in os.environ.get("JAX_PLATFORMS", "axon"):
        return False
    try:
        with socket.create_connection(("127.0.0.1", 8082), timeout=3):
            return True
    except OSError:
        return False


if not _tpu_reachable():
    # CPU: the virtual-device flag must be set before jax initializes,
    # so re-exec once with it
    if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""
    ):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.execv(sys.executable, [sys.executable] + sys.argv)

import jax

if "axon" not in os.environ.get("JAX_PLATFORMS", "axon"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from common import parse_args

from taichi_mpm_tpu.parallel.spatial import shard_spatially
from taichi_mpm_tpu.parallel.spatial_blocked import (
    balanced_bounds_host,
    build_spatial_balanced_frame,
    build_spatial_blocked_frame,
    run_spatial_balanced_frames,
    run_spatial_blocked_frames,
    shard_spatially_bounds,
)
from taichi_mpm_tpu.scenes import benchmark_cube

args = parse_args(frames=5)
benchmark = int(os.environ.get("BENCHMARK", "125"))
balanced = os.environ.get("BALANCED", "1") == "1"
# 125 / 8000 are the reference presets; any other value is taken as the
# cube's cells-per-side directly (handy for quick CPU smoke runs)
cells = {125: 25, 8000: 100}.get(benchmark, benchmark)
interpret = jax.default_backend() != "tpu"

n_shards = int(os.environ.get("SHARDS", str(len(jax.devices()))))
mesh = Mesh(np.asarray(jax.devices()[:n_shards]), ("x",))
# res[0] must divide into whole blocks per shard; smoke-sized custom
# benchmarks take a small grid (interpret-mode cost scales with K)
res_base = 128 if benchmark in (125, 8000) else 32
res = -(-res_base // (4 * n_shards)) * (4 * n_shards)
K0 = 1024 if benchmark in (125, 8000) else 256
# balanced bounds need >= 1 block column of slack per shard; tiny smoke
# grids fall back to uniform slabs instead of tripping balanced_params
_r_max = (res // (4 * n_shards) - 2) // 2
if _r_max < 1:
    balanced = False

sim = benchmark_cube(cells=cells, res=res, material="jelly", E=2e4, nu=0.35)
sim._finalize()
cfg = sim.cfg
colliders = tuple(sim.colliders)
n = cells**3 * 8
n_sub = int(os.environ.get("SUBSTEPS", "20"))
print(f"benchmark={benchmark}: {n} particles, res {res}^3, "
      f"{n_shards} shards ({jax.default_backend()}), "
      f"{'balanced' if balanced else 'uniform'} slabs")

# frame 0 through the auto-grow runner settles K / migration budgets;
# then a PERSISTENT jitted frame at the settled sizes is timed (the
# runners rebuild their jit per call, which is fine for simulation but
# would recompile inside a timing loop)
t = jnp.float32(0.0)
packed_path = os.environ.get("PACKED", "1") == "1"
if packed_path:
    # the production path: fully-fused packed pipeline per shard
    from taichi_mpm_tpu.parallel.spatial_blocked import (
        build_spatial_packed_frame,
        run_spatial_packed_frames,
    )

    if balanced:
        r = min(2, _r_max)
        bounds = balanced_bounds_host(sim.particles, cfg, n_shards, r)
        p = shard_spatially_bounds(sim.particles, cfg, mesh, bounds,
                                   slack=2.0)
    else:
        r = None
        p = shard_spatially(sim.particles, cfg, mesh, slack=2.0)
    p, t, st = run_spatial_packed_frames(
        p, t, cfg, colliders, n_sub, mesh, n_frames=1, K=K0,
        budget=256, r=r, interpret=interpret,
    )
    frame = build_spatial_packed_frame(
        cfg, colliders, n_sub, mesh, K=st["K"], budget=st["budget"], r=r,
        interpret=interpret,
    )
    bounds, hist = st["bounds"], st["hist"]

    def run_one(p, t):
        global bounds, hist
        if r is not None:
            p, t, bounds, hist, needed, n_act = frame(p, t, bounds, hist)
        else:
            p, t, needed, n_act = frame(p, t)
        assert int(needed) <= st["budget"] and int(n_act) <= st["K"]
        return p, t
elif balanced:
    r = min(2, _r_max)
    bounds = balanced_bounds_host(sim.particles, cfg, n_shards, r)
    p = shard_spatially_bounds(sim.particles, cfg, mesh, bounds, slack=2.0)
    p, t, st = run_spatial_balanced_frames(
        p, t, cfg, colliders, n_sub, mesh, n_frames=1, K=K0, budget=256,
        r=r, interpret=interpret,
    )
    frame = build_spatial_balanced_frame(
        cfg, colliders, n_sub, mesh, K=st["K"], budget=st["budget"], r=r,
        interpret=interpret,
    )
    bounds, hist = st["bounds"], st["hist"]

    def run_one(p, t):
        global bounds, hist
        p, t, bounds, hist, needed, n_act = frame(p, t, bounds, hist)
        assert int(needed) <= st["budget"] and int(n_act) <= st["K"]
        return p, t
else:
    p = shard_spatially(sim.particles, cfg, mesh, slack=2.0)
    p, t, st = run_spatial_blocked_frames(
        p, t, cfg, colliders, n_sub, mesh, n_frames=1, K=K0, budget=256,
        interpret=interpret,
    )
    frame = build_spatial_blocked_frame(
        cfg, colliders, n_sub, mesh, K=st["K"], budget=st["budget"],
        interpret=interpret,
    )

    def run_one(p, t):
        p, t, needed, n_act = frame(p, t)
        assert int(needed) <= st["budget"] and int(n_act) <= st["K"]
        return p, t

p, t = run_one(p, t)  # compile + warmup the persistent frame
jax.block_until_ready(p.x)
for f in range(args.frames):
    t0 = time.perf_counter()
    p, t = run_one(p, t)
    jax.block_until_ready(p.x)
    wall = time.perf_counter() - t0
    print(f"frame {f}: {wall*1e3:.1f} ms  "
          f"{n * n_sub / wall / 1e6:.1f} M particle-steps/s aggregate "
          f"({n * n_sub / wall / 1e6 / n_shards:.1f} M/shard)")
act = int(np.asarray(p.active).sum())
assert act == n, f"particle loss: {act}/{n}"
print(f"done: {act}/{n} particles intact, t={float(t):.4f}s")
