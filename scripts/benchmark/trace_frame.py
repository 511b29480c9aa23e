"""Capture + parse a jax.profiler trace of one benchmark frame.

Prints the top device ops by total duration (TPU pid; outermost
while/jit containers excluded) — the tool for attributing frame-level
overhead that per-stage microbenchmarks can't see (layout copies,
aliasing copies, scan plumbing).

    TMT_FUSED=1 CELLS=100 timeout 1800 python scripts/benchmark/trace_frame.py
"""

import glob
import gzip
import json
import os
from collections import defaultdict


def capture(log_dir):
    import jax

    from taichi_mpm_tpu.scenes import benchmark_cube

    cells = int(os.environ.get("CELLS", "100"))
    sim = benchmark_cube(cells=cells, res=125, material="jelly", E=2e4,
                         nu=0.35)
    sim.frame_dt = sim.cfg.base_dt * int(os.environ.get("SUBSTEPS", "20"))
    sim.step()
    jax.block_until_ready(sim.particles.x)
    with jax.profiler.trace(log_dir):
        sim.step()
        jax.block_until_ready(sim.particles.x)
    print("fused =", sim.fused, flush=True)


def parse(log_dir, top=40):
    paths = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {log_dir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    tpu_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    sums = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        if name.startswith("while") or name.startswith("jit_") or (
            name.startswith("run_")
        ):
            continue
        sums[name] += e.get("dur", 0.0)
        counts[name] += 1
        total += e.get("dur", 0.0)
    print(f"{'total device op time':55s} {total / 1e3:9.2f} ms")
    for name, dur in sorted(sums.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{name[:55]:55s} {dur / 1e3:9.2f} ms  x{counts[name]}")


if __name__ == "__main__":
    log_dir = os.environ.get("TRACE_DIR", "/tmp/tmt_trace")
    if os.environ.get("PARSE_ONLY", "0") != "1":
        capture(log_dir)
    parse(log_dir)
