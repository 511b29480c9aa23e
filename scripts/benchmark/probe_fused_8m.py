"""Time the fused kernels ALONE at the 8M benchmark size.

stage_report materializes every unfused intermediate and OOMs at 8M;
this keeps only what the two fused kernels need (state + page map +
grid window tiles). Prints ms/substep for p2g_fused and a
self-threading g2p_fused chain, plus the merge/grid/windows glue.

    cd /root/repo && timeout 1800 python scripts/benchmark/probe_fused_8m.py
"""

import os
import time


def main():
    import jax
    import jax.numpy as jnp

    from taichi_mpm_tpu.ops import blocked, fused_pallas, packed
    from taichi_mpm_tpu.ops.p2g_pallas import BATCH
    from taichi_mpm_tpu.ops.rows import NCH
    from taichi_mpm_tpu.ops.substep import grid_update_flat
    from taichi_mpm_tpu.scenes import benchmark_cube

    cells = int(os.environ.get("CELLS", "100"))
    sub = int(os.environ.get("SUBSTEPS", "10"))
    sim = benchmark_cube(cells=cells, res=125, material="jelly", E=2e4,
                         nu=0.35)
    sim._finalize()
    cfg = sim.cfg
    dt = cfg.base_dt
    colliders = tuple(sim.colliders)
    n_blocks = (-(-cells // 4) + 2) ** 3
    K = -(-int(1.5 * n_blocks) // (64 * BATCH)) * 64 * BATCH

    # ONE jitted setup: eager pack/sort at 8M materializes every sort
    # intermediate on the worker and OOMs it (and eager axon is
    # pathologically slow anyway)
    @jax.jit
    def setup(p):
        st = packed.pack_particles(p)
        st, keys, pm = packed.sort_and_map(st, cfg, K)
        return st.reshape(NCH, st.shape[0] // NCH), pm

    st2d, pm = setup(sim.particles)
    jax.block_until_ready(st2d)
    # free the SoA pytree: its (N, 3)/(N, 3, 3) arrays carry huge lane
    # padding at 8M and OOM the chip if held alongside the packed state
    sim.particles = None
    del sim
    pw = st2d.shape[1]
    print(f"n={cells ** 3 * 8}, K={K}, pw={pw}", flush=True)

    def timeit(name, fn, *args):
        # every operand is an explicit jit argument: a closure-captured
        # device array becomes an embedded CONSTANT (materialized to
        # numpy through the ~30 MB/s axon tunnel, then into the program
        # image — stage_report's OOM at 8M)
        @jax.jit
        def run(*a):
            def body(c, _):
                return c + fn(*a), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=sub)
            return c

        float(run(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s} {best / sub * 1e3:8.2f} ms", flush=True)

    timeit(
        "p2g_fused",
        lambda a, s, e: fused_pallas.p2g_fused(s, e, a, dt, cfg)[0, 0, 0],
        st2d, pm["s_arr"], pm["e_arr"],
    )

    tiles = fused_pallas.p2g_fused(pm["s_arr"], pm["e_arr"], st2d, dt, cfg)
    timeit("merge", lambda a, nbr: blocked.merge_tiles_mm(a, nbr)[0, 0],
           tiles, pm["nbr"])

    @jax.jit
    def grid_stages(t, ids, nbr):
        rec = blocked.merge_tiles_mm(t, nbr)
        vrec = grid_update_flat(rec, ids, cfg, colliders, 0.0, dt)
        return vrec, blocked.windows_mm(vrec, nbr)

    vrec, gtiles = grid_stages(tiles, pm["ids"], pm["nbr"])
    jax.block_until_ready(gtiles)
    timeit(
        "grid",
        lambda a, ids: grid_update_flat(a, ids, cfg, colliders, 0.0, dt)[0, 0],
        jax.jit(blocked.merge_tiles_mm)(tiles, pm["nbr"]), pm["ids"],
    )
    del tiles
    timeit("windows", lambda a, nbr: blocked.windows_mm(a, nbr)[0, 0, 0],
           vrec, pm["nbr"])
    del vrec

    keys2d = pm["slot_keys"][None, :]
    nbd = jnp.asarray([K], jnp.int32)

    @jax.jit
    def g2pf_chain(a, k2, gt, nb):
        def body(c, _):
            c, vm, _ = fused_pallas.g2p_fused(k2, c, gt, nb, dt, cfg)
            return c, vm[0, 0]
        c, vms = jax.lax.scan(body, a, None, length=sub)
        return jnp.sum(vms) + c[0, 0]

    float(g2pf_chain(st2d, keys2d, gtiles, nbd))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g2pf_chain(st2d, keys2d, gtiles, nbd))
        best = min(best, time.perf_counter() - t0)
    print(f"{'g2p_fused':12s} {best / sub * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
