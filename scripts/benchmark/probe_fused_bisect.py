"""Bisect the fused-kernel Mosaic failure on real hardware.

Runs p2g_fused and g2p_fused SEPARATELY on a tiny benchmark scene so
the Mosaic error (BENCH_r02: `tpu.reshape (vector<512xf32>) ->
vector<4x128xf32>` unsupported) is attributed to one kernel. The
isolated-construct battery (probe_mosaic.py) shows the canonical
(1,512)->(4,128) reshape is LEGAL, so the failure is context-dependent;
this narrows it. Full tracebacks go to /tmp/fused_bisect.log.

    cd /root/repo && timeout 900 python scripts/benchmark/probe_fused_bisect.py
"""

import traceback

LOG = "/tmp/fused_bisect.log"


def main():
    import jax
    import jax.numpy as jnp

    from taichi_mpm_tpu.ops import blocked, fused_pallas, packed
    from taichi_mpm_tpu.ops.p2g_pallas import BATCH
    from taichi_mpm_tpu.ops.rows import NCH
    from taichi_mpm_tpu.ops.substep import grid_update_flat
    from taichi_mpm_tpu.scenes import benchmark_cube

    log = open(LOG, "w")
    sim = benchmark_cube(cells=8, res=32, material="jelly", E=2e4, nu=0.35)
    sim._finalize()
    cfg = sim.cfg
    dt = cfg.base_dt
    st = packed.pack_particles(sim.particles)
    K = 64 * BATCH
    st, keys, pm = packed.sort_and_map(st, cfg, K)
    pw = st.shape[0] // NCH
    st2d = st.reshape(NCH, pw)
    print("setup done; pw =", pw)

    tiles = None
    try:
        tiles = fused_pallas.p2g_fused(
            pm["s_arr"], pm["e_arr"], st2d, dt, cfg
        )
        jax.block_until_ready(tiles)
        print("PASS p2g_fused")
    except Exception as e:  # noqa: BLE001
        print("FAIL p2g_fused:", str(e).splitlines()[0][:160])
        log.write("=== p2g_fused ===\n" + traceback.format_exc() + "\n")

    if tiles is None:
        # unfused tiles so g2p can still be probed
        pdata, (px, py, pz) = packed.prep_packed(st, keys, cfg, dt)
        from taichi_mpm_tpu.ops.p2g_pallas import p2g_blocked_batched

        tiles = p2g_blocked_batched(pm["s_arr"], pm["e_arr"], pdata)

    rec = blocked.merge_tiles_mm(tiles, pm["nbr"])
    vrec = grid_update_flat(rec, pm["ids"], cfg, tuple(sim.colliders), 0.0, dt)
    gtiles = blocked.windows_mm(vrec, pm["nbr"])
    jax.block_until_ready(gtiles)
    print("grid stages done")

    try:
        out, vmaxw, plastw = fused_pallas.g2p_fused(
            pm["slot_keys"][None, :], st2d, gtiles,
            jnp.asarray([K], jnp.int32), dt, cfg,
        )
        jax.block_until_ready(out)
        print("PASS g2p_fused, vmax =", float(jnp.max(vmaxw)))
    except Exception as e:  # noqa: BLE001
        print("FAIL g2p_fused:", str(e).splitlines()[0][:160])
        log.write("=== g2p_fused ===\n" + traceback.format_exc() + "\n")
    log.close()
    print("done; full tracebacks in", LOG)


if __name__ == "__main__":
    main()
