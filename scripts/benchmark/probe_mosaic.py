"""Mosaic legality probe battery for the fused-kernel constructs.

Round-2 shipped two retiling guesses (rows8, rows4) that both failed on
hardware with `infer-vector-layout: unsupported shape cast` on the
(512,) -> (4, 128) tpu.reshape (BENCH_r02.json). This script compiles+
runs each candidate construct as a tiny standalone kernel on the REAL
TPU so the fused path is fixed from measurements, not guesses
(VERDICT round 2, next-round task 1).

Run (serialize TPU access — nothing else may touch the tunnel):

    cd /root/repo && timeout 900 python scripts/benchmark/probe_mosaic.py

Each probe prints PASS/FAIL plus a one-line error head. All probes run
in ONE process (one axon client).
"""

import traceback

import numpy as np

CHUNK = 512
NCH = 48


def _run(name, fn):
    import jax

    try:
        out = fn()
        jax.block_until_ready(out)
        print(f"PASS {name}")
        return True
    except Exception as e:  # noqa: BLE001
        head = str(e).splitlines()
        msg = next((l for l in head if l.strip()), "?")
        for l in head[:6]:
            if "unsupported" in l.lower() or "error" in l.lower():
                msg = l.strip()
                break
        print(f"FAIL {name}: {msg[:160]}")
        return False


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("devices:", jax.devices())
    x = jnp.asarray(np.random.rand(1, CHUNK), jnp.float32)
    big = jnp.asarray(np.random.rand(NCH, CHUNK), jnp.float32)

    def mk(kernel, arg, oshape=None):
        oshape = oshape if oshape is not None else arg.shape

        def f():
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
            )(arg)

        return f

    # P0: rows1 baseline — elementwise math on the raw (1, 512) row.
    def k0(x_ref, o_ref):
        a = x_ref[:]
        o_ref[:] = a * a + 1.0

    _run("rows1 (1,512) elementwise", mk(k0, x))

    # P1: the shipped rows4 reshape (1,512)->(4,128) (expected FAIL).
    def k1(x_ref, o_ref):
        a = x_ref[:].reshape(4, 128)
        a = a * a + 1.0
        o_ref[:] = a.reshape(1, CHUNK)

    _run("reshape (1,512)->(4,128)->back", mk(k1, x))

    # P1b: only the back direction (4,128)->(1,512).
    y4 = jnp.asarray(np.random.rand(4, 128), jnp.float32)

    def k1b(x_ref, o_ref):
        o_ref[:] = (x_ref[:] * 2.0).reshape(1, CHUNK)

    _run("reshape (4,128)->(1,512)", mk(k1b, y4, (1, CHUNK)))

    # P2: slice+concat retiling (no reshape): 4 lane-slices stacked on
    # sublanes, math, then 4 sublane rows re-concatenated on lanes.
    def k2(x_ref, o_ref):
        a = jnp.concatenate(
            [x_ref[:, i * 128 : (i + 1) * 128] for i in range(4)], 0
        )
        a = a * a + 1.0
        o_ref[:] = jnp.concatenate([a[i : i + 1, :] for i in range(4)], 1)

    _run("slice+concat (1,512)<->(4,128)", mk(k2, x))

    # P3: whole-tile reshape (48,512)->(192,128) and back.
    def k3(x_ref, o_ref):
        a = x_ref[:].reshape(192, 128)
        a = a * 2.0
        o_ref[:] = a.reshape(NCH, CHUNK)

    _run("reshape (48,512)<->(192,128)", mk(k3, big))

    # P3b: whole-tile slice of the (192,128) view = contiguous 4-row
    # slabs (what _tp would become under a one-shot tile retile).
    def k3b(x_ref, o_ref):
        a = x_ref[:].reshape(192, 128)
        r = a[4:8, :] * a[8:12, :]
        o_ref[:] = jnp.concatenate([r[i : i + 1, :] for i in range(4)], 1)

    _run("tile-reshape + 4-row slab math", mk(k3b, big, (1, CHUNK)))

    # P4: SMEM whole-array per-program scalar side outputs (g2p_fused's
    # vmax/plast pattern) alongside a VMEM main output.
    nwin = 4

    def k4(x_ref, o_ref, s_ref):
        q = pl.program_id(0)
        o_ref[:] = x_ref[:] + 1.0
        s_ref[0, q] = jnp.max(x_ref[:])

    def f4():
        return pl.pallas_call(
            k4,
            grid=(nwin,),
            in_specs=[pl.BlockSpec((1, CHUNK), lambda q: (0, q))],
            out_specs=[
                pl.BlockSpec((1, CHUNK), lambda q: (0, q)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, nwin * CHUNK), jnp.float32),
                jax.ShapeDtypeStruct((1, nwin), jnp.float32),
            ],
        )(jnp.tile(x, (1, nwin)))

    _run("SMEM whole-array scalar side output", f4)

    # P5: strided (48, CHUNK) HBM->VMEM DMA (fused p2g streaming shape;
    # (16, CHUNK) is hardware-proven, 48 rows is the new bit).
    def k5(x_hbm, o_ref, buf, sem):
        cp = pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(CHUNK, CHUNK)], buf, sem
        )
        cp.start()
        cp.wait()
        o_ref[:] = buf[:] * 2.0

    def f5():
        wide = jnp.tile(big, (1, 4))  # (48, 2048) in HBM
        return pl.pallas_call(
            k5,
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NCH, CHUNK), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((NCH, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(wide)

    _run("strided (48,CHUNK) HBM DMA", f5)

    # P6: input_output_aliases on a (48, Pw) blocked in/out (g2p_fused's
    # in-place state update).
    def k6(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 1.5

    def f6():
        wide = jnp.tile(big, (1, 2))
        return pl.pallas_call(
            k6,
            grid=(2,),
            in_specs=[pl.BlockSpec((NCH, CHUNK), lambda q: (0, q))],
            out_specs=pl.BlockSpec((NCH, CHUNK), lambda q: (0, q)),
            out_shape=jax.ShapeDtypeStruct((NCH, 2 * CHUNK), jnp.float32),
            input_output_aliases={0: 0},
        )(wide)

    _run("input_output_aliases (48,Pw)", f6)

    print("probe battery done")


if __name__ == "__main__":
    main()
