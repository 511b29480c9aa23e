"""Mosaic probe battery 2: the slab-space fused-kernel rewrite.

Battery 1 + the hardware bisect established:
  * reshape (1,512)->(4,128) of a REF LOAD is legal, but of a row
    SLICE OF A (48,512) VALUE it lowers to vector<512xf32> ->
    vector<4x128xf32> and fails layout inference — that is the real
    BENCH_r02 failure (fused_pallas._tp).
  * whole-tile reshape (48,512)<->(192,128) is legal both directions.

This battery validates the proposed fix end to end in miniature:
physics in (192,128) "slab space" — tile reshape once, contiguous
4-row slab slices as operands, sublane-concat of slab results, one
reshape back at the store.

    cd /root/repo && timeout 900 python scripts/benchmark/probe_mosaic2.py
"""

import numpy as np

CHUNK = 512
NCH = 48


def _run(name, fn, expect=None):
    import jax

    try:
        out = fn()
        jax.block_until_ready(out)
        ok = True
        if expect is not None:
            ok = bool(np.allclose(np.asarray(out), expect, atol=1e-5))
        print(("PASS" if ok else "WRONG") + f" {name}")
        return ok
    except Exception as e:  # noqa: BLE001
        lines = str(e).splitlines()
        msg = next(
            (l.strip() for l in lines
             if "unsupported" in l.lower() or "not implemented" in l.lower()
             or "NotImplemented" in l),
            lines[0] if lines else "?",
        )
        print(f"FAIL {name}: {msg[:200]}")
        return False


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    big_np = rng.standard_normal((NCH, CHUNK)).astype(np.float32)
    big = jnp.asarray(big_np)

    # Q1: confirm the bisect diagnosis — slice-of-value reshape fails.
    def k1(x_ref, o_ref):
        xt = x_ref[:]
        r = xt[3:4, :].reshape(4, 128)
        o_ref[:] = (r * 2.0).reshape(1, CHUNK)

    def f1():
        return pl.pallas_call(
            k1, out_shape=jax.ShapeDtypeStruct((1, CHUNK), jnp.float32)
        )(big)

    _run("value-slice reshape (expect FAIL)", f1)

    # Q2: the full slab-space mini-pipeline: tile reshape, offset slab
    # slices, elementwise math, sublane concat, reshape back, store.
    def k2(x_ref, o_ref):
        xt = x_ref[:].reshape(4 * NCH, 128)

        def slab(r):
            return xt[4 * r : 4 * r + 4, :]

        a, b, c = slab(3), slab(17), slab(40)
        r0 = a * b + c
        r1 = jnp.where(a > 0.0, b, c) * 0.5
        r2 = jnp.maximum(a, b) - jnp.minimum(b, c)
        out = jnp.concatenate([r0, r1, r2], 0)  # (12, 128)
        o_ref[:] = out.reshape(3, CHUNK)

    def f2():
        return pl.pallas_call(
            k2, out_shape=jax.ShapeDtypeStruct((3, CHUNK), jnp.float32)
        )(big)

    def slab_np(r):
        return big_np[r].reshape(4, 128)

    a, b, c = slab_np(3), slab_np(17), slab_np(40)
    exp = np.concatenate(
        [a * b + c, np.where(a > 0, b, c) * 0.5,
         np.maximum(a, b) - np.minimum(b, c)], 0
    ).reshape(3, CHUNK)
    _run("slab-space mini-pipeline", f2, expect=exp)

    # Q3: reshape of a MATMUL-produced value (16,512)->(64,128) + slab
    # math (the g2p acc path: window_accum output is an MXU result).
    w = jnp.asarray(rng.standard_normal((CHUNK, CHUNK)).astype(np.float32))

    def k3(x_ref, w_ref, o_ref):
        acc = jnp.dot(
            x_ref[:16, :], w_ref[:], preferred_element_type=jnp.float32
        )  # (16, 512) MXU value
        a192 = acc.reshape(64, 128)
        v = a192[0:4, :] * 0.25 + a192[4:8, :]
        o_ref[:] = v.reshape(1, CHUNK)

    def f3():
        return pl.pallas_call(
            k3, out_shape=jax.ShapeDtypeStruct((1, CHUNK), jnp.float32)
        )(big, w)

    accn = big_np[:16] @ np.asarray(w)
    a192n = accn.reshape(64, 128)
    _run("matmul-value reshape + slab math", f3,
         expect=(a192n[0:4] * 0.25 + a192n[4:8]).reshape(1, CHUNK))

    # Q4: slab -> (1,512) single-row reshape of a COMPUTED slab (needed
    # where a slab row feeds a (1,512) consumer like window_accum pos).
    def k4(x_ref, o_ref):
        xt = x_ref[:].reshape(4 * NCH, 128)
        s = xt[8:12, :] * 3.0
        o_ref[:] = s.reshape(1, CHUNK)

    def f4():
        return pl.pallas_call(
            k4, out_shape=jax.ShapeDtypeStruct((1, CHUNK), jnp.float32)
        )(big)

    _run("computed-slab reshape -> (1,512)", f4,
         expect=(big_np[2] * 3.0).reshape(1, CHUNK))

    # Q5: bool slabs + int32 slabs + reductions to scalar (finish-tile
    # needs act masks, plasticity counters, vmax reductions).
    def k5(x_ref, o_ref):
        xt = x_ref[:].reshape(4 * NCH, 128)
        act = xt[0:4, :] > 0.0
        cnt = jnp.sum(jnp.where(act, 1, 0).astype(jnp.int32))
        vmax = jnp.max(jnp.where(act, jnp.abs(xt[4:8, :]), 0.0))
        o_ref[0, 0] = vmax + cnt.astype(jnp.float32)

    def f5():
        from jax.experimental.pallas import tpu as pltpu

        return pl.pallas_call(
            k5,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        )(big)

    actn = big_np[0].reshape(4, 128) > 0
    expn = np.max(np.where(actn, np.abs(big_np[1].reshape(4, 128)), 0.0))
    _run("bool/int slabs + scalar reductions", f5,
         expect=np.float32(expn + actn.sum()))

    # Q6: a 48-slab full-tile rebuild: 48 computed slabs concatenated
    # and stored as the whole (48,512) output (the g2p out_ref write).
    def k6(x_ref, o_ref):
        xt = x_ref[:].reshape(4 * NCH, 128)
        slabs = [xt[4 * r : 4 * r + 4, :] + float(r) for r in range(NCH)]
        o_ref[:] = jnp.concatenate(slabs, 0).reshape(NCH, CHUNK)

    def f6():
        return pl.pallas_call(
            k6, out_shape=jax.ShapeDtypeStruct((NCH, CHUNK), jnp.float32)
        )(big)

    _run("48-slab full-tile rebuild", f6,
         expect=big_np + np.arange(NCH, dtype=np.float32)[:, None])

    print("probe battery 2 done")


if __name__ == "__main__":
    main()
