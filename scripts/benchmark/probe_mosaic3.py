"""Probe 3: is the matmul-value reshape a miscompile or just MXU
precision? Computes the SAME matmul in one kernel and derives the same
output two ways — (1,512) row slices (no reshape) vs (64,128) slab
reshape — and compares them bit-for-bit on the host. Also re-checks
against numpy at a realistic tolerance.

    cd /root/repo && timeout 600 python scripts/benchmark/probe_mosaic3.py
"""

import numpy as np

CHUNK = 512


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    xn = rng.standard_normal((16, CHUNK)).astype(np.float32)
    wn = rng.standard_normal((CHUNK, CHUNK)).astype(np.float32)
    x = jnp.asarray(xn)
    w = jnp.asarray(wn)

    def k(x_ref, w_ref, o_row, o_slab):
        acc = jnp.dot(x_ref[:], w_ref[:],
                      preferred_element_type=jnp.float32)  # (16, 512)
        # row path: value slices, no reshape
        o_row[:] = acc[0:1, :] * 0.25 + acc[1:2, :]
        # slab path: whole-value reshape to (64,128), slab slices
        a192 = acc.reshape(64, 128)
        v = a192[0:4, :] * 0.25 + a192[4:8, :]
        o_slab[:] = v.reshape(1, CHUNK)

    row, slab = pl.pallas_call(
        k,
        out_shape=[
            jax.ShapeDtypeStruct((1, CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((1, CHUNK), jnp.float32),
        ],
    )(x, w)
    row = np.asarray(row)
    slab = np.asarray(slab)
    ref = (xn @ wn)[0] * 0.25 + (xn @ wn)[1]
    print("row == slab bitwise:", bool(np.array_equal(row, slab)))
    print("max |row - numpy|:", float(np.abs(row[0] - ref).max()))
    print("max |slab - numpy|:", float(np.abs(slab[0] - ref).max()))


if __name__ == "__main__":
    main()
