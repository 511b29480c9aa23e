"""Fused P2G scatter as a Pallas TPU kernel.

TPU-native replacement for the reference's SIMD blocked rasterize
(/root/reference/src/transfer.cpp:361-581): one program per 4^3-cell
grid block streams its sorted particle range from HBM (double-buffered
DMA), evaluates the quadratic B-spline weights *densely* over the
block's 7-node support (no scatter anywhere), and accumulates the
block's (7,7,7) halo tile with a single MXU matmul per chunk:

    tile[(i,c), (j,k)] = sum_p VAL2[(i,c), p] * WYZT[(j,k), p]

(a lane-contracted dot_general: both operands keep particles on the
128-lane axis, which is also what HBM DMA requires). VAL2 folds the
per-x-node weight into 16 value channels (momentum + mass + the three
affine columns); the affine-in-node-coordinate decomposition

    value(node) = c0 - nx*A[:,0] - ny*A[:,1] - nz*A[:,2]

turns the node-dependent scattered value into node-independent matmul
channels, finished by an elementwise correction. Halo tiles are merged
into the dense blocked grid by taichi_mpm_tpu.ops.blocked.merge_tiles.

TPU DMA constraints shape the layout: slices of HBM arrays must have a
lane dimension that is a multiple of 128, at 128-aligned offsets. The
per-block range [s, e) is therefore fetched from align128(s) with the
head rows (previous block's particles) masked out in-kernel — no
padding of the sorted particle array is needed.

Particle positions are block-local, so all coordinate arithmetic stays
in [-1, 5) — no catastrophic cancellation against absolute coordinates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_mpm_tpu.ops.blocked import TILE

# Particles per streamed state chunk / G2P window. 1024 was TRIED
# (round 4) on the theory that (8, 128) full-vreg slabs would halve the
# in-kernel physics time vs 512's (4, 128) half-vregs: measured 52.5 ->
# 62.6 ms/substep at 8M (both kernels slower), and splitting the masked
# hit matmuls into 512-lane sub-chunks only recovered P2G to par while
# G2P stayed ~4 ms worse. The VPU is evidently not sublane-limited at
# (4, 128); don't redo without a profile showing otherwise.
CHUNK = 512
ALIGN = 128
NVAL = 16  # value channels: mv(3) mass(1) A-col0(3) 0 A-col1(3) 0 A-col2(3) 0
NROW = NVAL * TILE  # 112 matmul M
NJK = TILE * TILE  # 49 matmul N
NOUT = 4 * TILE  # 28 output rows: (i, c)
import os as _os

_HI = jax.lax.Precision.HIGHEST
_X6 = _os.environ.get("TMT_XFER_X6", "0") == "1"


def transfer_dot(a, b, dims):
    """The transfer kernels' f32 contraction at ~bf16x3 precision.

    Mosaic supports only DEFAULT (one bf16 MXU pass, ~1e-3 relative
    error at 512-deep sums) and HIGHEST (6 passes) inside kernels —
    `Precision.HIGH` raises "Unsupported dot precision". The classic
    3-pass split is therefore done manually: each operand is split
    into a bf16 hi part and a bf16 residual, and hh + hl + lh gives
    ~2^-16 operand accuracy at HALF the MXU passes of HIGHEST
    (hardware A/B on the 1M bench scene: max |dx| 6e-8 after 60
    substeps). On CPU (tests, interpret-mode differentials, the
    multichip dryrun) the full-f32 dot is used so CPU oracles stay
    bitwise-stable. TMT_XFER_X6=1 restores HIGHEST on TPU."""
    if _X6 or jax.default_backend() == "cpu":
        return jax.lax.dot_general(
            a, b, dimension_numbers=dims,
            preferred_element_type=jnp.float32, precision=_HI,
        )
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = functools.partial(
        jax.lax.dot_general, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )
    return d(ah, bh) + (d(ah, bl) + d(al, bh))


def _quadratic_weight(t):
    """Dense quadratic B-spline N(t), zero outside |t| < 1.5."""
    a = jnp.abs(t)
    inner = 0.75 - t * t
    outer = 0.5 * (1.5 - a) * (1.5 - a)
    return jnp.where(a <= 0.5, inner, jnp.where(a < 1.5, outer, 0.0))


def _axis_weights_T(pos_row):
    """(8, CHUNK) weights at local nodes i-1 for i in 0..6 (row 7 unused)."""
    irow = (
        jax.lax.broadcasted_iota(jnp.int32, (8, CHUNK), 0).astype(jnp.float32)
        - 1.0
    )
    return _quadratic_weight(pos_row - irow)


def _wyzT(py_row, pz_row):
    """(49, CHUNK) tensor-product y/z weights, particles on lanes."""
    wy = _axis_weights_T(py_row)
    wz = _axis_weights_T(pz_row)
    return jnp.concatenate(
        [wy[j : j + 1, :] * wz[0:TILE, :] for j in range(TILE)], axis=0
    )


def _chunk_ops(pd):
    """Per-chunk P2G operands SHARED across the block hits of a batched
    program: (val2 (112, CHUNK), wyz_base (49, CHUNK)). Hoisted out of
    the per-hit path — with BATCH blocks per program a chunk typically
    intersects 2 block ranges, and rebuilding these per hit doubled the
    kernel's VPU work (only the range mask is hit-specific)."""
    wyz_base = _wyzT(pd[14:15, :], pd[15:16, :])  # (49, CHUNK)
    wx = _axis_weights_T(pd[13:14, :])  # (8, CHUNK)

    mv = pd[0:3, :]
    m = pd[3:4, :]
    A = pd[4:13, :]  # row-major A00..A22
    px, py, pz = pd[13:14, :], pd[14:15, :], pd[15:16, :]
    c0 = mv + jnp.concatenate(
        [
            A[0:1] * px + A[1:2] * py + A[2:3] * pz,
            A[3:4] * px + A[4:5] * py + A[5:6] * pz,
            A[6:7] * px + A[7:8] * py + A[8:9] * pz,
        ],
        axis=0,
    )
    zero = jnp.zeros_like(m)
    a0 = jnp.concatenate([A[0:1], A[3:4], A[6:7], zero], 0)  # A[:,0], pad
    a1 = jnp.concatenate([A[1:2], A[4:5], A[7:8], zero], 0)
    a2 = jnp.concatenate([A[2:3], A[5:6], A[8:9], zero], 0)
    val = jnp.concatenate([c0, m, a0, a1, a2], 0)  # (16, CHUNK)

    val2 = jnp.concatenate(
        [val * wx[i : i + 1, :] for i in range(TILE)], 0
    )  # (112, CHUNK)
    return val2, wyz_base


# MXU sub-chunk: the masked hit matmuls contract over MMW lanes, not
# the full CHUNK — a block's sorted range covers ~MMW particles, so
# matmul work stays proportional to particles-in-range instead of
# scaling with the (VPU-sized) chunk width. Measured: CHUNK=1024 with
# full-width hit matmuls regressed the 8M substep 52.5 -> 62.6 ms.
MMW = 512
NSUB = CHUNK // MMW


def _hit_contrib(val2, wyz_base, s, e, gstart):
    """One block hit's (112, 49) contribution from precomputed chunk
    operands; lanes outside [s, e) masked out."""
    gidx = gstart + jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    mask = ((gidx >= s) & (gidx < e)).astype(jnp.float32)
    return transfer_dot(
        val2, wyz_base * mask, (((1,), (1,)), ((), ()))
    )  # (112, 49)


def _hit_contrib_sub(val2, wyz_base, s, e, gstart, h: int):
    """One block hit's contribution restricted to MXU sub-chunk h:
    (112, 49) from the MMW-lane slice, lanes outside [s, e) masked."""
    lo = gstart + h * MMW
    gidx = lo + jax.lax.broadcasted_iota(jnp.int32, (1, MMW), 1)
    mask = ((gidx >= s) & (gidx < e)).astype(jnp.float32)
    sl = slice(h * MMW, (h + 1) * MMW)
    return transfer_dot(
        val2[:, sl], wyz_base[:, sl] * mask, (((1,), (1,)), ((), ()))
    )  # (112, 49)


def _chunk_contrib(pd, s, e, gstart):
    """One chunk's (112, 49) tile contribution (single-hit form)."""
    val2, wyz_base = _chunk_ops(pd)
    return _hit_contrib(val2, wyz_base, s, e, gstart)


def tile_correct(acc):
    """Node-coordinate correction: (NROW, NJK) accumulated matmul
    channels -> (NOUT, NJK) halo tile [(i, c), (j, k)]."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (3, NJK), 1)
    ny = (lane // TILE - 1).astype(jnp.float32)
    nz = (lane % TILE - 1).astype(jnp.float32)
    pieces = []
    for i in range(TILE):
        o = i * NVAL
        nx = float(i - 1)
        mom = (
            acc[o : o + 3]
            - nx * acc[o + 4 : o + 7]
            - ny * acc[o + 8 : o + 11]
            - nz * acc[o + 12 : o + 15]
        )
        pieces.append(jnp.concatenate([mom, acc[o + 3 : o + 4]], 0))
    return jnp.concatenate(pieces, 0)  # (28, 49)


def _p2g_kernel(s_ref, e_ref, pdata_first, pdata_hbm, out_ref, pbuf, sem_p):
    b = pl.program_id(0)
    s = s_ref[b]
    e = e_ref[b]
    cnt = e - s
    dstart = pl.multiple_of((s // CHUNK) * CHUNK, CHUNK)
    nch = jnp.where(cnt > 0, pl.cdiv(e - dstart, CHUNK), 0)

    # chunk 0 arrives through the pipelined BlockSpec (the only chunk
    # for blocks whose range fits one chunk — the common case at 8 ppc)
    acc = _chunk_contrib(pdata_first, s, e, dstart)
    acc = jnp.where(nch > 0, acc, 0.0)

    def dma_p(slot, ci):
        return pltpu.make_async_copy(
            pdata_hbm.at[:, pl.ds(dstart + ci * CHUNK, CHUNK)],
            pbuf.at[slot],
            sem_p.at[slot],
        )

    @pl.when(nch > 1)
    def _():
        dma_p(1, 1).start()

    def body(ci, acc):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < nch)
        def _():
            dma_p(jax.lax.rem(ci + 1, 2), ci + 1).start()

        dma_p(slot, ci).wait()
        return acc + _chunk_contrib(pbuf[slot], s, e, dstart + ci * CHUNK)

    acc = jax.lax.fori_loop(1, nch, body, acc)
    out_ref[0] = tile_correct(acc)


BATCH = 4  # blocks per program in the batched kernel


def _p2g_kernel_batched(
    s_ref, e_ref, pdata_first, pdata_hbm, out_ref, pbuf, acc_ref, sem_p
):
    """BATCH consecutive block slots per program. Their sorted particle
    ranges are CONTIGUOUS (slots ascend with block id, and empty/
    sentinel slots carry collapsed-but-ordered ranges), so the group
    streams ONE chunk sequence [s(first), e(last)) and each chunk feeds
    a pl.when-predicated MXU matmul only into the blocks it
    intersects (at 8 ppc a chunk usually spans 1-2 of the BATCH)."""
    q = pl.program_id(0)
    base = q * BATCH

    s0 = s_ref[base]
    eL = e_ref[base + BATCH - 1]
    dstart = pl.multiple_of((s0 // CHUNK) * CHUNK, CHUNK)
    nch = jnp.where(eL > s0, pl.cdiv(eL - dstart, CHUNK), 0)

    def dma_p(slot, ci):
        return pltpu.make_async_copy(
            pdata_hbm.at[:, pl.ds(dstart + ci * CHUNK, CHUNK)],
            pbuf.at[slot],
            sem_p.at[slot],
        )

    @pl.when(nch > 1)
    def _():
        dma_p(1, 1).start()

    for i in range(BATCH):
        acc_ref[i] = jnp.zeros((NROW, NJK), jnp.float32)

    def accum_chunk(pd, ci):
        c_lo = dstart + ci * CHUNK
        val2, wyz_base = _chunk_ops(pd)
        for h in range(NSUB):
            h_lo = c_lo + h * MMW
            for i in range(BATCH):
                s = s_ref[base + i]
                e = e_ref[base + i]
                hit = (e > s) & (s < h_lo + MMW) & (e > h_lo)

                @pl.when(hit)
                def _(i=i, s=s, e=e, h=h):
                    acc_ref[i] = acc_ref[i] + _hit_contrib_sub(
                        val2, wyz_base, s, e, c_lo, h
                    )

    @pl.when(nch > 0)
    def _():
        accum_chunk(pdata_first, 0)

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < nch)
        def _():
            dma_p(jax.lax.rem(ci + 1, 2), ci + 1).start()

        dma_p(slot, ci).wait()
        accum_chunk(pbuf[slot], ci)
        return 0

    jax.lax.fori_loop(1, nch, body, 0)

    for b in range(BATCH):
        out_ref[b] = tile_correct(acc_ref[b])


@functools.partial(jax.jit, static_argnames=("interpret",))
def p2g_blocked_batched(s_arr, e_arr, pdata, interpret: bool = False):
    """Batched P2G: BATCH block slots per program (grid K/BATCH).
    Same contract as p2g_blocked; K must be a multiple of BATCH."""
    K = s_arr.shape[0]
    assert K % BATCH == 0, f"K={K} must divide by BATCH={BATCH}"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K // BATCH,),
        in_specs=[
            pl.BlockSpec(
                (NVAL, CHUNK),
                lambda q, s, e: (0, s[q * BATCH] // CHUNK),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (BATCH, NOUT, NJK), lambda q, *_: (q, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NVAL, CHUNK), jnp.float32),
            pltpu.VMEM((BATCH, NROW, NJK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(s_ref, e_ref, pdata_first_ref, pdata_hbm, out_ref, pbuf,
               acc_ref, sem_p):
        _p2g_kernel_batched(s_ref, e_ref, pdata_first_ref[:], pdata_hbm,
                            out_ref, pbuf, acc_ref, sem_p)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, NOUT, NJK), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(s_arr, e_arr, pdata, pdata)


@functools.partial(jax.jit, static_argnames=("interpret",))
def p2g_blocked(s_arr, e_arr, pdata, interpret: bool = False):
    """Run the P2G kernel: one program per (active) block slot.

    Args:
      s_arr / e_arr: (K,) int32 sorted-range [start, end) per slot
        (equal => empty slot; for the dense path pass starts[:-1] /
        starts[1:]).
      pdata: (16, Ppad) f32 — rows [mv(3), mass, A row-major(9),
        pos_local(3)]; Ppad must be a multiple of 128 with at least CHUNK
        rows of slack past the last active particle.

    Returns tiles (K, 28, 49) f32 — [(i,c), (j,k)] halo tiles.
    """
    K = s_arr.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(
                (NVAL, CHUNK),
                lambda i, s, e: (0, s[i] // CHUNK),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(
            (1, NOUT, NJK), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NVAL, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(s_ref, e_ref, pdata_first_ref, pdata_hbm, out_ref, pbuf, sem_p):
        _p2g_kernel(s_ref, e_ref, pdata_first_ref[:], pdata_hbm, out_ref,
                    pbuf, sem_p)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, NOUT, NJK), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(s_arr, e_arr, pdata, pdata)
