"""Fully-fused transfer kernels: prep+P2G and G2P+finish in one pass.

The round-2 packed path ran per-particle physics as XLA elementwise
stages around the Pallas transfer kernels; at 8M particles the
prep/finish glue (force build, plasticity, advection, full-state
rewrite) cost ~50 of the 83 ms substep — the particle state made four
HBM round trips per substep (state->pdata, pdata->kernel,
kernel->pout, pout+state->state). Here each state chunk streams
through VMEM ONCE per kernel:

  * ``p2g_fused``  — streams raw (48, CHUNK) state chunks, builds the
    16-channel P2G operand in-kernel (material force dispatch through
    materials/cforms — the same component-form single source of truth
    the XLA path uses), and accumulates the per-block halo tiles with
    the existing masked MXU matmuls (ops/p2g_pallas._chunk_contrib).
  * ``g2p_fused``  — per 512-particle window: the existing run-walk
    window accumulation (ops/g2p_pallas.window_accum), then the FULL
    resample tail in-kernel (APIC/RPIC damping, MLS F-update,
    plasticity return map, advection, clamp, NaN scrub —
    /root/reference/src/transfer.cpp:659-687 + mpm.cpp:582-633) and
    writes the new (48, CHUNK) state block in place (aliased output),
    plus per-window max|v| (drift accounting) and plasticity counters
    (mpm.h:111-112).

Per-particle physics shape: a (1, CHUNK) row computes at 1/8 VPU
sublane utilization, so the material math runs in SLAB SPACE — the
whole (n, CHUNK) tile is reshaped ONCE to (n*4, 128) and each
component row becomes a contiguous (4, 128) slab slice (4/8 sublane
utilization). Mosaic's layout inference rejects the per-row
alternative (reshaping a (1, CHUNK) VALUE SLICE lowers to
vector<512xf32> -> vector<4x128xf32>, "unsupported shape cast" —
BENCH_r02), while the whole-tile cast is legal both directions and
bitwise-exact on matmul-produced values; measured on v5e,
scripts/benchmark/probe_mosaic{,2,3}.py.

The kernels consume the packed flat carry through a (48, Pw) reshape —
a pure bitcast, since both sides are row-major and the Pallas calls
are the only per-substep consumers of the state (CLAUDE.md layout
invariant). Sort-time block origins live in state rows 43-45
(ops/rows.py), written at every lazy re-sort.

Differential-tested against the unfused packed path in
tests/test_fused.py (all materials, multi-substep with mid-frame
re-sorts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from taichi_mpm_tpu.materials import cforms
from taichi_mpm_tpu.math.kernels import inv_D
from taichi_mpm_tpu.ops.g2p_pallas import (
    GTLANES,
    GTROWS,
    _PRE2,
    window_accum,
)
from taichi_mpm_tpu.ops.p2g_pallas import (
    BATCH,
    CHUNK,
    MMW,
    NJK,
    NOUT,
    NROW,
    NSUB,
    NVAL,
    _chunk_ops,
    _hit_contrib_sub,
    tile_correct,
)
from taichi_mpm_tpu.ops.rows import (
    NCH,
    RACT,
    RAUX,
    RC,
    RF,
    RMASS,
    RMAT,
    RMATF,
    RORG,
    RPAR,
    RV,
    RVOL,
    RX,
)

# Slab space: one whole-tile tpu.reshape (n, CHUNK) <-> (n*SB, 128)
# turns every (1, CHUNK) component row into a contiguous (SB, 128)
# slab — 4/8 sublane utilization for the material math with NO per-row
# shape casts (Mosaic rejects those on value slices; module docstring).
SB = CHUNK // 128


def _to_slabs(xt):
    """(n, CHUNK) tile value -> (n*SB, 128) slab view."""
    return xt.reshape(xt.shape[0] * SB, 128)


def _slab(x192, r):
    """Component row r of a slab view: a contiguous (SB, 128) slice."""
    return x192[SB * r : SB * (r + 1), :]


def _from_slabs(slabs):
    """Component slabs [(SB, 128) x n] -> (n, CHUNK) tile value."""
    return jnp.concatenate(slabs, 0).reshape(len(slabs), CHUNK)


def _phys_state(x192):
    """Material-model operands of a (48*SB, 128) state slab view:
    (F, C, aux, vol, mass, params, matf), each (SB, 128)."""
    F = tuple(_slab(x192, RF + i) for i in range(9))
    C = tuple(_slab(x192, RC + i) for i in range(9))
    aux = _slab(x192, RAUX)
    vol = _slab(x192, RVOL)
    mass = _slab(x192, RMASS)
    params = tuple(_slab(x192, RPAR + i) for i in range(8))
    matf = _slab(x192, RMATF)
    return F, C, aux, vol, mass, params, matf


def _build_pd(xt, dt, cfg):
    """In-kernel prep: (48, CHUNK) state tile -> (16, CHUNK) P2G operand
    [mv(3), mass, A(9), pos_local(3)] — same values as
    ops.packed.prep_packed (transfer.cpp:452-454 affine fusion)."""
    invD = inv_D(cfg.kernel_order)
    x192 = _to_slabs(xt)
    F, C, aux, vol, mass, params, matf = _phys_state(x192)
    act = _slab(x192, RACT) > 0.5

    force = cforms.dispatch_force(cfg.active_materials, matf, F, aux, params, vol)
    cf_scale = invD * cfg.inv_dx * dt
    A = tuple(
        jnp.where(act, invD * mass * c - cf_scale * f, 0.0)
        for c, f in zip(C, force)
    )
    massm = jnp.where(act, mass, 0.0)
    v = [_slab(x192, RV + k) for k in range(3)]
    if cfg.particle_gravity:
        v = [v[k] + cfg.gravity[k] * dt for k in range(3)]

    pos = [
        _slab(x192, RX + k) * cfg.inv_dx - _slab(x192, RORG + k)
        for k in range(3)
    ]

    rows = [massm * v[0], massm * v[1], massm * v[2], massm]
    rows += list(A)
    rows += pos
    return _from_slabs(rows)


def _finish_tile(xt, acc, dt, cfg):
    """In-kernel finish on a (48, CHUNK) state tile given the window
    accumulation acc (16, CHUNK) [v(3) B(9)]: the packed twin of
    ops.packed.finish_packed (same formulas/order). Returns
    (new tile (48, CHUNK), vmax scalar, plast count scalar)."""
    invD = inv_D(cfg.kernel_order)
    x192 = _to_slabs(xt)
    a64 = _to_slabs(acc)
    act1 = _slab(x192, RACT) > 0.5
    v_new = [jnp.where(act1, _slab(a64, k), 0.0) for k in range(3)]

    B = tuple(jnp.where(act1, _slab(a64, 3 + k), 0.0) for k in range(9))

    if cfg.apic:
        sym_w = 1.0 - cfg.rpic_damping
        skew_w = 1.0 - cfg.apic_damping
        C_new = []
        for i in range(3):
            for j in range(3):
                bij, bji = B[3 * i + j], B[3 * j + i]
                s = 0.5 * (bij + bji)
                C_new.append(sym_w * s + skew_w * (bij - s))
        C_new = tuple(C_new)
    else:
        C_new = tuple(jnp.zeros_like(B[0]) for _ in range(9))

    k = invD * dt * cfg.inv_dx
    eye = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    cdg = tuple(e - k * b for e, b in zip(eye, B))

    F, _, aux, _, _, params, matf = _phys_state(x192)
    F_new, aux_new, cnt = cforms.dispatch_plasticity(
        cfg.active_materials, matf, F, cdg, aux, params, dt
    )

    hi = [(cfg.res[kk] - cfg.clamp_eps) * cfg.dx for kk in range(3)]
    x_new = [
        jnp.clip(_slab(x192, RX + kk) + dt * v_new[kk], 0.0, hi[kk])
        for kk in range(3)
    ]

    finite = jnp.ones_like(act1)
    for r in x_new + v_new + list(F_new):
        finite = finite & jnp.isfinite(r)
    act_new = act1 & finite
    dead = act1 & ~finite  # newly deactivated: scrub the slot
    keep = act_new

    def sel(new, old, cleanup=0.0):
        return jnp.where(keep, new, jnp.where(dead, cleanup, old))

    rows = [sel(x_new[kk], _slab(x192, RX + kk)) for kk in range(3)]
    rows += [sel(v_new[kk], _slab(x192, RV + kk)) for kk in range(3)]
    rows += [sel(F_new[i], _slab(x192, RF + i), cleanup=eye[i])
             for i in range(9)]
    rows += [sel(c, _slab(x192, RC + i)) for i, c in enumerate(C_new)]
    rows += [jnp.where(keep, aux_new, _slab(x192, RAUX))]
    rows += [_slab(x192, RMASS), _slab(x192, RVOL),
             _slab(x192, RMAT)]  # mat (bitcast) passthrough
    rows += [_slab(x192, RPAR + i) for i in range(8)]
    rows += [act_new.astype(jnp.float32)]
    rows += [_slab(x192, r) for r in range(37, NCH)]
    tile = _from_slabs(rows)

    vmax = jnp.float32(0.0)
    for v in v_new:
        vmax = jnp.maximum(vmax, jnp.max(jnp.where(act_new, jnp.abs(v), 0.0)))
    plast = jnp.sum(jnp.where(act_new, cnt, 0))
    return tile, vmax, plast


# -- fused P2G --------------------------------------------------------------


def _p2g_fused_kernel(
    s_ref, e_ref, dt_ref, st_first, st_hbm, out_ref, pbuf, acc_ref, sem_p,
    *, cfg,
):
    """BATCH block slots per program over raw state chunks (the fused
    twin of ops.p2g_pallas._p2g_kernel_batched)."""
    q = pl.program_id(0)
    base = q * BATCH

    s0 = s_ref[base]
    eL = e_ref[base + BATCH - 1]
    dstart = pl.multiple_of((s0 // CHUNK) * CHUNK, CHUNK)
    nch = jnp.where(eL > s0, pl.cdiv(eL - dstart, CHUNK), 0)
    dt = dt_ref[0]

    def dma_p(slot, ci):
        return pltpu.make_async_copy(
            st_hbm.at[:, pl.ds(dstart + ci * CHUNK, CHUNK)],
            pbuf.at[slot],
            sem_p.at[slot],
        )

    @pl.when(nch > 1)
    def _():
        dma_p(1, 1).start()

    for i in range(BATCH):
        acc_ref[i] = jnp.zeros((NROW, NJK), jnp.float32)

    def accum_chunk(xt, ci):
        pd = _build_pd(xt, dt, cfg)
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
        accum_chunk(st_first, 0)

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


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def p2g_fused(s_arr, e_arr, st2d, dt, cfg, interpret: bool = False):
    """Fused prep+P2G: (48, Pw) state -> (K, NOUT, NJK) halo tiles.

    st2d must carry sort-time origins in rows 43-45 and matf in row 47
    (ops/rows.py); s_arr/e_arr as in p2g_blocked_batched; K % BATCH == 0.
    dt may be a traced scalar.
    """
    K = s_arr.shape[0]
    assert K % BATCH == 0, f"K={K} must divide by BATCH={BATCH}"
    dtv = jnp.full((1,), dt, jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K // BATCH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dt
            pl.BlockSpec(
                (NCH, CHUNK),
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
            pltpu.VMEM((2, NCH, CHUNK), jnp.float32),
            pltpu.VMEM((BATCH, NROW, NJK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    def kernel(s_ref, e_ref, dt_ref, st_first_ref, st_hbm, out_ref, pbuf,
               acc_ref, sem_p):
        _p2g_fused_kernel(s_ref, e_ref, dt_ref, st_first_ref[:], st_hbm,
                          out_ref, pbuf, acc_ref, sem_p, cfg=cfg)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, NOUT, NJK), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(s_arr, e_arr, dtv, st2d, st2d)


# -- fused G2P --------------------------------------------------------------


def _g2p_fused_kernel(
    dims_ref, first_ref, dt_ref, keys_ref, xt_ref, gt_first, gt_second,
    gt_hbm, out_ref, vmax_ref, plast_ref, tbuf, sem_t, *, cfg,
):
    K = dims_ref[0]
    dt = dt_ref[0]
    xt = xt_ref[:]  # (48, CHUNK)
    kb2 = keys_ref[:]  # (1, CHUNK)
    px = xt[RX : RX + 1, :] * cfg.inv_dx - xt[RORG : RORG + 1, :]
    py = xt[RX + 1 : RX + 2, :] * cfg.inv_dx - xt[RORG + 1 : RORG + 2, :]
    pz = xt[RX + 2 : RX + 3, :] * cfg.inv_dx - xt[RORG + 2 : RORG + 3, :]
    acc = window_accum(K, kb2, px, py, pz, gt_first, gt_hbm, tbuf, sem_t,
                       gt_second=gt_second)
    tile, vmax, plast = _finish_tile(xt, acc, dt, cfg)
    out_ref[:] = tile
    # vmax/plast live in SMEM whole-array refs: Mosaic rejects (1, 1)
    # VMEM blocks over a (1, nwin) array (last block dim must divide 128
    # or equal nwin), and these are scalar-per-program side outputs.
    q = pl.program_id(0)
    vmax_ref[0, q] = vmax
    plast_ref[0, q] = plast


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def g2p_fused(keys2d, st2d, gtiles, nb_dims, dt, cfg, interpret: bool = False):
    """Fused G2P+finish: one program per 512-particle window.

    Args: keys2d (1, Pw) sorted slot keys (K sentinel); st2d (48, Pw)
    state (origins in rows 43-45); gtiles (K, 24, 128) from windows_mm;
    nb_dims (1,) [K]; dt possibly traced.

    Returns (st_new (48, Pw), vmax (1, nwin), plast (1, nwin) int32);
    st_new ALIASES st2d's buffer (in-place update).
    """
    pw = keys2d.shape[1]
    nwin = pw // CHUNK
    K = gtiles.shape[0]
    first = jnp.minimum(keys2d[0, ::CHUNK], K - 1).astype(jnp.int32)
    dtv = jnp.full((1,), dt, jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nwin,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dt
            pl.BlockSpec((1, CHUNK), lambda q, *_: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NCH, CHUNK), lambda q, *_: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, GTROWS, GTLANES),
                lambda q, dims, first: (first[q], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *([
                pl.BlockSpec(
                    (1, GTROWS, GTLANES),
                    lambda q, dims, first: (
                        jnp.minimum(first[q] + 1, dims[0] - 1), 0, 0,
                    ),
                    memory_space=pltpu.VMEM,
                ),
            ] if _PRE2 else []),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=[
            pl.BlockSpec((NCH, CHUNK), lambda q, *_: (0, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((GTROWS, GTLANES), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    if _PRE2:
        def kernel(dims_ref, first_ref, dt_ref, keys_ref, xt_ref,
                   gt_first_ref, gt_second_ref, gt_hbm, out_ref, vmax_ref,
                   plast_ref, tbuf, sem_t):
            _g2p_fused_kernel(dims_ref, first_ref, dt_ref, keys_ref, xt_ref,
                              gt_first_ref[0], gt_second_ref[0], gt_hbm,
                              out_ref, vmax_ref, plast_ref, tbuf, sem_t,
                              cfg=cfg)
        args = (nb_dims, first, dtv, keys2d, st2d, gtiles, gtiles, gtiles)
    else:
        def kernel(dims_ref, first_ref, dt_ref, keys_ref, xt_ref,
                   gt_first_ref, gt_hbm, out_ref, vmax_ref, plast_ref,
                   tbuf, sem_t):
            _g2p_fused_kernel(dims_ref, first_ref, dt_ref, keys_ref, xt_ref,
                              gt_first_ref[0], None, gt_hbm,
                              out_ref, vmax_ref, plast_ref, tbuf, sem_t,
                              cfg=cfg)
        args = (nb_dims, first, dtv, keys2d, st2d, gtiles, gtiles)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((NCH, pw), jnp.float32),
            jax.ShapeDtypeStruct((1, nwin), jnp.float32),
            jax.ShapeDtypeStruct((1, nwin), jnp.int32),
        ],
        input_output_aliases={4: 0},  # st2d -> st_new (in-place)
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*args)
