"""Per-block bucketed adaptive dt (ops/async_bucketed) — the TPU
redesign of the reference AsyncMPM scheduler (async_mpm.cpp:90-421):
POT dt levels per block, largest-first bucketed advance with
time-consistent backups, work scaling with bucket context size.

Validation strategy: the bucketed machinery must be EXACT where
exactness is defined — a single-level scene reproduces uniform
stepping at that level's dt bitwise, and spatially isolated regions
reproduce per-region uniform runs at their own dt — plus the work
metric (reference update_counter) must actually drop on the
CFL-heterogeneous scene. Trajectory equality across DIFFERENT dt is
not a meaningful oracle (both integrators are stable but chaotic
internal oscillations diverge), which is the same trade the reference
scheduler makes."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from taichi_mpm_tpu.config import SimConfig
from taichi_mpm_tpu.core.state import empty_particles
from taichi_mpm_tpu.materials import models as materials
from taichi_mpm_tpu.ops import packed
from taichi_mpm_tpu.ops.async_bucketed import (
    MAXLEV,
    bucketed_frame,
    slot_levels,
)

UNIT = 5e-4
FRAME = UNIT * (1 << MAXLEV)


def _blob(rng, lo, hi, n, E):
    mid, par, _ = materials.pack_params("elastic", E=E, nu=0.3)
    x = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    params = np.broadcast_to(np.asarray(par, np.float32), (n, 8))
    return x, params, mid


def _make(blobs, seed=0):
    rng = np.random.default_rng(seed)
    cfg = SimConfig(res=(32, 32, 32), base_dt=1e-3, gravity=(0.0, 0.0, 0.0))
    xs, ps = [], []
    mid = None
    for lo, hi, n, E in blobs:
        x, params, mid = _blob(rng, lo, hi, n, E)
        xs.append(x)
        ps.append(params)
    x = np.concatenate(xs)
    params = np.concatenate(ps)
    n = x.shape[0]
    v = 0.1 * np.random.default_rng(seed + 1).standard_normal(
        (n, 3)
    ).astype(np.float32)
    p = empty_particles(n, 3)
    p = dataclasses.replace(
        p,
        x=p.x.at[:].set(x),
        v=p.v.at[:].set(v),
        mat=p.mat.at[:].set(mid),
        params=p.params.at[:].set(params),
        mass=p.mass.at[:].set(1e-3),
        vol=p.vol.at[:].set(1e-6),
        active=p.active.at[:].set(True),
    )
    return p, cfg.with_materials([mid])


SOFT = ((0.15, 0.3, 0.3), (0.45, 0.7, 0.7), 1600, 4e3)
STIFF = ((0.65, 0.4, 0.4), (0.85, 0.6, 0.6), 400, 4e5)


def _positions(p):
    a = np.asarray(p.active)
    x = np.asarray(p.x)[a]
    return x[np.lexsort(x.T)]


def test_levels_are_heterogeneous():
    p, cfg = _make([SOFT, STIFF])
    st = packed.pack_particles(p)
    st, keys = packed.sort_packed(st, cfg)
    pm = packed.build_page_map_packed(keys, cfg, 512)
    lev = np.asarray(slot_levels(st, keys, pm, cfg, UNIT))
    occupied = np.asarray(pm["e_arr"]) > np.asarray(pm["s_arr"])
    assert lev[occupied].min() < lev[occupied].max()
    assert lev[occupied].min() >= 0 and lev[occupied].max() <= MAXLEV


def test_homogeneous_bucket_is_exact():
    """One level present -> bucketed frame == uniform stepping at that
    level's dt, bitwise."""
    p, cfg = _make([SOFT])
    st = packed.pack_particles(p)
    st, keys = packed.sort_packed(st, cfg)
    pm = packed.build_page_map_packed(keys, cfg, 512)
    lev = np.asarray(slot_levels(st, keys, pm, cfg, UNIT))
    occupied = np.asarray(pm["e_arr"]) > np.asarray(pm["s_arr"])
    L = int(lev[occupied].min())
    assert int(lev[occupied].max()) == L  # truly homogeneous

    p2, t2, n_up, n_sel, n_act, _ = bucketed_frame(
        p, jnp.float32(0.0), cfg, (), FRAME, UNIT, K=512, budget=2048,
        K_ctx=768, interpret=True,
    )
    assert int(np.asarray(n_sel).max()) <= 2048 and int(n_act) <= 768
    n_steps = (1 << MAXLEV) >> L
    p_ref, _, _, _, _ = packed.packed_frame(
        p, jnp.float32(0.0), cfg, (), UNIT * (1 << L), n_steps, 512,
        interpret=True,
    )
    np.testing.assert_array_equal(_positions(p2), _positions(p_ref))
    assert int(n_up) == int(np.asarray(p.active).sum()) * n_steps


def _region_lev_fn(L_soft, L_stiff):
    """Explicit per-region level assignment (x-position of the slot's
    block decides the region; empties follow MAXLEV)."""
    import jax.numpy as jnp

    def fn(pm):
        ids = pm["ids"]
        nbp = 9 * 9 * 9
        bx = ids // (9 * 9)
        occupied = pm["e_arr"] > pm["s_arr"]
        lev = jnp.where(bx <= 4, L_soft, L_stiff)
        return jnp.where(occupied, lev, MAXLEV)

    return fn


def test_isolated_regions_match_per_region_uniform_runs():
    """Spatially separated soft+stiff blobs pinned to single levels
    (the natural assignment grades levels near region fringes, which
    correctly mixes dt inside a region and has no single-dt oracle):
    the bucketed frame must reproduce EACH blob's own uniform-dt
    trajectory exactly — buckets only interact through adjacency, and
    there is none here."""
    L_soft, L_stiff = 4, 1
    p, cfg = _make([SOFT, STIFF])
    p2, t2, n_up, n_sel, n_act, _ = bucketed_frame(
        p, jnp.float32(0.0), cfg, (), FRAME, UNIT, K=512, budget=4096,
        K_ctx=768, interpret=True, lev_fn=_region_lev_fn(L_soft, L_stiff),
    )
    assert int(np.asarray(n_sel).max()) <= 4096 and int(n_act) <= 768

    # run the COMBINED scene per-region by zeroing out the other blob
    n_soft = SOFT[2]
    refs = []
    n_updates_expected = 0
    for blob, L in ((SOFT, L_soft), (STIFF, L_stiff)):
        n_steps = (1 << MAXLEV) >> L
        pc, cfgc = _make([SOFT, STIFF])
        act = np.zeros(pc.capacity, bool)
        if blob is SOFT:
            act[:n_soft] = True
        else:
            act[n_soft:] = True
        pc = dataclasses.replace(pc, active=jnp.asarray(act))
        p_ref, _, _, _, _ = packed.packed_frame(
            pc, jnp.float32(0.0), cfgc, (), UNIT * (1 << L), n_steps,
            512, interpret=True,
        )
        refs.append(_positions(p_ref))
        n_updates_expected += blob[2] * n_steps
    ref = np.concatenate(refs)
    ref = ref[np.lexsort(ref.T)]
    np.testing.assert_array_equal(_positions(p2), ref)

    # the paper's work metric drops vs uniform-fine stepping
    n = int(np.asarray(p.active).sum())
    updates_fine = n * (1 << MAXLEV)
    assert int(n_up) == n_updates_expected
    assert n_updates_expected < 0.5 * updates_fine


def test_midframe_resort_is_exact():
    """A fast-moving homogeneous blob drifts > 0.45 cells mid-frame:
    the bucketed frame must LAZY RE-SORT in-device (n_resorts >= 1) and
    still reproduce uniform stepping at the level's dt bitwise — in the
    single-level regime every tick is aligned, so the resort schedule
    matches packed_frame's exactly (same trigger, same accumulation)."""
    p, cfg = _make([SOFT])
    # uniform fast velocity: drift = |v| * FRAME * inv_dx ~ 1 cell
    v = np.tile(np.asarray([[1.0, 0.0, 0.0]], np.float32), (p.capacity, 1))
    p = dataclasses.replace(p, v=jnp.asarray(v))

    st = packed.pack_particles(p)
    st, keys = packed.sort_packed(st, cfg)
    pm = packed.build_page_map_packed(keys, cfg, 512)
    lev = np.asarray(slot_levels(st, keys, pm, cfg, UNIT))
    occupied = np.asarray(pm["e_arr"]) > np.asarray(pm["s_arr"])
    L = int(lev[occupied].min())
    assert int(lev[occupied].max()) == L  # stays homogeneous

    p2, t2, n_up, n_sel, n_act, info = bucketed_frame(
        p, jnp.float32(0.0), cfg, (), FRAME, UNIT, K=512, budget=2048,
        K_ctx=768, interpret=True,
    )
    assert int(np.asarray(n_sel).max()) <= 2048 and int(n_act) <= 768
    assert int(info["n_resorts"]) >= 1  # the drift trigger fired

    n_steps = (1 << MAXLEV) >> L
    p_ref, _, _, n_sorts_ref, _ = packed.packed_frame(
        p, jnp.float32(0.0), cfg, (), UNIT * (1 << L), n_steps, 512,
        interpret=True,
    )
    assert int(n_sorts_ref) >= 2  # frame-edge sort + >=1 lazy re-sort
    np.testing.assert_array_equal(_positions(p2), _positions(p_ref))
    assert int(n_up) == int(np.asarray(p.active).sum()) * n_steps


def test_natural_levels_save_updates_and_stay_finite():
    """With the NATURAL level assignment (graded near fringes), the
    scheme must stay stable/finite and cut the update count — the
    reference's own validation level (energy/visual + update_counter,
    async_mpm.cpp:328,420)."""
    p, cfg = _make([SOFT, STIFF])
    p2, t2, n_up, n_sel, n_act, _ = bucketed_frame(
        p, jnp.float32(0.0), cfg, (), FRAME, UNIT, K=512, budget=4096,
        K_ctx=768, interpret=True,
    )
    assert int(np.asarray(n_sel).max()) <= 4096 and int(n_act) <= 768
    a = np.asarray(p2.active)
    assert a.sum() == int(np.asarray(p.active).sum())
    x = np.asarray(p2.x)[a]
    v = np.asarray(p2.v)[a]
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(v))
    assert np.abs(v).max() < 5.0  # no blow-up
    n = int(np.asarray(p.active).sum())
    assert int(n_up) < 0.8 * n * (1 << MAXLEV)
