"""Differential tests: blocked Pallas path vs the generic XLA oracle.

The exact analog of the reference's optimized-vs-generic strategy
(``optimized`` flag, mpm.cpp:510-514; SURVEY.md §4). Pallas kernels run
in interpreter mode on the CPU test mesh.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichi_mpm_tpu.core.solver import MPM, substep
from taichi_mpm_tpu.core import transfer
from taichi_mpm_tpu.ops import blocked
from taichi_mpm_tpu.ops.substep import blocked_substep, prep_p2g
from taichi_mpm_tpu.ops.p2g_pallas import p2g_blocked
from taichi_mpm_tpu.ops.blocked import (
    active_block_ids,
    block_starts,
    neighbor_slots,
    num_blocks_padded,
    records_to_windows,
    sort_particles,
    tiles_to_records,
    total_blocks_padded,
)


def _scene(n=400, res=16, material="jelly", seed=0, spread=(0.25, 0.75), **kw):
    rng = np.random.default_rng(seed)
    sim = MPM(res=(res, res, res), base_delta_t=2e-4, gravity=(0.0, -10.0, 0.0))
    x0 = rng.uniform(*spread, size=(n, 3)).astype(np.float32)
    v0 = rng.normal(0, 0.5, size=(n, 3)).astype(np.float32)
    sim.add_particles(material, pos=x0, vel=None, density=1000.0, **kw)
    sim._finalize()
    p = dataclasses.replace(sim.particles, v=jnp.asarray(v0))
    return sim, p


def _records_pipeline(p, cfg, dt, K):
    """sort -> P2G tiles -> records (the blocked grid build)."""
    nbt = total_blocks_padded(cfg)
    ps, keys, _ = sort_particles(p, cfg)
    starts = block_starts(keys, nbt)
    ids, n_act, slot_map = active_block_ids(starts, cfg, K)
    pdata = prep_p2g(ps, keys, cfg, dt)
    safe = jnp.minimum(ids, nbt - 1)
    s_arr = jnp.where(ids < nbt, starts[safe], 0)
    e_arr = jnp.where(ids < nbt, starts[safe + 1], 0)
    tiles = p2g_blocked(s_arr, e_arr, pdata, interpret=True)
    tiles_ijkc = jnp.transpose(tiles.reshape(K, 7, 4, 7, 7), (0, 1, 3, 4, 2))
    nbr = neighbor_slots(ids, slot_map, cfg)
    rec = tiles_to_records(tiles_ijkc, nbr, K)
    return ps, ids, n_act, nbr, rec


@pytest.mark.parametrize("material", ["jelly", "snow", "water", "sand"])
def test_p2g_records_match_oracle(material):
    """Active-block node records must equal the oracle dense grid at
    every in-domain node (and the window assembly must read back the
    same values)."""
    sim, p = _scene(n=300, res=16, material=material, spread=(0.05, 0.95))
    cfg, dt = sim.cfg, sim.cfg.base_dt
    K = 256

    grid_ref = np.asarray(transfer.p2g(p, cfg, dt))  # (res+2,)^3 + (4,)
    ps, ids, n_act, nbr, rec = _records_pipeline(p, cfg, dt, K)
    assert int(n_act) <= K

    rec = np.asarray(rec)
    ids_np = np.asarray(ids)
    nbx, nby, nbz = num_blocks_padded(cfg)
    nn = grid_ref.shape[0]
    covered = np.zeros(grid_ref.shape[:3], bool)
    for a, bid in enumerate(ids_np):
        if bid >= nbx * nby * nbz:
            continue
        bz = bid % nbz
        by = (bid // nbz) % nby
        bx = bid // (nbz * nby)
        for lx in range(4):
            gx = 4 * bx + lx
            if gx >= nn:
                continue
            for ly in range(4):
                gy = 4 * by + ly
                if gy >= nn:
                    continue
                for lz in range(4):
                    gz = 4 * bz + lz
                    if gz >= nn:
                        continue
                    np.testing.assert_allclose(
                        rec[a, lx, ly, lz], grid_ref[gx, gy, gz],
                        rtol=1e-4, atol=1e-5,
                        err_msg=f"node ({gx},{gy},{gz})",
                    )
                    covered[gx, gy, gz] = True
    # every node with mass must be covered by some active record
    assert np.all(covered | (grid_ref[..., 3] == 0))

    # window readback: block's 7^3 window equals the grid slab 4b-1..4b+5
    win = np.asarray(records_to_windows(jnp.asarray(rec), nbr, K))
    for a, bid in enumerate(ids_np[: int(n_act)]):
        bz = bid % nbz
        by = (bid // nbz) % nby
        bx = bid // (nbz * nby)
        for w, g in [(0, -1), (3, 2), (6, 5)]:
            gx, gy, gz = 4 * bx + g, 4 * by + g, 4 * bz + g
            want = (
                grid_ref[gx, gy, gz]
                if 0 <= gx < nn and 0 <= gy < nn and 0 <= gz < nn
                else np.zeros(4)
            )
            np.testing.assert_allclose(
                win[a, w, w, w], want, rtol=1e-4, atol=1e-5
            )
        break  # one block suffices for the slab check


@pytest.mark.parametrize("material", ["jelly", "sand"])
def test_blocked_substep_matches_oracle(material):
    sim, p = _scene(n=300, res=16, material=material, spread=(0.05, 0.95))
    from taichi_mpm_tpu.core import levelset

    colliders = (
        levelset.box_domain(
            lo=(0.2, 0.2, 0.2), hi=(0.8, 0.8, 0.8), friction=0.3
        ),
    )
    cfg, dt = sim.cfg, sim.cfg.base_dt

    # pre-sort so both paths see identical particle order
    p, _, _ = sort_particles(p, cfg)

    p_ref = p
    p_fast = p
    t = jnp.float32(0.0)
    for _ in range(3):
        p_ref, _ = substep(p_ref, t, cfg, colliders, dt)
        (p_fast, _), _ = blocked_substep(
            p_fast, t, cfg, colliders, dt, interpret=True, max_active_blocks=256
        )
        p_ref, _, _ = sort_particles(p_ref, cfg)
        p_fast, _, _ = sort_particles(p_fast, cfg)
        t = t + dt

    np.testing.assert_allclose(
        np.asarray(p_fast.x), np.asarray(p_ref.x), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(p_fast.v), np.asarray(p_ref.v), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(p_fast.F), np.asarray(p_ref.F), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(p_fast.C), np.asarray(p_ref.C), atol=2e-3
    )


def test_sort_packed_roundtrip():
    """The packed one-gather sort must preserve every field bitwise."""
    sim, p = _scene(n=123, res=16)
    cfg = sim.cfg
    p = dataclasses.replace(
        p,
        states=jnp.arange(p.capacity, dtype=jnp.int32) * 7 + 3,
        near_b=jnp.arange(p.capacity) % 3 == 0,
    )
    ps, keys, order = sort_particles(p, cfg)
    inv = np.asarray(order)
    for f in dataclasses.fields(p):
        a = np.asarray(getattr(p, f.name))
        b = np.asarray(getattr(ps, f.name))
        np.testing.assert_array_equal(a[inv], b, err_msg=f.name)


def test_active_compaction_matches_dense():
    """A tight K and a loose K give identical physics (and n_act reports
    the true dilated occupancy)."""
    sim, p = _scene(n=300, res=16)
    cfg, dt = sim.cfg, sim.cfg.base_dt
    p, _, _ = sort_particles(p, cfg)
    t = jnp.float32(0.0)
    (pd, _), n_dense = blocked_substep(
        p, t, cfg, (), dt, interpret=True, max_active_blocks=total_blocks_padded(cfg)
    )
    (pa, _), n_act = blocked_substep(
        p, t, cfg, (), dt, interpret=True, max_active_blocks=128
    )
    assert int(n_act) == int(n_dense) <= 128
    np.testing.assert_array_equal(np.asarray(pd.x), np.asarray(pa.x))
    np.testing.assert_array_equal(np.asarray(pd.v), np.asarray(pa.v))
    np.testing.assert_array_equal(np.asarray(pd.F), np.asarray(pa.F))


def test_active_overflow_reported():
    sim, p = _scene(n=300, res=16)
    cfg, dt = sim.cfg, sim.cfg.base_dt
    p, _, _ = sort_particles(p, cfg)
    (_, _), n_act = blocked_substep(
        p, jnp.float32(0.0), cfg, (), dt, interpret=True, max_active_blocks=4
    )
    assert int(n_act) > 4  # overflow is visible to the driver

def test_lazy_resort_frame_matches_per_substep_sort():
    """blocked_frame's drift-triggered lazy re-sort must reproduce the
    per-substep-sort trajectory even when particles cross blocks (fast
    drift forces several in-scan re-sorts)."""
    from taichi_mpm_tpu.ops.substep import blocked_frame

    sim, p = _scene(n=300, res=16, spread=(0.1, 0.6))
    cfg = sim.cfg
    import dataclasses as dc

    # strong uniform drift: ~0.1 cells/substep -> resorts mid-frame
    vdrift = 0.1 / (cfg.base_dt * cfg.inv_dx)
    v = np.broadcast_to(
        np.asarray([vdrift, 0.0, 0.0], np.float32), (p.capacity, 3)
    ).copy()
    p = dc.replace(p, v=jnp.asarray(v))
    p, _, _ = sort_particles(p, cfg)

    # reference: sort every substep
    p_ref = p
    t = jnp.float32(0.0)
    for _ in range(12):
        (p_ref, t), _ = blocked_substep(
            p_ref, t, cfg, (), cfg.base_dt, interpret=True, max_active_blocks=128
        )

    p_lazy, t2, nmax, nsorts = blocked_frame(
        p, jnp.float32(0.0), cfg, (), cfg.base_dt, 12, 128, interpret=True
    )
    assert int(nsorts) >= 2  # drift actually triggered re-sorts
    a = np.asarray(p_ref.x)[np.asarray(p_ref.active)]
    b = np.asarray(p_lazy.x)[np.asarray(p_lazy.active)]
    a = a[np.lexsort(a.T)]
    b = b[np.lexsort(b.T)]
    np.testing.assert_allclose(a, b, atol=1e-6)
