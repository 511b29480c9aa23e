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
from taichi_mpm_tpu.ops.substep import blocked_substep, grid_update_blocked, prep_p2g
from taichi_mpm_tpu.ops.p2g_pallas import p2g_blocked
from taichi_mpm_tpu.ops.blocked import block_starts, num_blocks, sort_particles


def _scene(n=400, res=16, material="jelly", seed=0, **kw):
    rng = np.random.default_rng(seed)
    sim = MPM(res=(res, res, res), base_delta_t=2e-4, gravity=(0.0, -10.0, 0.0))
    x0 = rng.uniform(0.25, 0.75, size=(n, 3)).astype(np.float32)
    v0 = rng.normal(0, 0.5, size=(n, 3)).astype(np.float32)
    sim.add_particles(material, pos=x0, vel=None, density=1000.0, **kw)
    sim._finalize()
    p = dataclasses.replace(sim.particles, v=jnp.asarray(v0))
    return sim, p


def test_merge_extract_roundtrip():
    """merge_tiles followed by extract_tiles must reproduce each block's
    own 7^3 halo view of the summed grid."""
    rng = np.random.default_rng(1)
    sim, _ = _scene(n=8, res=16)
    cfg = sim.cfg
    nb = num_blocks(cfg)
    nbt = nb[0] * nb[1] * nb[2]
    tiles = jnp.asarray(rng.normal(size=(nbt, 7, 4, 7, 7)).astype(np.float32))
    G = blocked.merge_tiles(tiles, cfg)
    # check a couple of nodes by brute force
    Gn = np.asarray(G)  # (nbx+2,4, nby+2,4, nbz+2,4, 4)
    T = np.asarray(tiles).reshape(nb + (7, 4, 7, 7))
    for (gx, gy, gz) in [(5, 6, 7), (8, 8, 8), (3, 12, 9), (0, 0, 0)]:
        want = np.zeros(4)
        for bx in range(nb[0]):
            for by in range(nb[1]):
                for bz in range(nb[2]):
                    ix, iy, iz = gx - 4 * bx + 1, gy - 4 * by + 1, gz - 4 * bz + 1
                    if 0 <= ix < 7 and 0 <= iy < 7 and 0 <= iz < 7:
                        want += T[bx, by, bz, ix, :, iy, iz]
        Bx, lx = gx // 4 + 1, gx % 4
        By, ly = gy // 4 + 1, gy % 4
        Bz, lz = gz // 4 + 1, gz % 4
        np.testing.assert_allclose(
            Gn[Bx, lx, By, ly, Bz, lz], want, rtol=1e-5, atol=1e-5
        )

    # extract: block b's tile row (j,k), col (c,i) = G at node 4b-1+offset
    gt = np.asarray(blocked.extract_tiles(G[..., :3], cfg))
    b = (1, 2, 1)
    bid = (b[0] * nb[1] + b[1]) * nb[2] + b[2]
    for (i, j, k) in [(0, 0, 0), (3, 4, 5), (6, 6, 6), (1, 2, 3)]:
        gxyz = [4 * b[a] - 1 + o for a, o in enumerate((i, j, k))]
        idx = tuple(
            q for a in range(3) for q in (gxyz[a] // 4 + 1, gxyz[a] % 4)
        )
        for c in range(3):
            np.testing.assert_allclose(
                gt[bid, c * 7 + i, j * 7 + k], Gn[idx][c], rtol=1e-5
            )


@pytest.mark.parametrize("material", ["jelly", "snow", "water", "sand"])
def test_p2g_blocked_matches_oracle(material):
    sim, p = _scene(n=300, res=16, material=material)
    cfg, dt = sim.cfg, sim.cfg.base_dt
    nb = num_blocks(cfg)
    nbt = nb[0] * nb[1] * nb[2]

    grid_ref = transfer.p2g(p, cfg, dt)  # (nodes..., 4) oracle

    ps, keys, _ = sort_particles(p, cfg)
    starts = block_starts(keys, nbt)
    pdata = prep_p2g(ps, keys, cfg, dt)
    tiles = p2g_blocked(starts, pdata, nbt, interpret=True)
    G = blocked.merge_tiles(tiles.reshape(nbt, 7, 4, 7, 7), cfg)

    # compare on the common node range [0, res+2)
    Gn = np.asarray(G)
    nbx = nb[0]
    dense = Gn.reshape(4 * (nbx + 2), 4 * (nbx + 2), 4 * (nbx + 2), 4)
    dense = dense[4:, 4:, 4:]  # drop the low slack block -> node 0 aligned
    ref = np.asarray(grid_ref)
    nn = ref.shape[0]
    np.testing.assert_allclose(
        dense[:nn, :nn, :nn], ref, rtol=1e-4, atol=1e-5
    )
    # nothing outside the oracle's node range
    assert np.abs(dense[nn:]).max() == 0.0


@pytest.mark.parametrize("material", ["jelly", "sand"])
def test_blocked_substep_matches_oracle(material):
    sim, p = _scene(n=300, res=16, material=material)
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
        p_fast, _ = blocked_substep(p_fast, t, cfg, colliders, dt, interpret=True)
        # re-sorting inside blocked_substep permutes; bring oracle to the
        # same order for comparison at the next iteration
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
