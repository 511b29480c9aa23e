"""Golden-trajectory test vs the COMPILED reference tetris.cpp.

tests/fixtures/tetris_ref/golden.txt is produced by compiling the ACTUAL
/root/reference/tetris.cpp (its advance()/add_object() verbatim, against
the mpm88 fixture's taichi.h shim — see tetris_ref/harness.cpp) and
dumping positions+type at frames 0/5/10/20/40 (26 substeps of
dt=60e-4/160 per frame, the reference main loop's cadence).

This pins the reference's per-particle MULTI-MATERIAL dispatch
(tetris.cpp:49-53,98-113: 0 elastic corotated / 1 snow plasticity /
2 liquid J-pressure) against this framework's material table in one
scene — the second compiled-reference oracle after mls-mpm88
(BASELINE.md correctness row). The liquid's cauchy = 0.2E(J-1)I is
exactly this framework's water EOS at gamma=1:
vol*j*k*(j^-1 - 1) = vol*k*(1-j).

Measured errors (probe, float32): COM 2.1e-5/3.6e-4/2.1e-3 at frames
10/20/40; water is near-bitwise until floor contact (free fall);
snow quantiles go chaotic after fracture so only elastic+water
distributions are pinned (dx = 6.25e-3).
"""

import os

import numpy as np

from taichi_mpm_tpu import MPM, levelset

N = 160
DT = 60e-4 / N  # tetris.cpp:5
WALL = 0.045  # between grid nodes 7 (0.04375) and 8 (0.05): nodes 0..7
# are inside the wall exactly like the reference's `x < 0.05` node test

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "tetris_ref",
    "golden.txt",
)


def _load_golden():
    txt = open(FIXTURE).read().splitlines()
    frames = {}
    i = 0
    while i < len(txt):
        tok = txt[i].split()
        assert tok[0] == "FRAME"
        k, n = int(tok[1]), int(tok[2])
        frames[k] = np.array(
            [[float(v) for v in l.split()] for l in txt[i + 1 : i + 1 + n]],
            np.float32,
        )
        i += 1 + n
    return frames


def test_tetris_matches_compiled_reference():
    golden = _load_golden()
    x0 = golden[0][:, :2]
    types = golden[0][:, 2].astype(int)
    masks = [types == t for t in range(3)]

    sim = MPM(
        res=(N, N), base_delta_t=DT, frame_dt=26 * DT, gravity=(0.0, -200.0)
    )
    # tetris.cpp material table: E=1e4 nu=0.2 hardening=10 for all;
    # unit mass/volume (tetris.cpp:7-9)
    sim.add_particles("jelly", pos=x0[masks[0]], mass=1.0, vol=1.0,
                      E=1e4, nu=0.2)
    sim.add_particles("snow", pos=x0[masks[1]], mass=1.0, vol=1.0,
                      youngs_modulus=1e4, poisson_ratio=0.2, hardening=10.0)
    sim.add_particles("water", pos=x0[masks[2]], mass=1.0, vol=1.0,
                      k=0.2e4, gamma=1.0)
    # sticky left/right/top walls + separating floor (tetris.cpp:72-78)
    for c in [
        levelset.Collider(sdf=lambda x, t: x[..., 0] - WALL,
                          friction=-1.0, band_lo=-1e9),
        levelset.Collider(sdf=lambda x, t: (1 - WALL) - x[..., 0],
                          friction=-1.0, band_lo=-1e9),
        levelset.Collider(sdf=lambda x, t: (1 - WALL) - x[..., 1],
                          friction=-1.0, band_lo=-1e9),
        levelset.Collider(sdf=lambda x, t: x[..., 1] - WALL,
                          friction=0.0, band_lo=-1e9),
    ]:
        sim.add_collider(c)

    order = np.concatenate([np.where(m)[0] for m in masks])
    sizes = [int(m.sum()) for m in masks]

    com_checks = {10: 1e-3, 20: 2e-3, 40: 8e-3}
    f = 0
    for k in sorted(com_checks):
        while f < k:
            sim.step()
            f += 1
        got = np.asarray(sim.particles.x)
        ref = golden[k][:, :2][order]
        off = 0
        for t, nt in enumerate(sizes):
            g, r = got[off : off + nt], ref[off : off + nt]
            com_err = np.abs(g.mean(0) - r.mean(0)).max()
            assert com_err < com_checks[k], (k, t, com_err)
            if k == 10 and t in (0, 2):  # snow fractures chaotically
                qs = np.linspace(0.05, 0.95, 10)
                q_err = np.abs(
                    np.quantile(g, qs, axis=0) - np.quantile(r, qs, axis=0)
                ).max()
                assert q_err < (5e-3 if t == 0 else 1e-3), (k, t, q_err)
            off += nt
