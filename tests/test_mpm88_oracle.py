"""Golden-trajectory test against an independent numpy MLS-MPM oracle.

The scene is the canonical mls-mpm88 setup (reference mls-mpm88.cpp /
README.md:41-129): 2D, 80^2 grid, snow-plasticity fixed-corotated
material (E=1e4, nu=0.2, hardening=10), unit mass/volume, gravity -200,
sticky walls + separating floor. The oracle below is a deliberately
naive, loop-based numpy implementation written directly from the
published MLS-MPM update equations — a fully independent code path that
exercises the solver end to end (P2G, grid ops, BCs, G2P, plasticity,
advection).
"""

import dataclasses
import os

import numpy as np
import jax.numpy as jnp
import pytest

from taichi_mpm_tpu import MPM, levelset
from taichi_mpm_tpu.core import transfer
from taichi_mpm_tpu.core.solver import substep

N = 80
DX = 1.0 / N
INV_DX = float(N)
DT = 1e-4
GRAVITY = -200.0
E, NU, HARDENING = 1e4, 0.2, 10.0
MU0 = E / (2 * (1 + NU))
LAM0 = E * NU / ((1 + NU) * (1 - 2 * NU))
THETA_C, THETA_S = 2.5e-2, 7.5e-3
WALL = 0.045  # between grid nodes to avoid node-on-plane ambiguity


def numpy_mpm88_substep(x, v, F, B, Jp, nodes):
    """One substep, straight from the MLS-MPM equations, looped in numpy."""
    n = x.shape[0]
    grid = np.zeros(nodes + (3,), np.float32)

    # ---- P2G
    for p in range(n):
        pos = x[p] * INV_DX
        base = np.floor(pos - 0.5).astype(np.int32)
        fx = pos - base
        w = np.stack(
            [0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1) ** 2, 0.5 * (fx - 0.5) ** 2]
        ).astype(np.float32)
        e = np.float32(np.exp(HARDENING * (1.0 - Jp[p])))
        mu, lam = MU0 * e, LAM0 * e
        J = np.linalg.det(F[p])
        u, s, vt = np.linalg.svd(F[p])
        R = (u @ vt).astype(np.float32)
        pft = 2 * mu * (F[p] - R) @ F[p].T + lam * (J - 1) * J * np.eye(2, dtype=np.float32)
        force = -1.0 * pft  # vol = 1
        affine = 4.0 * 1.0 * B[p] - 4.0 * INV_DX * DT * force  # mass = 1
        for i in range(3):
            for j in range(3):
                node = base + np.array([i, j])
                dpos = (pos - node).astype(np.float32)
                weight = w[i, 0] * w[j, 1]
                mom = 1.0 * v[p] + affine @ dpos
                grid[node[0], node[1], :2] += weight * mom
                grid[node[0], node[1], 2] += weight * 1.0

    # ---- grid ops
    gx = np.arange(nodes[0], dtype=np.float32) * DX
    gy = np.arange(nodes[1], dtype=np.float32) * DX
    for i in range(nodes[0]):
        for j in range(nodes[1]):
            m = grid[i, j, 2]
            if m > 0:
                grid[i, j, :2] /= m
                grid[i, j, 1] += DT * GRAVITY
                if gx[i] <= WALL or gx[i] >= 1 - WALL or gy[j] >= 1 - WALL:
                    grid[i, j, :2] = 0.0
                if gy[j] <= WALL:
                    grid[i, j, 1] = max(0.0, grid[i, j, 1])

    # ---- G2P
    for p in range(n):
        pos = x[p] * INV_DX
        base = np.floor(pos - 0.5).astype(np.int32)
        fx = pos - base
        w = np.stack(
            [0.5 * (1.5 - fx) ** 2, 0.75 - (fx - 1) ** 2, 0.5 * (fx - 0.5) ** 2]
        ).astype(np.float32)
        new_v = np.zeros(2, np.float32)
        new_B = np.zeros((2, 2), np.float32)
        for i in range(3):
            for j in range(3):
                node = base + np.array([i, j])
                dpos = (pos - node).astype(np.float32)
                weight = np.float32(w[i, 0] * w[j, 1])
                gv = grid[node[0], node[1], :2]
                new_v += weight * gv
                new_B += np.outer(weight * gv, dpos)
        v[p] = new_v
        B[p] = new_B
        cdg = np.eye(2, dtype=np.float32) - 4.0 * DT * INV_DX * new_B
        Fn = (cdg @ F[p]).astype(np.float32)
        u, s, vt = np.linalg.svd(Fn)
        s_c = np.clip(s, 1 - THETA_C, 1 + THETA_S)
        F_new = (u @ np.diag(s_c) @ vt).astype(np.float32)
        Jp[p] = np.clip(Jp[p] * s.prod() / s_c.prod(), 0.6, 20.0)
        F[p] = F_new
        x[p] = x[p] + DT * v[p]
    return x, v, F, B, Jp


def _mpm88_colliders():
    return [
        levelset.Collider(
            sdf=lambda x, t: x[..., 0] - WALL, friction=-1.0, band_lo=-1e9
        ),
        levelset.Collider(
            sdf=lambda x, t: (1 - WALL) - x[..., 0], friction=-1.0, band_lo=-1e9
        ),
        levelset.Collider(
            sdf=lambda x, t: (1 - WALL) - x[..., 1], friction=-1.0, band_lo=-1e9
        ),
        levelset.Collider(
            sdf=lambda x, t: x[..., 1] - WALL, friction=0.0, band_lo=-1e9
        ),
    ]


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(42)
    x0 = (rng.uniform(-1, 1, size=(192, 2)) * 0.08 + np.array([0.5, 0.55])).astype(
        np.float32
    )
    return x0


def test_mpm88_trajectory_matches_numpy_oracle(scene):
    x0 = scene
    n = x0.shape[0]

    sim = MPM(
        res=(N, N),
        base_delta_t=DT,
        gravity=(0.0, GRAVITY),
        frame_dt=DT * 10,
    )
    sim.add_particles(
        "snow",
        pos=x0,
        mass=1.0,
        vol=1.0,
        youngs_modulus=E,
        poisson_ratio=NU,
        hardening=HARDENING,
    )
    for c in _mpm88_colliders():
        sim.add_collider(c)

    # numpy oracle state
    x = x0.copy()
    v = np.zeros((n, 2), np.float32)
    F = np.broadcast_to(np.eye(2, dtype=np.float32), (n, 2, 2)).copy()
    B = np.zeros((n, 2, 2), np.float32)
    Jp = np.ones((n,), np.float32)
    nodes = sim.cfg.grid_nodes

    n_steps = 30
    for _ in range(3):  # 3 frames x 10 substeps
        sim.step()
    for _ in range(n_steps):
        x, v, F, B, Jp = numpy_mpm88_substep(x, v, F, B, Jp, nodes)

    xj = np.asarray(sim.particles.x)[:n]
    vj = np.asarray(sim.particles.v)[:n]
    np.testing.assert_allclose(xj, x, atol=5e-5)
    np.testing.assert_allclose(vj, v, atol=5e-3)
    np.testing.assert_allclose(np.asarray(sim.particles.aux)[:n], Jp, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sim.particles.F)[:n], F, atol=1e-3)


def test_momentum_conservation_free_flight():
    """P2G -> normalize -> G2P with no gravity/BCs preserves momentum."""
    from taichi_mpm_tpu.config import SimConfig

    rng = np.random.default_rng(0)
    n = 128
    sim = MPM(res=(32, 32, 32), base_delta_t=1e-4, gravity=(0.0, 0.0, 0.0))
    x0 = rng.uniform(0.3, 0.7, size=(n, 3)).astype(np.float32)
    v0 = rng.normal(0, 1, size=(n, 3)).astype(np.float32)
    sim.add_particles("jelly", pos=x0, vel=None, E=1e4, nu=0.3)
    sim._finalize()
    p = dataclasses.replace(sim.particles, v=jnp.asarray(v0))

    mom0 = np.asarray(jnp.sum(p.mass[:, None] * p.v, 0))
    p2, _ = substep(p, jnp.float32(0.0), sim.cfg, (), sim.cfg.base_dt)
    mom1 = np.asarray(jnp.sum(p2.mass[:, None] * p2.v, 0))
    np.testing.assert_allclose(mom1, mom0, rtol=2e-4, atol=1e-8)


def test_p2g_mass_conservation():
    rng = np.random.default_rng(1)
    n = 64
    sim = MPM(res=(32, 32), base_delta_t=1e-4)
    x0 = rng.uniform(0.2, 0.8, size=(n, 2)).astype(np.float32)
    sim.add_particles("water", pos=x0, density=1000.0)
    sim._finalize()
    grid = transfer.p2g(sim.particles, sim.cfg, sim.cfg.base_dt)
    total = float(jnp.sum(grid[..., -1]))
    expect = float(jnp.sum(sim.particles.mass * sim.particles.active))
    np.testing.assert_allclose(total, expect, rtol=1e-5)


def test_inactive_particles_do_not_contribute():
    rng = np.random.default_rng(2)
    n = 64
    sim = MPM(res=(32, 32), base_delta_t=1e-4)
    x0 = rng.uniform(0.2, 0.8, size=(n, 2)).astype(np.float32)
    sim.add_particles("jelly", pos=x0)
    sim._finalize(capacity=n * 2)  # second half inactive
    p = sim.particles
    # poison inactive slots
    p = dataclasses.replace(
        p,
        F=p.F.at[n:].set(jnp.nan),
        x=p.x.at[n:].set(0.5),
        mass=p.mass.at[n:].set(99.0),
    )
    grid = transfer.p2g(p, sim.cfg, sim.cfg.base_dt)
    assert np.all(np.isfinite(np.asarray(grid)))
    total = float(jnp.sum(grid[..., -1]))
    expect = float(jnp.sum(np.asarray(p.mass[:n])))
    np.testing.assert_allclose(total, expect, rtol=1e-5)


# -- golden trajectory vs the COMPILED reference 88-liner -------------------
#
# tests/fixtures/mpm88_ref/golden.txt is produced by compiling the
# ACTUAL /root/reference/mls-mpm88.cpp (its advance()/add_object()
# verbatim, against a minimal taichi.h shim — see harness.cpp) and
# dumping positions at frames 0/10/20/40 (10 substeps of dt=1e-4 per
# frame). The test reruns the same scene through THIS framework's MPM
# class from the fixture's exact initial particles and asserts an
# envelope match (per-particle trajectories diverge chaotically over
# hundreds of substeps; the envelope — COM, extent, quantiles — is the
# stable observable; BASELINE.md correctness row).

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "mpm88_ref",
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


def test_mpm88_matches_compiled_reference():
    golden = _load_golden()
    x0 = golden[0]
    n = x0.shape[0]

    sim = MPM(
        res=(N, N), base_delta_t=1e-4, gravity=(0.0, -200.0),
        frame_dt=1e-3,
    )
    sim.add_particles(
        "snow", pos=x0, mass=1.0, vol=1.0,
        youngs_modulus=1e4, poisson_ratio=0.2, hardening=10.0,
    )
    for c in _mpm88_colliders():
        sim.add_collider(c)

    # Observables: the center of mass pins gravity/BC/bulk-stress
    # integration to ~1e-3 over 400 float32 substeps; early-frame
    # deciles pin the distribution before floor contact. The 88-liner's
    # startup pressure spike ejects a small spray cone (~5% of
    # particles by frame 40) whose membership is chaotic and depends on
    # the SVD's inverted-element sign convention (taichi.h vs
    # jnp.linalg.svd differ there), so late-frame TAILS are not pinned
    # — measured: COM err 3e-5/1e-3/2.2e-3 at frames 10/20/40,
    # frame-10 decile err 1.1e-2 (dx = 1.25e-2).
    f = 0
    checks = {10: 1e-3, 20: 4e-3, 40: 8e-3}
    for k in sorted(checks):
        while f < k:
            sim.step()
            f += 1
        ref = golden[k]
        got = np.asarray(sim.particles.x)[:n]
        com_err = np.abs(got.mean(0) - ref.mean(0)).max()
        assert com_err < checks[k], (k, com_err)
        if k == 10:
            qs = np.linspace(0.05, 0.95, 10)
            q_err = np.abs(
                np.quantile(got, qs, axis=0) - np.quantile(ref, qs, axis=0)
            ).max()
            assert q_err < 2e-2, (k, q_err)
