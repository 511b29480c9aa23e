"""Checkpoint / resume: full simulation state snapshots.

The reference serializes every solver field + particle pools + rigids
via taichi's TC_IO reflection into `.tcb` files (mpm.cpp:936-958,
mpm.h:134-169), re-patching scripted-motion function pointers by id
after load. Here state is a pytree -> one compressed npz; scripted
callables stay in the scene object the user reconstructs (the natural
functional split: code is rebuilt, arrays are restored).
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np


def _flatten(prefix: str, obj) -> dict:
    out = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if isinstance(v, (jnp.ndarray, np.ndarray)):
            out[f"{prefix}.{f.name}"] = np.asarray(v)
    return out


def _restore(cls_instance, prefix: str, data, grow_to: int | None = None,
             snap_cap: int | None = None) -> object:
    """Replace array fields from the npz. When ``grow_to`` is given, a
    restored array whose leading dim IS the snapshot's particle
    capacity (``snap_cap``) covers rows [0:snap_cap) and rows
    [snap_cap:grow_to) keep the scene's freshly-initialized (inactive)
    values — so a snapshot can be resumed into a LARGER-capacity scene,
    like the reference's .tcb load rebuilding pools at the snapshot's
    size (mpm.cpp:941-958). Arrays with any other leading dim (fixed
    tables etc.) are restored verbatim — gating on snap_cap rather than
    on shape[0] < grow_to keeps a future non-capacity-leading field
    from being silently padded with current-field rows (ADVICE r4)."""
    kw = {}
    for f in dataclasses.fields(cls_instance):
        key = f"{prefix}.{f.name}"
        if key not in data:
            continue
        a = jnp.asarray(data[key])
        if (grow_to is not None and snap_cap is not None
                and a.shape[0] == snap_cap and snap_cap < grow_to):
            cur = getattr(cls_instance, f.name)
            a = jnp.concatenate([a, cur[a.shape[0]:]], axis=0)
        kw[f.name] = a
    return dataclasses.replace(cls_instance, **kw)


def save_checkpoint(path: str, sim) -> None:
    """Snapshot particles, rigid bodies, time, and config (action='save',
    mpm.cpp:936-940)."""
    arrays = _flatten("p", sim.particles)
    if sim.bodies is not None:
        arrays.update(_flatten("b", sim.bodies))
    arrays["t"] = np.asarray(sim.t)
    meta = dict(
        cfg={
            k: v
            for k, v in dataclasses.asdict(sim.cfg).items()
            if isinstance(v, (int, float, bool, str, tuple, list))
        },
        frame_dt=sim.frame_dt,
        has_bodies=sim.bodies is not None,
    )
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, sim) -> None:
    """Restore array state into a scene-reconstructed sim (the analog of
    action='load' + script-id repatching, mpm.cpp:941-958: the user
    rebuilds the scene — colliders/scripted motion/articulations — and
    this restores the dynamic state)."""
    data = np.load(path)
    meta = json.loads(bytes(data["meta_json"]).decode())
    if sim.particles is None:
        sim._finalize()
    snap_cap = data["p.x"].shape[0]
    if sim.particles.capacity < snap_cap:
        raise ValueError(
            f"scene capacity {sim.particles.capacity} is smaller than the "
            f"checkpoint's {snap_cap}; rebuild the scene with at least the "
            "snapshot capacity"
        )
    sim.particles = _restore(
        sim.particles, "p", data, grow_to=sim.particles.capacity,
        snap_cap=snap_cap,
    )
    sim._pcarry = None
    if meta["has_bodies"]:
        assert sim.bodies is not None, "checkpoint has rigid bodies; scene does not"
        sim.bodies = _restore(sim.bodies, "b", data)
    sim.t = jnp.asarray(data["t"])
    sim.frame_dt = float(meta["frame_dt"])
