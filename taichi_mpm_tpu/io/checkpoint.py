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


def _restore(cls_instance, prefix: str, data) -> object:
    kw = {}
    for f in dataclasses.fields(cls_instance):
        key = f"{prefix}.{f.name}"
        if key in data:
            kw[f.name] = jnp.asarray(data[key])
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
    assert (
        sim.particles.capacity == data["p.x"].shape[0]
    ), "scene capacity differs from checkpoint"
    sim.particles = _restore(sim.particles, "p", data)
    if meta["has_bodies"]:
        assert sim.bodies is not None, "checkpoint has rigid bodies; scene does not"
        sim.bodies = _restore(sim.bodies, "b", data)
    sim.t = jnp.asarray(data["t"])
    sim.frame_dt = float(meta["frame_dt"])
