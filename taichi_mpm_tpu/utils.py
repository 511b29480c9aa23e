"""Small shared utilities."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

HI = jax.lax.Precision.HIGHEST


def mm(a, b):
    """Matmul at full f32 precision (TPU defaults to bf16 passes)."""
    return jnp.matmul(a, b, precision=HI)


def pytree_dataclass(cls=None, *, meta_fields: tuple = ()):
    """Register a dataclass as a JAX pytree; `meta_fields` are static."""

    def wrap(c):
        c = dataclasses.dataclass(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def outer(a, b):
    """Batched outer product: (..., d) x (..., d) -> (..., d, d)."""
    return a[..., :, None] * b[..., None, :]
