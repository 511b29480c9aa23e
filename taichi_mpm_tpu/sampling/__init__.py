"""Particle seeding: Poisson-disk sampling + density-field textures
(SURVEY.md §2.1 sampler/seeding rows)."""

from taichi_mpm_tpu.sampling import poisson, texture  # noqa: F401
from taichi_mpm_tpu.sampling.texture import Texture  # noqa: F401
