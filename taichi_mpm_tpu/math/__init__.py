from taichi_mpm_tpu.math import kernels, svd
from taichi_mpm_tpu.math.kernels import bspline_weights, inv_D, stencil_start
from taichi_mpm_tpu.math.svd import polar_decomp, svd2x2, svd3x3

__all__ = [
    "kernels",
    "svd",
    "bspline_weights",
    "inv_D",
    "stencil_start",
    "polar_decomp",
    "svd2x2",
    "svd3x3",
]
