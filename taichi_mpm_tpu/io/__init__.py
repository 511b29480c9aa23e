"""Output + persistence: BGEO particle dumps (native C++ writer),
checkpoint/resume (SURVEY.md §2.5 partio row, §5 checkpoint row)."""

from taichi_mpm_tpu.io.bgeo import read_bgeo, write_bgeo  # noqa: F401
from taichi_mpm_tpu.io.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
