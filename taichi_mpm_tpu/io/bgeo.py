"""BGEO particle output (Houdini classic geo v5).

Replaces the reference's partio dependency (MPM::visualize writes bgeo
via Partio, /root/reference/src/visualize.cpp:17-99). Two back ends
producing identical bytes:
  * a native C++ writer (io/native/bgeo.cpp) compiled on first use and
    driven through ctypes — the production path for multi-million
    particle frame dumps;
  * a pure-numpy fallback used when no compiler is available.

Also provides ``read_bgeo`` for round-trip tests and downstream tools.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import tempfile
from typing import Dict, Optional, Tuple

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False

HOUDINI_FLOAT = 0
HOUDINI_INT = 1
HOUDINI_VECTOR = 5


def _native_lib():
    """Compile (once, cached) and load the native writer."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    src = os.path.join(os.path.dirname(__file__), "native", "bgeo.cpp")
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "taichi_mpm_tpu",
    )
    lib_path = os.path.join(cache_dir, "libtmtio.so")
    try:
        if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(src):
            os.makedirs(cache_dir, exist_ok=True)
            with tempfile.NamedTemporaryFile(
                suffix=".so", dir=cache_dir, delete=False
            ) as tmp:
                tmp_path = tmp.name
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", tmp_path, src],
                check=True,
                capture_output=True,
            )
            os.replace(tmp_path, lib_path)
        lib = ctypes.CDLL(lib_path)
        lib.tmt_write_bgeo.restype = ctypes.c_int
        lib.tmt_write_bgeo.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        _NATIVE = lib
    except (OSError, subprocess.CalledProcessError):
        _NATIVE = None
    return _NATIVE


def _normalize(positions, attributes):
    pos = np.ascontiguousarray(positions, np.float32)
    n, d = pos.shape
    if d == 2:  # embed 2D in z=0 like the reference 2D output
        pos = np.concatenate([pos, np.zeros((n, 1), np.float32)], 1)
    attrs = []
    for name, arr in (attributes or {}).items():
        a = np.ascontiguousarray(arr, np.float32)
        if a.ndim == 1:
            a = a[:, None]
        assert a.shape[0] == n, f"attribute {name} length mismatch"
        htype = HOUDINI_VECTOR if a.shape[1] == 3 else HOUDINI_FLOAT
        attrs.append((name, a, htype))
    return pos, n, attrs


def write_bgeo(path: str, positions: np.ndarray, attributes: Optional[Dict[str, np.ndarray]] = None):
    """Write a classic BGEO file. attributes: name -> (n,) or (n, c) float."""
    pos, n, attrs = _normalize(positions, attributes)
    lib = _native_lib()
    if lib is not None:
        names = (ctypes.c_char_p * len(attrs))(*[a[0].encode() for a in attrs])
        counts = (ctypes.c_int * len(attrs))(*[a[1].shape[1] for a in attrs])
        types = (ctypes.c_int * len(attrs))(*[a[2] for a in attrs])
        ptrs = (ctypes.POINTER(ctypes.c_float) * len(attrs))(
            *[a[1].ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in attrs]
        )
        rc = lib.tmt_write_bgeo(
            path.encode(),
            n,
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(attrs),
            names,
            counts,
            types,
            ptrs,
        )
        if rc != 0:
            raise IOError(f"native bgeo writer failed with code {rc} for {path}")
        return
    _write_bgeo_py(path, pos, n, attrs)


def _write_bgeo_py(path: str, pos: np.ndarray, n: int, attrs):
    """Pure-python fallback, byte-identical to the native writer."""
    out = bytearray()
    magic = ((((ord("B") << 8) | ord("g")) << 8) | ord("e")) << 8 | ord("o")
    out += struct.pack(">i", magic)
    out += b"V"
    out += struct.pack(">iiiiiiiii", 5, n, 1, 0, 0, len(attrs), 0, 1, 0)
    particle_size = 4
    for name, a, htype in attrs:
        out += struct.pack(">H", len(name)) + name.encode()
        out += struct.pack(">Hi", a.shape[1], htype)
        out += struct.pack(">i", 0) * a.shape[1]
        particle_size += a.shape[1]
    # particle block: [x y z 1 attrs...] big-endian f32, vectorized
    block = np.empty((n, particle_size), ">f4")
    block[:, :3] = pos
    block[:, 3] = 1.0
    col = 4
    for _, a, _ in attrs:
        block[:, col : col + a.shape[1]] = a
        col += a.shape[1]
    out += block.tobytes()
    out += struct.pack(">H", 9) + b"generator"
    out += struct.pack(">Hii", 1, 4, 1)
    out += struct.pack(">H", 4) + b"papi"
    out += struct.pack(">ii", 0x8000, n)
    if n > (1 << 16):
        out += np.arange(n, dtype=">i4").tobytes()
    else:
        out += np.arange(n, dtype=">u2").tobytes()
    out += struct.pack(">i", 0)
    out += b"\x00\xff"
    with open(path, "wb") as f:
        f.write(out)


def read_bgeo(path: str) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Read back a classic BGEO written by this module (or partio)."""
    with open(path, "rb") as f:
        buf = f.read()
    off = 0

    def take(fmt):
        nonlocal off
        vals = struct.unpack_from(">" + fmt, buf, off)
        off += struct.calcsize(">" + fmt)
        return vals if len(vals) > 1 else vals[0]

    magic = take("i")
    assert magic == ((((ord("B") << 8) | ord("g")) << 8) | ord("e")) << 8 | ord("o")
    assert take("c") == b"V"
    version, n, nprims, npg, nprg, nattr, nva, npa, na = take("iiiiiiiii")
    attrs = []
    particle_size = 4
    for _ in range(nattr):
        ln = take("H")
        name = buf[off : off + ln].decode()
        off += ln
        count, htype = take("Hi")
        off += 4 * count  # defaults
        attrs.append((name, count))
        particle_size += count
    data = np.frombuffer(buf, ">f4", n * particle_size, off).reshape(n, particle_size)
    off += n * particle_size * 4
    pos = data[:, :3].astype(np.float32)
    out = {}
    col = 4
    for name, count in attrs:
        a = data[:, col : col + count].astype(np.float32)
        out[name] = a[:, 0] if count == 1 else a
        col += count
    return pos, out
