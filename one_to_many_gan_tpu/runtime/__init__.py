"""Native runtime bindings (ctypes over libotm_runtime.so).

The C++ runtime provides the host-side hot paths of the data pipeline:
threaded JPEG/PNG decode + bilinear resize into a packed uint8 tensor, and
batch gather/flip/normalize (see loader.cpp). The shared library is NOT
checked into version control; it is built on demand from loader.cpp the
first time it's needed (``make -C one_to_many_gan_tpu/runtime``). Python
falls back to the PIL/numpy implementations when the build isn't possible.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "libotm_runtime.so"
_lib = None
_build_attempted = False


def _try_build() -> None:
    """Best-effort on-demand build of the shared library from loader.cpp."""
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    try:
        subprocess.run(
            ["make", "-C", str(Path(__file__).parent)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except (OSError, subprocess.SubprocessError):
        pass  # no toolchain / build failure -> caller falls back to Python


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        _try_build()
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.otm_load_images.restype = ctypes.c_int
    lib.otm_load_images.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.otm_assemble_batch.restype = None
    lib.otm_assemble_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_images(
    paths: list[str | os.PathLike],
    image_size: tuple[int, int],
    channels: int,
    threads: int | None = None,
) -> np.ndarray:
    """Decode + resize images in parallel -> [N, H, W, C] uint8."""
    lib = _load()
    if lib is None:
        msg = "native runtime not built (make -C one_to_many_gan_tpu/runtime)"
        raise RuntimeError(msg)
    h, w = image_size
    n = len(paths)
    out = np.zeros((n, h, w, channels), dtype=np.uint8)
    ok = np.zeros((n,), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    if threads is None:
        threads = min(8, os.cpu_count() or 1)
    loaded = lib.otm_load_images(
        arr,
        n,
        h,
        w,
        channels,
        threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if loaded != n:
        bad = [str(paths[i]) for i in np.nonzero(ok == 0)[0][:5]]
        msg = f"failed to decode {n - loaded}/{n} images, e.g. {bad}"
        raise RuntimeError(msg)
    return out


def assemble_batch(
    images: np.ndarray, indices: np.ndarray, flips: np.ndarray
) -> np.ndarray:
    """Gather + flip + normalize to float32 [-1,1] in native code."""
    lib = _load()
    if lib is None:
        msg = "native runtime not built"
        raise RuntimeError(msg)
    n, h, w, c = images.shape
    b = len(indices)
    out = np.empty((b, h, w, c), dtype=np.float32)
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    flp = np.ascontiguousarray(flips, dtype=np.uint8)
    images = np.ascontiguousarray(images)
    lib.otm_assemble_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b,
        h,
        w,
        c,
        flp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
