"""ctypes binding to the native C++ image I/O library (native/io.cpp).

The reference's result storage funnels every image through PIL on the
Python heap (src/utils.py:85-125).  Here the hot host-side path ---
RGB8 -> PNG encode -> disk --- is a small C++ library using libpng,
loaded via ctypes (no pybind11 in this image).  Falls back cleanly when
the shared object hasn't been built (build with `make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(here), "native", "libfpio.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.fpio_write_png.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.fpio_write_png.restype = ctypes.c_int
        # read path may be absent in a stale .so built before the loader
        # landed; treat it as optional so write keeps working
        for one, batch in (
            ("fpio_load_png_rgb", "fpio_load_png_rgb_batch"),
            # format-sniffing decode (PNG + JPEG); absent in older .so builds
            ("fpio_load_image_rgb", "fpio_load_image_rgb_batch"),
        ):
            if not hasattr(lib, one):
                continue
            fn = getattr(lib, one)
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            fn.restype = ctypes.c_int
            fb = getattr(lib, batch)
            fb.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
            fb.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def write_png(path: str, arr: np.ndarray) -> None:
    """arr: [H, W, 3] or [H, W] uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native io library not built (make -C native)")
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    rc = lib.fpio_write_png(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h, c
    )
    if rc != 0:
        raise IOError(f"fpio_write_png failed with code {rc} for {path}")


def read_available() -> bool:
    """True when the .so is loaded AND exposes the decode entry points."""
    lib = _load()
    return lib is not None and hasattr(lib, "fpio_load_png_rgb")


def image_read_available() -> bool:
    """True when the .so exposes the format-sniffing (PNG+JPEG) decoder."""
    lib = _load()
    return lib is not None and hasattr(lib, "fpio_load_image_rgb")


def load_png_rgb(path: str, target: int) -> np.ndarray:
    """Decode a PNG, center-crop to square, area-resample to [target, target, 3].

    The C++ side normalizes any PNG color type (palette / gray / 16-bit /
    alpha) to RGB8 and applies the same separable box resample as the numpy
    fallback in training/folder.py.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "fpio_load_png_rgb"):
        raise RuntimeError("native io read path not built (make -C native)")
    out = np.empty((target, target, 3), dtype=np.uint8)
    rc = lib.fpio_load_png_rgb(
        path.encode(), target, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    if rc != 0:
        raise IOError(f"fpio_load_png_rgb failed with code {rc} for {path}")
    return out


def load_png_rgb_batch(paths, target: int, n_threads: int = 0) -> np.ndarray:
    """Threaded batch decode: [len(paths), target, target, 3] uint8.

    ``n_threads <= 0`` uses the hardware concurrency.  One ctypes crossing
    for the whole batch; decode runs on C++ threads outside the GIL.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "fpio_load_png_rgb_batch"):
        raise RuntimeError("native io read path not built (make -C native)")
    paths = list(paths)
    out = np.empty((len(paths), target, target, 3), dtype=np.uint8)
    if not paths:
        return out
    buf = b"\0".join(p.encode() for p in paths) + b"\0"
    rc = lib.fpio_load_png_rgb_batch(
        buf, len(paths), target,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), int(n_threads),
    )
    if rc != 0:
        raise IOError(f"fpio_load_png_rgb_batch failed with code {rc}")
    return out


def load_image_rgb(path: str, target: int) -> np.ndarray:
    """Format-sniffing decode (PNG or JPEG by magic bytes) + crop/resample.

    JPEGs decode through libjpeg with the default (ISLOW) IDCT — the same
    backend PIL uses, so the two paths agree pixel-for-pixel (tested)."""
    lib = _load()
    if lib is None or not hasattr(lib, "fpio_load_image_rgb"):
        raise RuntimeError("native image read path not built (make -C native)")
    out = np.empty((target, target, 3), dtype=np.uint8)
    rc = lib.fpio_load_image_rgb(
        path.encode(), target, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    if rc != 0:
        raise IOError(f"fpio_load_image_rgb failed with code {rc} for {path}")
    return out


def load_image_rgb_batch(paths, target: int, n_threads: int = 0) -> np.ndarray:
    """Threaded format-sniffing batch decode: [n, target, target, 3] uint8."""
    lib = _load()
    if lib is None or not hasattr(lib, "fpio_load_image_rgb_batch"):
        raise RuntimeError("native image read path not built (make -C native)")
    paths = list(paths)
    out = np.empty((len(paths), target, target, 3), dtype=np.uint8)
    if not paths:
        return out
    buf = b"\0".join(p.encode() for p in paths) + b"\0"
    rc = lib.fpio_load_image_rgb_batch(
        buf, len(paths), target,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), int(n_threads),
    )
    if rc != 0:
        raise IOError(f"fpio_load_image_rgb_batch failed with code {rc}")
    return out
