"""ctypes bindings for the native data-loading core.

Builds `_native/loader.cpp` on first use (g++, libpng/libjpeg) and exposes
fused decode+dequantize+normalize for sensor PNGs plus threaded batch
decode. Falls back cleanly when a toolchain is unavailable — the numpy/cv2
pipeline stays the reference implementation.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.abspath(__file__)), '_native')
_SO_PATH = osp.join(_NATIVE_DIR, 'libhrfuser_loader.so')
_lib = None


class _SensorJob(ctypes.Structure):
    _fields_ = [
        ('path', ctypes.c_char_p),
        ('out', ctypes.POINTER(ctypes.c_float)),
        ('h', ctypes.c_int), ('w', ctypes.c_int), ('c', ctypes.c_int),
        ('scale', ctypes.c_float), ('shift', ctypes.c_float),
        ('mean', ctypes.POINTER(ctypes.c_float)),
        ('stdv', ctypes.POINTER(ctypes.c_float)),
    ]


def _build() -> bool:
    src = osp.join(_NATIVE_DIR, 'loader.cpp')
    cmd = ['g++', '-O3', '-shared', '-fPIC', src, '-o', _SO_PATH,
           '-lpng', '-ljpeg', '-lpthread']
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_SO_PATH) or (
            osp.getmtime(_SO_PATH)
            < osp.getmtime(osp.join(_NATIVE_DIR, 'loader.cpp'))):
        if not _build():
            return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.png16_shape.argtypes = [ctypes.c_char_p] + \
        [ctypes.POINTER(ctypes.c_int)] * 3
    lib.decode_png16.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_uint16)] + \
        [ctypes.c_int] * 3
    lib.decode_sensor_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
    lib.jpeg_shape.argtypes = [ctypes.c_char_p] + \
        [ctypes.POINTER(ctypes.c_int)] * 3
    lib.decode_jpeg_bgr.argtypes = [ctypes.c_char_p,
                                    ctypes.POINTER(ctypes.c_uint8),
                                    ctypes.c_int, ctypes.c_int]
    lib.decode_sensor_batch.argtypes = [ctypes.POINTER(_SensorJob),
                                        ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def png16_shape(path: str):
    lib = get_lib()
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    rc = lib.png16_shape(path.encode(), ctypes.byref(h), ctypes.byref(w),
                         ctypes.byref(c))
    if rc:
        raise IOError(f'png16_shape({path}) rc={rc}')
    return h.value, w.value, c.value


def decode_png16(path: str) -> np.ndarray:
    lib = get_lib()
    h, w, c = png16_shape(path)
    out = np.empty((h, w, c), np.uint16)
    rc = lib.decode_png16(path.encode(),
                          out.ctypes.data_as(
                              ctypes.POINTER(ctypes.c_uint16)), h, w, c)
    if rc:
        raise IOError(f'decode_png16({path}) rc={rc}')
    return out


def decode_sensor_png(path: str, scale: float, shift: float,
                      mean: Optional[Sequence[float]] = None,
                      std: Optional[Sequence[float]] = None) -> np.ndarray:
    """Fused decode + dequantize (+normalize): float32 [H, W, C]."""
    lib = get_lib()
    h, w, c = png16_shape(path)
    out = np.empty((h, w, c), np.float32)
    mean_arr = (np.ascontiguousarray(mean, np.float32)
                if mean is not None else None)
    std_arr = (np.ascontiguousarray(std, np.float32)
               if std is not None else None)

    def fptr(a):
        return (a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                if a is not None else None)

    rc = lib.decode_sensor_png(path.encode(),
                               out.ctypes.data_as(
                                   ctypes.POINTER(ctypes.c_float)),
                               h, w, c, scale, shift, fptr(mean_arr),
                               fptr(std_arr))
    if rc:
        raise IOError(f'decode_sensor_png({path}) rc={rc}')
    return out


def decode_jpeg_bgr(path: str) -> np.ndarray:
    lib = get_lib()
    h, w, c = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
    rc = lib.jpeg_shape(path.encode(), ctypes.byref(h), ctypes.byref(w),
                        ctypes.byref(c))
    if rc:
        raise IOError(f'jpeg_shape({path}) rc={rc}')
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.decode_jpeg_bgr(path.encode(),
                             out.ctypes.data_as(
                                 ctypes.POINTER(ctypes.c_uint8)),
                             h.value, w.value)
    if rc:
        raise IOError(f'decode_jpeg_bgr({path}) rc={rc}')
    return out


def decode_sensor_batch(paths: Sequence[str], shapes, scale: float,
                        shift: float, means=None, stds=None,
                        num_threads: int = 4):
    """Threaded fused decode of many sensor PNGs.

    Args:
        shapes: per-file (h, w, c).
    Returns:
        list of float32 arrays.
    """
    lib = get_lib()
    n = len(paths)
    outs = [np.empty(s, np.float32) for s in shapes]
    keep = []                                  # keep ctypes buffers alive
    jobs = (_SensorJob * n)()
    for i, (p, s) in enumerate(zip(paths, shapes)):
        pb = p.encode()
        keep.append(pb)
        mean_arr = (np.ascontiguousarray(means[i], np.float32)
                    if means is not None else None)
        std_arr = (np.ascontiguousarray(stds[i], np.float32)
                   if stds is not None else None)
        keep += [mean_arr, std_arr]
        jobs[i] = _SensorJob(
            pb, outs[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            s[0], s[1], s[2], scale, shift,
            mean_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            if mean_arr is not None else None,
            std_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            if std_arr is not None else None)
    failures = lib.decode_sensor_batch(jobs, n, num_threads)
    if failures:
        raise IOError(f'decode_sensor_batch: {failures} failures')
    return outs
