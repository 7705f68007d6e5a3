"""ctypes bindings for the native ingestion runtime (native/loader.cpp).

The TPU-native counterpart of the reference's C++ dataset layer
(/root/reference/datasets/asl_readers.cpp: eager CSV parse + lazy per-frame
``cv::imread``): a mmap'd CSV parser and a thread-pool image prefetcher that
decodes grayscale frames ahead of the consumer, overlapping host decode with
device execution.

Builds with ``make -C native``; every entry point falls back to pure
Python/PIL when the shared library is absent, so the framework never hard
-requires the native build.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native_loader.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.csv_count_rows.argtypes = [ctypes.c_char_p]
    lib.csv_count_rows.restype = ctypes.c_longlong
    lib.csv_parse.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_longlong,
        ctypes.c_int,
    ]
    lib.csv_parse.restype = ctypes.c_longlong
    lib.csv_parse_i64_col.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_longlong,
    ]
    lib.csv_parse_i64_col.restype = ctypes.c_longlong
    lib.image_decode_gray.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.image_decode_gray.restype = ctypes.c_int
    lib.image_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.image_probe.restype = ctypes.c_int
    lib.prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_longlong,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.prefetcher_create.restype = ctypes.c_void_p
    lib.prefetcher_get.argtypes = [
        ctypes.c_void_p,
        ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.prefetcher_get.restype = ctypes.c_int
    lib.prefetcher_destroy.argtypes = [ctypes.c_void_p]
    lib.prefetcher_destroy.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_csv(path: str, cols: int) -> np.ndarray:
    """Parse a numeric CSV ('#'-comment lines skipped) into (rows, cols) f64."""
    lib = _load()
    if lib is None:
        return np.atleast_2d(
            np.loadtxt(path, delimiter=",", comments="#", usecols=range(cols))
        )
    n = lib.csv_count_rows(path.encode())
    if n < 0:
        raise IOError(f"cannot read {path}")
    out = np.empty((n, cols), np.float64)
    got = lib.csv_parse(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, cols
    )
    if got < 0:
        raise IOError(f"csv parse failed: {path}")
    return out[:got]


def parse_csv_i64_col(path: str, col: int) -> np.ndarray:
    """Parse one CSV column as exact int64 (ns timestamps overflow f64)."""
    lib = _load()
    if lib is None:
        return np.atleast_1d(
            np.loadtxt(
                path, delimiter=",", comments="#", usecols=col, dtype=np.int64,
                converters={col: lambda s: np.int64(s)},
            )
        )
    n = lib.csv_count_rows(path.encode())
    if n < 0:
        raise IOError(f"cannot read {path}")
    out = np.empty((n,), np.int64)
    got = lib.csv_parse_i64_col(
        path.encode(), col, out.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)), n
    )
    if got < 0:
        raise IOError(f"csv parse failed: {path}")
    return out[:got]


def imread_gray(path: str, width: int | None = None, height: int | None = None) -> np.ndarray:
    """Decode a grayscale PNG/PGM/JPEG to (H, W) uint8."""
    lib = _load()
    if lib is None:
        from PIL import Image

        return np.asarray(Image.open(path).convert("L"))
    if width is None or height is None:
        w = ctypes.c_int()
        h = ctypes.c_int()
        if lib.image_probe(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
            raise IOError(f"cannot decode {path}")
        width, height = w.value, h.value
    out = np.empty((height, width), np.uint8)
    rc = lib.image_decode_gray(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), width, height
    )
    if rc != 0:
        raise IOError(f"decode failed ({rc}): {path}")
    return out


class ImagePrefetcher:
    """Thread-pool grayscale decoder with bounded lookahead.

    Sequential ``get(i)`` overlaps decode of frames i+1..i+lookahead with the
    caller's compute; random access seeks (flushes the ring).
    """

    def __init__(self, paths, width: int, height: int, n_threads: int = 4, lookahead: int = 16):
        self.paths = [os.fspath(p) for p in paths]
        self.width = int(width)
        self.height = int(height)
        self._lib = _load()
        self._handle = None
        if self._lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._keepalive = arr
            self._handle = self._lib.prefetcher_create(
                arr, len(self.paths), self.width, self.height, n_threads, lookahead
            )

    def get(self, index: int) -> np.ndarray:
        if self._handle is None:
            return imread_gray(self.paths[index], self.width, self.height)
        out = np.empty((self.height, self.width), np.uint8)
        rc = self._lib.prefetcher_get(
            self._handle, index, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        if rc != 0:
            raise IOError(f"prefetch decode failed ({rc}): {self.paths[index]}")
        return out

    def __len__(self):
        return len(self.paths)

    def close(self):
        if self._handle is not None:
            self._lib.prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
