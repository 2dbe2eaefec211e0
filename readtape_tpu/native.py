"""ctypes bindings to the native C++ IO runtime (native/readtape_io.cpp).

Builds the shared library on demand with the repo's Makefile; every entry
point has a pure-Python fallback, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libreadtape_io.so")
_lib = None
_tried = False


class _CsvScan(ctypes.Structure):
    _fields_ = [("first_time", ctypes.c_double),
                ("deltat", ctypes.c_double),
                ("nrows", ctypes.c_int64),
                ("ncols", ctypes.c_int32),
                ("volts", ctypes.POINTER(ctypes.c_float))]


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(_NATIVE_DIR, "readtape_io.cpp")
    stale = (not os.path.exists(_LIB_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)))
    if stale:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(_LIB_PATH):
                return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.csv_scan.argtypes = [ctypes.c_char_p, ctypes.POINTER(_CsvScan)]
    lib.csv_scan.restype = ctypes.c_int
    lib.csv_scan_scanfast.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(_CsvScan)]
    lib.csv_scan_scanfast.restype = ctypes.c_int
    lib.csv_deltat.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_double)]
    lib.csv_deltat.restype = ctypes.c_int
    lib.csv_free.argtypes = [ctypes.POINTER(_CsvScan)]
    lib.tap_open.argtypes = [ctypes.c_char_p]
    lib.tap_open.restype = ctypes.c_void_p
    lib.tap_write_block.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_uint32, ctypes.c_int]
    lib.tap_write_tapemark.argtypes = [ctypes.c_void_p]
    lib.tap_write_eom.argtypes = [ctypes.c_void_p]
    lib.tap_close.argtypes = [ctypes.c_void_p]
    lib.tap_close.restype = ctypes.c_int64
    if hasattr(lib, "pack12_delta"):
        lib.pack12_delta.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.pack12_delta.restype = ctypes.c_int
    if hasattr(lib, "tape_scan"):
        lib.tape_scan.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.tape_scan.restype = None
    if hasattr(lib, "pack12_delta_base"):
        lib.pack12_delta_base.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.pack12_delta_base.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def csv_scan_native(path: str, scanfast: bool = False):
    """Returns (first_time, deltat, volts [N, T] float32). Raises if the
    native library is unavailable or parsing fails. scanfast=True uses the
    float32 digit-accumulating parser that bit-exactly replicates the
    reference's scanfast_float (csvtbin.c:403-417)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    scan = _CsvScan()
    fn = lib.csv_scan_scanfast if scanfast else lib.csv_scan
    rc = fn(path.encode(), ctypes.byref(scan))
    if rc != 0:
        raise RuntimeError(f"csv_scan failed ({rc}) for {path}")
    try:
        n, c = scan.nrows, scan.ncols
        buf = np.ctypeslib.as_array(scan.volts, shape=(n, c))
        volts = np.array(buf, dtype=np.float32)    # copy before free
    finally:
        lib.csv_free(ctypes.byref(scan))
    dt = ctypes.c_double()
    lib.csv_deltat(path.encode(), ctypes.byref(dt))
    return float(scan.first_time), float(dt.value), volts


class NativeTapWriter:
    """Drop-in for formats.simh.TapWriter backed by the C++ writer."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        self._w = lib.tap_open(path.encode())
        if not self._w:
            raise OSError(f"can't create {path}")
        self.path = path
        self.numoutbytes = 0

    def write_block(self, data: bytes, error: bool = False):
        self._lib.tap_write_block(self._w, data, len(data), int(error))

    def write_tapemark(self):
        self._lib.tap_write_tapemark(self._w)

    def write_eom(self):
        self._lib.tap_write_eom(self._w)

    def close(self):
        if self._w:
            self.numoutbytes = self._lib.tap_close(self._w)
            self._w = None


def tape_scan(samples: np.ndarray, step: int):
    """One native pass over an int16 [N, T] tape: (chunk_max int32
    [N//16] = max |x| over each 16-row chunk and all tracks, sub int32
    [ceil(N/step)*T] = |x| of every step-th row) -- the inputs of the
    host-side activity mask and height estimate
    (segment.host_activity). Returns None if the native library is
    unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "tape_scan"):
        return None
    if samples.dtype != np.int16 or samples.ndim != 2:
        return None
    samples = np.ascontiguousarray(samples)
    n, t = samples.shape
    chunk_max = np.empty(n // 16, np.int32)
    sub = np.empty(-(-n // step) * t, np.int32)
    lib.tape_scan(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.c_int64(n), ctypes.c_int32(t), ctypes.c_int64(step),
        chunk_max.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sub.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return chunk_max, sub


def pack12_delta(samples: np.ndarray, base: np.ndarray = None):
    """12-bit delta pack of an int16 [N, T] sample tensor for the device
    upload (native/readtape_io.cpp::pack12_delta): three byte planes of
    ceil(N*T/2) bytes each (25% fewer bytes over the host->device link
    than raw int16). `base` is an optional int16 [T] row the delta chain
    starts from (granule-pipelined uploads pass the previous granule's
    last row; default zeros). Returns a [3, M] uint8 array, or None when
    the native library is unavailable or any per-track delta exceeds 12
    bits (callers then upload raw int16 -- both paths are lossless)."""
    lib = _load()
    if lib is None or not hasattr(lib, "pack12_delta_base"):
        return None
    if samples.dtype != np.int16 or samples.ndim != 2:
        return None
    samples = np.ascontiguousarray(samples)
    n, t = samples.shape
    base_p = None
    if base is not None:
        base = np.ascontiguousarray(base, np.int16)
        assert base.shape == (t,)
        base_p = base.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
    m = (n * t + 1) // 2
    planes = np.empty((3, m), np.uint8)
    rc = lib.pack12_delta_base(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        ctypes.c_int64(n), ctypes.c_int32(t), base_p,
        planes[0].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        planes[1].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        planes[2].ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return planes if rc == 0 else None
