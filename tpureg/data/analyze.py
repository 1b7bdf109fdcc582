"""Analyze 7.5 (.hdr/.img) volume reader — OASIS-1's native format.

The reference loads these through MONAI's NibabelReader (dataset.py:54);
neither MONAI nor nibabel exists in this environment, so the format is
implemented directly: the 348-byte Analyze header (dsr struct) is parsed for
dims / datatype / endianness and the .img payload memory-mapped.

A C++ fast path (native/analyze_reader.cc, loaded via ctypes) decodes and
type-converts volumes on worker threads; this module transparently falls
back to the pure-numpy path when the shared library is absent.

Returned volumes are float32 arrays of shape (X, Y, Z[, V]) in the file's
native voxel order — the same array nibabel's ``get_fdata`` yields, so the
downstream slicing pipeline (transpose → crop → per-slice resize) matches
the reference's MONAI chain 1:1.
"""

from __future__ import annotations

import os
import struct
from typing import Optional, Tuple

import numpy as np

__all__ = ["read_analyze", "AnalyzeHeader"]

_DTYPES = {
    2: np.uint8,
    4: np.int16,
    8: np.int32,
    16: np.float32,
    64: np.float64,
    132: np.int16,  # DT_SIGNED_SHORT | planar quirk seen in some exporters
}


class AnalyzeHeader:
    """Parsed subset of the Analyze 7.5 header."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            raw = f.read(348)
        if len(raw) < 348:
            raise ValueError(f"{path}: truncated Analyze header")
        # endianness: sizeof_hdr must equal 348
        for endian in ("<", ">"):
            (sizeof_hdr,) = struct.unpack(endian + "i", raw[0:4])
            if sizeof_hdr == 348:
                self.endian = endian
                break
        else:
            raise ValueError(f"{path}: not an Analyze header (sizeof_hdr)")
        dim = struct.unpack(self.endian + "8h", raw[40:56])
        ndim = int(dim[0])
        if not 1 <= ndim <= 7:
            raise ValueError(f"{path}: bad ndim {ndim}")
        self.shape: Tuple[int, ...] = tuple(int(d) for d in dim[1 : 1 + ndim])
        (self.datatype,) = struct.unpack(self.endian + "h", raw[70:72])
        (self.bitpix,) = struct.unpack(self.endian + "h", raw[72:74])
        pixdim = struct.unpack(self.endian + "8f", raw[76:108])
        self.pixdim = tuple(float(p) for p in pixdim[1 : 1 + ndim])
        (self.vox_offset,) = struct.unpack(self.endian + "f", raw[108:112])

    @property
    def np_dtype(self):
        if self.datatype not in _DTYPES:
            raise ValueError(f"unsupported Analyze datatype {self.datatype}")
        return np.dtype(_DTYPES[self.datatype]).newbyteorder(self.endian)


def _img_path(path: str) -> Tuple[str, str]:
    base, ext = os.path.splitext(path)
    if ext.lower() == ".img":
        return base + ".hdr", path
    if ext.lower() == ".hdr":
        return path, base + ".img"
    raise ValueError(f"expected .img/.hdr path, got {path}")


def _read_numpy(hdr: AnalyzeHeader, img_file: str) -> np.ndarray:
    count = int(np.prod(hdr.shape))
    data = np.fromfile(
        img_file, dtype=hdr.np_dtype, count=count, offset=int(hdr.vox_offset)
    )
    if data.size != count:
        raise ValueError(f"{img_file}: expected {count} voxels, got {data.size}")
    # Analyze stores Fortran (x fastest) order
    return data.reshape(hdr.shape, order="F").astype(np.float32)


_native = None


def _load_native():
    global _native
    if _native is not None:
        return _native
    import ctypes

    so = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                      "libanalyze.so")
    if not os.path.exists(so):
        _native = False
        return False
    lib = ctypes.CDLL(os.path.abspath(so))
    lib.analyze_decode.argtypes = [
        ctypes.c_char_p,        # img path
        ctypes.c_longlong,      # voxel count
        ctypes.c_longlong,      # byte offset
        ctypes.c_int,           # datatype code
        ctypes.c_int,           # 1 if byteswap needed
        ctypes.POINTER(ctypes.c_float),  # out buffer
    ]
    lib.analyze_decode.restype = ctypes.c_int
    _native = lib
    return lib


def read_analyze(path: str, use_native: bool = True) -> np.ndarray:
    """Read an Analyze volume (either .img or .hdr path) as float32."""
    hdr_file, img_file = _img_path(path)
    hdr = AnalyzeHeader(hdr_file)

    lib = _load_native() if use_native else False
    if lib and hdr.datatype in (2, 4, 8, 16):
        import ctypes

        count = int(np.prod(hdr.shape))
        out = np.empty(count, np.float32)
        swap = int(hdr.np_dtype.byteorder == (">" if np.little_endian else "<"))
        rc = lib.analyze_decode(
            img_file.encode(), count, int(hdr.vox_offset), int(hdr.datatype),
            swap, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc == 0:
            return out.reshape(hdr.shape, order="F")
        # fall through to numpy on native failure
    return _read_numpy(hdr, img_file)
