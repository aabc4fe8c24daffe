"""Native (C++) runtime components, ctypes-bound.

Currently: the RLE mask codec (rle.cpp) — the self-built replacement for
pycocotools' C maskApi (absent in this image). The shared library is built
on first import with g++ (cached next to the source); a pure-NumPy fallback
keeps everything working without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "rle.cpp")
_LIB = os.path.join(_DIR, "_rle.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            return None
    lib = ctypes.CDLL(_LIB)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.rle_encode.restype = ctypes.c_int64
    lib.rle_encode.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, u32p]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [u32p, ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_int64, u8p]
    lib.rle_area.restype = ctypes.c_uint64
    lib.rle_area.argtypes = [u32p, ctypes.c_int64]
    lib.rle_iou.restype = None
    lib.rle_iou.argtypes = [u32p, i64p, i64p, ctypes.c_int64,
                            u32p, i64p, i64p, ctypes.c_int64, u8p, f64p]
    lib.rle_merge.restype = ctypes.c_int64
    lib.rle_merge.argtypes = [u32p, ctypes.c_int64, u32p, ctypes.c_int64,
                              ctypes.c_int, u32p]
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.rle_paste.restype = ctypes.c_int64
    lib.rle_paste.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64,
                              ctypes.c_int64, ctypes.c_double, u32p]
    lib.rle_to_string.restype = ctypes.c_int64
    lib.rle_to_string.argtypes = [u32p, ctypes.c_int64, ctypes.c_char_p]
    lib.rle_from_string.restype = ctypes.c_int64
    lib.rle_from_string.argtypes = [ctypes.c_char_p, ctypes.c_int64, u32p]
    _lib = lib
    return lib


def have_native() -> bool:
    return _load() is not None


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


class RLE:
    """A single RLE mask: (h, w, counts uint32 array, column-major)."""

    __slots__ = ("h", "w", "counts")

    def __init__(self, h: int, w: int, counts: np.ndarray):
        self.h, self.w = int(h), int(w)
        self.counts = np.ascontiguousarray(counts, np.uint32)

    # -------------------------------------------------------------- codec
    @staticmethod
    def encode(mask: np.ndarray) -> "RLE":
        """mask: [H, W] bool/uint8 (row-major input; scanned column-major)."""
        h, w = mask.shape
        col = np.ascontiguousarray(mask.T.reshape(-1).astype(np.uint8))
        lib = _load()
        if lib is None:  # numpy fallback
            diff = np.nonzero(np.diff(col))[0] + 1
            edges = np.concatenate([[0], diff, [col.size]])
            counts = np.diff(edges)
            if col.size and col[0] == 1:
                counts = np.concatenate([[0], counts])
            return RLE(h, w, counts.astype(np.uint32))
        out = np.empty(h * w + 1, np.uint32)
        m = lib.rle_encode(_ptr(col, ctypes.c_uint8), h, w,
                           _ptr(out, ctypes.c_uint32))
        return RLE(h, w, out[:m].copy())

    def decode(self) -> np.ndarray:
        lib = _load()
        if lib is None:
            vals = np.zeros(len(self.counts), np.uint8)
            vals[1::2] = 1
            col = np.repeat(vals, self.counts)
            col = np.pad(col, (0, self.h * self.w - col.size))
            return col.reshape(self.w, self.h).T.astype(bool)
        out = np.empty(self.h * self.w, np.uint8)
        lib.rle_decode(_ptr(self.counts, ctypes.c_uint32), len(self.counts),
                       self.h, self.w, _ptr(out, ctypes.c_uint8))
        return out.reshape(self.w, self.h).T.astype(bool)

    def area(self) -> int:
        lib = _load()
        if lib is None:
            return int(self.counts[1::2].sum())
        return int(lib.rle_area(_ptr(self.counts, ctypes.c_uint32),
                                len(self.counts)))

    # ------------------------------------------------------------- string
    def to_string(self) -> str:
        lib = _load()
        if lib is None:
            raise RuntimeError("native RLE library unavailable")
        buf = ctypes.create_string_buffer(6 * len(self.counts) + 1)
        n = lib.rle_to_string(_ptr(self.counts, ctypes.c_uint32),
                              len(self.counts), buf)
        return buf.raw[:n].decode("ascii")

    @staticmethod
    def from_string(s: str, h: int, w: int) -> "RLE":
        lib = _load()
        if lib is None:
            raise RuntimeError("native RLE library unavailable")
        raw = s.encode("ascii")
        out = np.empty(len(raw) + 1, np.uint32)
        m = lib.rle_from_string(raw, len(raw), _ptr(out, ctypes.c_uint32))
        return RLE(h, w, out[:m].copy())

    def to_coco(self) -> dict:
        """COCO results-JSON segmentation entry."""
        return {"size": [self.h, self.w], "counts": self.to_string()}


def rle_iou(a: list, b: list, iscrowd=None) -> np.ndarray:
    """Pairwise IoU between two lists of RLEs. iscrowd: per-b bool."""
    na, nb = len(a), len(b)
    if na == 0 or nb == 0:
        return np.zeros((na, nb))
    lib = _load()
    if lib is None:  # dense fallback
        from detectron_tpu.eval.coco_eval import mask_iou_matrix

        return mask_iou_matrix(
            [x.decode() for x in a], [x.decode() for x in b],
            crowd=np.asarray(iscrowd, bool) if iscrowd is not None else None,
        )
    ca = np.concatenate([x.counts for x in a]).astype(np.uint32)
    cb = np.concatenate([x.counts for x in b]).astype(np.uint32)
    la = np.array([len(x.counts) for x in a], np.int64)
    lb = np.array([len(x.counts) for x in b], np.int64)
    oa = np.concatenate([[0], np.cumsum(la)[:-1]]).astype(np.int64)
    ob = np.concatenate([[0], np.cumsum(lb)[:-1]]).astype(np.int64)
    crowd = np.asarray(
        iscrowd if iscrowd is not None else np.zeros(nb), np.uint8
    )
    out = np.empty(na * nb, np.float64)
    lib.rle_iou(
        _ptr(ca, ctypes.c_uint32), _ptr(oa, ctypes.c_int64),
        _ptr(la, ctypes.c_int64), na,
        _ptr(cb, ctypes.c_uint32), _ptr(ob, ctypes.c_int64),
        _ptr(lb, ctypes.c_int64), nb,
        _ptr(crowd, ctypes.c_uint8), _ptr(out, ctypes.c_double),
    )
    return out.reshape(na, nb)


def rle_merge(a: RLE, b: RLE, intersect: bool = False) -> RLE:
    lib = _load()
    if lib is None:
        ma, mb = a.decode(), b.decode()
        return RLE.encode(np.logical_and(ma, mb) if intersect
                          else np.logical_or(ma, mb))
    out = np.empty(len(a.counts) + len(b.counts) + 2, np.uint32)
    m = lib.rle_merge(_ptr(a.counts, ctypes.c_uint32), len(a.counts),
                      _ptr(b.counts, ctypes.c_uint32), len(b.counts),
                      1 if intersect else 0, _ptr(out, ctypes.c_uint32))
    return RLE(a.h, a.w, out[:m].copy())
