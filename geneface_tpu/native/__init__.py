"""ctypes bindings for the native (C++) runtime library.

Provides two components (see ``src/gf_native.cpp``):

- :class:`NativeBatchLoader` — threaded pixel-batch assembler with a bounded
  prefetch queue (gather gt/bg pixels + torso-over-bg composite per sampled
  ray, all uint8). The native analog of the reference's torch DataLoader
  workers feeding ``RADNeRFDataset`` (``tasks/radnerfs/dataset_utils.py``).
- :class:`NativeStore` — mmap'd raw-record reads for the IndexedDataset
  container (``utils/commons/indexed_datasets.py``); used by
  :class:`geneface_tpu.utils.indexed_dataset.IndexedDataset` when available.

Import never fails: if g++ or the build is unavailable, ``AVAILABLE`` is
False and callers fall back to the pure-numpy paths.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

__all__ = ["AVAILABLE", "NativeBatchLoader", "NativeStore", "load_library"]

_LIB = None
AVAILABLE = False


def load_library():
    """Load (building if needed) the shared library; returns None on failure."""
    global _LIB, AVAILABLE
    if _LIB is not None:
        return _LIB
    try:
        from geneface_tpu.native.build import build

        path = build(quiet=True)
        lib = ctypes.CDLL(path)
    except Exception:
        return None

    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_i64p = ctypes.POINTER(ctypes.c_int64)

    lib.gf_loader_create.restype = ctypes.c_void_p
    lib.gf_loader_create.argtypes = [
        c_u8p, c_u8p, ctypes.c_int, c_u8p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
    ]
    lib.gf_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.gf_loader_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.gf_loader_wait.restype = ctypes.c_int64
    lib.gf_loader_wait.argtypes = [ctypes.c_void_p, c_i32p, c_u8p, c_u8p, c_u8p]
    lib.gf_gather.argtypes = [
        c_u8p, c_u8p, ctypes.c_int, c_u8p, ctypes.c_int64, ctypes.c_int64,
        c_i32p, ctypes.c_int64, c_u8p, c_u8p, c_u8p,
    ]
    lib.gf_store_open.restype = ctypes.c_void_p
    lib.gf_store_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, c_i64p,
    ]
    lib.gf_store_close.argtypes = [ctypes.c_void_p]
    lib.gf_store_read.restype = ctypes.c_int
    lib.gf_store_read.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, c_u8p,
    ]
    lib.gf_store_prefetch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
    ]

    _LIB = lib
    AVAILABLE = True
    return lib


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class NativeBatchLoader:
    """Threaded prefetching gather of (inds, gt, bg, bg_torso) ray batches.

    Frames are held as contiguous uint8 planes owned by the caller (numpy
    arrays; references are kept here to pin their lifetime):

    - ``gt``    [T, HW, 3] uint8
    - ``torso`` [T, HW, 4] uint8 (straight alpha) or [T, HW, 3]
    - ``bg``    [HW, 3] uint8

    ``submit()`` enqueues a batch job (uniform random pixels, or a fixed rect
    for lip patches); ``wait()`` returns the oldest submitted batch. Results
    come back in submit order regardless of worker scheduling.
    """

    def __init__(self, gt, torso, bg, n_threads: int = 2, depth: int = 4):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.gt = np.ascontiguousarray(gt, np.uint8)
        self.torso = np.ascontiguousarray(torso, np.uint8)
        self.bg = np.ascontiguousarray(bg, np.uint8)
        assert self.gt.ndim == 3 and self.gt.shape[-1] == 3
        assert self.torso.ndim == 3 and self.torso.shape[-1] in (3, 4)
        assert self.bg.ndim == 2 and self.bg.shape[-1] == 3
        self.T, self.HW = self.gt.shape[0], self.gt.shape[1]
        self._h = lib.gf_loader_create(
            _u8p(self.gt), _u8p(self.torso), self.torso.shape[-1],
            _u8p(self.bg), self.T, self.HW, n_threads, depth,
        )
        self._pending = []  # payload n per in-flight job

    def submit(self, frame: int, n_rays: int, seed: int, rect=None, W: int = 0):
        """rect = (x0, y0, h, w) row-major grid; otherwise uniform random."""
        if rect is not None:
            x0, y0, h, w = [int(v) for v in rect]
            n = h * w
            self._lib.gf_loader_submit(self._h, frame, n, seed, x0, y0, h, w, W)
        else:
            n = int(n_rays)
            self._lib.gf_loader_submit(self._h, frame, n, seed, 0, 0, 0, 0, 0)
        self._pending.append(n)

    def wait(self):
        """Returns (inds [n] i32, gt [n,3] u8, bg [n,3] u8, bg_torso [n,3] u8)."""
        n = self._pending.pop(0)
        inds = np.empty((n,), np.int32)
        gt = np.empty((n, 3), np.uint8)
        bg = np.empty((n, 3), np.uint8)
        bgt = np.empty((n, 3), np.uint8)
        got = self._lib.gf_loader_wait(
            self._h,
            inds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            _u8p(gt), _u8p(bg), _u8p(bgt),
        )
        assert got == n, (got, n)
        return inds, gt, bg, bgt

    def gather(self, frame: int, inds: np.ndarray):
        """Synchronous gather for caller-provided indices (no queue)."""
        inds = np.ascontiguousarray(inds, np.int32)
        n = inds.shape[0]
        gt = np.empty((n, 3), np.uint8)
        bg = np.empty((n, 3), np.uint8)
        bgt = np.empty((n, 3), np.uint8)
        self._lib.gf_gather(
            _u8p(self.gt[frame]), _u8p(self.torso[frame]),
            self.torso.shape[-1], _u8p(self.bg), self.HW, 0,
            inds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
            _u8p(gt), _u8p(bg), _u8p(bgt),
        )
        return gt, bg, bgt

    def close(self):
        if self._h:
            self._lib.gf_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeStore:
    """mmap'd byte-range reads over IndexedDataset chunk files."""

    def __init__(self, chunk_paths: list[str], chunk_begin: list[int]):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        arr = (ctypes.c_char_p * len(chunk_paths))(
            *[p.encode() for p in chunk_paths]
        )
        begins = np.asarray(chunk_begin, np.int64)
        self._h = lib.gf_store_open(
            arr, len(chunk_paths),
            begins.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if not self._h:
            raise RuntimeError(f"gf_store_open failed for {chunk_paths}")

    def read(self, abs_off: int, length: int) -> bytes:
        out = np.empty((length,), np.uint8)
        rc = self._lib.gf_store_read(self._h, abs_off, length, _u8p(out))
        if rc != 0:
            raise IOError(f"gf_store_read({abs_off}, {length}) failed")
        return out.tobytes()

    def prefetch(self, abs_off: int, length: int) -> None:
        self._lib.gf_store_prefetch(self._h, abs_off, length)

    def close(self):
        if self._h:
            self._lib.gf_store_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
