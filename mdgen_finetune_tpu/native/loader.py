"""ctypes bindings + on-demand build for the C++ batch loader.

The shared library is compiled once per environment (g++ -O3 -pthread) into
the package directory; ``NativeLoader`` exposes the same batch-dict iterator
interface as the Python ``make_batch_iterator`` so the trainer can swap it in
transparently. Falls back with ImportError if no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_loader.so")
_SRC = os.path.join(_DIR, "loader.cpp")


def build_native_library(force: bool = False) -> str:
    if os.path.exists(_SO) and not force and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_native_library())
        lib.ld_create.restype = ctypes.c_void_p
        lib.ld_create.argtypes = [ctypes.c_int64] * 4 + [ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64]
        lib.ld_add_traj.restype = ctypes.c_int
        lib.ld_add_traj.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
        lib.ld_start.restype = ctypes.c_int
        lib.ld_start.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.ld_next.restype = ctypes.c_int
        lib.ld_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.ld_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativeLoader:
    """Iterator of {atom14, seqres, mask} batches backed by the C++ loader."""

    def __init__(
        self,
        files: list[tuple[str, np.ndarray]],  # (npy_path, aatype int32 (L,))
        batch_size: int,
        num_frames: int,
        crop: int,
        frame_interval: Optional[int] = None,
        seed: int = 0,
        n_threads: int = 2,
        max_queue: int = 4,
    ):
        lib = _load()
        self._lib = lib
        self._handle = lib.ld_create(
            batch_size, num_frames, crop, frame_interval or 1, seed, n_threads, max_queue
        )
        n_added = 0
        for path, aatype in files:
            aat = np.ascontiguousarray(np.asarray(aatype, dtype=np.int32))
            rc = lib.ld_add_traj(
                self._handle, path.encode(), aat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(aat)
            )
            if rc == 0:
                n_added += 1
        if not n_added:
            raise FileNotFoundError("native loader: no usable trajectories")
        if lib.ld_start(self._handle, n_threads) != 0:
            raise RuntimeError("native loader failed to start")
        self.B, self.T, self.C = batch_size, num_frames, crop

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        atom14 = np.empty((self.B, self.T, self.C, 14, 3), np.float32)
        seqres = np.empty((self.B, self.C), np.int32)
        mask = np.empty((self.B, self.C), np.float32)
        rc = self._lib.ld_next(
            self._handle,
            atom14.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            seqres.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise StopIteration
        return {"atom14": atom14, "seqres": seqres, "mask": mask}

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.ld_destroy(self._handle)
            self._handle = None

    def __del__(self):
        self.close()
