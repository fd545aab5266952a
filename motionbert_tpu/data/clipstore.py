"""Python bindings for the native clip store (native/clipstore.cpp).

ClipStore packs a whole clip dataset (the MB3D file-per-clip pickle dir)
into one flat f32 file served by mmap + a C++ memcpy thread pool — the
native replacement for the reference's 12-process pickle DataLoader
(train.py:219-240). Build happens on demand (g++, ~1s) and is cached.

    store = ClipStore("train.mbcs")
    inputs, labels = store.gather([3, 1, 4])   # batch gather, no Python
    ds = ClipStoreDataset3D("train.mbcs")      # MotionDataset3D-compatible
    # (flip augmentation is applied on-device inside the jitted train
    #  step from the config's `flip` key, not by the dataset)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_MAGIC = 0x5343424D  # "MBCS"
_HEADER_BYTES = 64
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _lib_path() -> str:
    return os.path.abspath(os.path.join(_NATIVE_DIR, "libclipstore.so"))


def build_native(force: bool = False) -> str:
    """Compile the shared library if missing; returns its path."""
    so = _lib_path()
    src = os.path.join(os.path.dirname(so), "clipstore.cpp")
    if not os.path.exists(src):  # deployed with a prebuilt .so only
        if os.path.exists(so) and not force:
            return so
        raise FileNotFoundError(f"cannot (re)build {so}: missing {src}")
    if force or not os.path.exists(so) or (
            os.path.getmtime(src) > os.path.getmtime(so)):
        # compile to a per-pid temp then rename: two processes building
        # concurrently (e.g. parallel trainers on a fresh checkout) must
        # not read each other's half-written .so
        tmp = f"{so}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-pthread", "-shared",
             "-o", tmp, src],
            check=True, capture_output=True)
        os.replace(tmp, so)
    return so


_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_native())
        lib.mbcs_open.restype = ctypes.c_void_p
        lib.mbcs_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.mbcs_info.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32)]
        lib.mbcs_gather.restype = ctypes.c_int
        lib.mbcs_gather.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.mbcs_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def write_clipstore(path: str, labels: np.ndarray,
                    inputs: Optional[np.ndarray] = None):
    """Pack (N, T, J, C) float32 clip arrays into the MBCS format."""
    labels = np.ascontiguousarray(labels, np.float32)
    n, T, J, C = labels.shape
    has_input = inputs is not None
    if has_input:
        inputs = np.ascontiguousarray(inputs, np.float32)
        assert inputs.shape == labels.shape
    header = np.zeros(_HEADER_BYTES, np.uint8)
    header[:4].view(np.uint32)[0] = _MAGIC
    header[4:8].view(np.uint32)[0] = 1  # version
    header[8:16].view(np.uint64)[0] = n
    header[16:20].view(np.uint32)[0] = 1 if has_input else 0
    header[20:24].view(np.uint32)[0] = T
    header[24:28].view(np.uint32)[0] = J
    header[28:32].view(np.uint32)[0] = C
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        header.tofile(f)
        if has_input:
            inputs.tofile(f)
        labels.tofile(f)


class ClipStore:
    def __init__(self, path: str, n_threads: int = 8):
        self._lib = _load_lib()
        self._h = self._lib.mbcs_open(path.encode(), n_threads)
        if not self._h:
            raise OSError(f"cannot open clip store {path!r}")
        n = ctypes.c_uint64()
        T = ctypes.c_uint32()
        J = ctypes.c_uint32()
        C = ctypes.c_uint32()
        hi = ctypes.c_uint32()
        self._lib.mbcs_info(self._h, ctypes.byref(n), ctypes.byref(T),
                            ctypes.byref(J), ctypes.byref(C),
                            ctypes.byref(hi))
        self.n_clips = int(n.value)
        self.shape = (int(T.value), int(J.value), int(C.value))
        self.has_input = bool(hi.value)

    def __len__(self):
        return self.n_clips

    def gather(self, indices: Sequence[int], want_input: bool = True):
        """Batch gather -> (inputs or None, labels), each (B, T, J, C).

        want_input=False skips the input-stream copy (mbcs_gather accepts
        a NULL out_input) — callers that substitute inputs from labels
        (synthetic/gt_2d) shouldn't pay a second full-batch memcpy."""
        if self._h is None:
            # a NULL handle would be dereferenced by the native code —
            # SIGSEGV of the whole process instead of an exception
            raise ValueError("clip store is closed")
        idx = np.ascontiguousarray(indices, np.int64)
        B = len(idx)
        labels = np.empty((B,) + self.shape, np.float32)
        inputs = np.empty((B,) + self.shape, np.float32) \
            if (self.has_input and want_input) else None
        rc = self._lib.mbcs_gather(
            self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), B,
            inputs.ctypes.data_as(ctypes.c_void_p) if inputs is not None
            else None,
            labels.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise IndexError("clip index out of range")
        return inputs, labels

    def close(self):
        if self._h:
            self._lib.mbcs_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class ClipStoreDataset3D:
    """MotionDataset3D-compatible view over a ClipStore, plus the fast
    `get_batch` path BatchLoader uses when available (one native gather per
    batch instead of per-item Python)."""

    def __init__(self, path: str, synthetic: bool = False,
                 gt_2d: bool = False, scale_range_pretrain=None,
                 data_split: str = "train"):
        from motionbert_tpu.data.datasets import EpochSeededRNG

        self.store = ClipStore(path)
        self.synthetic = synthetic
        self.gt_2d = gt_2d
        self.scale_range_pretrain = scale_range_pretrain
        self.data_split = data_split
        self._rng = EpochSeededRNG()
        self.set_epoch = self._rng.set_epoch  # BatchLoader hook

    def __len__(self):
        return len(self.store)

    def _postprocess(self, inputs, labels, indices):
        from motionbert_tpu.geometry.transforms import crop_scale_3d

        if self.data_split == "train" and (self.synthetic or self.gt_2d):
            if self.scale_range_pretrain:
                labels = np.stack([
                    crop_scale_3d(m, self.scale_range_pretrain,
                                  rng=self._rng.item_rng(int(i)))
                    for i, m in zip(indices, labels)]).astype(np.float32)
            inputs = np.zeros_like(labels)
            inputs[..., :2] = labels[..., :2]
            inputs[..., 2] = 1.0
        elif self.data_split == "test" and self.gt_2d:
            # MotionDataset3D's test branch (datasets.py): evaluate on GT
            # xy with confidence 1 instead of detector 2D. Built from the
            # labels so labels-only stores (data_input=None) work too.
            inputs = np.zeros_like(labels)
            inputs[..., :2] = labels[..., :2]
            inputs[..., 2] = 1.0
        elif inputs is None:
            raise ValueError(
                "store has no input stream and no synthetic/gt_2d "
                f"substitution applies (split={self.data_split!r}, "
                f"synthetic={self.synthetic}, gt_2d={self.gt_2d})")
        return inputs, labels

    def _substitutes_inputs(self) -> bool:
        return (self.data_split == "train"
                and (self.synthetic or self.gt_2d)) or \
               (self.data_split == "test" and self.gt_2d)

    def get_batch(self, indices):
        # skip the input-stream memcpy entirely when _postprocess is about
        # to rebuild inputs from the labels (halves native copy volume)
        inputs, labels = self.store.gather(
            indices, want_input=not self._substitutes_inputs())
        return self._postprocess(inputs, labels, indices)

    def __getitem__(self, index):
        inputs, labels = self.get_batch([index])
        return inputs[0], labels[0]
