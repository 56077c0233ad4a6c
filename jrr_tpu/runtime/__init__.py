"""ctypes bindings + build for the native (C++) host runtime.

See jrr_runtime.cc for what lives natively and why. The library builds on
first use (g++ -O3 -shared) into this directory; no packaging machinery.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "jrr_runtime.cc")
_LIB = os.path.join(_DIR, "libjrr_runtime.so")
_MAGIC = 0x314B434150525252

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def build_library(force: bool = False) -> str:
    with _lock:
        if force or not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
                 "-pthread", _SRC, "-o", _LIB],
                check=True, capture_output=True,
            )
    return _LIB


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    build_library()
    lib = ctypes.CDLL(_LIB)
    lib.jrr_warp_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.jrr_pack_open.restype = ctypes.c_void_p
    lib.jrr_pack_open.argtypes = [ctypes.c_char_p]
    lib.jrr_pack_num_frames.restype = ctypes.c_int64
    lib.jrr_pack_num_frames.argtypes = [ctypes.c_void_p]
    lib.jrr_pack_close.argtypes = [ctypes.c_void_p]
    lib.jrr_pack_load_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.jrr_pack2_open.restype = ctypes.c_void_p
    lib.jrr_pack2_open.argtypes = [ctypes.c_char_p]
    lib.jrr_pack2_num_frames.restype = ctypes.c_int64
    lib.jrr_pack2_num_frames.argtypes = [ctypes.c_void_p]
    lib.jrr_pack2_close.argtypes = [ctypes.c_void_p]
    lib.jrr_pack2_load_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    _lib = lib
    return lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def warp_batch(
    images_u8: np.ndarray, homographies: np.ndarray, out_shape: Tuple[int, int],
    num_threads: int = 0,
) -> np.ndarray:
    """(B, H, W, C) uint8 + (B, 3, 3) → (B, C, OH, OW) float32 in [0, 1]."""
    lib = _load()
    images_u8 = np.ascontiguousarray(images_u8)
    homo = np.ascontiguousarray(homographies, dtype=np.float32)
    b, h, w, c = images_u8.shape
    oh, ow = out_shape
    out = np.empty((b, c, oh, ow), np.float32)
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    lib.jrr_warp_batch(_ptr(images_u8), b, h, w, c, _ptr(homo), _ptr(out), oh, ow, num_threads)
    return out


def write_pack(
    path: str, images_u8: np.ndarray, masks_u8: np.ndarray
) -> None:
    """Write the pack file: (N, H, W, C) images + (N, MH, MW) masks, uint8."""
    n, h, w, c = images_u8.shape
    mh, mw = masks_u8.shape[1:]
    with open(path, "wb") as f:
        f.write(struct.pack("<QQIIIII4x", _MAGIC, n, h, w, c, mh, mw))
        for i in range(n):
            f.write(np.ascontiguousarray(images_u8[i]).tobytes())
            f.write(np.ascontiguousarray(masks_u8[i]).tobytes())


_MAGIC2 = 0x324B434150525252


class Pack2Writer:
    """Streaming writer for the PRE-WARPED pack (v2): uint8 CHW crops with
    the warp already applied + float32 crop meta per frame. Decode+warp are
    paid once here; `Pack2Reader.load_batch` is then a straight u8→f32
    conversion (BASELINE.md round 4, VERDICT r3 item 7)."""

    def __init__(self, path: str, num_frames: int, spin_res: int, img_res: int,
                 channels: int, mask_h: int, mask_w: int):
        self._f = open(path, "wb")
        self._f.write(struct.pack(
            "<QQIIIII4x", _MAGIC2, num_frames, spin_res, img_res, channels,
            mask_h, mask_w,
        ))

    def append(self, spin_u8: np.ndarray, image_u8: np.ndarray,
               mask_u8: np.ndarray, meta_f32: np.ndarray) -> None:
        """Append a chunk of frames: (B,C,S,S)+(B,C,I,I)+(B,MH,MW) u8, (B,3) f32."""
        for k in range(spin_u8.shape[0]):
            self._f.write(np.ascontiguousarray(spin_u8[k]).tobytes())
            self._f.write(np.ascontiguousarray(image_u8[k]).tobytes())
            self._f.write(np.ascontiguousarray(mask_u8[k]).tobytes())
            self._f.write(
                np.ascontiguousarray(meta_f32[k], dtype=np.float32).tobytes()
            )

    def close(self):
        self._f.close()


def write_pack2(
    path: str, spin_u8: np.ndarray, image_u8: np.ndarray, mask_u8: np.ndarray,
    meta_f32: np.ndarray,
) -> None:
    """One-shot v2 pack write (small datasets / tests); see Pack2Writer."""
    n, c, s, _ = spin_u8.shape
    w = Pack2Writer(
        path, n, s, image_u8.shape[-1], c, mask_u8.shape[1], mask_u8.shape[2]
    )
    w.append(spin_u8, image_u8, mask_u8, np.asarray(meta_f32, np.float32))
    w.close()


class Pack2Reader:
    """Memory-mapped pre-warped pack: steady-state load ≈ memcpy."""

    def __init__(self, path: str, num_threads: int = 0):
        self._lib = _load()
        self._handle = self._lib.jrr_pack2_open(path.encode())
        if not self._handle:
            raise IOError(f"failed to open pack2: {path}")
        self.num_frames = int(self._lib.jrr_pack2_num_frames(self._handle))
        with open(path, "rb") as f:
            header = f.read(40)
        (_, _, self.spin_res, self.img_res, self.img_c, self.mask_h,
         self.mask_w) = struct.unpack("<QQIIIII", header[:36])
        self.num_threads = num_threads if num_threads > 0 else min(8, os.cpu_count() or 1)

    def load_batch(self, indices: np.ndarray):
        """Returns dict(spin_image, image, mask, min_x, min_y, scale) —
        identical contract to PackReader.load_batch (bboxes are baked in)."""
        b = len(indices)
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        spin = np.empty((b, self.img_c, self.spin_res, self.spin_res), np.float32)
        image = np.empty((b, self.img_c, self.img_res, self.img_res), np.float32)
        mask = np.empty((b, self.mask_h, self.mask_w), np.float32)
        meta = np.empty((b, 3), np.float32)
        self._lib.jrr_pack2_load_batch(
            self._handle, _ptr(idx), b, _ptr(spin), _ptr(image), _ptr(mask),
            _ptr(meta), self.num_threads,
        )
        return {
            "spin_image": spin, "image": image, "mask": mask,
            "min_x": meta[:, 0].copy(), "min_y": meta[:, 1].copy(),
            "scale": meta[:, 2].copy(),
        }

    def close(self):
        if self._handle:
            self._lib.jrr_pack2_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PackReader:
    """Memory-mapped pack + threaded native batch assembly."""

    def __init__(self, path: str, num_threads: int = 0):
        self._lib = _load()
        self._handle = self._lib.jrr_pack_open(path.encode())
        if not self._handle:
            raise IOError(f"failed to open pack: {path}")
        self.num_frames = int(self._lib.jrr_pack_num_frames(self._handle))
        with open(path, "rb") as f:
            header = f.read(40)
        (_, _, self.img_h, self.img_w, self.img_c, self.mask_h, self.mask_w) = struct.unpack(
            "<QQIIIII", header[:36]
        )
        self.num_threads = num_threads if num_threads > 0 else min(8, os.cpu_count() or 1)

    def load_batch(
        self, indices: np.ndarray, bboxes: np.ndarray,
        spin_res: int = 224, img_res: int = 256,
    ):
        """Returns dict(spin_image, image, mask, min_x, min_y, scale)."""
        b = len(indices)
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        bb = np.ascontiguousarray(bboxes, dtype=np.float32)
        spin = np.empty((b, self.img_c, spin_res, spin_res), np.float32)
        image = np.empty((b, self.img_c, img_res, img_res), np.float32)
        mask = np.empty((b, self.mask_h, self.mask_w), np.float32)
        meta = np.empty((b, 3), np.float32)
        self._lib.jrr_pack_load_batch(
            self._handle, _ptr(idx), b, _ptr(bb), _ptr(spin), spin_res,
            _ptr(image), img_res, _ptr(mask), _ptr(meta), self.num_threads,
        )
        return {
            "spin_image": spin, "image": image, "mask": mask,
            "min_x": meta[:, 0].copy(), "min_y": meta[:, 1].copy(),
            "scale": meta[:, 2].copy(),
        }

    def close(self):
        if self._handle:
            self._lib.jrr_pack_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
