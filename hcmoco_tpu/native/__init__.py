"""ctypes binding for the native preprocessing core (preproc.cpp).

Builds on demand with `make` (g++ -O3 -shared); all callers fall back to
numpy implementations when the compiler or library is unavailable."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libhcmoco_preproc.so")
_lock = threading.Lock()
_lib_cache: Optional["NativeLib"] = None
_tried = False


class NativeLib:
    def __init__(self, cdll):
        self._c = cdll
        c = cdll
        c.parse_skeleton.restype = ctypes.c_long
        c.parse_skeleton.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_long]
        c.ransac_homography.restype = ctypes.c_long
        c.ransac_homography.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_long, ctypes.c_double, ctypes.c_long, ctypes.c_long,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")]
        c.warp_perspective_u8.restype = ctypes.c_int
        c.warp_perspective_u8.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_long, ctypes.c_long]

    def parse_skeleton(self, path: str,
                       max_records: int = 1 << 20) -> Optional[np.ndarray]:
        buf = np.empty((max_records, 10), np.float64)
        n = self._c.parse_skeleton(path.encode(), buf, max_records)
        if n < 0:
            if n == -1:
                return None
            # buffer too small; retry sized
            buf = np.empty((-n, 10), np.float64)
            n = self._c.parse_skeleton(path.encode(), buf, -n)
            if n < 0:
                return None
        return buf[:n].copy()

    def ransac_homography(self, src: np.ndarray, dst: np.ndarray,
                          thresh: float, iters: int,
                          seed: int) -> Optional[np.ndarray]:
        src = np.ascontiguousarray(src, np.float64)
        dst = np.ascontiguousarray(dst, np.float64)
        out = np.empty(9, np.float64)
        n = self._c.ransac_homography(src, dst, len(src), thresh, iters,
                                      seed, out)
        if n < 0:
            return None
        return out.reshape(3, 3)

    def warp_perspective(self, img: np.ndarray, h_inv: np.ndarray,
                         out_size: Tuple[int, int]) -> Optional[np.ndarray]:
        img = np.ascontiguousarray(img, np.uint8)
        w, hh = out_size
        out = np.empty((hh, w, img.shape[2]), np.uint8)
        rc = self._c.warp_perspective_u8(
            img, img.shape[0], img.shape[1], img.shape[2],
            np.ascontiguousarray(h_inv, np.float64).reshape(-1), out, hh, w)
        return out if rc == 0 else None


class ResampleLib:
    """Pixel-exact PIL resize replacement (resample.cpp): crop window read
    straight from the (mmap) frame + BILINEAR u8 / NEAREST u16 resample +
    flip, in one native call."""

    def __init__(self, cdll):
        self._c = cdll
        c = cdll
        c.resized_crop_u8.restype = ctypes.c_int
        c.resized_crop_u8.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")]
        c.resized_crop_nearest_u16.restype = ctypes.c_int
        c.resized_crop_nearest_u16.argtypes = [
            np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
            ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, ctypes.c_int,
            np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")]

    def resized_crop_u8(self, frame: np.ndarray, i: int, j: int, h: int,
                        w: int, out_hw: Tuple[int, int],
                        flip: bool = False,
                        out: Optional[np.ndarray] = None
                        ) -> Optional[np.ndarray]:
        """frame: (H, W, C) uint8 (C-contiguous; mmap slices fine).
        Returns (out_h, out_w, C) uint8, PIL-crop+BILINEAR-resize exact.
        `out`: optional preallocated C-contiguous destination (e.g. a batch
        slot) — the resample writes straight into it, skipping the
        per-sample allocation + collate copy."""
        if frame.ndim == 2:
            frame = frame[:, :, None]
        if not frame.flags["C_CONTIGUOUS"]:
            frame = np.ascontiguousarray(frame)
        oh, ow = out_hw
        if out is None:
            out = np.empty((oh, ow, frame.shape[2]), np.uint8)
        rc = self._c.resized_crop_u8(
            frame, frame.shape[0], frame.shape[1], frame.shape[2],
            i, j, h, w, oh, ow, int(flip), out)
        return out if rc == 0 else None

    def resized_crop_nearest_u16(self, frame: np.ndarray, i: int, j: int,
                                 h: int, w: int, out_hw: Tuple[int, int],
                                 flip: bool = False,
                                 out: Optional[np.ndarray] = None
                                 ) -> Optional[np.ndarray]:
        if not frame.flags["C_CONTIGUOUS"]:
            frame = np.ascontiguousarray(frame)
        oh, ow = out_hw
        if out is None:
            out = np.empty((oh, ow), np.uint16)
        rc = self._c.resized_crop_nearest_u16(
            frame, frame.shape[0], frame.shape[1],
            i, j, h, w, oh, ow, int(flip), out)
        return out if rc == 0 else None


_RESAMPLE_SO = os.path.join(_HERE, "libhcmoco_resample.so")
_resample_cache: Optional["ResampleLib"] = None
_resample_tried = False


def build_native(verbose: bool = False) -> bool:
    try:
        r = subprocess.run(["make", "-C", _HERE], capture_output=True,
                           timeout=120)
        if verbose and r.returncode != 0:
            print(r.stdout.decode(), r.stderr.decode())
        return r.returncode == 0 and os.path.exists(_SO)
    except Exception:
        return False


def native_lib() -> Optional[NativeLib]:
    """Load (building if needed) the native core; None if unavailable."""
    global _lib_cache, _tried
    with _lock:
        if _lib_cache is not None or _tried:
            return _lib_cache
        _tried = True
        if os.environ.get("HCMOCO_NO_NATIVE"):
            # escape hatch: force the pure-python fallback even when the
            # .so already exists (debugging pixel/input discrepancies)
            return None
        if not os.path.exists(_SO):
            if not build_native():
                return None
        try:
            _lib_cache = NativeLib(ctypes.CDLL(_SO))
        except OSError:
            _lib_cache = None
        return _lib_cache


def resample_lib() -> Optional[ResampleLib]:
    """Load (building if needed) the native resample core; None if
    unavailable (callers fall back to PIL — identical pixels either way)."""
    global _resample_cache, _resample_tried
    with _lock:
        if _resample_cache is not None or _resample_tried:
            return _resample_cache
        _resample_tried = True
        if os.environ.get("HCMOCO_NO_NATIVE"):
            return None
        if not os.path.exists(_RESAMPLE_SO):
            if not build_native():
                return None
        if not os.path.exists(_RESAMPLE_SO):
            return None
        try:
            _resample_cache = ResampleLib(ctypes.CDLL(_RESAMPLE_SO))
        except OSError:
            _resample_cache = None
        return _resample_cache
