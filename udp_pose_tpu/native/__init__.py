"""ctypes bindings for the C++ host data-plane library (native/).

Auto-builds ``libudppose.so`` on first import if the toolchain is present;
every entry point has a pure-numpy fallback so the framework works without
the native library (same posture as the reference, whose compiled NMS is a
hard import — here it degrades gracefully).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libudppose.so"
_lib = None


def _try_load():
    global _lib
    if _lib is not None:
        return _lib
    src = _NATIVE_DIR / "udppose_native.cpp"
    stale = (not _LIB_PATH.exists()
             or (src.exists()
                 and src.stat().st_mtime > _LIB_PATH.stat().st_mtime))
    if stale:
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR), "-B"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            if not _LIB_PATH.exists():
                return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.warp_affine_batch_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
    lib.greedy_nms.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
    lib.greedy_nms.restype = ctypes.c_int
    lib.oks_iou_native.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float)]
    lib.native_version.restype = ctypes.c_int
    if lib.native_version() >= 2:
        lib.resize_bilinear_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _try_load() is not None


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def warp_affine_batch(img: np.ndarray, matrices: np.ndarray,
                      out_hw) -> np.ndarray:
    """n crops from one uint8 HWC frame; matrices (n, 2, 3) dst→src.
    Falls back to a numpy implementation when the library is absent."""
    lib = _try_load()
    oh, ow = out_hw
    img = np.ascontiguousarray(img, np.uint8)
    mats = np.ascontiguousarray(matrices, np.float32).reshape(-1, 6)
    n = mats.shape[0]
    H, W, C = img.shape
    if lib is None:
        return _warp_batch_np(img, mats.reshape(n, 2, 3), (oh, ow))
    out = np.empty((n, oh, ow, C), np.float32)
    lib.warp_affine_batch_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, C,
        _fptr(mats), n, _fptr(out), oh, ow)
    return out


def _warp_batch_np(img, mats, out_hw):
    oh, ow = out_hw
    H, W, C = img.shape
    ys, xs = np.mgrid[0:oh, 0:ow].astype(np.float32)
    outs = []
    imgf = img.astype(np.float32)
    for M in mats:
        sx = M[0, 0] * xs + M[0, 1] * ys + M[0, 2]
        sy = M[1, 0] * xs + M[1, 1] * ys + M[1, 2]
        x0 = np.floor(sx).astype(int)
        y0 = np.floor(sy).astype(int)
        fx, fy = sx - x0, sy - y0
        acc = np.zeros((oh, ow, C), np.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                xi, yi = x0 + dx, y0 + dy
                inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                v = imgf[np.clip(yi, 0, H - 1), np.clip(xi, 0, W - 1)]
                wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                acc += v * (wgt * inb)[..., None]
        outs.append(acc)
    return np.stack(outs)


def greedy_nms(dets: np.ndarray, thresh: float, plus_one=True):
    """Kept indices, native when available (parity: ops/nms.nms_np)."""
    lib = _try_load()
    if lib is None:
        from ..ops.nms import nms_np
        return nms_np(np.asarray(dets), thresh, plus_one=plus_one)
    dets = np.ascontiguousarray(dets, np.float32)
    keep = np.empty((len(dets),), np.int32)
    n = lib.greedy_nms(_fptr(dets), len(dets), float(thresh),
                       int(bool(plus_one)),
                       keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:n].tolist()


def oks_iou(g, d, a_g, a_d, sigmas):
    lib = _try_load()
    if lib is None:
        from ..ops.nms import oks_iou as _oks
        return _oks(np.asarray(g), np.asarray(d), a_g, np.asarray(a_d),
                    np.asarray(sigmas))
    g = np.ascontiguousarray(g, np.float32)
    d = np.ascontiguousarray(d, np.float32)
    a_d = np.ascontiguousarray(a_d, np.float32)
    sig = np.ascontiguousarray(sigmas, np.float32)
    out = np.empty((d.shape[0],), np.float32)
    J = g.size // 3
    lib.oks_iou_native(_fptr(g), _fptr(d), d.shape[0], J, float(a_g),
                       _fptr(a_d), _fptr(sig), _fptr(out))
    return out


def resize_bilinear(img: np.ndarray, out_hw) -> np.ndarray:
    """cv2.resize(INTER_LINEAR)-style bilinear u8 resize (half-pixel
    centres, edge clamp).  Native OpenMP kernel when built; numpy
    fallback otherwise.  Used by the --low-bw host letterbox."""
    lib = _try_load()
    oh, ow = int(out_hw[0]), int(out_hw[1])
    img = np.ascontiguousarray(img, np.uint8)
    H, W, C = img.shape
    if lib is not None and lib.native_version() >= 2:
        out = np.empty((oh, ow, C), np.uint8)
        lib.resize_bilinear_u8(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W, C,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oh, ow)
        return out
    ys = np.clip((np.arange(oh) + 0.5) * H / oh - 0.5, 0, None)
    xs = np.clip((np.arange(ow) + 0.5) * W / ow - 0.5, 0, None)
    y0 = np.clip(ys.astype(int), 0, H - 1)
    x0 = np.clip(xs.astype(int), 0, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    ay = (ys - y0)[:, None, None]
    ax = (xs - x0)[None, :, None]
    f = img.astype(np.float32)
    v = ((f[y0][:, x0] * (1 - ay) + f[y1][:, x0] * ay) * (1 - ax)
         + (f[y0][:, x1] * (1 - ay) + f[y1][:, x1] * ay) * ax)
    return np.clip(v + 0.5, 0, 255).astype(np.uint8)
