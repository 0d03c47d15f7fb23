"""ctypes bindings for the native host-pipeline kernels (csrc/).

Counterpart of the reference's JIT-compiled extension loader
(/root/reference/modules/Extension.py + cpp/voxelutil.cpp, SURVEY.md §2
C1/C2) — but for the *host feed path only*: voxelization/IoU/assignment
live on the TPU in this framework (ops/), while the fused
crop+project+shuffle+pad that feeds the device is native C++.

The shared object is built on first use with g++ (this image has no
pybind11; plain extern-"C" + ctypes keeps the ABI trivial).  Every entry
point has a numpy fallback (`*_numpy`) with identical semantics — the
pairs double as each other's test oracles (SURVEY.md §4).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from mvxnet_makise_tpu.geometry.calib import Calib

_SRC = os.path.join(os.path.dirname(__file__), "..", "csrc",
                    "pointcloud.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "csrc",
                         "libpointcloud.so")
_lib = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB_PATH)
    if not os.path.exists(lib) or \
            os.path.getmtime(lib) < os.path.getmtime(src):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", src, "-o", lib]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            _build_failed = True
            return None
    dll = ctypes.CDLL(lib)
    i64, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
    dll.crop_project.restype = i64
    dll.crop_project.argtypes = [f32p, i64, f32p, f32p, f32p, f32p, f32p]
    dll.crop_range.restype = i64
    dll.crop_range.argtypes = [f32p, i64, f32p, f32p]
    dll.assemble_frame.restype = i64
    dll.assemble_frame.argtypes = [f32p, i64, f32p, f32p, f32p, f32p,
                                   ctypes.c_uint64, i64, f32p]
    return dll


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        _lib = _build()
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _prep(points, calib: Calib, velo_range, image_size):
    pts = np.ascontiguousarray(points[:, :4], dtype=np.float32)
    rect = np.ascontiguousarray(
        np.asarray(calib.R0) @ np.asarray(calib.velo_to_cam),
        dtype=np.float32)
    proj = np.ascontiguousarray(
        np.asarray(calib.P2) @ rect, dtype=np.float32)
    rng6 = np.asarray(velo_range, dtype=np.float32)
    ims = np.asarray(image_size, dtype=np.float32)
    return pts, rect, proj, rng6, ims


# ---------------------------------------------------------------------------
# crop + project
# ---------------------------------------------------------------------------

def crop_project(points: np.ndarray, calib: Calib, velo_range,
                 image_size) -> np.ndarray:
    """(N, 4) -> (K, 6) [x y z refl row col]: fused range+frustum crop
    with image projection.  Native when available, numpy otherwise."""
    lib = get_lib()
    if lib is None:
        return crop_project_numpy(points, calib, velo_range, image_size)
    pts, rect, proj, rng6, ims = _prep(points, calib, velo_range, image_size)
    out = np.empty((len(pts), 6), dtype=np.float32)
    kept = lib.crop_project(_fp(pts), len(pts), _fp(rect), _fp(proj),
                            _fp(rng6), _fp(ims), _fp(out))
    return out[:kept].copy()


def crop_project_numpy(points: np.ndarray, calib: Calib, velo_range,
                       image_size) -> np.ndarray:
    """Numpy oracle with identical boundary semantics
    (reference Preprocessing.py:12-55 + Calib.py:47-70)."""
    pts = np.asarray(points[:, :4], dtype=np.float32)
    lo = np.asarray(velo_range[:3], np.float32)
    hi = np.asarray(velo_range[3:6], np.float32)
    keep = np.all((pts[:, :3] >= lo) & (pts[:, :3] < hi), axis=1)
    pts = pts[keep]

    rect = np.asarray(calib.R0, np.float32) @ \
        np.asarray(calib.velo_to_cam, np.float32)
    proj = np.asarray(calib.P2, np.float32) @ rect
    hom = np.concatenate(
        [pts[:, :3], np.ones((len(pts), 1), np.float32)], axis=1)
    cam = hom @ rect.T
    front = cam[:, 2] > 0
    pts, hom = pts[front], hom[front]
    img = hom @ proj.T
    uv = img[:, :2] / img[:, 2:3]
    h, w = image_size
    ok = (uv[:, 0] >= 0) & (uv[:, 0] < w - 1e-3) & \
         (uv[:, 1] >= 0) & (uv[:, 1] < h - 1e-3)
    pts, uv = pts[ok], uv[ok]
    return np.concatenate(
        [pts, uv[:, 1:2], uv[:, 0:1]], axis=1).astype(np.float32)


def crop_range(points: np.ndarray, velo_range) -> np.ndarray:
    """(N, 4) -> (K, 4) axis-aligned range crop (half-open bounds)."""
    lib = get_lib()
    pts = np.ascontiguousarray(points[:, :4], dtype=np.float32)
    if lib is None:
        lo = np.asarray(velo_range[:3], np.float32)
        hi = np.asarray(velo_range[3:6], np.float32)
        keep = np.all((pts[:, :3] >= lo) & (pts[:, :3] < hi), axis=1)
        return pts[keep]
    rng6 = np.asarray(velo_range, dtype=np.float32)
    out = np.empty_like(pts)
    kept = lib.crop_range(_fp(pts), len(pts), _fp(rng6), _fp(out))
    return out[:kept].copy()


def assemble_frame(points: np.ndarray, calib: Calib, velo_range,
                   image_size, capacity: int,
                   seed: int = 0) -> Tuple[np.ndarray, int]:
    """Fused crop+project+shuffle+pad into a (capacity, 6) buffer.
    Returns (buffer, num_real_rows)."""
    lib = get_lib()
    if lib is None:
        cloud = crop_project_numpy(points, calib, velo_range, image_size)
        rng = np.random.default_rng(seed)
        rng.shuffle(cloud, axis=0)
        n = min(len(cloud), capacity)
        out = np.zeros((capacity, 6), dtype=np.float32)
        out[:n] = cloud[:n]
        return out, n
    pts, rect, proj, rng6, ims = _prep(points, calib, velo_range, image_size)
    # native path needs room for all cropped points before padding
    out = np.zeros((max(capacity, len(pts)), 6), dtype=np.float32)
    n = lib.assemble_frame(_fp(pts), len(pts), _fp(rect), _fp(proj),
                           _fp(rng6), _fp(ims), seed, capacity, _fp(out))
    return np.ascontiguousarray(out[:capacity]), int(n)


def assemble_batch(frames, velo_range, image_size, capacity: int, B: int,
                   pool=None) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Assemble a batch of (points, calib, image-or-None) frames into
    device-ready ``(B, capacity, 6) points / (B,) counts / (B, H, W, 3)
    images`` arrays.

    With ``pool`` (a ThreadPoolExecutor) frames assemble concurrently:
    the ctypes call releases the GIL, the C++ kernel keeps no global
    state, and each worker writes a disjoint batch row.  Serial and
    pooled paths are bit-identical (fixed per-frame seed).  This is the
    serve-time host feed (serve.Detector._assemble) and the
    ``tools/bench_host.py --batch`` measurement surface."""
    pts = np.zeros((B, capacity, 6), np.float32)
    nums = np.zeros((B,), np.int32)
    imgs = np.zeros((B, *image_size, 3), np.float32)

    def one(i, points, calib, image):
        buf, n = assemble_frame(points, calib, velo_range, image_size,
                                capacity, seed=0)
        pts[i], nums[i] = buf, n
        if image is not None:
            img = np.asarray(image, np.float32)
            if img.max() > 1.5:
                img = img / 255.0
            h, w = image_size
            imgs[i, :img.shape[0], :img.shape[1]] = img[:h, :w]

    if pool is not None and len(frames) > 1:
        # list() drains the iterator so worker exceptions re-raise
        list(pool.map(lambda t: one(*t),
                      [(i, *f) for i, f in enumerate(frames)]))
    else:
        for i, f in enumerate(frames):
            one(i, *f)
    return pts, nums, imgs
