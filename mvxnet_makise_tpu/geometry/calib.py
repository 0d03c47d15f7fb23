"""KITTI calibration parsing and the LiDAR->image projection chain.

Reference: /root/reference/modules/data/Load.py:24-41 (readCalib) and
/root/reference/modules/utils/Calib.py:5-70 (lidar2P2 / p22Lidar /
lidar2Img).

TPU-native design: a calib is a small named tuple of 4x4 float32 matrices.
On-device we premultiply the chain ``P2 @ R0 @ Tr`` once so the per-point
projection is a single (N,4)x(4,4) matmul that XLA fuses into neighbouring
ops; the reference multiplies three 4x4s per call on the host.
Projection helpers accept numpy or jnp arrays and return the same kind.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jnp.ndarray]


class Calib(NamedTuple):
    """4x4 homogeneous calibration matrices (float32)."""
    velo_to_cam: Array   # 'Tr_velo_to_cam' padded to 4x4
    P2: Array            # camera-2 projection padded to 4x4
    R0: Array            # rectifying rotation embedded in 4x4

    @property
    def proj(self) -> Array:
        """Combined LiDAR->image homogeneous projection (P2 @ R0 @ Tr)."""
        return self.P2 @ self.R0 @ self.velo_to_cam

    def to_jax(self) -> "Calib":
        return Calib(*(jnp.asarray(m) for m in self))

    def to_numpy(self) -> "Calib":
        return Calib(*(np.asarray(m) for m in self))


def read_calib(path: str) -> Calib:
    """Parse a KITTI calib .txt into 4x4 matrices.

    Same padding scheme as Load.py:24-41: Tr and P2 get a [0,0,0,1] row,
    R0_rect is embedded into the top-left 3x3 of a 4x4 with [3,3] = 1.
    """
    mats = {}
    with open(path, "r") as f:
        for line in f.read().splitlines():
            if not line.strip():
                continue
            key, _, vals = line.partition(" ")
            key = key.rstrip(":")
            mats[key] = np.array(vals.split(), dtype=np.float32)

    v2c = np.concatenate(
        [mats["Tr_velo_to_cam"].reshape(3, 4),
         [[0, 0, 0, 1]]], axis=0).astype(np.float32)
    p2 = np.concatenate(
        [mats["P2"].reshape(3, 4), [[0, 0, 0, 1]]], axis=0).astype(np.float32)
    r0 = np.zeros((4, 4), dtype=np.float32)
    r0[:3, :3] = mats["R0_rect"].reshape(3, 3)
    r0[3, 3] = 1.0
    return Calib(velo_to_cam=v2c, P2=p2, R0=r0)


def _homogeneous(points: Array):
    xp = jnp if isinstance(points, jnp.ndarray) else np
    ones = xp.ones_like(points[:, :1])
    return xp.concatenate([points[:, :3], ones], axis=1)


def lidar_to_cam_rect(points: Array, calib: Calib) -> Array:
    """(N, 3+) LiDAR points -> (N, 3) rectified-camera-frame points
    (R0 @ Tr @ p; Calib.py chain before the P2 projection)."""
    p = _homogeneous(points)
    out = (calib.R0 @ calib.velo_to_cam @ p.T).T
    return out[:, :3]


def lidar_to_image(points: Array, calib: Calib,
                   keep_all: bool = True) -> Array:
    """Project (N, 3+) LiDAR points to image pixels.

    Returns (N, 2) as (u, v) = (width coord, height coord), the same layout
    as Calib.py:47-70 lidar2Img.  With ``keep_all`` (the reference's
    ``uncheck=True`` mode used by train.py:32) no depth filtering happens —
    all entry points here feed static-shape pipelines, so filtering is the
    caller's job via masks.
    """
    xp = jnp if isinstance(points, jnp.ndarray) else np
    p = _homogeneous(points)
    cam = (calib.R0 @ calib.velo_to_cam @ p.T)
    if not keep_all:
        mask = np.asarray(cam[2] > 0)
        cam = cam[:, mask]
    img = calib.P2 @ cam
    depth = img[2]
    uv = img[:2] / xp.where(xp.abs(depth) < 1e-9, 1e-9, depth)
    return uv.T


def lidar_depths(points: Array, calib: Calib) -> Array:
    """Camera-frame depth of each LiDAR point (for frustum masks)."""
    return lidar_to_cam_rect(points, calib)[:, 2]


def rect_to_lidar(points: Array, calib: Calib) -> Array:
    """Inverse chain: (N, 3) P2-frame points back to LiDAR
    (Calib.py:25-46 p22Lidar)."""
    xp = jnp if isinstance(points, jnp.ndarray) else np
    inv = jnp.linalg.inv if xp is jnp else np.linalg.inv
    p = _homogeneous(points)
    out = (inv(calib.velo_to_cam) @ inv(calib.R0) @ inv(calib.P2) @ p.T).T
    return out[:, :3]
