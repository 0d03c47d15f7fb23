"""Point-major VoxelNet branch — segment-ops formulation, no slot tensor.

The slot-grid formulation (models/voxelnet.py, mirroring the reference's
(V, T, C) layout) runs every pointwise MLP over max_voxels * T = 430k
sample slots and pays a measured 22 ms/batch scatter just to build the
slot tensor, although a frame holds only ~20-30k real points (~93%
padding).  This module computes the identical function directly over the
*sorted point list* the voxelizer already produces:

  * pointwise Dense layers run on (P,) real points;
  * per-voxel max-pooling is a sorted ``segment_max``;
  * the empty sample slots' contribution is EXACT, not dropped: after
    each layer, all empty slots of voxel v hold the same constant row
    (z chained through the layers, concatenated with voxel v's max), so
    their effect on the batch-norm statistics and on the per-voxel max
    is computed in closed form per voxel with multiplicity T - count_v
    (blocks.DenseReluNormVirtualWeighted).

Parameter tree matches VoxelNetBranch exactly (svfe/vfe1/fcn/fc, ...,
cml, rpn) — checkpoints interchange, and the equivalence is tested
against the slot path in tests/test_point_major.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.models.blocks import DenseReluNormVirtualWeighted
from mvxnet_makise_tpu.models.voxelnet import (REFERENCE_RPN_TRUNK,
                                               MiddleConvLayers, RPN)
from mvxnet_makise_tpu.ops.scatter import scatter_voxels_to_grid

_NEG = -1e30


def _segment_max(values: jnp.ndarray, seg: jnp.ndarray, kept: jnp.ndarray,
                 num_segments: int) -> jnp.ndarray:
    """Per-voxel max over kept points.  values (P, C); seg (P,) sorted
    with ``num_segments`` as the drop bucket.  Returns (V, C); empty
    segments get _NEG."""
    masked = jnp.where(kept[:, None], values, _NEG)
    out = jax.ops.segment_max(masked, seg, num_segments=num_segments + 1,
                              indices_are_sorted=True)
    return out[:num_segments]


def point_lidar_features(sorted_points: jnp.ndarray,
                         sorted_seg: jnp.ndarray,
                         sorted_kept: jnp.ndarray,
                         counts: jnp.ndarray) -> jnp.ndarray:
    """Per-point 7-channel LiDAR features in voxel-sorted order:
    [x, y, z, dx, dy, dz, refl] with centroid offsets over each voxel's
    kept points (the voxelizer's slot layout, channels 0..6) — computed
    from segment sums, no slot tensor.

    sorted_points: (P, 6) [x y z refl row col]; sorted_seg/kept: (P,);
    counts: (V,).
    """
    V = counts.shape[0]
    xyz = sorted_points[:, :3]
    sums = jax.ops.segment_sum(
        jnp.where(sorted_kept[:, None], xyz, 0.0), sorted_seg,
        num_segments=V + 1, indices_are_sorted=True)[:V]
    centroid = sums / jnp.maximum(counts, 1)[:, None]
    cent_pad = jnp.concatenate(
        [centroid, jnp.zeros_like(centroid[:1])], axis=0)
    offs = xyz - cent_pad[jnp.minimum(sorted_seg, V)]
    return jnp.concatenate(
        [xyz, offs, sorted_points[:, 3:4]], axis=-1)


class PointVFE(nn.Module):
    """VFE layer in point-major form (parity: models/voxelnet.VFE)."""
    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, kept, seg, z, nv, vmask, V: int):
        """x: (B, P, C); kept/seg: (B, P); z: (B, V, C) empty-slot rows;
        nv: (B, V) empty-slot multiplicities; vmask: (B, V).
        Returns (x', z') with 2*features channels."""
        h, hz = DenseReluNormVirtualWeighted(
            self.features, self.eps, name="fcn")(x, kept, z, nv, vmask)
        segmax = jax.vmap(
            lambda v, s, k: _segment_max(v, s, k, V))(h, seg, kept)
        # empty slots participate in the per-voxel max (slot path takes
        # max over all T slots incl. the z rows)
        vmax = jnp.where((nv > 0)[..., None],
                         jnp.maximum(segmax, hz), segmax)
        # a valid voxel always has >= 1 point; guard dead voxels anyway
        vmax = jnp.where(vmask[..., None] & (vmax > _NEG / 2), vmax, 0.0)

        gathered = jnp.take_along_axis(
            jnp.concatenate([vmax, jnp.zeros_like(vmax[:, :1])], axis=1),
            jnp.minimum(seg, V)[..., None], axis=1)
        x_next = jnp.concatenate([h, gathered], axis=-1)
        z_next = jnp.concatenate([hz, vmax], axis=-1)
        return x_next, z_next


class PointSVFE(nn.Module):
    """Stacked point-major VFE (parity: models/voxelnet.SVFE)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, kept, seg, z, nv, vmask, V: int):
        x, z = PointVFE(16, self.eps, name="vfe1")(
            x, kept, seg, z, nv, vmask, V)
        x, z = PointVFE(64, self.eps, name="vfe2")(
            x, kept, seg, z, nv, vmask, V)
        return x, z


class VoxelNetBranchPM(nn.Module):
    """Point-major twin of VoxelNetBranch (same params, same outputs)."""
    grid_shape: Sequence[int] = (352, 400, 10)
    anchors_per_loc: int = 2
    box_dim: int = 7
    eps: float = 1e-6
    samples_per_voxel: int = 35
    remat: bool = False
    scatter_backend: str = "auto"  # "auto" | "xla" | "pallas"
    cml_mode: str = "dense3d"      # "dense3d" | "banded"
    rpn_trunk: Tuple = REFERENCE_RPN_TRUNK

    @nn.compact
    def __call__(self, points: jnp.ndarray, kept: jnp.ndarray,
                 seg: jnp.ndarray, counts: jnp.ndarray,
                 coords: jnp.ndarray, vmask: jnp.ndarray,
                 z0: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """points: (B, P, C_in) voxel-sorted per-point features (the 7
        LiDAR channels or 7+16 fused); kept/seg: (B, P); counts: (B, V);
        coords: (B, V, 3); vmask: (B, V); z0: (B, V, C_in) empty-slot
        input rows (None = zeros, the LiDAR-only case)."""
        B, P, Cin = points.shape
        V = counts.shape[1]
        T = self.samples_per_voxel
        nv = jnp.clip(T - counts, 0, T).astype(points.dtype) * vmask

        if z0 is None:
            z = jnp.zeros((B, V, Cin), points.dtype)
        else:
            z = z0

        x, z = PointSVFE(self.eps, name="svfe")(
            points, kept, seg, z, nv, vmask, V)
        h, hz = DenseReluNormVirtualWeighted(
            128, self.eps, name="fcn")(x, kept, z, nv, vmask)
        segmax = jax.vmap(
            lambda v, s, k: _segment_max(v, s, k, V))(h, seg, kept)
        vfeat = jnp.where((nv > 0)[..., None],
                          jnp.maximum(segmax, hz), segmax)
        vfeat = jnp.where(vmask[..., None] & (vfeat > _NEG / 2), vfeat, 0.0)

        from mvxnet_makise_tpu.models.voxelnet import (
            MiddleConvLayersBanded, MiddleConvLayersColumn, _scatter)

        if self.cml_mode == "column":
            cml_cls = nn.remat(MiddleConvLayersColumn) if self.remat \
                else MiddleConvLayersColumn
            y = cml_cls(self.eps, tuple(self.grid_shape),
                        name="cml")(vfeat, coords, vmask)  # (B,H,W,D,C)
            Bd, H, W, D, C = y.shape
            # (C, D) torch flattening order, from the d-minor layout
            y = jnp.transpose(y, (0, 1, 2, 4, 3)).reshape(Bd, H, W, C * D)
            return RPN(self.anchors_per_loc, self.box_dim, self.eps,
                       self.rpn_trunk, name="rpn")(y)
        elif self.cml_mode == "banded":
            cml_cls = nn.remat(MiddleConvLayersBanded) if self.remat \
                else MiddleConvLayersBanded
            y = cml_cls(self.eps, tuple(self.grid_shape),
                        name="cml")(vfeat, coords, vmask)
        else:
            dense = jax.vmap(
                lambda f, c, m: _scatter(
                    f, c, m, self.grid_shape,
                    self.scatter_backend))(vfeat, coords, vmask)
            cml_cls = nn.remat(MiddleConvLayers) if self.remat \
                else MiddleConvLayers
            y = cml_cls(self.eps, name="cml")(dense)
        Bd, D, H, W, C = y.shape
        y = jnp.transpose(y, (0, 2, 3, 4, 1)).reshape(Bd, H, W, C * D)
        return RPN(self.anchors_per_loc, self.box_dim, self.eps,
                   self.rpn_trunk, name="rpn")(y)
