"""MVXNet — point-level LiDAR + camera fusion (MVX-Net "PointFusion").

Reference: /root/reference/MVXNet.py (SURVEY.md §2 C11): run the image
head to get a 16-dim per-point image feature, concatenate with the 7
LiDAR channels, feed the VoxelNet branch.

TPU-native: batch is a real axis, every shape static; voxel channel
layout is the voxelizer's ``[x, y, z, dx, dy, dz, refl, row, col]`` —
channels 0..6 are the LiDAR features (the reference's ``voxels[..., :7]``,
MVXNet.py:26), channels 7..8 the image projection consumed by the gather.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

import jax

from mvxnet_makise_tpu.models.blocks import DenseReluNorm
from mvxnet_makise_tpu.models.image_head import (
    ImageHead,
    PointImageHead,
    detection_transform,
    gather_image_size,
)
from mvxnet_makise_tpu.models.resnet_fpn import ResNet50FPN
from mvxnet_makise_tpu.models.voxelnet import (
    REFERENCE_RPN_TRUNK,
    RPN,
    SVFE,
    MiddleConvLayers,
    VoxelNetBranch,
)
from mvxnet_makise_tpu.ops.gather import bilinear_gather_fpn
from mvxnet_makise_tpu.ops.scatter import scatter_voxels_to_grid


class MVXNet(nn.Module):
    grid_shape: Sequence[int] = (352, 400, 10)
    image_size: Tuple[int, int] = (370, 1224)
    anchors_per_loc: int = 2
    box_dim: int = 7
    eps: float = 1e-6
    swapped_bilerp: bool = False
    remat: bool = False
    image_min_side: float = 800.0
    rpn_trunk: Tuple = REFERENCE_RPN_TRUNK

    @nn.compact
    def __call__(self, voxels: jnp.ndarray, coords: jnp.ndarray,
                 mask: jnp.ndarray,
                 images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """voxels: (B, V, T, 9); coords: (B, V, 3); mask: (B, V);
        images: (B, H, W, 3) in [0, 1].

        Returns (score (B, H/2, W/2, A), reg (B, H/2, W/2, A*7)).
        """
        points_rc = voxels[..., 7:9]
        # a sample slot is real iff any LiDAR coordinate is nonzero —
        # the reference's zero-point test (imhead/Pipe.py:53-59)
        point_valid = jnp.any(voxels[..., 0:3] != 0, axis=-1)

        imfeat = ImageHead(
            self.image_size, self.eps, self.swapped_bilerp,
            image_min_side=self.image_min_side,
            name="head")(images, points_rc, point_valid, mask)

        fused = jnp.concatenate([voxels[..., :7], imfeat], axis=-1)
        return VoxelNetBranch(
            self.grid_shape, self.anchors_per_loc, self.box_dim, self.eps,
            self.remat, rpn_trunk=self.rpn_trunk,
            name="backbone")(fused, coords, mask)


class MVXNetPointFusion(nn.Module):
    """MVXNet with the image branch evaluated *per point* (fast path).

    Numerically equivalent to :class:`MVXNet` (see PointImageFusion's
    virtual-row statistics) but the gather + 768-wide fusion MLP run over
    the ~20-30k real points of a frame instead of max_voxels * T = 430k
    voxel sample slots — on KITTI shapes that removes ~93% of the image
    branch's post-backbone work.  Parameter tree is identical to
    :class:`MVXNet`; checkpoints interchange both ways.
    """
    grid_shape: Sequence[int] = (352, 400, 10)
    image_size: Tuple[int, int] = (370, 1224)
    anchors_per_loc: int = 2
    box_dim: int = 7
    eps: float = 1e-6
    swapped_bilerp: bool = False
    remat: bool = False
    gather_backend: str = "auto"
    image_min_side: float = 800.0
    fusion_stats: str = "auto"
    rpn_trunk: Tuple = REFERENCE_RPN_TRUNK

    @nn.compact
    def __call__(self, voxels: jnp.ndarray, coords: jnp.ndarray,
                 mask: jnp.ndarray, images: jnp.ndarray,
                 points: jnp.ndarray, point_slots: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """voxels: (B, V, T, 9); coords: (B, V, 3); mask: (B, V);
        images: (B, H, W, 3); points: (B, P, 6) padded input clouds
        ([x y z refl row col]); point_slots: (B, P) flat voxel-sample
        slot per point (-1 = dropped/padding; ops/voxelize.py)."""
        B, V, T, _ = voxels.shape
        P = points.shape[1]

        kept = point_slots >= 0                            # (B, P)
        slot_total = jnp.sum(mask) * T
        n_virtual = slot_total - jnp.sum(kept)

        feats, z = PointImageHead(
            self.image_size, self.eps, self.swapped_bilerp,
            self.gather_backend,
            image_min_side=self.image_min_side,
            fusion_stats=self.fusion_stats,
            name="head")(images, points[..., 4:6], kept, n_virtual)
        # (B, P, 16), (16,)

        def scatter_one(f, slots):
            safe = jnp.where(slots >= 0, slots, V * T)
            buf = jnp.zeros((V * T + 1, f.shape[-1]), f.dtype)
            buf = buf.at[safe].set(f, mode="drop")
            filled = jnp.zeros((V * T + 1,), bool).at[safe].set(
                True, mode="drop")
            return (buf[:-1].reshape(V, T, -1),
                    filled[:-1].reshape(V, T))

        imfeat, filled = jax.vmap(scatter_one)(feats, point_slots)
        imfeat = jnp.where(filled[..., None], imfeat,
                           z.astype(imfeat.dtype))

        fused = jnp.concatenate([voxels[..., :7], imfeat], axis=-1)
        return VoxelNetBranch(
            self.grid_shape, self.anchors_per_loc, self.box_dim, self.eps,
            self.remat, rpn_trunk=self.rpn_trunk,
            name="backbone")(fused, coords, mask)


class MVXNetVoxelFusion(nn.Module):
    """MVX-Net *VoxelFusion* — the paper's second fusion variant.

    The reference implements only PointFusion; the MVX-Net paper also
    describes fusing image features at the *voxel* level: encode voxels
    from LiDAR alone, then append one image feature per voxel, gathered
    at the voxel's mean image projection.  On TPU this costs just
    max_voxels (~12k) gathers + a 12k-row fusion MLP — an order of
    magnitude below even the per-point path — at some loss of
    granularity.  A framework extension (no reference counterpart to
    cite); offered as a cheaper model-family member.
    """
    grid_shape: Sequence[int] = (352, 400, 10)
    image_size: Tuple[int, int] = (370, 1224)
    anchors_per_loc: int = 2
    box_dim: int = 7
    eps: float = 1e-6
    voxel_image_dim: int = 32
    image_min_side: float = 800.0
    rpn_trunk: Tuple = REFERENCE_RPN_TRUNK

    @nn.compact
    def __call__(self, voxels: jnp.ndarray, coords: jnp.ndarray,
                 mask: jnp.ndarray,
                 images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """voxels: (B, V, T, 9); coords: (B, V, 3); mask: (B, V);
        images: (B, H, W, 3)."""
        B, V, T, _ = voxels.shape

        # LiDAR-only voxel encoding (SVFE stack on the 7 point channels)
        x = SVFE(self.eps, name="svfe")(voxels[..., :7], mask)
        x = DenseReluNorm(128, self.eps, name="fcn")(
            x, mask[..., None] & jnp.ones((T,), bool))
        x = jnp.max(x, axis=-2)                            # (B, V, 128)

        # per-voxel image feature at the mean projection of its points
        slot_valid = jnp.any(voxels[..., 0:3] != 0, axis=-1)  # (B, V, T)
        cnt = jnp.maximum(jnp.sum(slot_valid, axis=-1), 1)
        rc = jnp.sum(voxels[..., 7:9] * slot_valid[..., None],
                     axis=-2) / cnt[..., None]             # (B, V, 2)

        timg = jax.vmap(
            lambda im: detection_transform(im, self.image_min_side)
        )(images)
        pyramid = ResNet50FPN(name="extractor")(timg)
        gsize = gather_image_size(self.image_size, self.image_min_side)
        gathered = jax.vmap(
            lambda feats, r, ok: bilinear_gather_fpn(
                feats, r, ok, gsize, eps=self.eps)
        )(pyramid, rc, mask)                               # (B, V, 768)
        imf = DenseReluNorm(128, self.eps, name="imfuse1")(gathered, mask)
        imf = DenseReluNorm(self.voxel_image_dim, self.eps,
                            name="imfuse2")(imf, mask)

        fused = jnp.concatenate([x, imf], axis=-1)
        fused = DenseReluNorm(128, self.eps, name="mix")(fused, mask)
        fused = jnp.where(mask[..., None], fused, 0.0)

        dense = jax.vmap(
            lambda f, c, m: scatter_voxels_to_grid(
                f, c, m, self.grid_shape))(fused, coords, mask)
        y = MiddleConvLayers(self.eps, name="cml")(dense)
        Bd, D, H, W, C = y.shape
        y = jnp.transpose(y, (0, 2, 3, 4, 1)).reshape(Bd, H, W, C * D)
        return RPN(self.anchors_per_loc, self.box_dim, self.eps,
                   self.rpn_trunk, name="rpn")(y)


class MVXNetPM(nn.Module):
    """Fully point-major MVXNet: per-point image fusion + point-major
    VoxelNet branch (voxelnet_pm.VoxelNetBranchPM).

    The fastest formulation: neither the image branch nor the LiDAR
    point encoder ever materializes the (V, T, C) slot tensor — all
    pointwise work runs on the ~20-30k real points, per-voxel pooling is
    a sorted segment-max, and empty-slot semantics are reproduced in
    closed form (virtual rows).  Parameter tree matches MVXNet /
    MVXNetPointFusion; checkpoints interchange across all three.
    """
    grid_shape: Sequence[int] = (352, 400, 10)
    image_size: Tuple[int, int] = (370, 1224)
    anchors_per_loc: int = 2
    box_dim: int = 7
    eps: float = 1e-6
    swapped_bilerp: bool = False
    samples_per_voxel: int = 35
    remat: bool = False
    scatter_backend: str = "auto"
    gather_backend: str = "auto"
    cml_mode: str = "dense3d"
    image_min_side: float = 800.0
    fusion_stats: str = "auto"
    rpn_trunk: Tuple = REFERENCE_RPN_TRUNK

    @nn.compact
    def __call__(self, sorted_points: jnp.ndarray,
                 sorted_kept: jnp.ndarray, sorted_seg: jnp.ndarray,
                 counts: jnp.ndarray, coords: jnp.ndarray,
                 vmask: jnp.ndarray,
                 images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """sorted_points: (B, P, 6) voxel-sorted [x y z refl row col];
        sorted_kept/seg: (B, P); counts: (B, V); coords: (B, V, 3);
        vmask: (B, V); images: (B, H, W, 3)."""
        from mvxnet_makise_tpu.models.voxelnet_pm import (
            VoxelNetBranchPM,
            point_lidar_features,
        )

        B, P, _ = sorted_points.shape
        V = counts.shape[1]
        T = self.samples_per_voxel

        n_virtual = jnp.sum(vmask) * T - jnp.sum(sorted_kept)
        imfeat, z16 = PointImageHead(
            self.image_size, self.eps, self.swapped_bilerp,
            self.gather_backend,
            image_min_side=self.image_min_side,
            fusion_stats=self.fusion_stats,
            name="head")(images, sorted_points[..., 4:6], sorted_kept,
                         n_virtual)

        pf7 = jax.vmap(point_lidar_features)(
            sorted_points, sorted_seg, sorted_kept, counts)
        # geometry is done: drop to the compute dtype of the image branch
        cdt = imfeat.dtype
        x = jnp.concatenate([pf7.astype(cdt), imfeat], axis=-1)
        z0 = jnp.concatenate([
            jnp.zeros((B, V, 7), cdt),
            jnp.broadcast_to(z16.astype(cdt), (B, V, 16))], axis=-1)

        return VoxelNetBranchPM(
            self.grid_shape, self.anchors_per_loc, self.box_dim,
            self.eps, self.samples_per_voxel, self.remat,
            self.scatter_backend, self.cml_mode,
            rpn_trunk=self.rpn_trunk,
            name="backbone")(x, sorted_kept, sorted_seg, counts, coords,
                             vmask, z0)
