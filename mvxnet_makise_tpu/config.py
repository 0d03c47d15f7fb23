"""Typed configuration for the framework.

TPU-native analogue of the reference's config stack
(/root/reference/config.yml + /root/reference/modules/config/{Config,Parser,
__init__}.py).  Differences by design:

* a frozen dataclass instead of module-level ``__getattr__`` — hashable, so a
  ``Config`` can be closed over by ``jax.jit`` as a static argument;
* derived quantities (``voxel_size``, ``eps``) are computed once in
  ``__post_init__`` exactly as Config.py:7-13 derives them;
* TPU-specific static capacities (``max_points``, ``max_voxels``,
  ``max_boxes``) replace the reference's data-dependent shapes — everything
  downstream jits with static shapes (SURVEY.md §7 "fixed-capacity" stance);
* batch size is real (the reference is hard-wired to batch 1,
  /root/reference/MVXNet.py:23);
* ``mesh_shape`` configures the jax.sharding Mesh (no reference counterpart).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional, Tuple

import yaml


@dataclasses.dataclass(frozen=True)
class Config:
    # ---- geometry of the scene (reference config.yml:6-13) ----
    # (x_min, y_min, z_min, x_max, y_max, z_max) in LiDAR metres.
    velo_range: Tuple[float, float, float, float, float, float] = (
        0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    # voxel grid extent (nx, ny, nz) — reference config.yml voxelshape.
    voxel_shape: Tuple[int, int, int] = (352, 400, 10)
    # anchor box size (l, w, h) — reference config.yml carsize.
    car_size: Tuple[float, float, float] = (3.9, 1.6, 1.56)
    # camera image size (h, w) — reference config.yml imsize.
    image_size: Tuple[int, int] = (370, 1224)

    # ---- sampling / capacity (static shapes for XLA) ----
    # points kept per voxel — reference config.yml samplenum.
    samples_per_voxel: int = 35
    # static point-cloud capacity per frame (cropped KITTI frames carry
    # ~17-20k points; augmentation adds a few hundred, so 24576 covers
    # the tail with >20% headroom; the host feed random-subsamples the
    # rare denser frame, standard practice at this capacity).  Every
    # point-wise stage (SVFE, FPN gather, fusion MLP) scales with this,
    # so oversizing it is pure padding compute: 32768 measured 10%
    # slower end-to-end with zero effect on 17-20k-point frames.
    max_points: int = 24576
    # static voxel capacity per frame (typical cropped frame: 5-9k voxels).
    max_voxels: int = 12288
    # static GT-box capacity per frame (augmentation fills to 12 cars;
    # dense KITTI frames have up to ~25 labels).
    max_boxes: int = 32

    # ---- model ----
    # feature channels of the per-point image feature (MVX PointFusion).
    image_feature_dim: int = 16
    # per-anchor regression dim (x y z l w h r).
    box_dim: int = 7
    # per-class anchor (l, w, h); None = standard KITTI sizes for each
    # target class (the reference supports Car only, config.yml carsize;
    # multi-class is this framework's extension — BASELINE config 5)
    anchor_sizes: Optional[Tuple[Tuple[float, float, float], ...]] = None

    # ---- target assignment (reference train.py:46) ----
    # scalars apply to all classes; per-class overrides derive in
    # __post_init__ (smaller classes conventionally use 0.35/0.5)
    neg_iou_threshold: float = 0.45
    pos_iou_threshold: float = 0.6
    # half-width (in anchor cells) of the dense IoU window evaluated around
    # each GT centre — replaces the reference's CPU spiral-with-early-exit
    # (cpp/voxelutil.cpp:138-316) with a jit-able masked dense pass.
    assign_window: int = 12
    # framework extension (default off = exact reference semantics):
    # SECOND-style best-anchor fallback — every GT's highest-IoU anchor
    # becomes positive even below pos_iou_threshold.  Without it, GTs
    # whose yaw sits ~25-65 deg off the axis-aligned anchor yaws get
    # ZERO positive anchors (the reference spiral has the same gap,
    # cpp/voxelutil.cpp:165-167) and are unlearnable.
    assign_best_anchor_fallback: bool = False

    # ---- training ----
    batch_size: int = 1
    learning_rate: float = 1e-3
    # "constant" = reference behaviour (flat AdamW, train.py:64);
    # "cosine" = warmup + cosine decay extension (see train/state.py)
    lr_schedule: str = "constant"
    lr_warmup_steps: int = 200
    lr_decay_steps: int = 10_000
    num_epochs: int = 10
    pos_loss_weight: float = 1.5   # reference Loss.py a=1.5
    neg_loss_weight: float = 1.0   # reference Loss.py b=1
    # Classification loss formulation.  "reference" = the VoxelNet-style
    # two-term CE with pos/Npos + neg/Nneg normalization (Loss.py:15-31)
    # — the default, and verified to generalize on the synthetic
    # held-out protocol (tools/gen_experiment.py).  "focal" = sigmoid
    # focal loss with BOTH terms normalized by Npos (the SECOND/
    # PointPillars recipe), offered because the reference normalization
    # dilutes each negative's per-anchor gradient by ~Nneg/Npos (see
    # the gradient-scale property test in tests/test_models.py), which
    # slows score-ranking convergence on sparse-positive data.
    cls_loss_mode: str = "reference"   # "reference" | "focal"
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # compute in bfloat16 (TPU-native analogue of the reference's fp16 AMP,
    # train.py:123; no loss scaler is needed for bf16).
    use_bf16: bool = False
    # stateless-norm statistics scope.  "sample" = every sample
    # normalized with its own statistics (vmapped model) — the
    # reference's exact semantics, since it only ever runs batch 1
    # (MVXNet.py:22-24); "batch" = statistics over the whole batch
    # (rounds 1-2 behaviour; couples samples through every norm layer,
    # measured to stall convergence on diverse scenes at batch >= 4).
    norm_scope: str = "sample"
    seed: int = 0
    checkpoint_dir: str = "./checkpoints"
    # keep only the newest N per-epoch checkpoints (0 = keep all, the
    # default — pruning deletes epochs from checkpoint_dir, including
    # ones from earlier runs, so it must be opted into; each pruned dir
    # is logged).  A full fusion checkpoint is ~180 MB, so long runs
    # should set this (tools/train passes --keep-last).
    checkpoint_keep_last: int = 0

    # ---- data ----
    data_root: str = "./data/kitti"
    target_classes: Tuple[str, ...] = ("Car",)
    # per-class number of GT boxes the paste augmentation fills scenes up to
    # (reference train.py:28 hard-codes [12] for Car).
    augment_fill_to: Tuple[int, ...] = (12,)
    num_workers: int = 8

    # ---- parallelism (no reference counterpart; SURVEY.md §5) ----
    # mesh axis sizes (data, model); (1, 1) = single chip.
    mesh_shape: Tuple[int, int] = (1, 1)

    # dense-grid scatter backend: "auto" | "xla" (presorted .at[].set) |
    # "pallas" (ops/pallas_scatter.py block row-writer).  The pallas
    # kernel wins in isolation (24 vs 33 ms/batch-8 on v5e) but loses
    # in model context (scheduling barrier vs XLA's overlap), so auto
    # resolves to xla — see models/voxelnet._scatter.
    scatter_backend: str = "auto"

    # CML first-layer formulation:
    #   "column"  — BEV-column-compacted sparse conv1 (the round-3
    #               default): active columns packed dense, all 27 taps
    #               as ONE MXU matmul, spatial merge via the Pallas
    #               one-hot-matmul kernel (ops/pallas_column_merge.py).
    #               Neither the 128-ch dense grid (1.44 GB/batch-8
    #               bf16) nor its scatter exists.  Measured v5e
    #               batch-8: isolated scatter+conv1 49.4 -> 25.9 ms,
    #               but in-branch only 81.8 -> 78.7 (XLA already
    #               overlaps the dense path's scatter; the merge
    #               epilogue costs what the matmul saves).  Kept
    #               default for the memory headroom and as the base
    #               for the fused-epilogue merge kernel.
    #   "dense3d" — scatter + strided 3D conv (the reference dataflow;
    #               conv1 output-channel-bound at N=64).
    #   "banded"  — scatter into conv1's depth-banded im2col layout +
    #               one 2D conv; identical math/params, measured slower
    #               in-model (137 vs 88 ms LiDAR branch).  Kept as a
    #               tested variant.
    cml_mode: str = "column"

    # FPN bilinear-gather backend for the image branch: "auto" | "raw4"
    # (per-image 4-tap row gathers from the raw maps, no patch tables —
    # the round-4 winner, 20.2 vs 30.0 ms/batch-8 stage time) | "xla"
    # (vmapped patch-row gather, the r1-r3 default and equivalence
    # oracle) | "xla_fused" (coarse levels merged into one wide-row
    # gather) | "pallas" (ops/pallas_gather.py banded selector-matmul
    # kernel; measured slower at KITTI shapes, 88 vs 63 ms/batch-8 head
    # time on v5e).  auto resolves by measurement to "raw4" — see
    # models/image_head.PointImageHead and the winner/loser table in
    # docs/DESIGN.md.
    gather_backend: str = "auto"

    # fusion-MLP statistics formulation: "masked" (per-layer masked
    # sums) | "full" (plain full-population reductions + analytic
    # virtual-row correction, models/blocks.DenseReluNormVirtualFull —
    # exact under the stack's zero-invalid-rows invariant) | "auto"
    # (resolved by measurement in models/image_head.PointImageHead).
    fusion_stats: str = "auto"

    # detection-transform min side (torchvision GeneralizedRCNNTransform;
    # the reference inherits 800/1333 from FasterRCNN — imhead/Pipe.py:18).
    # NOTE the max-side cap BINDS at KITTI aspect: 370x1224 scales by
    # 1333/1224 = 1.089 to 416x1344 padded, not by 800/370.  <= 0 = native
    # scale (pad only, 384x1248: ~1.17x fewer pixels); smaller values
    # (e.g. 200) shrink the frozen ResNet50-FPN's work quadratically.
    # AP caveat: the frozen torchvision weights were trained at the
    # 800/1333 operating point, so non-default values change the image
    # features' scale statistics — a serving-economy knob, not a parity
    # configuration.  Non-default values use a content-correct
    # pixel->feature-cell mapping (models/image_head.gather_image_size)
    # so the growing pad-to-32 border never mis-registers points;
    # values > 800 clamp to torchvision's fixed 1333 max-side cap.
    # Measured speed/AP table in docs/DESIGN.md.
    image_min_side: float = 800.0

    # RPN trunk shape — per-stage channels, per-stage extra 3x3 convs
    # after the stride-2 down conv, and the deconv width feeding the
    # 3*deconv concat (reference: (128, 128, 256) / (3, 5, 5) / 256,
    # /root/reference/modules/voxelnet/Pipe.py:45-75).  The RPN is
    # ~101 GFLOP/frame of the 600 issued (DESIGN.md ledger); smaller
    # values are the "cheaper dense trunk" surgery route (north-star
    # route #5) — they forfeit reference-checkpoint interchange for the
    # RPN params and must re-earn AP on the generalization protocol.
    # Measured speed/AP table in docs/DESIGN.md.
    rpn_channels: Tuple[int, int, int] = (128, 128, 256)
    rpn_extra: Tuple[int, int, int] = (3, 5, 5)
    rpn_deconv_channels: int = 256

    # rematerialize the CML 3D-conv stack in backward (jax.checkpoint):
    # trades one extra forward for the ~720 MB/frame dense-grid
    # activations; enable for large batches
    remat: bool = False

    # fusion dataflow for the image branch:
    #   "point" - MVXNetPointFusion fast path (default; numerically
    #             equivalent to the reference's slot-grid dataflow at a
    #             fraction of the gather/MLP work)
    #   "slot"  - MVXNet, the reference's per-sample-slot dataflow
    #   "voxel" - MVXNetVoxelFusion, the MVX-Net paper's cheaper
    #             voxel-level variant
    #   "pm"    - MVXNetPM, fully point-major (fastest; point fusion AND
    #             the LiDAR point encoder run on real points only)
    fusion_mode: str = "pm"

    # ---- compat knobs ----
    # the reference's bilinear gather swaps the interpolation weights vs the
    # textbook formula (/root/reference/modules/imhead/Pipe.py:72-75).  We
    # implement the textbook version by default and keep the swapped variant
    # behind this flag for checkpoint-parity experiments (SURVEY.md §7).
    compat_swapped_bilerp: bool = False

    # ---- derived (filled in __post_init__) ----
    voxel_size: Tuple[float, float, float] = dataclasses.field(init=False)
    eps: float = dataclasses.field(init=False)
    feature_map_shape: Tuple[int, int] = dataclasses.field(init=False)
    class_neg_thresholds: Tuple[float, ...] = dataclasses.field(init=False)
    class_pos_thresholds: Tuple[float, ...] = dataclasses.field(init=False)

    def __post_init__(self):
        # typos like 'Sample' would otherwise fall through make_apply's
        # == 'sample' check and silently run batch-scope statistics,
        # corrupting any per-sample-semantics A/B (ADVICE r3).
        if self.fusion_stats not in ("auto", "masked", "full"):
            raise ValueError(
                f"fusion_stats={self.fusion_stats!r} — must be 'auto', "
                f"'masked' or 'full'")
        if self.norm_scope not in ("sample", "batch"):
            raise ValueError(
                f"norm_scope={self.norm_scope!r} — must be 'sample' "
                f"(reference batch-1 semantics) or 'batch'")
        if not (len(self.rpn_channels) == len(self.rpn_extra) == 3):
            raise ValueError("rpn_channels/rpn_extra must have 3 stages")
        object.__setattr__(self, "rpn_channels",
                           tuple(int(c) for c in self.rpn_channels))
        object.__setattr__(self, "rpn_extra",
                           tuple(int(c) for c in self.rpn_extra))
        vr, vs = self.velo_range, self.voxel_shape
        object.__setattr__(
            self, "voxel_size",
            tuple((vr[i + 3] - vr[i]) / vs[i] for i in range(3)))
        # reference Config.py:8-13: eps 1e-3 under fp16, 1e-6 under fp32.
        object.__setattr__(self, "eps", 1e-3 if self.use_bf16 else 1e-6)
        # RPN output grid: voxel grid / 2 (reference train.py:59).
        object.__setattr__(
            self, "feature_map_shape", (vs[0] // 2, vs[1] // 2))
        if self.anchor_sizes is None:
            object.__setattr__(self, "anchor_sizes", tuple(
                _DEFAULT_CLASS_SIZES.get(c, tuple(self.car_size))
                for c in self.target_classes))
        thr = tuple(
            _DEFAULT_CLASS_THRESHOLDS.get(
                c, (self.neg_iou_threshold, self.pos_iou_threshold))
            for c in self.target_classes)
        object.__setattr__(
            self, "class_neg_thresholds", tuple(t[0] for t in thr))
        object.__setattr__(
            self, "class_pos_thresholds", tuple(t[1] for t in thr))
        # the dense windowed assignment is only equivalent to the
        # reference's unbounded spiral while the window covers every
        # anchor that can reach IoU >= neg_threshold — validate at
        # config time instead of silently diverging (ops/assign.py)
        from mvxnet_makise_tpu.ops.assign import min_assign_window
        for size, neg in zip(self.anchor_sizes, self.class_neg_thresholds):
            req = min_assign_window(self.feature_map_shape, vr, size, neg)
            if self.assign_window < req:
                raise ValueError(
                    f"assign_window={self.assign_window} under-covers "
                    f"anchors of footprint {size[:2]} at neg IoU "
                    f"threshold {neg} on a {self.feature_map_shape} grid "
                    f"— need >= {req} cells for spiral-parity")

    # -- convenience --
    @property
    def point_fusion(self) -> bool:
        return self.fusion_mode == "point"

    @property
    def num_classes(self) -> int:
        return len(self.target_classes)

    @property
    def rpn_trunk(self) -> Tuple:
        """((ch1, ch2, ch3), (e1, e2, e3), deconv_ch) for the RPN."""
        return (self.rpn_channels, self.rpn_extra,
                int(self.rpn_deconv_channels))

    @property
    def anchors_per_loc(self) -> int:
        """Total anchor slots per BEV cell: 2 yaws per class."""
        return 2 * self.num_classes

    @property
    def num_anchors(self) -> int:
        h, w = self.feature_map_shape
        return h * w * self.anchors_per_loc

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# standard KITTI anchor footprints and match thresholds per class
# (Car matches the reference's carsize/thresholds; the others follow the
# VoxelNet-family conventions used for KITTI Ped/Cyc heads)
_DEFAULT_CLASS_SIZES = {
    "Car": (3.9, 1.6, 1.56),
    "Pedestrian": (0.8, 0.6, 1.73),
    "Cyclist": (1.76, 0.6, 1.73),
}
_DEFAULT_CLASS_THRESHOLDS = {
    "Car": (0.45, 0.6),
    "Pedestrian": (0.35, 0.5),
    "Cyclist": (0.35, 0.5),
}


_YAML_KEYS = {
    # reference config.yml key -> Config field
    "velorange": "velo_range",
    "voxelshape": "voxel_shape",
    "carsize": "car_size",
    "imsize": "image_size",
    "samplenum": "samples_per_voxel",
    "batchsize": "batch_size",
}


def load_config(path: Optional[str] = None, **overrides) -> Config:
    """Build a Config, optionally from a YAML file.

    Accepts both this framework's field names and the reference's
    config.yml key names (so a reference config file loads directly).
    """
    kw = {}
    if path is not None and os.path.exists(path):
        with open(path, "r") as f:
            raw = yaml.safe_load(f) or {}
        fields = {f.name for f in dataclasses.fields(Config) if f.init}
        for k, v in raw.items():
            k = _YAML_KEYS.get(k, k)
            if k in fields:
                kw[k] = tuple(v) if isinstance(v, list) else v
    kw.update(overrides)
    return Config(**kw)


def parse_cli(argv=None) -> Tuple[Config, argparse.Namespace]:
    """CLI mirroring the reference's optparse surface
    (/root/reference/modules/config/Parser.py:1-12): positional dataroot,
    -n/--numepochs, -r/--resume; plus framework extras."""
    p = argparse.ArgumentParser(
        description="MVXNet-Makise TPU training",
        usage="python -m mvxnet_makise_tpu.train <dataroot> "
              "[-n NUMEPOCHS] [-r RESUME]")
    p.add_argument("dataroot", nargs="?", default=None)
    p.add_argument("-n", "--numepochs", type=int, default=10)
    p.add_argument("-r", "--resume", type=int, default=0,
                   help="epoch number to resume from")
    p.add_argument("--config", type=str, default=None,
                   help="optional YAML config path")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args(argv)

    overrides = {"num_epochs": args.numepochs}
    if args.dataroot:
        overrides["data_root"] = args.dataroot
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.bf16:
        overrides["use_bf16"] = True
    cfg = load_config(args.config, **overrides)
    return cfg, args
