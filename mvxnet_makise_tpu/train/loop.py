"""The training loop: host feed -> fused device step -> checkpoints.

Reference: /root/reference/train.py:51-189 (SURVEY.md §2 C13, §3.1).
Same observable behaviour — epoch shuffle, GT-paste augmentation, running
avg/max loss every 50 iterations, per-epoch checkpoint with resume — on a
TPU-native execution model:

  * the *entire* compute path (voxelize -> assign -> forward -> loss ->
    AdamW) is one jitted XLA program per batch; the reference runs numba
    + C++ + five torch dispatches per sample;
  * host workers only augment, project and pad (cheap numpy), overlapped
    with device compute through a thread-pool prefetch queue — the
    equivalent of the reference's ProcessPoolExecutor (train.py:105-109)
    without pickling multi-MB arrays between processes;
  * batches are real (reference locked to batch 1) and shard over the
    mesh's data axis when more than one device is visible.
"""

from __future__ import annotations

import concurrent.futures as cf
import random
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.data.augment import (
    SceneAugmenter,
    assemble_augmented_cloud,
)
from mvxnet_makise_tpu.data.kitti import KittiFrame
from mvxnet_makise_tpu.data.pipeline import FrameArrays
from mvxnet_makise_tpu.geometry.calib import lidar_to_image
from mvxnet_makise_tpu.models import (
    MVXNet,
    MVXNetPM,
    MVXNetPointFusion,
    MVXNetVoxelFusion,
    VoxelNetBranch,
)
from mvxnet_makise_tpu.ops import create_anchors
from mvxnet_makise_tpu.train import checkpoint as ckpt
from mvxnet_makise_tpu.train.state import TrainState, make_optimizer
from mvxnet_makise_tpu.train.step import (
    Batch,
    frames_to_batch,
    make_train_step,
)
from mvxnet_makise_tpu.utils.metrics import LossTracker, PhaseTimer


def preprocess_train_frame(frame: KittiFrame, cfg: Config,
                           augmenter: Optional[SceneAugmenter],
                           rng: np.random.Generator) -> FrameArrays:
    """Host half of cputask (reference train.py:26-49): augment, project
    (per-source calib), pad.  Voxelize/assign happen on device."""
    if augmenter is not None:
        pasted, image, boxes, _ = augmenter(
            frame.points, frame.image, frame.bbox2d, frame.boxes,
            list(cfg.target_classes), list(cfg.augment_fill_to))
        cloud = assemble_augmented_cloud(frame.points, frame.calib, pasted)
    else:
        image = frame.image
        boxes = frame.boxes
        uv = lidar_to_image(frame.points, frame.calib, keep_all=True)
        cloud = np.concatenate(
            [frame.points[:, :4], uv[:, 1:2], uv[:, 0:1]],
            axis=1).astype(np.float32)

    rng.shuffle(cloud, axis=0)
    n = min(len(cloud), cfg.max_points)
    pts = np.zeros((cfg.max_points, 6), dtype=np.float32)
    pts[:n] = cloud[:n]

    all_boxes, all_cls = [], []
    for ci, c in enumerate(cfg.target_classes):
        if c in boxes and len(boxes[c]):
            all_boxes.append(boxes[c])
            all_cls.append(np.full(len(boxes[c]), ci, np.int32))
    gt = np.zeros((cfg.max_boxes, 7), np.float32)
    gcls = np.zeros((cfg.max_boxes,), np.int32)
    gmask = np.zeros((cfg.max_boxes,), bool)
    if all_boxes:
        cat = np.concatenate(all_boxes, axis=0)[:cfg.max_boxes]
        ccls = np.concatenate(all_cls, axis=0)[:cfg.max_boxes]
        gt[:len(cat)] = cat
        gcls[:len(cat)] = ccls
        gmask[:len(cat)] = True

    img = image if image is not None else np.zeros(
        (*cfg.image_size, 3), np.float32)
    return FrameArrays(points=pts, num_points=np.int32(n),
                       image=np.asarray(img, np.float32),
                       gt_boxes=gt, gt_mask=gmask), gcls


def make_full_train_step(cfg: Config, anchors, with_images: bool):
    """Voxelize + assign + forward + loss + update fused in one jit."""
    inner = make_train_step(cfg, anchors, with_images=with_images)

    @jax.jit
    def step(state: TrainState, points, num_points, images, gt_boxes,
             gt_mask, gt_classes, key):
        batch = frames_to_batch(points, num_points, images, gt_boxes,
                                gt_mask, cfg, shuffle_key=key,
                                gt_classes=gt_classes)
        return inner(state, batch)

    return step


def build_model_and_state(cfg: Config, with_images: bool,
                          rng_seed: int = 0,
                          image_weights=None):
    """Construct the flagship model and a fresh TrainState."""
    cls = {"pm": MVXNetPM, "point": MVXNetPointFusion, "slot": MVXNet,
           "voxel": MVXNetVoxelFusion}[cfg.fusion_mode]
    if with_images:
        kw = dict(grid_shape=cfg.voxel_shape,
                  image_size=cfg.image_size,
                  anchors_per_loc=cfg.anchors_per_loc,
                  image_min_side=cfg.image_min_side,
                  rpn_trunk=cfg.rpn_trunk)
        if cfg.fusion_mode != "voxel":
            kw.update(swapped_bilerp=cfg.compat_swapped_bilerp,
                      remat=cfg.remat)
        if cfg.fusion_mode in ("pm", "point"):
            kw.update(gather_backend=cfg.gather_backend,
                      fusion_stats=cfg.fusion_stats)
        if cfg.fusion_mode == "pm":
            kw.update(samples_per_voxel=cfg.samples_per_voxel,
                      scatter_backend=cfg.scatter_backend,
                      cml_mode=cfg.cml_mode)
        model = cls(**kw)
    elif cfg.fusion_mode == "pm":
        from mvxnet_makise_tpu.models import VoxelNetBranchPM

        model = VoxelNetBranchPM(grid_shape=cfg.voxel_shape,
                                 anchors_per_loc=cfg.anchors_per_loc,
                                 samples_per_voxel=cfg.samples_per_voxel,
                                 remat=cfg.remat,
                                 scatter_backend=cfg.scatter_backend,
                                 cml_mode=cfg.cml_mode,
                                 rpn_trunk=cfg.rpn_trunk)
    else:
        model = VoxelNetBranch(grid_shape=cfg.voxel_shape,
                               anchors_per_loc=cfg.anchors_per_loc,
                               remat=cfg.remat,
                               scatter_backend=cfg.scatter_backend,
                               cml_mode=cfg.cml_mode,
                               rpn_trunk=cfg.rpn_trunk)

    V, T = cfg.max_voxels, cfg.samples_per_voxel
    dummy_vox = jnp.zeros((1, V, T, 9 if with_images else 7))
    dummy_coords = jnp.zeros((1, V, 3), jnp.int32)
    dummy_mask = jnp.zeros((1, V), bool)
    if with_images and cfg.fusion_mode == "pm":
        P = cfg.max_points
        dummy_img = jnp.zeros((1, *cfg.image_size, 3))
        params = jax.jit(model.init)(
            jax.random.key(rng_seed),
            jnp.zeros((1, P, 6)), jnp.zeros((1, P), bool),
            jnp.full((1, P), V, jnp.int32),
            jnp.zeros((1, V), jnp.int32), dummy_coords, dummy_mask,
            dummy_img)
    elif with_images:
        dummy_img = jnp.zeros((1, *cfg.image_size, 3))
        extra = ()
        if cfg.fusion_mode == "point":
            extra = (jnp.zeros((1, cfg.max_points, 6)),
                     jnp.full((1, cfg.max_points), -1, jnp.int32))
        params = jax.jit(model.init)(
            jax.random.key(rng_seed), dummy_vox, dummy_coords, dummy_mask,
            dummy_img, *extra)
    elif cfg.fusion_mode == "pm":
        P = cfg.max_points
        params = jax.jit(model.init)(
            jax.random.key(rng_seed),
            jnp.zeros((1, P, 7)), jnp.zeros((1, P), bool),
            jnp.full((1, P), V, jnp.int32),
            jnp.zeros((1, V), jnp.int32), dummy_coords, dummy_mask)
    else:
        params = jax.jit(model.init)(
            jax.random.key(rng_seed), dummy_vox, dummy_coords, dummy_mask)

    if image_weights is not None and with_images:
        params = _install_image_weights(params, image_weights)

    from mvxnet_makise_tpu.train.state import make_apply

    state = TrainState.create(make_apply(model, cfg), params,
                              make_optimizer(cfg))
    return model, state


def _install_image_weights(params, torch_state_dict):
    """Graft torchvision backbone weights into the image extractor."""
    from mvxnet_makise_tpu.models.resnet_fpn import (
        load_torchvision_fpn_weights)

    imported = load_torchvision_fpn_weights(torch_state_dict)["params"]
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    params["params"]["head"]["extractor"] = imported
    return params


def _flush_metrics(tracker, pending) -> None:
    """Move accumulated on-device step metrics to the tracker with one
    packed readback (per-step scalar fetches cost a full round trip
    per leaf on relayed backends — see utils/relay_io)."""
    if not pending:
        return
    from mvxnet_makise_tpu.utils.relay_io import tree_device_get_packed

    for m in tree_device_get_packed(list(pending)):
        tracker.update(m)
    pending.clear()


def train(cfg: Config,
          frames: Sequence[KittiFrame],
          *,
          gt_db=None,
          with_images: bool = True,
          resume_epoch: int = 0,
          num_epochs: Optional[int] = None,
          image_weights=None,
          log_every: int = 50,
          workers: Optional[int] = None,
          eval_frames: Optional[Sequence[KittiFrame]] = None,
          eval_every: int = 1,
          time_budget_s: Optional[float] = None) -> TrainState:
    """Run the training loop over in-RAM frames.  Returns final state.

    ``time_budget_s``: stop cleanly after the last fully-checkpointed
    epoch once the wall-clock budget is spent.  For schedulers that
    enforce hard job deadlines, a clean early exit (checkpoint intact,
    device connection closed) beats being SIGKILLed mid-save — killed
    runs can leave partial orbax tmp dirs and, on remote/relayed
    accelerators, a stale device lease that stalls the next job."""
    import time as _time

    t_start = _time.monotonic()
    num_epochs = num_epochs or cfg.num_epochs
    anchors = create_anchors(cfg.feature_map_shape, cfg.velo_range,
                             cfg.anchor_sizes)
    model, state = build_model_and_state(cfg, with_images,
                                         image_weights=image_weights)
    if resume_epoch > 0:
        state = ckpt.restore_checkpoint(cfg.checkpoint_dir, resume_epoch,
                                        state)

    step = make_full_train_step(cfg, anchors, with_images)
    timer = PhaseTimer()
    key = jax.random.key(cfg.seed)

    frames = list(frames)
    B = cfg.batch_size
    workers = workers if workers is not None else cfg.num_workers

    for epoch in range(resume_epoch, resume_epoch + num_epochs):
        random.Random(cfg.seed + epoch).shuffle(frames)
        tracker = LossTracker()

        def prep(args):
            # a PRIVATE generator per frame: numpy Generators are not
            # thread-safe, and per-frame seeding keeps the pipeline
            # deterministic under any thread interleaving
            idx, fr = args
            frame_rng = np.random.default_rng(
                np.random.SeedSequence([cfg.seed, epoch, idx]))
            augmenter = (SceneAugmenter(cfg, gt_db, rng=frame_rng)
                         if gt_db else None)
            return preprocess_train_frame(fr, cfg, augmenter, frame_rng)

        with cf.ThreadPoolExecutor(max_workers=max(workers, 1)) as pool:
            prepped = pool.map(prep, enumerate(frames))
            batch_buf: List[FrameArrays] = []
            pending: List[dict] = []
            it = 0
            for fa_cls in prepped:
                batch_buf.append(fa_cls)
                if len(batch_buf) < B:
                    continue
                with timer.phase("host_collate"):
                    pts = np.stack([f.points for f, _ in batch_buf])
                    nps = np.asarray(
                        [f.num_points for f, _ in batch_buf], np.int32)
                    imgs = np.stack([f.image for f, _ in batch_buf])
                    gts = np.stack([f.gt_boxes for f, _ in batch_buf])
                    gms = np.stack([f.gt_mask for f, _ in batch_buf])
                    gcs = np.stack([c for _, c in batch_buf])
                batch_buf = []
                key, sub = jax.random.split(key)
                # NB: dispatch is async — this phase measures enqueue
                # time only; actual device execution is absorbed by the
                # epoch-end "device_wait" barrier below (or by whatever
                # phase blocks first)
                with timer.phase("device_dispatch"):
                    state, metrics = step(state, pts, nps, imgs, gts,
                                          gms, gcs, sub)
                    # metrics stay on-device; fetching scalars per step
                    # costs one round trip per leaf on relayed backends
                    pending.append(metrics)
                it += 1
                if it % log_every == 0:
                    _flush_metrics(tracker, pending)
                    print(f"epoch {epoch + 1} it {it}: "
                          f"avg cls {tracker.average('cls_loss'):.6f} "
                          f"avg reg {tracker.average('reg_loss'):.6f} "
                          f"max cls {tracker.maximum('cls_loss'):.6f} "
                          f"max reg {tracker.maximum('reg_loss'):.6f}")

        _flush_metrics(tracker, pending)

        # drain the async dispatch queue inside a dedicated phase so
        # device execution time lands in "device_wait", not in whatever
        # phase happens to block next
        with timer.phase("device_wait"):
            jax.block_until_ready(state.step)

        with timer.phase("checkpoint"):
            ckpt.save_checkpoint(cfg.checkpoint_dir, epoch + 1, state)
            if cfg.checkpoint_keep_last:
                ckpt.prune_checkpoints(cfg.checkpoint_dir,
                                       cfg.checkpoint_keep_last)

        # periodic validation (no reference counterpart — its eval was
        # never committed, SURVEY.md §6)
        if eval_frames and (epoch + 1 - resume_epoch) % eval_every == 0:
            from mvxnet_makise_tpu.eval.runner import run_eval

            with timer.phase("eval"):
                res = run_eval(cfg, list(eval_frames), state.params,
                               model, with_images,
                               batch_size=min(cfg.batch_size, 4))
            for cname, buckets in res.items():
                r = buckets["all"]
                print(f"epoch {epoch + 1} val {cname}: "
                      f"AP={r['ap']:.4f} R={r['recall']:.4f} "
                      f"gt={r['num_gt']}")
        print(f"epoch {epoch + 1} done | {timer.report()}")
        if time_budget_s is not None \
                and _time.monotonic() - t_start > time_budget_s:
            print(f"time budget ({time_budget_s:.0f}s) spent — stopping "
                  f"after epoch {epoch + 1} (resume with -r {epoch + 1})")
            break
    return state
