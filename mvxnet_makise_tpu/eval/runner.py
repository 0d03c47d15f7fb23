"""Evaluation runner: frames + params -> per-class difficulty-binned AP.

Shared by the evaluate CLI and the training loop's periodic validation.
(The reference ships no eval at all — SURVEY.md §6.)
"""

from __future__ import annotations

import numpy as np


def run_eval(cfg, frames, state_params, model, with_images: bool,
             score_threshold: float = 0.05,
             batch_size: int = 4,
             iou_threshold=None):
    """score_threshold default is LOW on purpose: AP integrates the
    precision/recall curve over the full score ranking, so evaluating at
    a serving threshold (0.3) silently truncates the curve and reports
    AP=0 for any model whose calibrated scores sit below it — which is
    every early/mid-training checkpoint.  Serving keeps its own
    threshold (serve.Detector)."""
    import jax
    import jax.numpy as jnp

    from mvxnet_makise_tpu.eval.ap import average_precision_3d
    from mvxnet_makise_tpu.eval.decode import decode_predictions
    from mvxnet_makise_tpu.ops import create_anchors
    from mvxnet_makise_tpu.train.loop import preprocess_train_frame
    from mvxnet_makise_tpu.train.state import cast_for_compute
    from mvxnet_makise_tpu.train.step import frames_to_batch

    anchors = jnp.asarray(create_anchors(
        cfg.feature_map_shape, cfg.velo_range, cfg.anchor_sizes))

    @jax.jit
    def infer(params, points, num_points, images):
        batch = frames_to_batch(
            points, num_points, images,
            jnp.zeros((points.shape[0], 1, 7)),
            jnp.zeros((points.shape[0], 1), bool), cfg)
        from mvxnet_makise_tpu.train.step import _model_inputs

        cparams = cast_for_compute(params, cfg.use_bf16)
        from mvxnet_makise_tpu.train.step import (
            cast_batch_for_compute)

        from mvxnet_makise_tpu.train.state import make_apply

        cbatch = cast_batch_for_compute(batch, cfg.use_bf16)
        score, reg = make_apply(model, cfg)(
            cparams, *_model_inputs(cbatch, with_images))
        return jax.vmap(lambda s, r: decode_predictions(
            s.astype(jnp.float32), r.astype(jnp.float32), anchors,
            score_threshold=score_threshold))(score, reg)

    # accumulate detections and GTs per class
    n_cls = cfg.num_classes
    dets = {c: [] for c in range(n_cls)}
    gts = {c: [] for c in range(n_cls)}
    difficulties = {c: [] for c in range(n_cls)}
    rng = np.random.default_rng(0)
    for i in range(0, len(frames), batch_size):
        chunk = frames[i:i + batch_size]
        if len(chunk) < batch_size:  # static-shape pipeline: pad the tail
            chunk = list(chunk) + [chunk[-1]] * (batch_size - len(chunk))
            real = len(frames) - i
        else:
            real = batch_size
        fas = [preprocess_train_frame(f, cfg, None, rng)[0] for f in chunk]
        pts = np.stack([f.points for f in fas])
        nps = np.asarray([f.num_points for f in fas], np.int32)
        imgs = np.stack([f.image for f in fas])
        decoded = jax.device_get(infer(state_params, pts, nps, imgs))
        for b, frame in enumerate(chunk[:real]):
            v = decoded.valid[b]
            dcls = decoded.classes[b][v]
            for ci, cname in enumerate(cfg.target_classes):
                sel = dcls == ci
                dets[ci].append((decoded.boxes[b][v][sel],
                                 decoded.scores[b][v][sel]))
                g = frame.boxes.get(cname)
                gts[ci].append(np.asarray(g, np.float32) if g is not None
                               and len(g) else np.zeros((0, 7), np.float32))
                d = frame.difficulty.get(cname)
                difficulties[ci].append(
                    np.asarray(d, np.int32) if d is not None and
                    d is not None and len(gts[ci][-1]) == len(d)
                    else np.full(len(gts[ci][-1]), 1, np.int32))

    # KITTI per-class IoU thresholds: Car 0.7, smaller classes 0.5
    results = {}
    buckets = {"easy": 0, "moderate": 1, "hard": 2}
    for ci, cname in enumerate(cfg.target_classes):
        thr = iou_threshold if iou_threshold is not None \
            else (0.7 if cname == "Car" else 0.5)
        out = {"all": average_precision_3d(dets[ci], gts[ci],
                                           iou_threshold=thr)}
        for bname, dmax in buckets.items():
            ignored = [~((d >= 0) & (d <= dmax)) for d in difficulties[ci]]
            out[bname] = average_precision_3d(
                dets[ci], gts[ci], iou_threshold=thr, gt_ignored=ignored)
        results[cname] = out
    return results


