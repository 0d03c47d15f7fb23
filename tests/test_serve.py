"""Serving API test: raw frames in, detections out (tiny config)."""

import numpy as np
import pytest

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.data.synthetic import synthetic_frame
from mvxnet_makise_tpu.serve import Detector
from mvxnet_makise_tpu.train.loop import build_model_and_state

CFG = Config(
    velo_range=(0.0, -8.0, -3.0, 12.8, 8.0, 1.0),
    voxel_shape=(32, 32, 10),
    image_size=(64, 96),
    max_points=1024, max_voxels=128, max_boxes=4,
    samples_per_voxel=8, assign_window=6)


@pytest.mark.slow
def test_detector_end_to_end(rng):
    model, state = build_model_and_state(CFG, with_images=True)
    det = Detector(CFG, model, state.params, with_images=True,
                   score_threshold=0.0)

    frames = []
    for _ in range(2):
        pts, calib, image, _ = synthetic_frame(rng, CFG, num_cars=2,
                                               num_points=1200)
        frames.append((pts, calib, image))

    results = det.detect_frames(frames)
    assert len(results) == 2
    for r in results:
        assert r.boxes.ndim == 2 and r.boxes.shape[1] == 7
        assert len(r.boxes) == len(r.scores) == len(r.classes)
        assert np.all(np.isfinite(r.boxes))
        # untrained params: any detections are fine, but classes must be
        # valid indices
        if len(r.classes):
            assert r.classes.max() < CFG.num_classes

    # second call reuses the compiled pipeline
    results2 = det.detect_frames(frames)
    np.testing.assert_allclose(results[0].scores, results2[0].scores)
