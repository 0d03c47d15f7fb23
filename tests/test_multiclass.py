"""Multi-class anchors/assignment/decode tests (framework extension —
the reference is Car-only, config.yml carsize)."""

import numpy as np
import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.ops import assign_anchor_targets, create_anchors
from mvxnet_makise_tpu.eval.decode import decode_predictions

CFG3 = Config(target_classes=("Car", "Pedestrian", "Cyclist"),
              augment_fill_to=(12, 8, 8))


def test_config_derives_class_params():
    assert CFG3.num_classes == 3
    assert CFG3.anchors_per_loc == 6
    assert CFG3.anchor_sizes[0] == (3.9, 1.6, 1.56)
    assert CFG3.anchor_sizes[1] == (0.8, 0.6, 1.73)
    assert CFG3.class_neg_thresholds == (0.45, 0.35, 0.35)
    assert CFG3.class_pos_thresholds == (0.6, 0.5, 0.5)


def test_multiclass_anchor_layout():
    a = create_anchors(CFG3.feature_map_shape, CFG3.velo_range,
                       CFG3.anchor_sizes)
    assert a.shape == (176, 200, 6, 7)
    np.testing.assert_allclose(a[0, 0, 0, 3:6], (3.9, 1.6, 1.56))
    np.testing.assert_allclose(a[0, 0, 2, 3:6], (0.8, 0.6, 1.73))
    np.testing.assert_allclose(a[0, 0, 4, 3:6], (1.76, 0.6, 1.73))
    np.testing.assert_allclose(a[..., 0::2, 6], 0.0)
    np.testing.assert_allclose(a[..., 1::2, 6], np.pi / 2)


def test_multiclass_assignment_routes_to_class_slots():
    anchors = create_anchors(CFG3.feature_map_shape, CFG3.velo_range,
                             CFG3.anchor_sizes)
    # one GT per class, sitting exactly on an anchor of its class
    gt = np.stack([anchors[60, 50, 0], anchors[100, 120, 2],
                   anchors[140, 80, 4]]).astype(np.float32)
    classes = np.array([0, 1, 2], np.int32)
    t = assign_anchor_targets(
        jnp.asarray(gt), jnp.ones(3, bool),
        grid_hw=CFG3.feature_map_shape, velo_range=CFG3.velo_range,
        box_size=CFG3.anchor_sizes,
        neg_threshold=CFG3.class_neg_thresholds,
        pos_threshold=CFG3.class_pos_thresholds,
        window=CFG3.assign_window, gt_classes=jnp.asarray(classes))
    t = jax.tree.map(np.asarray, t)
    assert t.pos.shape == (176, 200, 6)
    # each GT positive only in its own class's slots
    assert t.pos[60, 50, 0] and t.gt_index[60, 50, 0] == 0
    assert t.pos[100, 120, 2] and t.gt_index[100, 120, 2] == 1
    assert t.pos[140, 80, 4] and t.gt_index[140, 80, 4] == 2
    # the car's cell has no pedestrian/cyclist positives
    assert not t.pos[60, 50, 2:].any()
    # a class's GT does not mark other classes' slots anywhere
    pos_per_slot = t.pos.reshape(-1, 6).any(axis=0)
    assert pos_per_slot[0] and pos_per_slot[2] and pos_per_slot[4]


def test_decode_assigns_class_ids():
    anchors = jnp.asarray(create_anchors(
        CFG3.feature_map_shape, CFG3.velo_range, CFG3.anchor_sizes))
    H, W, A, _ = anchors.shape
    score = np.zeros((H, W, A), np.float32)
    score[30, 30, 3] = 0.9   # pedestrian yaw-90 slot
    score[90, 90, 0] = 0.8   # car yaw-0 slot
    det = decode_predictions(
        jnp.asarray(score), jnp.zeros((H, W, A * 7)), anchors,
        score_threshold=0.5)
    v = np.asarray(det.valid)
    cls = np.asarray(det.classes)[v]
    sc = np.asarray(det.scores)[v]
    assert v.sum() == 2
    order = np.argsort(-sc)
    np.testing.assert_array_equal(cls[order], [1, 0])
    np.testing.assert_allclose(sc[order], [0.9, 0.8], atol=1e-5)
