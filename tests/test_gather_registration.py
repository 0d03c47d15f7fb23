"""Registration of the FPN gather across image_min_side settings.

At non-default min_side the pad-to-32 fraction of the transformed image
grows (10.8% of rows at min_side=512 on KITTI 370x1224), and mapping
original pixels through the RAW image size would land bottom/right
points in the zero-padded feature border.  gather_image_size() returns
the content-correct effective size for those settings while preserving
the reference's own padded-map convention at the 800 default
(/root/reference/modules/imhead/Pipe.py:41-45).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mvxnet_makise_tpu.models.image_head import (
    _MIN_SIZE,
    _transform_scale,
    gather_image_size,
    transform_output_shape,
)
from mvxnet_makise_tpu.ops.gather import (
    bilinear_gather_fpn,
    bilinear_gather_fpn_batch,
)

KITTI = (370, 1224)


def test_default_min_side_keeps_reference_convention():
    assert gather_image_size(KITTI, _MIN_SIZE) == (370.0, 1224.0)


def test_supra_800_clamps_to_torchvision_cap():
    # torchvision's max-side cap is FIXED at 1333; at KITTI aspect it
    # binds for every min_side >= ~735, so 1000 must behave like 800
    assert _transform_scale(*KITTI, 1000.0) == _transform_scale(*KITTI,
                                                                800.0)
    assert transform_output_shape(KITTI, 1000.0) == \
        transform_output_shape(KITTI, 800.0)


@pytest.mark.parametrize("min_side", [600.0, 512.0, 400.0, 0.0])
def test_effective_size_maps_content_not_padding(min_side):
    (rh, rw), (ph, pw) = transform_output_shape(KITTI, min_side)
    eh, ew = gather_image_size(KITTI, min_side)
    stride = 8
    Hf, Wf = ph // stride, pw // stride
    # the bottom-right ORIGINAL pixel must map to the last resized
    # content cell, not into the padded border
    r_cell = (KITTI[0] - 1) / (eh / Hf)
    c_cell = (KITTI[1] - 1) / (ew / Wf)
    assert r_cell <= rh / stride + 1e-6
    assert c_cell <= rw / stride + 1e-6
    # and the mapping must still cover (nearly) the full content extent
    assert r_cell > (rh / stride) * 0.99 - 1
    assert c_cell > (rw / stride) * 0.99 - 1


@pytest.mark.parametrize("batched", [False, True])
def test_gather_hits_content_at_small_min_side(batched):
    """A feature map that is 1 on resized content and 0 on the pad
    border must gather ~1 at every in-image point when mapped through
    gather_image_size — the raw-size mapping used to read the zero pad
    for bottom-rows at min_side=512."""
    min_side = 512.0
    (rh, rw), (ph, pw) = transform_output_shape(KITTI, min_side)
    stride = 8
    Hf, Wf = ph // stride, pw // stride
    # cells receiving any resized-content rows (the last one partially)
    ch = -(-rh // stride)
    cw = -(-rw // stride)
    feat = np.zeros((Hf, Wf, 4), np.float32)
    feat[:ch, :cw] = 1.0

    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(0, KITTI[0] - 1, 256),
                    rng.uniform(0, KITTI[1] - 1, 256)], axis=-1)
    valid = np.ones(256, bool)
    gsize = gather_image_size(KITTI, min_side)
    if batched:
        out = bilinear_gather_fpn_batch(
            (jnp.asarray(feat)[None],), jnp.asarray(pts)[None],
            jnp.asarray(valid)[None], gsize)[0]
    else:
        out = bilinear_gather_fpn((jnp.asarray(feat),), jnp.asarray(pts),
                                  jnp.asarray(valid), gsize)
    # interior points interpolate between 1-cells only; the last partial
    # cell may blend with its clamped neighbour, so allow the boundary
    # row/col to dip slightly
    out = np.asarray(out)
    assert float(out.min()) > 0.45, float(out.min())
    assert np.mean(out > 0.99) > 0.9

    # the OLD mapping (raw image size) demonstrably read the zero pad
    old = bilinear_gather_fpn((jnp.asarray(feat),), jnp.asarray(pts),
                              jnp.asarray(valid), KITTI)
    assert float(np.asarray(old).min()) < 0.05
