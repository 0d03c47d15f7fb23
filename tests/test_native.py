"""Native C++ host kernels vs numpy oracle (identical semantics pairs)."""

import numpy as np
import pytest

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.data import native
from mvxnet_makise_tpu.data.synthetic import toy_calib

CFG = Config()

needs_native = pytest.mark.skipif(
    not native.available(), reason="g++ build unavailable")


def make_cloud(rng, n=5000):
    pts = np.zeros((n, 4), dtype=np.float32)
    pts[:, 0] = rng.uniform(-10, 80, n)
    pts[:, 1] = rng.uniform(-50, 50, n)
    pts[:, 2] = rng.uniform(-4, 2, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    return pts


@needs_native
def test_crop_project_matches_numpy(rng):
    pts = make_cloud(rng)
    calib = toy_calib(CFG.image_size)
    a = native.crop_project(pts, calib, CFG.velo_range, CFG.image_size)
    b = native.crop_project_numpy(pts, calib, CFG.velo_range, CFG.image_size)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)
    assert len(a) > 100  # the frustum keeps a meaningful subset


@needs_native
def test_crop_range_half_open_bounds(rng):
    pts = make_cloud(rng)
    # plant exact-boundary points
    pts[0, :3] = [0.0, -40.0, -3.0]     # low edge: kept
    pts[0, 3] = 0.12345
    pts[1, :3] = [np.float32(70.4), 0.0, 0.0]   # high edge: dropped
    pts[1, 3] = 0.54321
    out = native.crop_range(pts, CFG.velo_range)
    lo = np.asarray(CFG.velo_range[:3])
    hi = np.asarray(CFG.velo_range[3:6])
    assert np.all((out[:, :3] >= lo) & (out[:, :3] < hi))
    assert np.float32(0.12345) in out[:, 3]
    assert np.float32(0.54321) not in out[:, 3]


@needs_native
def test_assemble_frame_pads_and_shuffles(rng):
    pts = make_cloud(rng, 3000)
    calib = toy_calib(CFG.image_size)
    cap = 4096
    buf, n = native.assemble_frame(pts, calib, CFG.velo_range,
                                   CFG.image_size, cap, seed=7)
    assert buf.shape == (cap, 6)
    assert 0 < n < cap
    assert np.all(buf[n:] == 0)
    # same rows as the numpy crop, order-independent
    ref = native.crop_project_numpy(pts, calib, CFG.velo_range,
                                    CFG.image_size)
    assert n == len(ref)
    a = buf[:n][np.lexsort(buf[:n].T)]
    b = ref[np.lexsort(ref.T)]
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)
    # different seed -> different order
    buf2, _ = native.assemble_frame(pts, calib, CFG.velo_range,
                                    CFG.image_size, cap, seed=8)
    assert not np.array_equal(buf, buf2)


@needs_native
def test_assemble_frame_truncates_at_capacity(rng):
    pts = make_cloud(rng, 8000)
    calib = toy_calib(CFG.image_size)
    cap = 64
    buf, n = native.assemble_frame(pts, calib, CFG.velo_range,
                                   CFG.image_size, cap, seed=0)
    assert n == cap
    assert buf.shape == (cap, 6)
    assert np.all(buf[:, 0] >= 0)


def test_assemble_batch_pooled_matches_serial(rng):
    """The serve-time thread-pooled batch assemble must be bit-identical
    to the serial path (fixed per-frame seed, disjoint row writes)."""
    from concurrent.futures import ThreadPoolExecutor

    calib = toy_calib(CFG.image_size)
    image = rng.uniform(0, 255, (*CFG.image_size, 3)).astype(np.float32)
    frames = [(make_cloud(rng, 4000), calib, image) for _ in range(5)]
    B = 8  # pad rows 5..7 stay zero
    serial = native.assemble_batch(frames, CFG.velo_range,
                                   CFG.image_size, CFG.max_points, B)
    with ThreadPoolExecutor(max_workers=4) as pool:
        pooled = native.assemble_batch(frames, CFG.velo_range,
                                       CFG.image_size, CFG.max_points, B,
                                       pool=pool)
    for a, b in zip(serial, pooled):
        np.testing.assert_array_equal(a, b)
    assert serial[1][:5].min() > 0 and serial[1][5:].max() == 0
