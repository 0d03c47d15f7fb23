"""Parity against the reference's OWN C++ kernels (VERDICT r1 missing #3).

Builds /root/reference/cpp/voxelutil.cpp with torch.utils.cpp_extension
(g++ + ninja, both in this image) and uses it as the ground-truth oracle:

  * voxelizer: ops.voxelize vs ``cpp._group`` + the group_ centroid
    post-processing (/root/reference/modules/data/Preprocessing.py:57-73),
    permutation-invariant voxel-set comparison with exact per-voxel
    sample order;
  * target assignment: ops.assign_anchor_targets vs
    ``cpp._classifyAnchors`` (the spiral with the 0.1 early break,
    voxelutil.cpp:138-316) with the centre-cell rounding of
    Calc.py:88-96, on random scenes of <= 5 boxes (the reference's
    bboxOverlap scratch OOB bug needs >= 6 boxes in *that* function;
    classifyAnchors itself is safe, we stay conservative anyway).

The earlier suites test against builder-written twins; this file is the
only one whose oracle is the reference's actual compiled code.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF_CPP = "/root/reference/cpp/voxelutil.cpp"


@pytest.fixture(scope="module")
def cpp():
    import os
    import shutil
    import tempfile

    if shutil.which("g++") is None or shutil.which("ninja") is None:
        pytest.skip("no host toolchain for the reference extension")
    from torch.utils import cpp_extension

    build_dir = os.path.join(tempfile.gettempdir(),
                             "voxelutil_ref_oracle_build")
    os.makedirs(build_dir, exist_ok=True)
    try:
        return cpp_extension.load(
            name="voxelutil", sources=[REF_CPP],
            build_directory=build_dir, verbose=False)
    except Exception as e:  # toolchain quirk, not a parity failure
        pytest.skip(f"reference extension failed to build: {e}")


def _random_cloud(rng, n, velo_range):
    pts = np.zeros((n, 4), np.float32)
    lo, hi = np.array(velo_range[:3]), np.array(velo_range[3:6])
    pts[:, :3] = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    pts[:, 3] = rng.uniform(0, 1, n).astype(np.float32)
    # clamp away from the upper boundary so int binning matches floor
    pts[:, :3] = np.minimum(pts[:, :3], (hi - 1e-4).astype(np.float32))
    return pts


def test_voxelizer_matches_reference_group(cpp):
    from mvxnet_makise_tpu.ops.voxelize import voxelize

    velo_range = (0.0, -20.0, -3.0, 35.2, 20.0, 1.0)
    grid_shape = (176, 200, 10)
    voxel_size = tuple(
        (velo_range[i + 3] - velo_range[i]) / grid_shape[i]
        for i in range(3))
    T = 5  # small cap so the capping path is exercised hard
    rng = np.random.default_rng(11)
    pts = _random_cloud(rng, 4000, velo_range)
    # densify: collapse many points into few cells to force T-capping;
    # re-clamp into range afterwards (the real pipeline range-crops
    # before grouping — Preprocessing.crop runs first — and the
    # reference's trunc-toward-zero binning only equals floor for
    # in-range points)
    pts[1000:3000, :3] = np.tile(pts[:100, :3], (20, 1)) + rng.uniform(
        -0.04, 0.04, (2000, 3)).astype(np.float32)
    lo = np.array(velo_range[:3], np.float32)
    hi = np.array(velo_range[3:6], np.float32)
    pts[:, :3] = np.clip(pts[:, :3], lo, hi - 1e-4)

    # ---- reference path: cpp._group + group_'s centroid post-process
    low = np.array(velo_range[:3], np.float32)
    idx = ((pts[:, :3] - low) / np.array(voxel_size, np.float32)
           ).astype("int32")
    voxel_ref, uidx, cnt_ref = cpp._group(pts, idx, T)
    center = voxel_ref[..., :3].sum(axis=1) / cnt_ref[:, None]
    voxel_ref[..., 3:6] = voxel_ref[..., :3] - center[:, None, :]
    coords_ref = np.array(uidx).T                       # (V, 3)

    # ---- our path (same input order: no shuffle on either side)
    P = 4096
    padded = np.zeros((P, 6), np.float32)
    padded[:len(pts), :4] = pts
    grid = jax.jit(lambda p, n: voxelize(
        p, n, velo_range=velo_range, voxel_size=voxel_size,
        grid_shape=grid_shape, max_voxels=4096, samples_per_voxel=T))(
        jnp.asarray(padded), jnp.int32(len(pts)))

    V = int(grid.num_voxels)
    assert V == len(coords_ref)
    ours = {tuple(c): i for i, c in enumerate(np.asarray(grid.coords)[:V])}
    counts = np.asarray(grid.counts)
    feats = np.asarray(grid.features)
    assert (counts[:V] <= T).all() and counts[:V].min() >= 1

    n_capped = 0
    for vi, c in enumerate(coords_ref):
        i = ours[tuple(c)]
        assert counts[i] == cnt_ref[vi]
        if cnt_ref[vi] == T:
            n_capped += 1
        k = int(cnt_ref[vi])
        # identical sample order: both keep first-k in input order
        np.testing.assert_allclose(
            feats[i, :k, :3], voxel_ref[vi, :k, :3], atol=1e-5)
        # centroid offsets
        np.testing.assert_allclose(
            feats[i, :k, 3:6], voxel_ref[vi, :k, 3:6], atol=1e-4)
        # reflectance: our channel 6 == reference channel 6
        np.testing.assert_allclose(
            feats[i, :k, 6], voxel_ref[vi, :k, 6], atol=1e-6)
        # empty slots zero on both sides (reference zero-fills voxelres,
        # but its offsets then hold -centroid; ours zero — the documented
        # at-source zeroing, ops/voxelize.py module docstring)
        np.testing.assert_array_equal(feats[i, k:, :3], 0)
    assert n_capped > 50  # the T-cap path really ran


def test_assignment_matches_reference_classify_anchors(cpp):
    from mvxnet_makise_tpu.geometry.boxes_np import bev_corners
    from mvxnet_makise_tpu.ops.assign import (assign_anchor_targets,
                                              create_anchors)

    velo_range = (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)
    grid_hw = (176, 200)
    size = (3.9, 1.6, 1.56)
    neg_thr, pos_thr = 0.45, 0.6

    anchors = create_anchors(grid_hw, velo_range, size)   # (H, W, 2, 7)
    anchor_bevs = bev_corners(
        anchors.reshape(-1, 7)).reshape(*grid_hw, 2, 4, 2)

    H, W = grid_hw
    ls = (velo_range[3] - velo_range[0]) / H
    ws = (velo_range[4] - velo_range[1]) / W

    total_pos = 0
    for seed in range(6):
        rng = np.random.default_rng(seed)
        G = int(rng.integers(1, 6))
        gts = np.zeros((G, 7), np.float32)
        gts[:, 0] = rng.uniform(5, 65, G)
        gts[:, 1] = rng.uniform(-35, 35, G)
        gts[:, 2] = -1.0
        gts[:, 3:6] = np.array(size) * rng.uniform(0.85, 1.25, (G, 3))
        gts[:, 6] = rng.uniform(-np.pi, np.pi, G)
        gt_bevs = bev_corners(gts).astype(np.float32)

        # reference centre-cell rounding (Calc.py:91-94, torch .long()
        # truncation — GT centres are far from 0 so trunc == floor)
        nls = ((gts[:, 0] - velo_range[0] - ls / 2) / ls + 0.5
               ).astype(np.int64)
        nws = ((gts[:, 1] - velo_range[1] - ws / 2) / ws + 0.5
               ).astype(np.int64)

        pi, ni, gi = cpp._classifyAnchors(
            gt_bevs, anchor_bevs.astype(np.float32), nls, nws,
            neg_thr, pos_thr)

        pos_ref = np.zeros((H, W, 2), bool)
        ign_ref = np.zeros((H, W, 2), bool)
        gi_ref = np.full((H, W, 2), -1, np.int64)
        ign_ref[tuple(np.asarray(x) for x in ni)] = True
        px, py_, pz = (np.asarray(x) for x in pi)
        for k in range(len(px)):  # sequential: last writer wins
            pos_ref[px[k], py_[k], pz[k]] = True
            gi_ref[px[k], py_[k], pz[k]] = np.asarray(gi)[k]

        t = jax.tree.map(np.asarray, assign_anchor_targets(
            jnp.asarray(gts), jnp.ones(G, bool), grid_hw=grid_hw,
            velo_range=velo_range, box_size=size, neg_threshold=neg_thr,
            pos_threshold=pos_thr, window=12))

        np.testing.assert_array_equal(t.pos, pos_ref)
        np.testing.assert_array_equal(t.ignore, ign_ref)
        np.testing.assert_array_equal(t.gt_index[pos_ref],
                                      gi_ref[pos_ref])
        total_pos += pos_ref.sum()
    assert total_pos > 10  # the scenes produced real positives
