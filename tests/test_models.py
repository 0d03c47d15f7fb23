"""Model tests: blocks, VoxelNet branch, ResNet-FPN import path, fusion.

Where torch (CPU) can serve as an oracle — conv weight layout mapping and
frozen-BN folding — we check numerics directly against torch ops.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.models import (
    ConvReluNorm,
    DenseReluNorm,
    ImageFeatureFusion,
    MVXNet,
    ResNet50FPN,
    VoxelNetBranch,
    load_torchvision_fpn_weights,
    masked_standardize,
    standardize,
)
from mvxnet_makise_tpu.models.image_head import (
    detection_transform,
    transform_output_shape,
)
from mvxnet_makise_tpu.ops.assign import AnchorTargets
from mvxnet_makise_tpu.train import voxel_loss


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def test_standardize_zero_mean_unit_var(rng):
    x = jnp.asarray(rng.normal(2.0, 3.0, (4, 8, 16)).astype(np.float32))
    y = np.asarray(standardize(x))
    np.testing.assert_allclose(y.mean(axis=(0, 1)), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.std(axis=(0, 1)), 1.0, atol=1e-3)


def test_masked_standardize_ignores_padding(rng):
    x = rng.normal(size=(10, 5, 8)).astype(np.float32)
    mask = np.zeros((10, 5), dtype=bool)
    mask[:6] = True
    # poison the masked-out region
    x[6:] = 1e6
    y = np.asarray(masked_standardize(jnp.asarray(x), jnp.asarray(mask)))
    # stats over the valid region only
    valid = y[:6].reshape(-1, 8)
    np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(valid.std(axis=0), 1.0, atol=1e-3)
    # matches plain standardize on the valid slice
    ref = np.asarray(standardize(jnp.asarray(x[:6])))
    np.testing.assert_allclose(y[:6], ref, rtol=1e-4, atol=1e-4)


def test_dense_relu_norm_shapes(rng):
    m = DenseReluNorm(16)
    x = jnp.asarray(rng.normal(size=(2, 10, 35, 8)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 10, 35, 16)


# ---------------------------------------------------------------------------
# torch oracles for conv layout + BN folding
# ---------------------------------------------------------------------------

def test_conv_import_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    x = rng.normal(size=(1, 4, 9, 11)).astype(np.float32)  # NCHW
    tconv = torch.nn.Conv2d(4, 6, 3, stride=2, padding=1, bias=False)
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x)).numpy()

    kernel = np.transpose(tconv.weight.detach().numpy(), (2, 3, 1, 0))
    fconv = nn.Conv(6, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False)
    fy = fconv.apply({"params": {"kernel": kernel}},
                     jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(fy), (0, 3, 1, 2)), ty, rtol=1e-4,
        atol=1e-4)


def test_bn_folding_matches_torch_eval(rng):
    torch = pytest.importorskip("torch")
    from mvxnet_makise_tpu.models.resnet_fpn import _fold_bn

    bn = torch.nn.BatchNorm2d(8)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(
            rng.normal(1, 0.2, 8).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(
            rng.normal(0, 0.2, 8).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(
            rng.normal(0, 1, 8).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(
            rng.uniform(0.5, 2, 8).astype(np.float32)))
    bn.eval()
    x = rng.normal(size=(2, 8, 5, 5)).astype(np.float32)
    with torch.no_grad():
        ty = bn(torch.from_numpy(x)).numpy()

    sd = {f"b.{k}": v.detach().numpy() for k, v in
          bn.state_dict().items() if "num_batches" not in k}
    folded = _fold_bn(sd, "b")
    fy = x * folded["scale"][None, :, None, None] + \
        folded["bias"][None, :, None, None]
    np.testing.assert_allclose(fy, ty, rtol=1e-4, atol=1e-4)


def test_deconv_matches_torch(rng):
    """flax ConvTranspose configs used by the RPN reproduce torch
    ConvTranspose2d (k3 s1 p1), (k2 s2 p0), (k4 s4 p0) output shapes."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    cases = [((3, 3), (1, 1), "SAME", 3, 1, 1),
             ((2, 2), (2, 2), "VALID", 2, 2, 0),
             ((4, 4), (4, 4), "VALID", 4, 4, 0)]
    x = rng.normal(size=(1, 4, 8, 10)).astype(np.float32)
    for fk, fs, fp, tk, ts, tp in cases:
        tdeconv = torch.nn.ConvTranspose2d(4, 6, tk, ts, tp, bias=False)
        with torch.no_grad():
            ty = tdeconv(torch.from_numpy(x)).numpy()
        fdeconv = nn.ConvTranspose(6, fk, strides=fs, padding=fp,
                                   use_bias=False)
        params = fdeconv.init(
            jax.random.key(0), jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        fy = fdeconv.apply(
            params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        assert np.transpose(np.asarray(fy), (0, 3, 1, 2)).shape == ty.shape


# ---------------------------------------------------------------------------
# ResNet50-FPN
# ---------------------------------------------------------------------------

def _fake_torchvision_state_dict(rng):
    """Random state_dict with torchvision fasterrcnn_resnet50_fpn_v2
    backbone key names and shapes."""
    sd = {}

    def conv(key, cout, cin, k):
        sd[key + ".weight"] = rng.normal(
            0, 0.05, (cout, cin, k, k)).astype(np.float32)

    def bn(key, c):
        sd[key + ".weight"] = rng.normal(1, 0.1, c).astype(np.float32)
        sd[key + ".bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[key + ".running_mean"] = rng.normal(0, 0.5, c).astype(np.float32)
        sd[key + ".running_var"] = rng.uniform(0.5, 2, c).astype(np.float32)

    conv("backbone.body.conv1", 64, 3, 7)
    bn("backbone.body.bn1", 64)
    cin = 64
    for li, blocks in enumerate([3, 4, 6, 3]):
        f = 64 * 2 ** li
        for bi in range(blocks):
            t = f"backbone.body.layer{li + 1}.{bi}"
            conv(t + ".conv1", f, cin if bi == 0 else f * 4, 1)
            bn(t + ".bn1", f)
            conv(t + ".conv2", f, f, 3)
            bn(t + ".bn2", f)
            conv(t + ".conv3", f * 4, f, 1)
            bn(t + ".bn3", f * 4)
            if bi == 0:
                conv(t + ".downsample.0", f * 4, cin, 1)
                bn(t + ".downsample.1", f * 4)
        cin = f * 4
    for li in range(4):
        cin_l = 256 * 2 ** li
        conv(f"backbone.fpn.inner_blocks.{li}.0", 256, cin_l, 1)
        bn(f"backbone.fpn.inner_blocks.{li}.1", 256)
        if li < 3:
            conv(f"backbone.fpn.layer_blocks.{li}.0", 256, 256, 3)
            bn(f"backbone.fpn.layer_blocks.{li}.1", 256)
    return sd


def test_resnet_fpn_import_and_forward(rng):
    sd = _fake_torchvision_state_dict(rng)
    params = load_torchvision_fpn_weights(sd)
    model = ResNet50FPN()
    x = jnp.asarray(rng.normal(size=(1, 64, 96, 3)).astype(np.float32))
    outs = model.apply(params, x)
    assert [tuple(o.shape) for o in outs] == [
        (1, 16, 24, 256), (1, 8, 12, 256), (1, 4, 6, 256)]
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))
    # structural check: imported tree matches random-init tree exactly
    init = model.init(jax.random.key(0), x)
    imported_paths = {"/".join(str(k) for k in p)
                      for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    init_paths = {"/".join(str(k) for k in p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(init)}
    assert imported_paths == init_paths
    chex_shapes = jax.tree.map(lambda a, b: a.shape == b.shape, params, init)
    assert all(jax.tree.leaves(chex_shapes))


def test_s2d_stem_equals_direct_conv(rng):
    """StemConv's space-to-depth refold is exact: same params, same
    output as the direct 7x7/2 conv (models/resnet_fpn.StemConv)."""
    from mvxnet_makise_tpu.models.resnet_fpn import StemConv

    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)).astype(np.float32))
    direct = StemConv(64, s2d=False)
    folded = StemConv(64, s2d=True)
    params = direct.init(jax.random.key(3), x)
    y0 = direct.apply(params, x)
    y1 = folded.apply(params, x)
    assert y0.shape == y1.shape == (2, 32, 48, 64)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)
    # odd-content edges: non-zero border pixels exercise the padding
    xb = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(direct.apply(params, xb)),
        np.asarray(folded.apply(params, xb)), rtol=1e-5, atol=1e-5)


def test_detection_transform_static_shape():
    (rh, rw), (ph, pw) = transform_output_shape((370, 1224))
    assert (ph % 32, pw % 32) == (0, 0)
    assert ph >= rh and pw >= rw
    img = jnp.zeros((370, 1224, 3))
    out = detection_transform(img)
    assert out.shape == (ph, pw, 3)
    # the max-side cap binds at KITTI aspect: scale = 1333/1224, NOT
    # 800/370 — the padded shape must be 416x1344 (docs/DESIGN.md)
    assert (ph, pw) == (416, 1344)


def test_detection_transform_min_side():
    # native scale (min_side <= 0): no resize, pad-to-32 only
    (rh, rw), (ph, pw) = transform_output_shape((370, 1224), 0)
    assert (rh, rw) == (370, 1224) and (ph, pw) == (384, 1248)
    img = jnp.ones((70, 100, 3), jnp.float32) * 0.5
    out = detection_transform(img, 0)
    assert out.shape == (96, 128, 3)
    # native content is the normalized input, untouched by resampling
    ref = (np.full((70, 100, 3), 0.5, np.float32)
           - np.array([0.485, 0.456, 0.406], np.float32)) \
        / np.array([0.229, 0.224, 0.225], np.float32)
    np.testing.assert_allclose(np.asarray(out)[:70, :100], ref, rtol=1e-6)
    # sub-reference min sides scale the max-side cap proportionally so
    # the long side shrinks too (not re-clamped at 1333)
    (rh2, rw2), _ = transform_output_shape((370, 1224), 400)
    assert rh2 == int(370 * (1333 / 2) / 1224)
    assert rw2 <= 1333 / 2
    # default argument reproduces the reference operating point exactly
    assert transform_output_shape((370, 1224), 800.0) \
        == transform_output_shape((370, 1224))


def test_pm_model_native_scale_forward(rng):
    """MVXNetPM with image_min_side=0 runs end-to-end and its params
    interchange with the default-transform model (the gather maps
    original pixels through the pyramid's own shape, so the parameter
    tree is resolution-independent)."""
    from mvxnet_makise_tpu.models.mvxnet import MVXNetPM

    B, P, V, T = 1, 64, 32, 8
    pts = rng.normal(size=(B, P, 6)).astype(np.float32)
    pts[..., 4] = rng.uniform(0, 60, (B, P))
    pts[..., 5] = rng.uniform(0, 90, (B, P))
    kept = np.ones((B, P), bool)
    seg = np.sort(rng.integers(0, V, (B, P))).astype(np.int32)
    counts = np.zeros((B, V), np.int32)
    np.add.at(counts, (0, seg[0]), 1)
    coords = np.stack([rng.integers(0, 16, (B, V)),
                       rng.integers(0, 16, (B, V)),
                       rng.integers(0, 10, (B, V))], -1).astype(np.int32)
    vmask = counts > 0
    images = rng.uniform(0, 1, (B, 64, 96, 3)).astype(np.float32)
    common = dict(grid_shape=(16, 16, 10), image_size=(64, 96),
                  samples_per_voxel=T)
    native = MVXNetPM(image_min_side=0.0, **common)
    params = native.init(jax.random.key(0), pts, kept, seg, counts,
                         coords, vmask, images)
    s, r = native.apply(params, pts, kept, seg, counts, coords, vmask,
                        images)
    assert s.shape == (B, 8, 8, 2) and r.shape == (B, 8, 8, 14)
    assert np.isfinite(np.asarray(s)).all()
    # same params apply under the reference transform
    s2, _ = MVXNetPM(**common).apply(params, pts, kept, seg, counts,
                                     coords, vmask, images)
    assert s2.shape == s.shape


# ---------------------------------------------------------------------------
# VoxelNet branch (scaled-down config)
# ---------------------------------------------------------------------------

SMALL_GRID = (16, 16, 10)   # nx, ny, nz


def _small_inputs(rng, B=1, V=32, T=8, C=7):
    voxels = rng.normal(size=(B, V, T, C)).astype(np.float32)
    coords = np.stack([
        rng.integers(0, SMALL_GRID[0], (B, V)),
        rng.integers(0, SMALL_GRID[1], (B, V)),
        rng.integers(0, SMALL_GRID[2], (B, V))], axis=-1).astype(np.int32)
    mask = np.ones((B, V), dtype=bool)
    mask[:, V - 4:] = False
    return jnp.asarray(voxels), jnp.asarray(coords), jnp.asarray(mask)


def test_voxelnet_branch_shapes(rng):
    model = VoxelNetBranch(grid_shape=SMALL_GRID)
    voxels, coords, mask = _small_inputs(rng)
    params = model.init(jax.random.key(0), voxels, coords, mask)
    score, reg = model.apply(params, voxels, coords, mask)
    assert score.shape == (1, 8, 8, 2)
    assert reg.shape == (1, 8, 8, 14)
    s = np.asarray(score)
    assert np.all((s >= 0) & (s <= 1))  # sigmoid activated


def test_voxelnet_branch_batch(rng):
    model = VoxelNetBranch(grid_shape=SMALL_GRID)
    voxels, coords, mask = _small_inputs(rng, B=2)
    params = model.init(jax.random.key(0), voxels, coords, mask)
    score, reg = model.apply(params, voxels, coords, mask)
    assert score.shape == (2, 8, 8, 2)


def test_voxelnet_gradients_flow(rng):
    model = VoxelNetBranch(grid_shape=SMALL_GRID)
    voxels, coords, mask = _small_inputs(rng)
    params = model.init(jax.random.key(0), voxels, coords, mask)

    def loss_fn(p):
        score, reg = model.apply(p, voxels, coords, mask)
        return jnp.sum(score) + jnp.sum(reg ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    nonzero = sum(np.any(np.asarray(g) != 0) for g in leaves)
    assert nonzero > len(leaves) * 0.8


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

def _loss_case(rng, H=8, W=8, A=2, G=3, npos=5):
    score = rng.uniform(0.01, 0.99, (H, W, A)).astype(np.float32)
    reg = rng.normal(size=(H, W, A * 7)).astype(np.float32)
    pos = np.zeros((H, W, A), dtype=bool)
    flat = rng.choice(H * W * A, npos, replace=False)
    pos.reshape(-1)[flat] = True
    ignore = pos.copy()
    more = rng.choice(H * W * A, 10, replace=False)
    ignore.reshape(-1)[more] = True
    gt_index = np.where(pos, rng.integers(0, G, (H, W, A)), -1).astype(np.int32)
    gt = rng.normal(size=(G, 7)).astype(np.float32)
    gt[:, 3:6] = np.abs(gt[:, 3:6]) + 1.0
    anchors = rng.normal(size=(H, W, A, 7)).astype(np.float32)
    anchors[..., 3:6] = np.abs(anchors[..., 3:6]) + 1.0
    return score, reg, pos, ignore, gt_index, gt, anchors


def _numpy_ref_loss(score, reg, pos, ignore, gt_index, gt, anchors,
                    a=1.5, b=1.0, eps=1e-6):
    """Hand-computed reference semantics (Loss.py:15-45)."""
    npos = pos.sum()
    nign = ignore.sum()
    size = score.size
    pos_term = (-np.log(score + eps))[pos].sum() / (npos + eps)
    neg_all = -np.log(1 - score + eps)
    neg_term = (neg_all.sum() - neg_all[ignore].sum()) / (size - nign + eps)
    cls = a * pos_term + b * neg_term

    if npos == 0:
        return cls, 0.0
    H, W, A = score.shape
    regr = reg.reshape(H, W, A, 7)[pos]
    al = anchors[pos]
    g = gt[gt_index[pos]]
    d = np.sqrt(al[:, 3] ** 2 + al[:, 4] ** 2)
    t = np.empty_like(g)
    t[:, 0] = (g[:, 0] - al[:, 0]) / d
    t[:, 1] = (g[:, 1] - al[:, 1]) / d
    t[:, 2] = (g[:, 2] - al[:, 2]) / al[:, 5]
    t[:, 3:6] = np.log(g[:, 3:6] / al[:, 3:6])
    t[:, 6] = g[:, 6] - al[:, 6]
    diff = np.abs(regr - t)
    sl1 = np.where(diff < 1, 0.5 * diff ** 2, diff - 0.5)
    return cls, sl1.mean()


def test_loss_matches_reference_semantics(rng):
    score, reg, pos, ignore, gt_index, gt, anchors = _loss_case(rng)
    targets = AnchorTargets(pos=jnp.asarray(pos), ignore=jnp.asarray(ignore),
                            gt_index=jnp.asarray(gt_index))
    total, metrics = voxel_loss(
        jnp.asarray(score), jnp.asarray(reg), targets, jnp.asarray(gt),
        jnp.asarray(anchors))
    exp_cls, exp_reg = _numpy_ref_loss(
        score, reg, pos, ignore, gt_index, gt, anchors)
    np.testing.assert_allclose(float(metrics["cls_loss"]), exp_cls, rtol=1e-4)
    np.testing.assert_allclose(float(metrics["reg_loss"]), exp_reg, rtol=1e-4)
    np.testing.assert_allclose(float(total), exp_cls + exp_reg, rtol=1e-4)


def test_loss_focal_mode(rng):
    """Focal mode: exact numpy oracle + the property that motivates it —
    a negative anchor's gradient is NOT diluted by the anchor count
    (both terms normalize by num_pos)."""
    score, reg, pos, ignore, gt_index, gt, anchors = _loss_case(rng)
    targets = AnchorTargets(pos=jnp.asarray(pos), ignore=jnp.asarray(ignore),
                            gt_index=jnp.asarray(gt_index))
    g, a = 2.0, 0.25
    total, metrics = voxel_loss(
        jnp.asarray(score), jnp.asarray(reg), targets, jnp.asarray(gt),
        jnp.asarray(anchors), mode="focal", focal_gamma=g, focal_alpha=a)
    npos = max(pos.sum(), 1)
    pos_t = (a * (1 - score) ** g * -np.log(score + 1e-6))[pos].sum() / npos
    neg_t = ((1 - a) * score ** g *
             -np.log(1 - score + 1e-6))[~ignore].sum() / npos
    np.testing.assert_allclose(float(metrics["cls_loss"]),
                               1.5 * pos_t + neg_t, rtol=1e-4)
    assert np.isfinite(float(total))

    # gradient scale: with moderate scores (no CE blow-ups), the mean
    # per-anchor cls gradient of a negative is diluted ~total/num_pos
    # (>100x) under reference normalization; focal keeps it within ~30x
    # of a positive's — the property that prevents the prior collapse.
    import jax

    def cls_of(s, mode):
        _, m = voxel_loss(s, jnp.asarray(reg), targets, jnp.asarray(gt),
                          jnp.asarray(anchors), mode=mode)
        return m["cls_loss"]

    s = jnp.asarray(np.clip(score, 0.3, 0.7))
    ratios = {}
    for mode in ("focal", "reference"):
        grad = jax.grad(lambda x: cls_of(x, mode))(s)
        gpos = np.abs(np.asarray(grad)[pos]).mean()
        gneg = np.abs(np.asarray(grad)[~ignore]).mean()
        ratios[mode] = gpos / max(gneg, 1e-12)
    assert ratios["focal"] < 30.0, ratios
    # dilution factor removed by focal mode scales with the case's
    # anchor/positive count — assert the relative effect, not an
    # absolute that depends on grid size
    assert ratios["reference"] > 20.0 * ratios["focal"], ratios


def test_loss_no_gt_frame(rng):
    score, reg, *_ = _loss_case(rng)
    H, W, A = score.shape
    empty = AnchorTargets(
        pos=jnp.zeros((H, W, A), bool), ignore=jnp.zeros((H, W, A), bool),
        gt_index=jnp.full((H, W, A), -1, jnp.int32))
    gt = jnp.ones((1, 7))
    anchors = jnp.ones((H, W, A, 7))
    total, metrics = voxel_loss(
        jnp.asarray(score), jnp.asarray(reg), empty, gt, anchors)
    # degenerates to mean(-log(1 - score + eps)) (Loss.py:17-19)
    expect = (-np.log(1 - score + 1e-6)).mean()
    np.testing.assert_allclose(float(total), expect, rtol=1e-4)
    assert float(metrics["reg_loss"]) == 0.0


# ---------------------------------------------------------------------------
# fusion + full MVXNet (tiny)
# ---------------------------------------------------------------------------

def test_image_fusion_shapes(rng):
    m = ImageFeatureFusion()
    x = jnp.asarray(rng.normal(size=(1, 16, 8, 768)).astype(np.float32))
    mask = jnp.ones((1, 16), bool)
    params = m.init(jax.random.key(0), x, mask)
    y = m.apply(params, x, mask)
    assert y.shape == (1, 16, 8, 16)


@pytest.mark.slow
def test_mvxnet_tiny_end_to_end(rng):
    model = MVXNet(grid_shape=SMALL_GRID, image_size=(64, 96))
    B, V, T = 1, 16, 4
    voxels = rng.normal(size=(B, V, T, 9)).astype(np.float32)
    voxels[..., 7] = rng.uniform(0, 63, (B, V, T))
    voxels[..., 8] = rng.uniform(0, 95, (B, V, T))
    coords = np.stack([
        rng.integers(0, SMALL_GRID[0], (B, V)),
        rng.integers(0, SMALL_GRID[1], (B, V)),
        rng.integers(0, SMALL_GRID[2], (B, V))], axis=-1).astype(np.int32)
    mask = np.ones((B, V), dtype=bool)
    images = rng.uniform(0, 1, (B, 64, 96, 3)).astype(np.float32)

    args = (jnp.asarray(voxels), jnp.asarray(coords), jnp.asarray(mask),
            jnp.asarray(images))
    params = model.init(jax.random.key(0), *args)
    score, reg = model.apply(params, *args)
    assert score.shape == (B, 8, 8, 2)
    assert reg.shape == (B, 8, 8, 14)
    assert np.all(np.isfinite(np.asarray(score)))
    assert np.all(np.isfinite(np.asarray(reg)))


def test_voxelnet_remat_matches_plain(rng):
    """remat=True must be numerically identical (same params tree)."""
    plain = VoxelNetBranch(grid_shape=SMALL_GRID)
    remat = VoxelNetBranch(grid_shape=SMALL_GRID, remat=True)
    voxels, coords, mask = _small_inputs(rng)
    params = plain.init(jax.random.key(0), voxels, coords, mask)
    s1, r1 = plain.apply(params, voxels, coords, mask)
    s2, r2 = remat.apply(params, voxels, coords, mask)
    # remat recomputation reassociates float ops; the stacked norms
    # amplify that, so check correlation + a small absolute bound
    s1, s2 = np.asarray(s1), np.asarray(s2)
    assert np.corrcoef(s1.ravel(), s2.ravel())[0, 1] > 0.9999
    assert np.max(np.abs(s1 - s2)) < 5e-3
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-2)

    g1 = jax.grad(lambda p: jnp.sum(
        plain.apply(p, voxels, coords, mask)[0]))(params)
    g2 = jax.grad(lambda p: jnp.sum(
        remat.apply(p, voxels, coords, mask)[0]))(params)
    flat1 = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(g1)])
    flat2 = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(g2)])
    assert np.corrcoef(flat1, flat2)[0, 1] > 0.99


def test_cml_depth_fold_matches_3d(rng):
    """Depth-folded CML == naive 3D conv CML with the same params."""
    from mvxnet_makise_tpu.models.voxelnet import MiddleConvLayers

    x = jnp.asarray(rng.normal(size=(1, 10, 24, 20, 16)).astype(np.float32))
    folded = MiddleConvLayers(fold_depth=True)
    naive = MiddleConvLayers(fold_depth=False)
    params = naive.init(jax.random.key(0), x)
    # identical param trees
    p2 = folded.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    y_naive = np.asarray(naive.apply(params, x))
    y_fold = np.asarray(folded.apply(params, x))
    assert y_naive.shape == y_fold.shape == (1, 2, 24, 20, 64)
    np.testing.assert_allclose(y_fold, y_naive, rtol=1e-3, atol=1e-4)



def test_bf16_compute_path_stays_bf16(rng):
    """The fused flagship model must run bf16 END TO END when
    use_bf16=True.  Regression guard for the round-4 find: the
    detection transform's f32 numpy mean/std promoted bf16 images to
    f32, and because every later stage inherits the pyramid's dtype the
    whole model (image branch, VFE, CML, RPN) silently computed in f32
    on TPU (models/image_head.detection_transform)."""
    from mvxnet_makise_tpu.config import Config
    from mvxnet_makise_tpu.train.loop import build_model_and_state
    from mvxnet_makise_tpu.train.state import cast_for_compute, make_apply
    from mvxnet_makise_tpu.train.step import (_model_inputs,
                                              cast_batch_for_compute,
                                              frames_to_batch)

    cfg = Config(use_bf16=True, batch_size=1, max_points=128,
                 max_voxels=64, voxel_shape=(16, 16, 10),
                 image_size=(64, 96), samples_per_voxel=4)
    pts = jnp.asarray(rng.uniform(0, 3, (1, 128, 6)), jnp.float32)
    nums = jnp.full((1,), 128, jnp.int32)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)), jnp.float32)
    batch = jax.jit(lambda *a: frames_to_batch(*a, cfg))(
        pts, nums, imgs, jnp.zeros((1, 1, 7)), jnp.zeros((1, 1), bool))
    model, state = build_model_and_state(cfg, True)
    cparams = cast_for_compute(state.params, True)
    cbatch = cast_batch_for_compute(batch, True)
    score, reg = jax.eval_shape(lambda: make_apply(model, cfg)(
        cparams, *_model_inputs(cbatch, True)))
    assert score.dtype == jnp.bfloat16, score.dtype
    assert reg.dtype == jnp.bfloat16, reg.dtype
    # the transform itself must be dtype-preserving
    out = jax.eval_shape(detection_transform,
                         jax.ShapeDtypeStruct((64, 96, 3), jnp.bfloat16))
    assert out.dtype == jnp.bfloat16
