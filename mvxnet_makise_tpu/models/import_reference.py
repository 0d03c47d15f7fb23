"""Import a *reference* PyTorch MVXNet checkpoint into this framework.

The reference saves ``model.state_dict()`` per epoch
(/root/reference/train.py:179).  This module maps that state dict onto
our Flax parameter tree so users can switch frameworks without
retraining, and so AP-parity tests can run the same weights in both.

Layout facts used (verified numerically in tests/test_import_reference.py
against live torch layers):
  * Linear (out, in)            -> Dense kernel (in, out)            [T]
  * Conv2d OIHW                 -> Conv kernel HWIO
  * Conv3d OIDHW                -> Conv kernel DHWIO
  * ConvTranspose2d (in,out,kh,kw) -> ConvTranspose kernel
    (kh, kw, in, out) with both spatial axes flipped
    (flax default transpose_kernel=False)
  * 1x1 Conv2d (out, in, 1, 1)  -> Dense kernel (in, out) — the fusion
    MLP's "conv" layers are pointwise and live as Dense here
  * reference BN layers are parameter-free (affine=False,
    track_running_stats=False, Blocks.py + config.yml:19-20) — nothing
    to import; our stateless standardize matches.

Reference module tree (state-dict prefixes):
  head.fusion.{fcn1,conv1,fcn2,conv2,fcn3}   (imhead/Pipe.py:84-105)
  head.extractor.backbone.{body,fpn}         (frozen torchvision)
  backbone.svfe.{vfe1,vfe2}.fcn, backbone.fcn (voxelnet)
  backbone.cml.conv{1..3}.conv               (3D convs)
  backbone.rpn.blk{1,2,3}.{i}.conv, deconv{1..3}.deconv, cls, reg
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from mvxnet_makise_tpu.models.resnet_fpn import load_torchvision_fpn_weights


def _np(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _dense(sd, key):
    return {"kernel": np.ascontiguousarray(_np(sd[key + ".weight"]).T),
            "bias": _np(sd[key + ".bias"])}


def _dense_from_1x1conv(sd, key):
    w = _np(sd[key + ".weight"])                # (out, in, 1, 1)
    return {"kernel": np.ascontiguousarray(w[:, :, 0, 0].T),
            "bias": _np(sd[key + ".bias"])}


def _conv2d(sd, key):
    w = _np(sd[key + ".weight"])                # OIHW
    out = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))}
    if key + ".bias" in sd:
        out["bias"] = _np(sd[key + ".bias"])
    return out


def _conv3d(sd, key):
    w = _np(sd[key + ".weight"])                # OIDHW
    return {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0))),
            "bias": _np(sd[key + ".bias"])}


def _deconv2d(sd, key):
    w = _np(sd[key + ".weight"])                # (in, out, kh, kw)
    k = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
    return {"kernel": np.ascontiguousarray(k),
            "bias": _np(sd[key + ".bias"])}


def import_reference_checkpoint(state_dict: Dict[str, Any],
                                with_images: bool = True) -> Dict[str, Any]:
    """Reference ``MVXNet().state_dict()`` -> our params pytree
    (``{'params': {...}}``) for :class:`models.mvxnet.MVXNet` (or the
    ``backbone``-only subtree for :class:`VoxelNetBranch` when
    ``with_images=False``)."""
    sd = {k: v for k, v in state_dict.items()}

    backbone = {
        "svfe": {
            "vfe1": {"fcn": {"fc": _dense(sd, "backbone.svfe.vfe1.fcn.fc")}},
            "vfe2": {"fcn": {"fc": _dense(sd, "backbone.svfe.vfe2.fcn.fc")}},
        },
        "fcn": {"fc": _dense(sd, "backbone.fcn.fc")},
        "cml": {
            "conv1": {"conv": _conv3d(sd, "backbone.cml.conv1.conv")},
            "conv2": {"conv": _conv3d(sd, "backbone.cml.conv2.conv")},
            "conv3": {"conv": _conv3d(sd, "backbone.cml.conv3.conv")},
        },
        "rpn": _import_rpn(sd),
    }
    if not with_images:
        return {"params": backbone}

    head = {
        "extractor": load_torchvision_fpn_weights({
            k.removeprefix("head.extractor.backbone."): v
            for k, v in sd.items()
            if k.startswith("head.extractor.backbone.")})["params"],
        "fusion": {
            "fcn1": {"fc": _dense(sd, "head.fusion.fcn1.fc")},
            "conv1": {"fc": _dense_from_1x1conv(sd, "head.fusion.conv1.conv")},
            "fcn2": {"fc": _dense(sd, "head.fusion.fcn2.fc")},
            "conv2": {"fc": _dense_from_1x1conv(sd, "head.fusion.conv2.conv")},
            "fcn3": {"fc": _dense(sd, "head.fusion.fcn3.fc")},
        },
    }
    return {"params": {"head": head, "backbone": backbone}}


def export_reference_checkpoint(params: Dict[str, Any],
                                with_images: bool = True
                                ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_reference_checkpoint`: our Flax params ->
    a reference-layout torch ``state_dict`` (numpy values; pass through
    ``torch.save({k: torch.from_numpy(v) ...})`` to write a file the
    reference's ``load_state_dict`` accepts).

    The frozen extractor's folded norms export as BatchNorm stats with
    ``running_mean=0, running_var=1-eps`` and ``weight=scale,
    bias=bias`` — numerically identical in eval mode.
    """
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}

    def dense(key, tree):
        sd[key + ".weight"] = np.ascontiguousarray(
            np.asarray(tree["kernel"]).T)
        sd[key + ".bias"] = np.asarray(tree["bias"])

    def dense_to_1x1conv(key, tree):
        k = np.asarray(tree["kernel"])              # (in, out)
        sd[key + ".weight"] = np.ascontiguousarray(
            k.T[:, :, None, None])
        sd[key + ".bias"] = np.asarray(tree["bias"])

    def conv2d(key, tree):
        k = np.asarray(tree["kernel"])              # HWIO
        sd[key + ".weight"] = np.ascontiguousarray(
            np.transpose(k, (3, 2, 0, 1)))
        if "bias" in tree:
            sd[key + ".bias"] = np.asarray(tree["bias"])

    def conv3d(key, tree):
        k = np.asarray(tree["kernel"])              # DHWIO
        sd[key + ".weight"] = np.ascontiguousarray(
            np.transpose(k, (4, 3, 0, 1, 2)))
        sd[key + ".bias"] = np.asarray(tree["bias"])

    def deconv2d(key, tree):
        k = np.asarray(tree["kernel"])[::-1, ::-1]  # un-flip spatial
        sd[key + ".weight"] = np.ascontiguousarray(
            np.transpose(k, (2, 3, 0, 1)))          # -> (in, out, kh, kw)
        sd[key + ".bias"] = np.asarray(tree["bias"])

    def folded_bn(key, tree):
        scale = np.asarray(tree["scale"])
        sd[key + ".weight"] = scale
        sd[key + ".bias"] = np.asarray(tree["bias"])
        sd[key + ".running_mean"] = np.zeros_like(scale)
        # torch BN eval divides by sqrt(var + 1e-5)
        sd[key + ".running_var"] = np.full_like(scale, 1.0 - 1e-5)
        sd[key + ".num_batches_tracked"] = np.asarray(0, np.int64)

    bb = p["backbone"] if with_images else p
    dense("backbone.svfe.vfe1.fcn.fc", bb["svfe"]["vfe1"]["fcn"]["fc"])
    dense("backbone.svfe.vfe2.fcn.fc", bb["svfe"]["vfe2"]["fcn"]["fc"])
    dense("backbone.fcn.fc", bb["fcn"]["fc"])
    for c in ("conv1", "conv2", "conv3"):
        conv3d(f"backbone.cml.{c}.conv", bb["cml"][c]["conv"])
    rpn = bb["rpn"]
    for b, extras in [(1, 3), (2, 5), (3, 5)]:
        conv2d(f"backbone.rpn.blk{b}.0.conv", rpn[f"blk{b}_down"]["conv"])
        for j in range(extras):
            conv2d(f"backbone.rpn.blk{b}.{j + 1}.conv",
                   rpn[f"blk{b}_conv{j}"]["conv"])
    for d in range(1, 4):
        deconv2d(f"backbone.rpn.deconv{d}.deconv",
                 rpn[f"deconv{d}"]["deconv"])
    conv2d("backbone.rpn.cls", rpn["cls"])
    conv2d("backbone.rpn.reg", rpn["reg"])

    if not with_images:
        return sd

    fus = p["head"]["fusion"]
    dense("head.fusion.fcn1.fc", fus["fcn1"]["fc"])
    dense_to_1x1conv("head.fusion.conv1.conv", fus["conv1"]["fc"])
    dense("head.fusion.fcn2.fc", fus["fcn2"]["fc"])
    dense_to_1x1conv("head.fusion.conv2.conv", fus["conv2"]["fc"])
    dense("head.fusion.fcn3.fc", fus["fcn3"]["fc"])

    ext = p["head"]["extractor"]
    pre = "head.extractor.backbone."
    conv2d(pre + "body.conv1", ext["conv1"])
    folded_bn(pre + "body.bn1", ext["bn1"])
    for li, blocks in enumerate((3, 4, 6, 3)):
        for bi in range(blocks):
            blk = ext[f"layer{li + 1}_{bi}"]
            t = pre + f"body.layer{li + 1}.{bi}"
            for c in ("conv1", "conv2", "conv3"):
                conv2d(f"{t}.{c}", blk[c])
            for b in ("bn1", "bn2", "bn3"):
                folded_bn(f"{t}.{b}", blk[b])
            if bi == 0:
                conv2d(t + ".downsample.0", blk["down_conv"])
                folded_bn(t + ".downsample.1", blk["down_bn"])
    for li in range(4):
        if f"fpn_inner{li}" in ext:
            conv2d(pre + f"fpn.inner_blocks.{li}.0", ext[f"fpn_inner{li}"])
            folded_bn(pre + f"fpn.inner_blocks.{li}.1",
                      ext[f"fpn_inner_bn{li}"])
        if f"fpn_layer{li}" in ext:
            conv2d(pre + f"fpn.layer_blocks.{li}.0", ext[f"fpn_layer{li}"])
            folded_bn(pre + f"fpn.layer_blocks.{li}.1",
                      ext[f"fpn_layer_bn{li}"])
    return sd


def _import_rpn(sd):
    rpn: Dict[str, Any] = {}
    # blk{i}.0 is the stride-2 down conv; blk{i}.{j>=1} the extras
    for b, extras in [(1, 3), (2, 5), (3, 5)]:
        rpn[f"blk{b}_down"] = {
            "conv": _conv2d(sd, f"backbone.rpn.blk{b}.0.conv")}
        for j in range(extras):
            rpn[f"blk{b}_conv{j}"] = {
                "conv": _conv2d(sd, f"backbone.rpn.blk{b}.{j + 1}.conv")}
    for d in range(1, 4):
        rpn[f"deconv{d}"] = {
            "deconv": _deconv2d(sd, f"backbone.rpn.deconv{d}.deconv")}
    rpn["cls"] = _conv2d(sd, "backbone.rpn.cls")
    rpn["reg"] = _conv2d(sd, "backbone.rpn.reg")
    return rpn
