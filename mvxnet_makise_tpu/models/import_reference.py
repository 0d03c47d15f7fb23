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
