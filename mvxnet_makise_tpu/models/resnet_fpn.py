"""ResNet50 + FPN image backbone in Flax, with torchvision weight import.

Counterpart of the reference's frozen torchvision
``fasterrcnn_resnet50_fpn_v2`` backbone (/root/reference/modules/imhead/
Pipe.py:8-21, SURVEY.md §2 C10).  The reference downloads pretrained
weights at import time; this environment has no network egress, so
:func:`load_torchvision_fpn_weights` converts a torch ``state_dict``
(from a local file) into this module's parameter pytree.  Without a
weight file the backbone initializes randomly (the branch is frozen
either way — reference Head.py:9-11 — so training code treats its params
as constants).

TPU-native details:
  * channels-last everywhere; 7x7/2 stem + 3,4,6,3 bottleneck stages;
  * batch norms are *folded* to per-channel scale/bias at import time
    (the branch runs frozen in eval mode, so BN is an affine transform;
    folding removes 53 rsqrt ops from the graph and keeps the params
    pytree small);
  * FPN follows the v2 layout: conv+norm (no activation) in both the
    lateral (1x1) and output (3x3) blocks, nearest-neighbour top-down
    upsampling;
  * returns pyramid levels '0', '1', '2' (strides 4/8/16, 256 ch) — the
    three levels the reference consumes (Pipe.py:20).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class FoldedNorm(nn.Module):
    """Frozen batch norm folded to y = x * scale + bias (per channel)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


class StemConv(nn.Module):
    """The ResNet 7x7/stride-2 stem conv, with an optional
    space-to-depth evaluation.

    The naive stem is the worst op on a TPU: 3 input channels leave
    125 of the MXU's 128 reduction lanes idle (measured 7.7 of the
    extractor's 16.1 ms/batch-8 at ~2% MFU — tools/bench_resnet.py).
    ``s2d=True`` evaluates the SAME parameters as a 4x4/stride-1 conv
    over a 2x2 space-to-depth input (12 channels): zero-pad the 7x7
    kernel to 8x8 on the leading edges and regroup even/odd taps —
    an exact refold, not an approximation.  The parameter tree is
    identical either way (one (7, 7, 3, 64) kernel named like
    ``nn.Conv``'s), so torchvision imports and checkpoints are
    unaffected.  Reference stem: torchvision ResNet50 ``body.conv1``
    (/root/reference/modules/imhead/Pipe.py:8-21).

    Measured (v5e, batch 8, tools/bench_resnet.py): the refold wins
    the stem stage (6.97 vs 7.74 ms) but the gain leaks back into
    layer1's fusion boundary and the full extractor is flat (16.36 vs
    16.12 ms) — XLA's small-K conv path runs ~4 TFLOP/s at K=12 just
    as at K=3, so channel folding is not the lever here.  Default
    stays the direct form; ``s2d=True`` remains selectable and
    equivalence-tested (tests/test_models.py).
    """
    features: int = 64
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], self.features))
        kernel = kernel.astype(x.dtype)
        if not self.s2d:
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        B, H, W, C = x.shape
        h2, w2 = H // 2, W // 2
        # out[i,j] = sum_{u,v} w[u,v] x[2i+u-3, 2j+v-3]
        #          = sum_{t=u+1} w8[t] xpad[2i+t],  xpad = pad-left-4
        # with t = 2q+r: a 4x4 VALID conv over the 2x2 s2d of xpad
        xpad = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
        xs = xpad.reshape(B, h2 + 4, 2, w2 + 4, 2, C)
        xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
            B, h2 + 4, w2 + 4, 4 * C)
        w8 = jnp.zeros((8, 8, C, self.features), kernel.dtype
                       ).at[1:8, 1:8].set(kernel)
        ws = w8.reshape(4, 2, 4, 2, C, self.features)
        ws = jnp.transpose(ws, (0, 2, 1, 3, 4, 5)).reshape(
            4, 4, 4 * C, self.features)
        y = jax.lax.conv_general_dilated(
            xs, ws, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[:, :h2, :w2, :]


class Bottleneck(nn.Module):
    """ResNet bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + skip."""
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = FoldedNorm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name="conv2")(y)
        y = FoldedNorm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = FoldedNorm(name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               name="down_conv")(x)
            identity = FoldedNorm(name="down_bn")(identity)
        return nn.relu(y + identity)


class ResNet50FPN(nn.Module):
    """ResNet50 trunk + FPN pyramid (levels 0..2, 256 channels)."""
    fpn_channels: int = 256
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    num_levels: int = 3
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        # stem (StemConv s2d=True is the exact space-to-depth refold —
        # measured flat across the full extractor, so off by default)
        x = StemConv(64, s2d=self.s2d_stem, name="conv1")(x)
        x = FoldedNorm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        features = 64
        for li, blocks in enumerate(self.stage_sizes):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                x = Bottleneck(
                    features, stride=stride if bi == 0 else 1,
                    downsample=(bi == 0),
                    name=f"layer{li + 1}_{bi}")(x)
            feats.append(x)
            features *= 2

        # FPN (v2: conv + norm, no activation)
        laterals = []
        for li, f in enumerate(feats):
            y = nn.Conv(self.fpn_channels, (1, 1), use_bias=False,
                        name=f"fpn_inner{li}")(f)
            y = FoldedNorm(name=f"fpn_inner_bn{li}")(y)
            laterals.append(y)

        # top-down pathway with nearest-neighbour upsampling
        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for li in range(len(laterals) - 2, -1, -1):
            up = merged[li + 1]
            h, w = laterals[li].shape[-3:-1]
            up = jnp.repeat(jnp.repeat(up, 2, axis=-3), 2, axis=-2)
            up = up[..., :h, :w, :]
            merged[li] = laterals[li] + up

        outs = []
        for li in range(self.num_levels):
            y = nn.Conv(self.fpn_channels, (3, 3),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name=f"fpn_layer{li}")(merged[li])
            y = FoldedNorm(name=f"fpn_layer_bn{li}")(y)
            outs.append(y)
        return outs


# ---------------------------------------------------------------------------
# torchvision weight import
# ---------------------------------------------------------------------------

def _fold_bn(sd: Dict[str, Any], prefix: str, eps: float = 1e-5):
    """torch BN params -> (scale, bias) of the folded affine."""
    w = np.asarray(sd[prefix + ".weight"], dtype=np.float32)
    b = np.asarray(sd[prefix + ".bias"], dtype=np.float32)
    mean = np.asarray(sd[prefix + ".running_mean"], dtype=np.float32)
    var = np.asarray(sd[prefix + ".running_var"], dtype=np.float32)
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def _conv(sd: Dict[str, Any], key: str, with_bias: bool = False):
    """torch OIHW conv kernel -> flax HWIO."""
    k = np.asarray(sd[key + ".weight"], dtype=np.float32)
    out = {"kernel": np.transpose(k, (2, 3, 1, 0))}
    if with_bias:
        out["bias"] = np.asarray(sd[key + ".bias"], dtype=np.float32)
    return out


def load_torchvision_fpn_weights(state_dict: Dict[str, Any],
                                 stage_sizes: Sequence[int] = (3, 4, 6, 3),
                                 num_levels: int = 3,
                                 strict: bool = False) -> Dict[str, Any]:
    """Convert a torchvision FasterRCNN(-v2) ``state_dict`` (or just its
    ``backbone.*`` subset) into a :class:`ResNet50FPN` params pytree.

    Accepts keys with or without the ``backbone.`` prefix.  torch tensors
    or numpy arrays both work (anything ``np.asarray`` accepts).

    ``strict=True`` additionally asserts that every input key was
    consumed by the conversion — catching key-layout mismatches (e.g. a
    renamed block) *at import time* instead of as silently-random
    weights.  Keys that are legitimately unused are exempt: BN
    ``num_batches_tracked`` counters and FPN output blocks beyond
    ``num_levels`` (the reference consumes pyramid levels '0'..'2' only,
    /root/reference/modules/imhead/Pipe.py:20).
    """
    consumed = set()

    class _Recording(dict):
        def __getitem__(self, key):
            consumed.add(key)
            return super().__getitem__(key)

        def __contains__(self, key):
            consumed.add(key)
            return super().__contains__(key)

    sd = _Recording()
    for k, v in state_dict.items():
        k = k.removeprefix("backbone.")
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        sd[k] = v

    p: Dict[str, Any] = {}
    p["conv1"] = _conv(sd, "body.conv1")
    p["bn1"] = _fold_bn(sd, "body.bn1")

    features = 64
    for li, blocks in enumerate(stage_sizes):
        for bi in range(blocks):
            t = f"body.layer{li + 1}.{bi}"
            blk = {
                "conv1": _conv(sd, t + ".conv1"),
                "bn1": _fold_bn(sd, t + ".bn1"),
                "conv2": _conv(sd, t + ".conv2"),
                "bn2": _fold_bn(sd, t + ".bn2"),
                "conv3": _conv(sd, t + ".conv3"),
                "bn3": _fold_bn(sd, t + ".bn3"),
            }
            if bi == 0:
                blk["down_conv"] = _conv(sd, t + ".downsample.0")
                blk["down_bn"] = _fold_bn(sd, t + ".downsample.1")
            p[f"layer{li + 1}_{bi}"] = blk
        features *= 2

    for li in range(len(stage_sizes)):
        # v2 FPN blocks are Conv2dNormActivation: .0 = conv, .1 = norm
        p[f"fpn_inner{li}"] = _conv(sd, f"fpn.inner_blocks.{li}.0")
        p[f"fpn_inner_bn{li}"] = _fold_bn(sd, f"fpn.inner_blocks.{li}.1")
        if li < num_levels:
            p[f"fpn_layer{li}"] = _conv(sd, f"fpn.layer_blocks.{li}.0")
            p[f"fpn_layer_bn{li}"] = _fold_bn(sd, f"fpn.layer_blocks.{li}.1")

    if strict:
        exempt_prefixes = tuple(
            f"fpn.layer_blocks.{li}." for li in
            range(num_levels, len(stage_sizes)))
        leftover = sorted(
            k for k in dict.keys(sd)
            if k not in consumed
            and not k.endswith("num_batches_tracked")
            and not k.startswith(exempt_prefixes))
        if leftover:
            raise ValueError(
                "torchvision state_dict keys not consumed by the FPN "
                f"import ({len(leftover)}): {leftover[:8]}...")
    return {"params": p}
