"""Per-stage timing of the frozen ResNet50-FPN extractor.

Companion to tools/bench_image.py: breaks the 22.6 ms/batch-8 resnet_fpn
stage (v5e, round-3 measurement) into stem / trunk stages / FPN blocks so
MFU work targets the real hot spot (reference backbone:
/root/reference/modules/imhead/Pipe.py:8-21).

Each probe times a truncated forward (everything up to and including the
named stage) — stage cost = successive difference; XLA fuses each prefix
the same way it fuses the full graph, so differences are honest.
"""
import time

from mvxnet_makise_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.models.image_head import detection_transform
from mvxnet_makise_tpu.models.resnet_fpn import (Bottleneck, FoldedNorm,
                                                 ResNet50FPN, StemConv)

B = 8
cfg = Config(use_bf16=True, batch_size=B)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.uniform(0, 1, (B, *cfg.image_size, 3)),
                     jnp.bfloat16)


class Probe(ResNet50FPN):
    """ResNet50FPN truncated after `upto` (same param tree)."""
    upto: str = "fpn"

    @nn.compact
    def __call__(self, x):
        x = StemConv(64, s2d=self.s2d_stem, name="conv1")(x)
        x = FoldedNorm(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.upto == "stem":
            return x
        feats = []
        features = 64
        for li, blocks in enumerate(self.stage_sizes):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                x = Bottleneck(features, stride=stride if bi == 0 else 1,
                               downsample=(bi == 0),
                               name=f"layer{li + 1}_{bi}")(x)
            feats.append(x)
            features *= 2
            if self.upto == f"layer{li + 1}":
                return x
        laterals = []
        for li, f in enumerate(feats):
            y = nn.Conv(self.fpn_channels, (1, 1), use_bias=False,
                        name=f"fpn_inner{li}")(f)
            y = FoldedNorm(name=f"fpn_inner_bn{li}")(y)
            laterals.append(y)
        merged = [None] * len(laterals)
        merged[-1] = laterals[-1]
        for li in range(len(laterals) - 2, -1, -1):
            up = merged[li + 1]
            h, w = laterals[li].shape[-3:-1]
            up = jnp.repeat(jnp.repeat(up, 2, axis=-3), 2, axis=-2)
            up = up[..., :h, :w, :]
            merged[li] = laterals[li] + up
        if self.upto == "merge":
            return merged[0]
        outs = []
        for li in range(self.num_levels):
            y = nn.Conv(self.fpn_channels, (3, 3),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        name=f"fpn_layer{li}")(merged[li])
            y = FoldedNorm(name=f"fpn_layer_bn{li}")(y)
            outs.append(y)
        if self.upto == "fpn0":
            return outs[0]
        return outs


print("init params...", flush=True)
full = ResNet50FPN()
params = jax.jit(full.init)(jax.random.key(0),
                            jnp.zeros((1, 416, 1344, 3), jnp.bfloat16))
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
x0 = jax.jit(jax.vmap(detection_transform))(images)
x0 = jax.block_until_ready(x0.astype(jnp.bfloat16))
print("params ready", flush=True)

def _sync(out):
    """Real execution barrier: block_until_ready is not reliable on
    relayed/remote backends (see bench.py), so read a reduced scalar."""
    leaf = jax.tree.leaves(out)[0]
    corner = leaf[(slice(0, 1),) * leaf.ndim]
    return float(jnp.sum(corner.astype(jnp.float32)))


prev = 0.0
for upto in ("stem", "layer1", "layer2", "layer3", "layer4",
             "merge", "fpn0", "fpn"):
    m = Probe(upto=upto)
    f = jax.jit(lambda x, m=m: m.apply(params, x))
    out = f(x0)
    _sync(out)
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        out = f(x0)
    _sync(out)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"upto {upto:8s} {dt:8.2f} ms/batch  (+{dt - prev:6.2f})",
          flush=True)
    prev = dt
