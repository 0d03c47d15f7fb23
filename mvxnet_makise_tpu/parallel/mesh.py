"""Device mesh and sharding rules.

No reference counterpart — the reference is a single-process single-GPU
trainer (SURVEY.md §2 parallelism census: zero torch.distributed /
NCCL / MPI anywhere).  This module is the scale-out story the TPU rebuild
adds (SURVEY.md §5/§7 M6):

  * a 2-axis ``Mesh`` ``('data', 'model')`` over all visible devices;
  * **data parallelism**: every per-frame array shards its batch axis over
    ``'data'``; gradients are combined by XLA-inserted psums (no manual
    collectives);
  * **model (tensor) parallelism**: large conv kernels and dense layers
    shard their output-channel axis over ``'model'``; XLA SPMD inserts the
    matching all-gathers/reduce-scatters on ICI.  For this model family
    the dominant tensors (RPN 768-channel concat convs, fusion 768-wide
    MLP, dense BEV grid activations) split cleanly on channels.

Everything goes through ``jax.jit`` with ``in_shardings``/``out_shardings``
— single-program SPMD, collectives ride ICI, per the scaling-book recipe.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Create a ('data', 'model') mesh.

    ``shape=None`` puts all devices on the data axis.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> Any:
    """Sharding for a Batch pytree: leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


# -- parameter partitioning rules -------------------------------------------

_MIN_SHARD_CHANNELS = 256


def _spec_for_param(path, value, model_axis_size: int) -> P:
    """Output-channel sharding for large kernels; replicate the rest."""
    if model_axis_size <= 1 or value.ndim == 0:
        return P()
    name = getattr(path[-1], "key", "")
    out_ch = value.shape[-1]
    if name == "kernel" and value.ndim >= 2 \
            and out_ch % model_axis_size == 0 \
            and out_ch >= _MIN_SHARD_CHANNELS:
        return P(*([None] * (value.ndim - 1) + ["model"]))
    if name == "bias" and out_ch % model_axis_size == 0 \
            and out_ch >= _MIN_SHARD_CHANNELS:
        return P("model")
    return P()


def param_sharding(params, mesh: Mesh):
    """Pytree of NamedShardings for a params tree."""
    size = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda p, v: NamedSharding(mesh, _spec_for_param(p, v, size)),
        params)


def shard_params(params, mesh: Mesh):
    shardings = param_sharding(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
