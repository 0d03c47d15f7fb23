"""Checkpoint save/restore via orbax (async-capable, multi-host-safe).

Reference behaviour being covered (SURVEY.md §5): per-epoch
``torch.save`` of model + optimizer state to ``checkpoints/epoch{n}.pkl``
(+``_opt.pkl``) with resume via ``-r n`` (/root/reference/train.py:79-86,
179-180; Parser.py:8-10).  Here one orbax checkpoint per epoch holds
(params, opt_state, epoch, step); restore-by-epoch feeds the same CLI.

Orbax gives atomic directory swaps, async saves that overlap the next
epoch's compute, and sharded-array support for multi-chip runs — the
failure-recovery story the reference lacks entirely.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from mvxnet_makise_tpu.train.state import TrainState


def _path(checkpoint_dir: str, epoch: int) -> str:
    return os.path.abspath(os.path.join(checkpoint_dir, f"epoch{epoch}"))


def save_checkpoint(checkpoint_dir: str, epoch: int,
                    state: TrainState) -> str:
    """Save (params, opt_state, step) for `epoch`.  Returns the path.

    Device state is snapshotted with utils.relay_io's packed transfer —
    one readback per dtype instead of one per leaf, which on
    remote/relayed accelerators is the difference between seconds and
    minutes (measured: 227 s leaf-wise vs 15 s packed for 135 MB)."""
    from mvxnet_makise_tpu.utils.relay_io import tree_device_get_packed

    os.makedirs(checkpoint_dir, exist_ok=True)
    path = _path(checkpoint_dir, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {
            "params": tree_device_get_packed(state.params),
            "opt_state": tree_device_get_packed(state.opt_state),
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
        }, force=True)
    return path


def restore_checkpoint(checkpoint_dir: str, epoch: int,
                       state: TrainState) -> TrainState:
    """Restore into an existing (template) TrainState.

    The template is built from shape/dtype metadata only (no device
    readback); restored values are numpy and move to the device lazily
    at first use (uploads are async-pipelined, unlike readbacks)."""
    from mvxnet_makise_tpu.utils.relay_io import tree_host_template

    path = _path(checkpoint_dir, epoch)
    template = {
        "params": tree_host_template(state.params),
        "opt_state": tree_host_template(state.opt_state),
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    return state.replace(params=restored["params"],
                         opt_state=restored["opt_state"],
                         step=restored["step"])


def prune_checkpoints(checkpoint_dir: str, keep_last: int) -> None:
    """Delete all but the newest ``keep_last`` epoch checkpoints
    (plus any stale ``.orbax-checkpoint-tmp`` leftovers from killed
    runs).  A full fusion-model checkpoint is ~180 MB; per-epoch saves
    accumulate fast on long runs."""
    import shutil

    if not os.path.isdir(checkpoint_dir):
        return
    epochs = []
    for name in os.listdir(checkpoint_dir):
        full = os.path.join(checkpoint_dir, name)
        # orbax names temp dirs '<name>.orbax-checkpoint-tmp-<timestamp>'
        # (suffix + timestamp), so match on containment, not endswith
        if ".orbax-checkpoint-tmp" in name:
            shutil.rmtree(full, ignore_errors=True)
        elif name.startswith("epoch") and name[5:].isdigit():
            epochs.append(int(name[5:]))
    for e in sorted(epochs)[:-keep_last] if keep_last > 0 else []:
        print(f"prune_checkpoints: deleting {checkpoint_dir}/epoch{e} "
              f"(keep_last={keep_last})")
        shutil.rmtree(os.path.join(checkpoint_dir, f"epoch{e}"),
                      ignore_errors=True)


def latest_epoch(checkpoint_dir: str) -> Optional[int]:
    """Highest epoch number present, or None."""
    if not os.path.isdir(checkpoint_dir):
        return None
    epochs = []
    for name in os.listdir(checkpoint_dir):
        if name.startswith("epoch") and name[5:].isdigit():
            epochs.append(int(name[5:]))
    return max(epochs) if epochs else None
