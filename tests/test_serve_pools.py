"""Fast unit tests for serving batch pools and checkpoint retention."""

import os

import numpy as np

from mvxnet_makise_tpu.train.checkpoint import (
    latest_epoch,
    prune_checkpoints,
)


def test_pool_size_selection():
    from mvxnet_makise_tpu.serve import Detector

    det = Detector.__new__(Detector)        # logic-only: no model needed
    det._compiled = {1: None, 4: None, 8: None}
    assert det._pool_size(1) == 1
    assert det._pool_size(2) == 4           # smallest pooled size >= n
    assert det._pool_size(4) == 4
    assert det._pool_size(5) == 8
    assert det._pool_size(9) == 9           # beyond pools: new compile
    det._compiled = {}
    assert det._pool_size(3) == 3


def test_prune_checkpoints_keeps_newest(tmp_path):
    root = str(tmp_path / "ckpts")
    for e in [1, 2, 3, 7, 10]:
        os.makedirs(os.path.join(root, f"epoch{e}"))
    # real orbax temp naming: '<name>.orbax-checkpoint-tmp-<timestamp>'
    os.makedirs(os.path.join(root,
                             "epoch11.orbax-checkpoint-tmp-1723900000"))

    prune_checkpoints(root, keep_last=2)
    left = sorted(os.listdir(root))
    assert left == ["epoch10", "epoch7"]     # newest two, tmp dir gone
    assert latest_epoch(root) == 10

    prune_checkpoints(root, keep_last=0)     # 0 = keep all
    assert sorted(os.listdir(root)) == ["epoch10", "epoch7"]
