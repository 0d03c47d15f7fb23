"""Multi-host initialization and cross-host mesh construction.

The reference is strictly single-process (SURVEY.md §2 parallelism
census).  For multi-host TPU pods this module wraps
``jax.distributed.initialize`` and builds meshes whose data axis spans
hosts (gradient psums ride ICI within a slice, DCN across slices —
XLA handles placement from the device order).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax

from mvxnet_makise_tpu.parallel.mesh import make_mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize multi-process JAX when env/args indicate a pod run.

    Returns True when running distributed.  No-ops (returns False) for
    single-process runs, so callers can use it unconditionally.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None \
            and "JAX_NUM_PROCESSES" not in os.environ:
        return False
    kw = {}
    if coordinator_address:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    elif "JAX_NUM_PROCESSES" in os.environ:
        kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None:
        kw["process_id"] = process_id
    elif "JAX_PROCESS_ID" in os.environ:
        kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kw)
    return True


def global_mesh(model_axis: int = 1,
                devices: Optional[Sequence] = None):
    """A ('data', 'model') mesh over *all* processes' devices.

    The model axis stays within a host's devices (ICI-adjacent) by
    construction of jax.devices() ordering; the data axis spans the rest.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model axis "
                         f"{model_axis}")
    return make_mesh((n // model_axis, model_axis), devices)


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
