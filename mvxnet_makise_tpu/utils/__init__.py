from mvxnet_makise_tpu.utils.metrics import (  # noqa: F401
    LossTracker,
    PhaseTimer,
)
from mvxnet_makise_tpu.utils.logging import MetricsLogger  # noqa: F401
from mvxnet_makise_tpu.utils.profiling import trace_context  # noqa: F401
