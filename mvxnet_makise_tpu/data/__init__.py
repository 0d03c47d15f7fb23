from mvxnet_makise_tpu.data.pipeline import (  # noqa: F401
    FrameArrays,
    preprocess_frame,
    collate,
)
from mvxnet_makise_tpu.data.synthetic import synthetic_frame  # noqa: F401
