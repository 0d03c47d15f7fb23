from mvxnet_makise_tpu.eval.decode import Detections, decode_predictions  # noqa: F401
from mvxnet_makise_tpu.eval.ap import average_precision_3d, evaluate_frames  # noqa: F401
from mvxnet_makise_tpu.eval.runner import run_eval  # noqa: F401
