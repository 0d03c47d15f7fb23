"""MVXNet-Makise TPU — a TPU-native LiDAR+camera 3D detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the PyTorch
reference `MakiseChris666/MVXNet-Makise` (multimodal VoxelNet / MVX-Net
PointFusion on KITTI).  Nothing here is a translation of the reference: all
hot paths are static-shape, jit-compiled, and designed for the TPU MXU /
HBM / ICI cost model.

Subpackages
-----------
config    : typed configuration (the TPU-native analogue of the reference's
            config.yml + modules/config, /root/reference/modules/config).
geometry  : box math, calibration projection chain, rotated IoU
            (reference: modules/Calc.py, modules/utils/).
ops       : fixed-capacity voxelizer, dense scatter, FPN bilinear gather,
            anchor assignment, rotated NMS (reference: cpp/voxelutil.cpp,
            modules/data/Preprocessing.py, modules/imhead/Pipe.py).
models    : Flax model zoo — VoxelNet branch, ResNet50-FPN image branch,
            the fused MVXNet (reference: MVXNet.py, modules/voxelnet/,
            modules/imhead/, modules/layers/Blocks.py).
data      : KITTI parsing, frustum crop, GT-database augmentation, host
            pipeline (reference: modules/data/, modules/augment/,
            cropdata.py, create_gtdatabase.py).
train     : loss, train step, AdamW, orbax checkpointing, the training loop
            (reference: train.py, modules/voxelnet/Loss.py).
eval      : box decoding, NMS and the KITTI AP evaluator (the reference has
            none committed; built per SURVEY.md §6).
parallel  : jax.sharding Mesh construction and sharding rules for
            data/model-parallel execution (no reference counterpart —
            the reference is single-GPU).
"""

__version__ = "0.1.0"

from mvxnet_makise_tpu.config import Config, load_config  # noqa: F401
