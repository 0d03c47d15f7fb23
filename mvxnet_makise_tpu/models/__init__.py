from mvxnet_makise_tpu.models.blocks import (  # noqa: F401
    DenseReluNorm,
    ConvReluNorm,
    DeconvReluNorm,
    masked_standardize,
    standardize,
)
from mvxnet_makise_tpu.models.voxelnet import (  # noqa: F401
    VFE,
    SVFE,
    MiddleConvLayers,
    RPN,
    VoxelNetBranch,
)
from mvxnet_makise_tpu.models.resnet_fpn import (  # noqa: F401
    ResNet50FPN,
    load_torchvision_fpn_weights,
)
from mvxnet_makise_tpu.models.image_head import (  # noqa: F401
    ImageFeatureFusion,
    ImageHead,
    PointImageFusion,
    PointImageHead,
    detection_transform,
)
from mvxnet_makise_tpu.models.mvxnet import (  # noqa: F401
    MVXNet,
    MVXNetPM,
    MVXNetPointFusion,
    MVXNetVoxelFusion,
)
from mvxnet_makise_tpu.models.voxelnet_pm import (  # noqa: F401
    VoxelNetBranchPM,
)
