from mvxnet_makise_tpu.ops.voxelize import (  # noqa: F401
    VoxelGrid,
    voxelize,
    crop_to_range_mask,
    frustum_mask,
)
from mvxnet_makise_tpu.ops.assign import (  # noqa: F401
    AnchorTargets,
    create_anchors,
    assign_anchor_targets,
)
from mvxnet_makise_tpu.ops.scatter import (  # noqa: F401
    scatter_voxels_to_conv1_bands,
    scatter_voxels_to_grid,
)
from mvxnet_makise_tpu.ops.gather import (  # noqa: F401
    bilinear_gather_fpn,
    bilinear_gather_fpn_batch,
)
from mvxnet_makise_tpu.ops.nms import rotated_nms_bev  # noqa: F401
