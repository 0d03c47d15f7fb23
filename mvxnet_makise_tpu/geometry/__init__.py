from mvxnet_makise_tpu.geometry.boxes import (  # noqa: F401
    boxes3d_to_bev_corners,
    boxes3d_to_corners3d,
    rotated_iou_bev,
    quad_intersection_area,
    polygon_area,
    encode_boxes,
    decode_boxes,
    boxes_cam_to_lidar,
    boxes_lidar_to_cam,
    aligned_bbox_intersection,
)
from mvxnet_makise_tpu.geometry.calib import (  # noqa: F401
    Calib,
    read_calib,
    lidar_to_cam_rect,
    lidar_to_image,
    rect_to_lidar,
)
