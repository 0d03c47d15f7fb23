from mvxnet_makise_tpu.train.loss import voxel_loss, smooth_l1  # noqa: F401
