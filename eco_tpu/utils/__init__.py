from eco_tpu.utils.shapes import (
    caffe_conv_out_dim,
    caffe_pool_out_dim,
    normalize_spatial_param,
)
