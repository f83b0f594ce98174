from eco_tpu.convert.caffemodel import load_caffemodel
from eco_tpu.convert.load import (
    convert_conv_weight,
    fold_bn,
    import_caffe_weights,
)
