from eco_tpu.ops.conv import conv2d, conv3d, conv_nd
from eco_tpu.ops.pool import (
    avg_pool,
    global_avg_pool,
    max_pool,
    pool_nd,
    roi_max_pool,
    stochastic_pool,
)
from eco_tpu.ops.norm import (
    bn_inference,
    bn_train,
    fold_scale_shift,
    scale_shift,
)
from eco_tpu.ops.elementwise import (
    bnll,
    concat_channels,
    dropout,
    eltwise,
    mvn,
    relu,
    threshold,
)
from eco_tpu.ops.linear import inner_product
from eco_tpu.ops.loss import (
    contrastive_loss,
    hinge_loss,
    infogain_loss,
    sigmoid_cross_entropy,
    softmax,
    softmax_cross_entropy,
    topk_accuracy,
)
from eco_tpu.ops.layout import (
    caffe_reshape_dims,
    fold_segments,
    im2col,
    segment_consensus,
    to_logical,
    to_physical,
    unfold_segments,
)
