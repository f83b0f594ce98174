from eco_tpu.convert.caffemodel import load_blobproto, load_caffemodel
from eco_tpu.convert.load import (
    convert_conv_weight,
    fold_bn,
    import_caffe_weights,
)
from eco_tpu.convert.export_hlo import (
    export_serving,
    load_serving_artifact,
    save_serving_artifact,
)
from eco_tpu.convert.quantize import quantize_for_serving
from eco_tpu.convert.write import export_caffe_weights
from eco_tpu.spec.transforms import merge_sibling_1x1_convs


def optimize_for_inference(graph, params, state, *, fold: bool = True,
                           merge: bool = True):
    """Inference-graph optimization pipeline: sibling-1x1 merge + BN fold."""
    if merge:
        graph, params, state = merge_sibling_1x1_convs(graph, params, state)
    if fold:
        graph, params, state = fold_bn(graph, params, state)
    return graph, params, state
