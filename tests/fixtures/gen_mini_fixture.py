"""Generate the checked-in mini real-weights fixture (VERDICT r1 #9).

Writes ``mini_eco.prototxt`` (an ECO-shaped net: VideoData -> fold ->
Conv+BN+ReLU -> global pool -> segment consensus -> FC -> loss/accuracy) and
``mini_eco.caffemodel`` with HANDCRAFTED weights that classify solid-color
videos by dominant BGR channel with 100% accuracy.  The caffemodel is written
through eco_tpu.convert.write (V2 NetParameter wire), so the fixture also
pins the export path.

Deterministic -- rerun ``python tests/fixtures/gen_mini_fixture.py`` to
regenerate byte-identical artifacts.
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

PROTOTXT = """\
name: "mini_eco"
layer { name: "data" type: "VideoData" top: "data" top: "label"
  video_data_param { source: "OVERRIDE_WITH_--list" batch_size: 3
    new_length: 1 num_segments: 2 modality: RGB shuffle: true
    name_pattern: "img_%04d.jpg" new_height: 64 new_width: 80 }
  transform_param { crop_size: 32 mirror: true
    mean_value: 104 mean_value: 117 mean_value: 123 }
  include { phase: TRAIN } }
layer { name: "data" type: "VideoData" top: "data" top: "label"
  video_data_param { source: "OVERRIDE_WITH_--list" batch_size: 3
    new_length: 1 num_segments: 2 modality: RGB
    name_pattern: "img_%04d.jpg" new_height: 64 new_width: 80 }
  transform_param { crop_size: 32
    mean_value: 104 mean_value: 117 mean_value: 123 }
  include { phase: TEST } }
layer { name: "reshape_data" type: "Reshape" bottom: "data" top: "data_r"
  reshape_param { shape { dim: [-1, 3, 32, 32] } } }
layer { name: "conv1" type: "Convolution" bottom: "data_r" top: "conv1"
  convolution_param { num_output: 3 kernel_size: 1 } }
layer { name: "conv1_bn" type: "BN" bottom: "conv1" top: "conv1_bn"
  bn_param { frozen: true } }
layer { name: "relu1" type: "ReLU" bottom: "conv1_bn" top: "conv1_bn" }
layer { name: "gp" type: "Pooling" bottom: "conv1_bn" top: "gp"
  pooling_param { pool: AVE kernel_size: 32 stride: 1 } }
layer { name: "rsh" type: "Reshape" bottom: "gp" top: "rsh"
  reshape_param { shape { dim: [-1, 1, 2, 3] } } }
layer { name: "cons" type: "Pooling" bottom: "rsh" top: "cons"
  pooling_param { pool: AVE kernel_h: 2 kernel_w: 1 } }
layer { name: "rsh2" type: "Reshape" bottom: "cons" top: "feat"
  reshape_param { shape { dim: -1 dim: 3 } } }
layer { name: "fc" type: "InnerProduct" bottom: "feat" top: "fc"
  inner_product_param { num_output: 3 } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "fc" bottom: "label"
  top: "loss" }
layer { name: "top1" type: "Accuracy" bottom: "fc" bottom: "label"
  top: "top1" include { phase: TEST } }
"""


# Flow-modality variant: 2-channel (flow_x, flow_y) input, 2 classes keyed
# on the flow_x brightness sign after 128 mean-subtraction.
FLOW_PROTOTXT = """\
name: "mini_flow"
layer { name: "data" type: "VideoData" top: "data" top: "label"
  video_data_param { source: "OVERRIDE_WITH_--list" batch_size: 2
    new_length: 1 num_segments: 2 modality: FLOW
    name_pattern: "flow_%05d.jpg" new_height: 48 new_width: 56 }
  transform_param { crop_size: 32 is_flow: true
    mean_value: 128 mean_value: 128 }
  include { phase: TEST } }
layer { name: "reshape_data" type: "Reshape" bottom: "data" top: "data_r"
  reshape_param { shape { dim: [-1, 2, 32, 32] } } }
layer { name: "conv1" type: "Convolution" bottom: "data_r" top: "conv1"
  convolution_param { num_output: 2 kernel_size: 1 } }
layer { name: "gp" type: "Pooling" bottom: "conv1" top: "gp"
  pooling_param { pool: AVE kernel_size: 32 stride: 1 } }
layer { name: "rsh" type: "Reshape" bottom: "gp" top: "rsh"
  reshape_param { shape { dim: [-1, 1, 2, 2] } } }
layer { name: "cons" type: "Pooling" bottom: "rsh" top: "cons"
  pooling_param { pool: AVE kernel_h: 2 kernel_w: 1 } }
layer { name: "rsh2" type: "Reshape" bottom: "cons" top: "feat"
  reshape_param { shape { dim: -1 dim: 2 } } }
layer { name: "fc" type: "InnerProduct" bottom: "feat" top: "fc"
  inner_product_param { num_output: 2 } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "fc" bottom: "label"
  top: "loss" }
layer { name: "top1" type: "Accuracy" bottom: "fc" bottom: "label"
  top: "top1" include { phase: TEST } }
"""


def _rgb_weights():
    eye = np.eye(3, dtype=np.float32)
    params = {
        # ours: (*k, in, out) -- channel-identity 1x1 conv
        "conv1": {"w": eye.reshape(1, 1, 3, 3), "b": np.zeros(3, np.float32)},
        # non-trivial but order-preserving BN (same affine per channel)
        "conv1_bn": {"gamma": np.full(3, 2.0, np.float32),
                     "beta": np.full(3, 1.0, np.float32)},
        "fc": {"w": eye, "b": np.zeros(3, np.float32)},
    }
    state = {
        "conv1_bn": {"mean": np.full(3, 5.0, np.float32),
                     "var": np.full(3, 4.0, np.float32)},
    }
    return params, state


def main():
    from eco_tpu.convert.write import export_caffe_weights
    from eco_tpu.spec.prototxt import graph_from_prototxt

    proto_path = os.path.join(HERE, "mini_eco.prototxt")
    with open(proto_path, "w") as f:
        f.write(PROTOTXT)
    graph = graph_from_prototxt(PROTOTXT)
    params, state = _rgb_weights()
    model_path = os.path.join(HERE, "mini_eco.caffemodel")
    exported = export_caffe_weights(graph, params, state, model_path)
    print(f"wrote {proto_path} and {model_path} (layers: {exported})")

    # inverse-std BN style (bn_convert_style.py:13-33): 4th blob = 1/sqrt(
    # var+eps).  Importing with --bn-style inv_std must reconstruct var.
    eps = 1e-5
    state_istd = {
        "conv1_bn": {
            "mean": state["conv1_bn"]["mean"],
            "var": 1.0 / np.sqrt(state["conv1_bn"]["var"] + eps),
        }
    }
    istd_path = os.path.join(HERE, "mini_eco_invstd.caffemodel")
    export_caffe_weights(graph, params, state_istd, istd_path)
    print(f"wrote {istd_path}")

    # flow-modality net: logit0 = -mean(flow_x - 128), logit1 = +mean(...)
    flow_proto_path = os.path.join(HERE, "mini_flow.prototxt")
    with open(flow_proto_path, "w") as f:
        f.write(FLOW_PROTOTXT)
    fgraph = graph_from_prototxt(FLOW_PROTOTXT)
    wc = np.zeros((1, 1, 2, 2), np.float32)
    wc[0, 0, 0, 0] = -1.0  # flow_x -> logit-feature 0 (negated)
    wc[0, 0, 0, 1] = +1.0  # flow_x -> logit-feature 1
    fparams = {
        "conv1": {"w": wc, "b": np.zeros(2, np.float32)},
        "fc": {"w": np.eye(2, dtype=np.float32), "b": np.zeros(2, np.float32)},
    }
    flow_model_path = os.path.join(HERE, "mini_flow.caffemodel")
    exported = export_caffe_weights(fgraph, fparams, {}, flow_model_path)
    print(f"wrote {flow_proto_path} and {flow_model_path} (layers: {exported})")


if __name__ == "__main__":
    main()
