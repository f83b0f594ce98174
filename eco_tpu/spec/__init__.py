from eco_tpu.spec.graph import TRAIN, TEST, GraphSpec, LayerSpec, ParamSpec
from eco_tpu.spec.netspec import NetBuilder
