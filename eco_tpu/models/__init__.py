from eco_tpu.models.eco import build_eco_full, build_eco_lite
from eco_tpu.models.zoo import REGISTRY, get_model
