from eco_tpu.apps.online import (
    MultiStreamRecognizer,
    OnlineRecognizer,
    preprocess_frame,
)
from eco_tpu.apps.serving import UInt8Server
from eco_tpu.apps.tsn_eval import OversampleEvaluator, oversample_video, ten_crop
