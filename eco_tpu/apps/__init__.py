from eco_tpu.apps.online import (
    MultiStreamRecognizer,
    OnlineRecognizer,
    preprocess_frame,
)
