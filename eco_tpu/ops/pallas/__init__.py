from eco_tpu.ops.pallas.preprocess import crop_normalize, preprocess_on_device
