from eco_tpu.runtime.executor import Context, Program
