"""ECO-TPU: a TPU-native (JAX/XLA/Pallas/pjit) video-understanding framework.

Re-implements the full capability surface of the reference ECO stack
(mzolfaghari/ECO-efficient-video-understanding, a Caffe/CUDA/MPI framework)
as an idiomatic TPU framework:

- ``eco_tpu.ops``       -- channels-last XLA/Pallas op library (2D/3D conv, BN
                           variants, Caffe-semantics pooling, losses, ...).
- ``eco_tpu.spec``      -- declarative graph IR + Caffe prototxt importer
                           (config-system parity with caffe.proto).
- ``eco_tpu.runtime``   -- GraphSpec -> pure jittable function executor (the
                           ``Net`` equivalent), profiler, remat policies.
- ``eco_tpu.models``    -- native ECO-Lite / ECO-Full model builders + zoo.
- ``eco_tpu.convert``   -- .caffemodel wire parser, weight import, BN folding.
- ``eco_tpu.data``      -- segment-sampling video pipeline (VideoData parity).
- ``eco_tpu.train``     -- Caffe-exact solver family (SGD/Nesterov/AdaGrad),
                           LR policies, checkpoint/resume.
- ``eco_tpu.parallel``  -- mesh construction, shardings, psum-based gradient
                           and BN-moment sync (replaces the reference's MPI).
- ``eco_tpu.apps``      -- online recognition streaming runner.
- ``eco_tpu.tools``     -- ``eco train/test/time/device_query`` CLI.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy convenience exports: eco_tpu.get_model, eco_tpu.Program, ..."""
    if name == "get_model":
        from eco_tpu.models import get_model

        return get_model
    if name == "Program":
        from eco_tpu.runtime import Program

        return Program
    if name == "ops":
        import eco_tpu.ops as ops

        return ops
    raise AttributeError(name)
