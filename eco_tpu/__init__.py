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
