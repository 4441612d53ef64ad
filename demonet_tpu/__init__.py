"""demonet_tpu — a TPU-native (JAX/XLA/Pallas) single-shot object detection framework.

A ground-up re-design of the capabilities of zhiqwang/demonet (SSD object
detection: MobileNetV2/V3 + VGG16 backbones, SSD/SSDLite heads, DefaultBox
anchors, MultiBox loss with hard negative mining, on-device class-wise NMS,
COCO/VOC data pipelines + evaluators, data-parallel training over a device
mesh, StableHLO export).

Design stance (TPU-first, not a port):
  * functional core — models are pure ``init``/``apply`` (flax.linen); loss and
    prediction are separate jit-compiled functions (the reference mode-switches
    inside one forward, /root/reference/demonet/models/generalized_ssd.py:271).
  * static shapes everywhere — fixed input size per builder, anchors as a
    compile-time constant, ragged ground truth as padded+masked arrays.
  * everything batched/vmapped — matching, loss, NMS are dense per-image maps,
    not host-side Python loops.
  * SPMD via jax.sharding.Mesh + NamedSharding; XLA collectives over ICI.
"""

__version__ = "0.1.0"

from demonet_tpu import ops  # noqa: F401
from demonet_tpu import models  # noqa: F401
