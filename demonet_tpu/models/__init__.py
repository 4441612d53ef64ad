"""Model zoo (reference demonet/models/__init__.py:1-6 + hubconf.py)."""

from demonet_tpu.models.builders import (  # noqa: F401
    MODEL_REGISTRY,
    get_model,
    mobilenet_v2,
    mobilenet_v3_large,
    mobilenet_v3_small,
    ssd300_vgg16,
    ssd512_vgg16,
    ssd_lite_mobilenet_v2,
    ssdlite320_mobilenet_v3_large,
)
from demonet_tpu.models.detection import (  # noqa: F401
    Detector,
    SSD,
    SSDConfig,
    postprocess_detections,
    preprocess,
)
