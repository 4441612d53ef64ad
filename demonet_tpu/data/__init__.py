"""Datasets, augmentations, loaders, evaluators (reference demonet/data/)."""

from demonet_tpu.data.coco import (  # noqa: F401
    COCO_CLASSES,
    CocoDetection,
    get_coco,
    get_coco_kp,
)
from demonet_tpu.data.group_by_aspect_ratio import (  # noqa: F401
    GroupedBatchSampler,
    compute_aspect_ratios,
    create_aspect_ratio_groups,
)
from demonet_tpu.data.voc import VOC_CLASSES, VOCDetection  # noqa: F401
from demonet_tpu.data.coco_eval import CocoEvaluator  # noqa: F401
from demonet_tpu.data.voc_eval import VocEvaluator, voc_ap, voc_eval  # noqa: F401
from demonet_tpu.data.loader import DetectionLoader  # noqa: F401
from demonet_tpu.data.presets import DetectionPresetEval, DetectionPresetTrain  # noqa: F401
