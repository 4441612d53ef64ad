"""Model export (replaces the reference's ONNX/TorchScript/Caffe glue).

The reference exports via torch.onnx (export/onnx_export.py), TorchScript
(test/tracing/trace_model.py) and two PyTorch->Caffe transpilers
(export/model_converter.py, export/converter/). The TPU-native artifact is
serialized StableHLO from jax.export — one format, portable across PJRT
backends, consumed by the C++ runner in cpp/ (the libtorch-test equivalent).
"""

from demonet_tpu.export.stablehlo import (  # noqa: F401
    export_detector,
    load_exported,
    save_exported,
)
