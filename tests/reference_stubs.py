"""Shared torchvision stub kit for the executed-reference oracle tests.

The reference (/root/reference/demonet) depends on torchvision only
through a tiny surface: a handful of box ops, two container classes, a
URL weight loader and the VGG16 feature stack. torchvision itself is not
installed here, so the oracle tests install pure-torch stand-ins into
``sys.modules`` and then import the reference's ACTUAL model code
unmodified. Formulas mirror torchvision's documented semantics:

  * box_iou / clip_boxes_to_image — torchvision.ops.boxes (the exact
    expressions are restated at generalized_ssd.py:8 call sites)
  * nms / batched_nms — greedy score-descending suppression with the
    class-offset trick (generalized_ssd.py:389)
  * FrozenBatchNorm2d — only referenced by overwrite_eps (_utils.py:8)
  * ImageList — (tensors, image_sizes) pair (transform.py:7)
  * load_state_dict_from_url — must never be hit (no egress): raises
  * vgg.vgg16 — torchvision cfg-"D" feature stack (31 modules, 5 pools),
    the layout ssd_vgg16.py:112-137 slices by MaxPool2d positions

Everything here is test harness, not framework code.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

import torch
from torch import nn

REF = "/root/reference/demonet"


# ---------------------------------------------------------------------------
# pure-torch torchvision.ops.boxes
# ---------------------------------------------------------------------------


def tv_box_iou(boxes1, boxes2):
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = torch.max(boxes1[:, None, :2], boxes2[:, :2])
    rb = torch.min(boxes1[:, None, 2:], boxes2[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, :, 0] * wh[:, :, 1]
    return inter / (area1[:, None] + area2 - inter)


def tv_nms(boxes, scores, iou_threshold):
    """Greedy NMS, score-descending, suppress IoU > threshold — the exact
    torchvision keep-order semantics (indices into the input, sorted by
    score)."""
    order = torch.argsort(scores, descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0]
        keep.append(int(i))
        if order.numel() == 1:
            break
        rest = order[1:]
        iou = tv_box_iou(boxes[i:i + 1], boxes[rest])[0]
        order = rest[iou <= iou_threshold]
    return torch.tensor(keep, dtype=torch.int64)


def tv_batched_nms(boxes, scores, idxs, iou_threshold):
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
    return tv_nms(boxes + offsets[:, None], scores, iou_threshold)


def tv_clip_boxes_to_image(boxes, size):
    h, w = size
    out = boxes.clone()
    out[:, 0::2] = out[:, 0::2].clamp(min=0, max=w)
    out[:, 1::2] = out[:, 1::2].clamp(min=0, max=h)
    return out


# ---------------------------------------------------------------------------
# pure-torch torchvision.models.vgg (cfg "D" features only)
# ---------------------------------------------------------------------------


def _vgg16_features() -> nn.Sequential:
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers: list = []
    in_ch = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers += [nn.Conv2d(in_ch, int(v), kernel_size=3, padding=1),
                       nn.ReLU(inplace=True)]
            in_ch = int(v)
    return nn.Sequential(*layers)


class _VGG(nn.Module):
    def __init__(self):
        super().__init__()
        self.features = _vgg16_features()
        # torchvision VGG init (the part that matters for conv features)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(
                    m.weight, mode="fan_out", nonlinearity="relu")
                nn.init.constant_(m.bias, 0)


def vgg16(pretrained: bool = False, progress: bool = True, **kw) -> _VGG:
    assert not pretrained, "oracle stubs have no pretrained weights"
    return _VGG()


def _no_egress(*a, **k):
    raise RuntimeError(
        "load_state_dict_from_url called in the offline oracle harness")


class FrozenBatchNorm2d(nn.Module):
    """Stub: only _utils.overwrite_eps references it, which the oracle
    tests never exercise with pretrained=False builders."""


class ImageList:
    def __init__(self, tensors, image_sizes):
        self.tensors = tensors
        self.image_sizes = image_sizes


def _paste_masks_stub(*a, **k):
    raise NotImplementedError("paste_masks_in_image stub")


def _mod(name: str) -> types.ModuleType:
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
    return sys.modules[name]


def install_torchvision_stubs() -> None:
    """Idempotently install the full torchvision stub surface the
    reference package imports. Safe to call repeatedly and from multiple
    test modules in any order."""
    tv = _mod("torchvision")
    tv._is_tracing = lambda: False

    ops = _mod("torchvision.ops")
    tv.ops = ops
    misc = _mod("torchvision.ops.misc")
    ops.misc = misc
    misc.FrozenBatchNorm2d = getattr(misc, "FrozenBatchNorm2d",
                                     FrozenBatchNorm2d)
    boxes = _mod("torchvision.ops.boxes")
    ops.boxes = boxes
    for fname, fn in (("box_iou", tv_box_iou), ("nms", tv_nms),
                      ("batched_nms", tv_batched_nms),
                      ("clip_boxes_to_image", tv_clip_boxes_to_image)):
        if not hasattr(boxes, fname):
            setattr(boxes, fname, fn)

    models = _mod("torchvision.models")
    tv.models = models
    mutils = _mod("torchvision.models.utils")
    models.utils = mutils
    mutils.load_state_dict_from_url = getattr(
        mutils, "load_state_dict_from_url", _no_egress)
    vggmod = _mod("torchvision.models.vgg")
    models.vgg = vggmod
    vggmod.vgg16 = getattr(vggmod, "vgg16", vgg16)

    det = _mod("torchvision.models.detection")
    models.detection = det
    il = _mod("torchvision.models.detection.image_list")
    det.image_list = il
    il.ImageList = getattr(il, "ImageList", ImageList)
    rh = _mod("torchvision.models.detection.roi_heads")
    det.roi_heads = rh
    rh.paste_masks_in_image = getattr(rh, "paste_masks_in_image",
                                      _paste_masks_stub)


def load_ref_module(path: str, name: str) -> types.ModuleType:
    """Exec one reference file as a standalone module (no relative
    imports inside)."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def ref_models_package() -> types.ModuleType:
    """Import /root/reference/demonet/models as the package
    ``reffm_models`` (so its relative imports resolve) under the stub
    kit; return the package module. The name is distinct from
    test_reference_oracle.py's ``ref_demonet_models`` so the two stub
    harnesses never share module instances. Individual members are then
    importlib.import_module('reffm_models.<name>')."""
    install_torchvision_stubs()
    if "reffm_models" not in sys.modules:
        pkg = types.ModuleType("reffm_models")
        pkg.__path__ = [f"{REF}/models"]
        sys.modules["reffm_models"] = pkg
    return sys.modules["reffm_models"]


def import_ref(member: str) -> types.ModuleType:
    ref_models_package()
    return importlib.import_module(f"reffm_models.{member}")
