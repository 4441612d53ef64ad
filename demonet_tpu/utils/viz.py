"""Demo-time image pre/post utilities + detection visualization.

Capability parity with reference demonet/util/image_utils.py:
  * load_image (:7-27): file -> RGB float CHW... here HWC (NHWC framework),
    resized + normalized
  * select_top_predictions (:30-35)
  * compute_colors_for_labels (:38-50) — same palette math
  * overlay_boxes (:54-70), overlay_class_names (:73-103)
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def load_image(
    path: str,
    size: Optional[Tuple[int, int]] = None,
    mean: Sequence[float] = (0.5, 0.5, 0.5),
    std: Sequence[float] = (0.5, 0.5, 0.5),
    normalize: bool = False,
) -> np.ndarray:
    """Read an image file -> float32 RGB HWC in [0,1] (optionally resized /
    mean-std normalized, reference image_utils.py:7-27)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if size is not None:
        img = cv2.resize(img, (size[1], size[0]),
                         interpolation=cv2.INTER_LINEAR)
    img = img.astype(np.float32) / 255.0
    if normalize:
        img = (img - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return img


def select_top_predictions(detections: Dict[str, np.ndarray],
                           threshold: float) -> Dict[str, np.ndarray]:
    """Filter one image's detections by score (reference :30-35)."""
    keep = np.asarray(detections["scores"]) > threshold
    if "valid" in detections:
        keep &= np.asarray(detections["valid"])
    return {k: np.asarray(v)[keep] for k, v in detections.items()}


def compute_colors_for_labels(labels: np.ndarray) -> np.ndarray:
    """Deterministic color per class id (reference :38-50)."""
    palette = np.asarray([2 ** 25 - 1, 2 ** 15 - 1, 2 ** 21 - 1])
    colors = labels[:, None].astype(np.int64) * palette[None, :]
    return (colors % 255).astype(np.uint8)


def overlay_boxes(image: np.ndarray, boxes: np.ndarray,
                  labels: np.ndarray) -> np.ndarray:
    """Draw boxes colored by class (reference :54-70). uint8 HWC in/out."""
    import cv2

    out = image.copy()
    colors = compute_colors_for_labels(np.asarray(labels))
    for box, color in zip(np.asarray(boxes), colors):
        x1, y1, x2, y2 = [int(v) for v in box]
        cv2.rectangle(out, (x1, y1), (x2, y2),
                      tuple(int(c) for c in color), 2)
    return out


def overlay_class_names(image: np.ndarray, boxes: np.ndarray,
                        labels: np.ndarray, scores: np.ndarray,
                        class_names: Sequence[str]) -> np.ndarray:
    """Draw 'name: score' captions (reference :73-103)."""
    import cv2

    out = image.copy()
    for box, label, score in zip(np.asarray(boxes), np.asarray(labels),
                                 np.asarray(scores)):
        x, y = int(box[0]), max(int(box[1]) - 4, 10)
        text = f"{class_names[int(label)]}: {score:.2f}"
        cv2.putText(out, text, (x, y), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    (255, 255, 255), 1)
    return out
