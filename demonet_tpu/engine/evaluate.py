"""Jitted eval step + evaluation loop (reference engine.evaluate,
demonet/engine.py:71-111).

The model forward + postprocess (decode/NMS) run as one jitted program on
device; only the final fixed-size padded detection arrays cross to the host,
where the evaluator (COCO mAP or VOC AP) consumes them.
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from demonet_tpu.models.detection import (
    Detector,
    postprocess_detections,
    preprocess,
)
from demonet_tpu.engine.state import TrainState
from demonet_tpu.utils.logging import MetricLogger


def make_predict_step(
    detector: Detector,
    mesh: Optional[Mesh] = None,
    nms_impl: str = "auto",
    topk_impl: str = "exact",
    impl: str = "reference",
) -> Callable:
    """Jitted (variables, images, original_sizes) -> padded detections.

    impl="fused" selects the trained-model fast postprocess (per-image
    chunk-gather candidate selection + single class-offset NMS, see
    models/detection.py) with an exactness-guarded fallback to the
    reference pipeline.
    """
    anchors = jnp.asarray(detector.anchors)
    config = detector.config

    def step(variables, images, original_sizes):
        x = preprocess(images, config, resize=False)
        outputs = detector.model.apply(variables, x, train=False)
        return postprocess_detections(
            outputs["cls_logits"], outputs["bbox_regression"], anchors,
            config, original_sizes, nms_impl=nms_impl, topk_impl=topk_impl,
            impl=impl)

    if mesh is None:
        return jax.jit(step)
    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(replicated, sharded, sharded),
                   out_shardings=sharded)


def detections_to_numpy(dets: Dict, image_ids: np.ndarray) -> List[Dict]:
    """Padded device arrays -> per-image numpy dicts (the reference's
    List[{boxes, labels, scores}] shape, generalized_ssd.py:392-396)."""
    boxes = np.asarray(dets["boxes"])
    scores = np.asarray(dets["scores"])
    labels = np.asarray(dets["labels"])
    valid = np.asarray(dets["valid"])
    out = []
    for i in range(boxes.shape[0]):
        v = valid[i]
        out.append({
            "image_id": int(image_ids[i]),
            "boxes": boxes[i][v],
            "scores": scores[i][v],
            "labels": labels[i][v],
        })
    return out


def evaluate(
    predict_step: Callable,
    variables,
    data_loader,
    evaluator,
    mesh: Optional[Mesh] = None,
    print_freq: int = 100,
):
    """Run inference over the loader, feed the evaluator, summarize
    (reference engine.py:71-111). `variables` may be a TrainState."""
    if isinstance(variables, TrainState):
        variables = {"params": variables.params,
                     "batch_stats": variables.batch_stats}

    logger = MetricLogger(delimiter="  ")
    header = "Test:"
    for batch in logger.log_every(data_loader, print_freq, header):
        images = batch["images"]
        sizes = batch["original_sizes"]
        if mesh is not None:
            from demonet_tpu.parallel.mesh import shard_batch

            sharded = shard_batch(
                {"images": images, "original_sizes": sizes}, mesh)
            images, sizes = sharded["images"], sharded["original_sizes"]

        t0 = time.time()
        dets = predict_step(variables, images, jnp.asarray(sizes))
        # fetch only this process's rows — device_get would touch
        # non-addressable shards in multi-process runs
        from demonet_tpu.parallel.mesh import host_local_values

        dets = host_local_values(dets)
        model_time = time.time() - t0

        t0 = time.time()
        results = detections_to_numpy(dets, np.asarray(batch["image_ids"]))
        # drop padded images (loader pads the last partial batch)
        if "batch_valid" in batch:
            bv = np.asarray(batch["batch_valid"])
            results = [r for r, ok in zip(results, bv) if ok]
        evaluator.update(results)
        evaluator_time = time.time() - t0
        logger.update(model_time=model_time, evaluator_time=evaluator_time)

    logger.synchronize_between_processes()
    print("Averaged stats:", logger)
    evaluator.synchronize_between_processes()
    evaluator.accumulate()
    evaluator.summarize()
    return evaluator
