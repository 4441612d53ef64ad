"""End-to-end VOC pipeline test: synthetic VOCdevkit on disk -> loader ->
jitted predict -> engine.evaluate -> VocEvaluator AP printout.

Covers the eval_voc CLI's whole data path (reference eval_voc.py:50-96)
without needing real VOC data or a trained model.
"""

import numpy as np
import jax
import pytest


@pytest.fixture
def voc_root(tmp_path):
    from PIL import Image

    root = tmp_path / "VOCdevkit" / "VOC2007"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    rng = np.random.RandomState(0)
    names = []
    for i in range(3):
        name = f"{i:06d}"
        names.append(name)
        Image.fromarray(
            (rng.rand(60, 80, 3) * 255).astype(np.uint8)).save(
                root / "JPEGImages" / f"{name}.jpg")
        xml = f"""<annotation>
          <size><width>80</width><height>60</height><depth>3</depth></size>
          <object><name>cat</name><difficult>0</difficult>
            <bndbox><xmin>{10 + i}</xmin><ymin>10</ymin>
                    <xmax>{40 + i}</xmax><ymax>40</ymax></bndbox>
          </object>
        </annotation>"""
        (root / "Annotations" / f"{name}.xml").write_text(xml)
    (root / "ImageSets" / "Main" / "test.txt").write_text(
        "\n".join(names) + "\n")
    return str(tmp_path / "VOCdevkit")


def test_voc_pipeline_end_to_end(voc_root):
    from demonet_tpu.data.loader import DetectionLoader
    from demonet_tpu.data.presets import DetectionPresetEval
    from demonet_tpu.data.voc import VOCDetection
    from demonet_tpu.data.voc_eval import VocEvaluator
    from demonet_tpu.engine import evaluate, make_predict_step
    from demonet_tpu.models import ssd_lite_mobilenet_v2

    dataset = VOCDetection(voc_root, "2007", "test", DetectionPresetEval())
    det = ssd_lite_mobilenet_v2(num_classes=21, size=(96, 96),
                                score_thresh=0.01)
    variables = det.init(jax.random.PRNGKey(0))
    loader = DetectionLoader(dataset, batch_size=2, image_size=(96, 96),
                             prefetch=0)
    evaluator = VocEvaluator(dataset, use_07_metric=True)
    predict = make_predict_step(det)
    result = evaluate(predict, variables, loader, evaluator)
    # untrained model: pipeline must complete and report (near-)zero mAP
    assert "mAP" in result.aps
    assert 0.0 <= result.aps["mAP"] <= 1.0
    # detections were produced and rescaled to original frames
    assert len(result._dets) == 3
    for det_ in result._dets.values():
        if len(det_["boxes"]):
            assert det_["boxes"][:, 2].max() <= 80 + 1e-3
            assert det_["boxes"][:, 3].max() <= 60 + 1e-3
