"""Data layer tests: COCO JSON parsing, VOC XML parsing, augmentations,
evaluator edge cases."""

import json
import os

import numpy as np
import pytest

from demonet_tpu.data import transforms as T
from demonet_tpu.data.coco import CocoDetection
from demonet_tpu.data.coco_eval import CocoEvaluator
from demonet_tpu.data.voc import VOCDetection
from demonet_tpu.data.voc_eval import VocEvaluator, voc_ap


# ---------- fixtures ----------

@pytest.fixture
def coco_dir(tmp_path):
    """Minimal COCO-format dataset: 2 images, 3 annotations."""
    from PIL import Image

    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "train2017").mkdir()
    for i, name in enumerate(["a.jpg", "b.jpg"]):
        Image.new("RGB", (40, 30), (i * 100, 10, 10)).save(
            root / "train2017" / name)
    ann = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "height": 30, "width": 40},
            {"id": 2, "file_name": "b.jpg", "height": 30, "width": 40},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 3,
             "bbox": [5, 5, 10, 12], "area": 120, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 7,
             "bbox": [20, 8, 8, 8], "area": 64, "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 3,
             "bbox": [0, 0, 0.5, 0.5], "area": 0.25, "iscrowd": 0},  # degenerate-ish
        ],
        "categories": [{"id": 3, "name": "x"}, {"id": 7, "name": "y"}],
    }
    with open(root / "annotations" / "instances_train2017.json", "w") as f:
        json.dump(ann, f)
    return str(root)


@pytest.fixture
def voc_dir(tmp_path):
    from PIL import Image

    root = tmp_path / "VOCdevkit" / "VOC2007"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    Image.new("RGB", (50, 40)).save(root / "JPEGImages" / "000001.jpg")
    xml = """<annotation>
      <size><width>50</width><height>40</height><depth>3</depth></size>
      <object><name>dog</name><difficult>0</difficult>
        <bndbox><xmin>10</xmin><ymin>10</ymin><xmax>30</xmax><ymax>30</ymax></bndbox>
      </object>
      <object><name>person</name><difficult>1</difficult>
        <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>9</xmax><ymax>9</ymax></bndbox>
      </object>
    </annotation>"""
    (root / "Annotations" / "000001.xml").write_text(xml)
    (root / "ImageSets" / "Main" / "test.txt").write_text("000001\n")
    return str(tmp_path / "VOCdevkit")


# ---------- COCO dataset ----------

def test_coco_dataset_targets(coco_dir):
    ds = CocoDetection(
        os.path.join(coco_dir, "train2017"),
        os.path.join(coco_dir, "annotations", "instances_train2017.json"))
    assert len(ds) == 2
    img, t = ds[0]
    assert img.shape == (30, 40, 3) and img.dtype == np.uint8
    assert t["boxes"].shape == (2, 4)
    # xywh -> xyxy
    np.testing.assert_allclose(t["boxes"][0], [5, 5, 15, 17])
    assert t["labels"].tolist() == [3, 7]
    assert ds.get_height_and_width(0) == (30, 40)


def test_coco_remove_empty(coco_dir):
    ds = CocoDetection(
        os.path.join(coco_dir, "train2017"),
        os.path.join(coco_dir, "annotations", "instances_train2017.json"),
        remove_images_without_annotations=True)
    # image 2 has only a sub-pixel box -> dropped
    assert len(ds) == 1


def test_coco_ground_truth_for_eval(coco_dir):
    ds = CocoDetection(
        os.path.join(coco_dir, "train2017"),
        os.path.join(coco_dir, "annotations", "instances_train2017.json"))
    gts = ds.ground_truth_for_eval()
    assert len(gts) == 2 and gts[0]["boxes"].shape == (2, 4)


# ---------- VOC dataset ----------

def test_voc_dataset(voc_dir):
    ds = VOCDetection(voc_dir, "2007", "test")
    assert len(ds) == 1
    img, t = ds[0]
    assert img.shape == (40, 50, 3)
    # 1-based -> 0-based
    np.testing.assert_allclose(t["boxes"][0], [9, 9, 29, 29])
    assert t["difficult"].tolist() == [0, 1]
    anns = ds.annotations_by_name()
    assert anns["000001"][0]["name"] == "dog"


# ---------- augmentations ----------

def _sample():
    img = np.zeros((40, 60, 3), np.uint8)
    img[10:30, 20:40] = 200
    target = {"boxes": np.asarray([[20.0, 10.0, 40.0, 30.0]], np.float32),
              "labels": np.asarray([1], np.int64)}
    return img, target


def test_hflip_deterministic():
    img, t = _sample()
    out_img, out_t = T.RandomHorizontalFlip(p=1.0)(
        img, t, np.random.default_rng(0))
    np.testing.assert_allclose(out_t["boxes"][0], [20, 10, 40, 30])  # symmetric
    assert out_img[15, 25, 0] == 200
    # asymmetric box
    t2 = {"boxes": np.asarray([[0.0, 0.0, 10.0, 10.0]], np.float32),
          "labels": np.asarray([1])}
    _, out = T.RandomHorizontalFlip(p=1.0)(img, t2, np.random.default_rng(0))
    np.testing.assert_allclose(out["boxes"][0], [50, 0, 60, 10])


def test_zoom_out_contains_original():
    img, t = _sample()
    rng = np.random.default_rng(3)
    out_img, out_t = T.RandomZoomOut(fill=[1, 2, 3], p=1.0)(img, t, rng)
    assert out_img.shape[0] >= 40 and out_img.shape[1] >= 60
    b = out_t["boxes"][0]
    w, h = b[2] - b[0], b[3] - b[1]
    assert w == 20 and h == 20  # box size preserved, only translated


def test_iou_crop_keeps_valid_boxes():
    img, t = _sample()
    rng = np.random.default_rng(0)
    out_img, out_t = T.RandomIoUCrop()(img, t, rng)
    assert len(out_t["boxes"]) >= 0
    if len(out_t["boxes"]):
        b = out_t["boxes"]
        assert (b[:, 2] <= out_img.shape[1]).all()
        assert (b[:, 3] <= out_img.shape[0]).all()


def test_photometric_distort_shape_dtype():
    img, t = _sample()
    out, _ = T.RandomPhotometricDistort(p=1.0)(img, t, np.random.default_rng(1))
    assert out.shape == img.shape and out.dtype == img.dtype


def test_resize_scales_boxes():
    img, t = _sample()
    out_img, out_t = T.Resize((20, 30))(img, t)
    assert out_img.shape[:2] == (20, 30)
    np.testing.assert_allclose(out_t["boxes"][0], [10, 5, 20, 15])


def _sample_with_masks_kps():
    img, t = _sample()
    h, w = img.shape[:2]
    mask = np.zeros((1, h, w), bool)
    mask[0, 10:30, 20:40] = True
    # 17 COCO keypoints: kp0 at box center visible, kp1 (left eye) visible,
    # kp2 (right eye) invisible (must stay zeroed under flip).
    kps = np.zeros((1, 17, 3), np.float32)
    kps[0, 0] = [30.0, 20.0, 2.0]
    kps[0, 1] = [25.0, 15.0, 2.0]
    t = dict(t, masks=mask, keypoints=kps)
    return img, t


def test_hflip_masks_and_keypoints():
    img, t = _sample_with_masks_kps()
    w = img.shape[1]
    _, out = T.RandomHorizontalFlip(p=1.0)(img, t, np.random.default_rng(0))
    np.testing.assert_array_equal(out["masks"], t["masks"][:, :, ::-1])
    # kp1 (left eye) swaps to slot 2 (right eye) with mirrored x
    np.testing.assert_allclose(out["keypoints"][0, 2], [w - 25.0, 15.0, 2.0])
    # the old slot-2 (invisible) lands in slot 1 and must be zeroed
    np.testing.assert_allclose(out["keypoints"][0, 1], [0, 0, 0])
    np.testing.assert_allclose(out["keypoints"][0, 0], [w - 30.0, 20.0, 2.0])


def test_resize_masks_and_keypoints():
    img, t = _sample_with_masks_kps()
    out_img, out = T.Resize((20, 30))(img, t)
    assert out["masks"].shape == (1, 20, 30)
    # mask stays roughly the same fractional area under nearest resize
    frac_in = t["masks"].mean()
    frac_out = out["masks"].mean()
    assert abs(frac_in - frac_out) < 0.05
    np.testing.assert_allclose(out["keypoints"][0, 0], [15.0, 10.0, 2.0])


def test_zoom_out_masks_and_keypoints():
    img, t = _sample_with_masks_kps()
    rng = np.random.default_rng(3)
    out_img, out = T.RandomZoomOut(p=1.0)(img, t, rng)
    assert out["masks"].shape[1:] == out_img.shape[:2]
    assert out["masks"].sum() == t["masks"].sum()  # translated, not scaled
    # keypoint offset matches box offset
    dx = out["boxes"][0, 0] - t["boxes"][0, 0]
    dy = out["boxes"][0, 1] - t["boxes"][0, 1]
    np.testing.assert_allclose(out["keypoints"][0, 0, :2], [30 + dx, 20 + dy])
    # invisible keypoints stay zeroed
    np.testing.assert_allclose(out["keypoints"][0, 2], [0, 0, 0])


def test_iou_crop_masks_and_keypoints():
    img, t = _sample_with_masks_kps()
    rng = np.random.default_rng(0)
    out_img, out = T.RandomIoUCrop()(img, t, rng)
    assert out["masks"].shape[0] == len(out["boxes"])
    assert out["masks"].shape[1:] == out_img.shape[:2]
    assert out["keypoints"].shape[0] == len(out["boxes"])
    kps = out["keypoints"]
    vis = kps[..., 2] > 0
    assert (kps[vis][:, 0] <= out_img.shape[1]).all()
    assert (kps[vis][:, 1] <= out_img.shape[0]).all()


# ---------- evaluators ----------

def test_coco_eval_crowd_is_ignored():
    gts = [{"image_id": 1, "boxes": [[0, 0, 10, 10], [50, 50, 90, 90]],
            "labels": [1, 1], "iscrowd": [False, True],
            "areas": [100.0, 1600.0]}]
    ev = CocoEvaluator(gts)
    # detection matching the crowd region only -> ignored, not a FP;
    # plus a perfect match on the real gt
    ev.update([{"image_id": 1,
                "boxes": [[0, 0, 10, 10], [55, 55, 85, 85]],
                "scores": [0.9, 0.8], "labels": [1, 1]}])
    ev.accumulate()
    s = ev.summarize()
    assert s["AP"] == pytest.approx(1.0)


def test_coco_eval_localization_quality():
    # det with IoU ~0.6: counts at IoU<=0.6 thresholds, fails above
    gts = [{"image_id": 1, "boxes": [[0, 0, 10, 10]], "labels": [1]}]
    ev = CocoEvaluator(gts)
    ev.update([{"image_id": 1, "boxes": [[0, 0, 10, 6.0]],
                "scores": [0.9], "labels": [1]}])
    ev.accumulate()
    s = ev.summarize()
    assert s["AP50"] == pytest.approx(1.0)
    assert s["AP75"] == pytest.approx(0.0)
    assert 0.0 < s["AP"] < 1.0


def test_voc_ap_modes():
    rec = np.asarray([0.2, 0.4, 0.4, 0.8])
    prec = np.asarray([1.0, 1.0, 0.6, 0.5])
    auc = voc_ap(rec, prec, use_07_metric=False)
    v07 = voc_ap(rec, prec, use_07_metric=True)
    assert 0 < v07 <= 1 and 0 < auc <= 1


def test_voc_eval_difficult_excluded(voc_dir):
    ds = VOCDetection(voc_dir, "2007", "test")
    ev = VocEvaluator(ds, use_07_metric=True)
    # perfect detection of the dog; difficult person undetected (no penalty)
    ev.update([{"image_id": 0, "boxes": np.asarray([[9, 9, 29, 29]]),
                "scores": np.asarray([0.9]), "labels": np.asarray([12])}])
    ev.accumulate()
    aps = ev.summarize()
    # perfect dog AP; the difficult-only person gt contributes no positives
    assert aps["dog"] == pytest.approx(1.0, abs=1e-6)
    assert aps["person"] == 0.0


def test_voc_eval_writes_results_files(voc_dir, tmp_path):
    ds = VOCDetection(voc_dir, "2007", "test")
    out = str(tmp_path / "results")
    ev = VocEvaluator(ds, output_dir=out)
    ev.update([{"image_id": 0, "boxes": np.asarray([[9, 9, 29, 29]]),
                "scores": np.asarray([0.9]), "labels": np.asarray([12])}])
    ev.accumulate()
    assert os.path.exists(os.path.join(out, "det_test_dog.txt"))
    line = open(os.path.join(out, "det_test_dog.txt")).read().split()
    assert line[0] == "000001" and float(line[1]) == pytest.approx(0.9)
