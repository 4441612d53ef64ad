"""Differential tests executing the REFERENCE's own runnable code as the
oracle (VERDICT r2 directive 2).

The reference's VOC evaluator is pure numpy+xml
(/root/reference/demonet/data/voc_eval.py:1-166) and its box coder /
matchers (/root/reference/demonet/models/_utils.py:81-362) need only torch
(CPU, present here) plus a one-class torchvision stub — so instead of
hand-derived golden values we run the reference directly on randomized
inputs and assert identical outputs. The same recipe with a fuller stub
set (ImageList, box_iou, a 20-line pure-torch greedy NMS) executes the
reference's DefaultBoxGenerator (anchor_utils.py), its complete MultiBox
training loss (generalized_ssd.py::SSD.compute_loss), the full inference
postprocess (SSD.postprocess_detections) and the model-side
pre/post transform (transform.py) — every numeric stage of the reference
that runs without torchvision binaries.

Environment shims (test-harness only, documented divergences none):
  * numpy>=1.24 removed the `np.bool` alias the 2020-era reference uses
    (voc_eval.py:95) — restored for the exec.
  * `torchvision.ops.misc.FrozenBatchNorm2d` stubbed (only referenced by
    `overwrite_eps`, which these tests do not exercise).

Known intentional divergences, avoided in the generators rather than
papered over in the asserts:
  * score ties: reference sorts detections with unstable argsort
    (voc_eval.py:112), ours stable — generators use unique scores.
  * SSDMatcher force-assign when two gts share one best anchor: reference
    last-write-wins (_utils.py:357-360), ours unspecified scatter order —
    collision cases are compared set-wise below (test_ssd_matcher_*).
"""

import importlib.util
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/demonet"


def _load_ref(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_voc():
    if not hasattr(np, "bool"):
        np.bool = bool  # shim for the removed alias (see module docstring)
    return _load_ref(f"{REF}/data/voc_eval.py", "ref_voc_eval")


@pytest.fixture(scope="module")
def ref_utils():
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        misc = types.ModuleType("torchvision.ops.misc")

        class FrozenBatchNorm2d(torch.nn.Module):
            pass

        misc.FrozenBatchNorm2d = FrozenBatchNorm2d
        tv.ops = ops
        ops.misc = misc
        sys.modules.update({"torchvision": tv, "torchvision.ops": ops,
                            "torchvision.ops.misc": misc})
    return _load_ref(f"{REF}/models/_utils.py", "ref_utils")


# ---------------------------------------------------------------------------
# VOC evaluator: reference file-based protocol vs our array-based one
# ---------------------------------------------------------------------------

CLASSES = ["aeroplane", "cat", "dog"]


def _gen_voc_scene(rng, n_images=14):
    """Random gt + detections: detections are jittered copies of gts (TPs
    at various IoUs), duplicates (double-detection FPs) and random boxes
    (pure FPs), with unique scores."""
    images = [f"im{i:04d}" for i in range(n_images)]
    annotations = {}
    for name in images:
        objs = []
        for _ in range(rng.integers(0, 6)):
            x1, y1 = rng.integers(0, 200, 2)
            w, h = rng.integers(20, 120, 2)
            objs.append({
                "name": CLASSES[rng.integers(0, len(CLASSES))],
                "bbox": [int(x1), int(y1), int(x1 + w), int(y1 + h)],
                "difficult": int(rng.random() < 0.25),
            })
        annotations[name] = objs
    # ensure every class has a non-difficult gt (reference divides by npos)
    for k, cls in enumerate(CLASSES):
        annotations[images[k]].append(
            {"name": cls, "bbox": [10, 10, 90, 90], "difficult": 0})

    dets = {c: [] for c in CLASSES}
    for idx, name in enumerate(images):
        for o in annotations[name]:
            for _ in range(rng.integers(0, 3)):  # 0-2 dets per gt
                jitter = rng.normal(0, 8, 4)
                bb = np.asarray(o["bbox"], float) + jitter
                dets[o["name"]].append([idx, 0.0, *bb])
        for _ in range(rng.integers(0, 3)):  # random FPs, random class
            x1, y1 = rng.uniform(0, 200, 2)
            w, h = rng.uniform(10, 100, 2)
            dets[CLASSES[rng.integers(0, len(CLASSES))]].append(
                [idx, 0.0, x1, y1, x1 + w, y1 + h])
    for c in CLASSES:
        if not dets[c]:
            dets[c].append([0, 0.0, 5.0, 5.0, 50.0, 50.0])
        arr = np.asarray(dets[c], float)
        arr[:, 1] = rng.permutation(len(arr)) / len(arr) + 1e-4  # unique
        dets[c] = arr
    return images, annotations, dets


def _write_voc_files(tmp_path, images, annotations, dets):
    ann_dir = tmp_path / "Annotations"
    ann_dir.mkdir()
    for name in images:
        objs = "".join(
            "<object><name>{}</name><difficult>{}</difficult>"
            "<bndbox><xmin>{}</xmin><ymin>{}</ymin>"
            "<xmax>{}</xmax><ymax>{}</ymax></bndbox></object>".format(
                o["name"], o["difficult"], *o["bbox"])
            for o in annotations[name])
        (ann_dir / f"{name}.xml").write_text(
            f"<annotation>{objs}</annotation>")
    (tmp_path / "imageset.txt").write_text(
        "".join(n + "\n" for n in images))
    for c, arr in dets.items():
        lines = [f"{images[int(r[0])]} {r[1]:.8f} "
                 f"{r[2]:.6f} {r[3]:.6f} {r[4]:.6f} {r[5]:.6f}\n"
                 for r in arr]
        (tmp_path / f"det_{c}.txt").write_text("".join(lines))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("use_07", [False, True])
def test_voc_eval_matches_reference(tmp_path, ref_voc, seed, use_07):
    from demonet_tpu.data.voc_eval import voc_eval

    rng = np.random.default_rng(seed)
    images, annotations, dets = _gen_voc_scene(rng)
    _write_voc_files(tmp_path, images, annotations, dets)

    for c in CLASSES:
        ref_rec, ref_prec, ref_ap = ref_voc.voc_eval(
            str(tmp_path / "det_{}.txt"),
            str(tmp_path / "Annotations") + "/{}.xml",
            str(tmp_path / "imageset.txt"),
            c, ovthresh=0.5, use_07_metric=use_07)
        got_rec, got_prec, got_ap = voc_eval(
            dets[c], images, annotations, c,
            ovthresh=0.5, use_07_metric=use_07)
        np.testing.assert_allclose(got_rec, ref_rec, rtol=0, atol=1e-12)
        np.testing.assert_allclose(got_prec, ref_prec, rtol=0, atol=1e-12)
        assert got_ap == pytest.approx(float(ref_ap), abs=1e-12)


def test_voc_ap_matches_reference_on_random_curves(ref_voc):
    from demonet_tpu.data.voc_eval import voc_ap

    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(1, 40))
        rec = np.sort(rng.random(n))
        prec = rng.random(n)
        for use_07 in (False, True):
            assert voc_ap(rec, prec, use_07) == pytest.approx(
                float(ref_voc.voc_ap(rec.copy(), prec.copy(), use_07)),
                abs=1e-12)


# ---------------------------------------------------------------------------
# BoxCoder encode/decode: reference torch vs our jnp
# ---------------------------------------------------------------------------


def _rand_boxes(rng, n, scale=300.0):
    # float32 on both sides: torch f64 vs jnp f32 (jax x64 disabled) would
    # otherwise differ at the 1e-4 level through exp/log
    xy = rng.random((n, 2)) * scale
    wh = rng.random((n, 2)) * (scale / 3) + 1.0
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


@pytest.mark.parametrize("seed", list(range(8)))
def test_box_coder_encode_matches_reference(ref_utils, seed):
    from demonet_tpu.ops.boxes import encode_boxes

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 500))
    weights = (10.0, 10.0, 5.0, 5.0)
    gt = _rand_boxes(rng, n)
    anchors = _rand_boxes(rng, n)

    coder = ref_utils.BoxCoder(weights=weights)
    ref = coder.encode_single(
        torch.from_numpy(gt), torch.from_numpy(anchors)).numpy()
    got = np.asarray(encode_boxes(gt, anchors, weights=weights))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("seed", list(range(8)))
def test_box_coder_decode_matches_reference(ref_utils, seed):
    from demonet_tpu.ops.boxes import decode_boxes

    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 500))
    weights = (10.0, 10.0, 5.0, 5.0)
    anchors = _rand_boxes(rng, n)
    # deltas spanning the exp clamp (bbox_xform_clip = log(1000/16))
    deltas = rng.normal(0, 3.0, (n, 4)).astype(np.float32)
    deltas[:: max(n // 5, 1), 2:] = 30.0  # force the clamp branch

    coder = ref_utils.BoxCoder(weights=weights)
    ref = coder.decode_single(
        torch.from_numpy(deltas), torch.from_numpy(anchors)).numpy()
    got = np.asarray(decode_boxes(deltas, anchors, weights=weights))
    np.testing.assert_allclose(got, ref.reshape(got.shape),
                               rtol=1e-4, atol=1e-3)


def test_box_coder_roundtrip_matches_reference(ref_utils):
    """encode -> decode recovers the gt identically in both stacks."""
    from demonet_tpu.ops.boxes import decode_boxes, encode_boxes

    rng = np.random.default_rng(42)
    gt = _rand_boxes(rng, 200)
    anchors = _rand_boxes(rng, 200)
    got = np.asarray(decode_boxes(
        np.asarray(encode_boxes(gt, anchors)), anchors))
    np.testing.assert_allclose(got, gt, rtol=1e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# Matcher / SSDMatcher: reference torch vs our jnp
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", list(range(10)))
@pytest.mark.parametrize("allow_low", [False, True])
def test_matcher_matches_reference(ref_utils, seed, allow_low):
    from demonet_tpu.models.matcher import match

    rng = np.random.default_rng(seed)
    g = int(rng.integers(1, 12))
    a = int(rng.integers(8, 600))
    quality = rng.random((g, a))  # continuous: no ties

    ref_m = ref_utils.Matcher(0.5, 0.4, allow_low_quality_matches=allow_low)
    ref = ref_m(torch.from_numpy(quality)).numpy()
    got = np.asarray(match(quality, 0.5, 0.4,
                           allow_low_quality_matches=allow_low))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("seed", list(range(10)))
def test_matcher_matches_reference_from_iou(ref_utils, seed):
    """Same but with a real IoU matrix (many exact zeros = ties on
    non-overlapping pairs; thresholds keep those anchors background in
    both, so the comparison stays exact)."""
    from demonet_tpu.models.matcher import match
    from demonet_tpu.ops.boxes import box_iou

    rng = np.random.default_rng(200 + seed)
    g = int(rng.integers(1, 10))
    gt = _rand_boxes(rng, g)
    anchors = _rand_boxes(rng, int(rng.integers(50, 400)))
    iou = np.asarray(box_iou(gt, anchors)[0], np.float32)

    ref_m = ref_utils.Matcher(0.5, 0.4, allow_low_quality_matches=True)
    ref = ref_m(torch.from_numpy(iou)).numpy()
    got = np.asarray(match(iou, 0.5, 0.4, allow_low_quality_matches=True))
    # all-zero columns (anchor overlaps no gt): argmax tie -> both give -1
    # after thresholding, so exact equality is expected
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("seed", list(range(10)))
def test_ssd_matcher_matches_reference(ref_utils, seed):
    from demonet_tpu.models.matcher import ssd_match
    from demonet_tpu.ops.boxes import box_iou

    rng = np.random.default_rng(300 + seed)
    g = int(rng.integers(1, 10))
    gt = _rand_boxes(rng, g)
    anchors = _rand_boxes(rng, int(rng.integers(50, 400)))
    iou = np.asarray(box_iou(gt, anchors)[0], np.float32)

    ref_m = ref_utils.SSDMatcher(0.5)
    ref = ref_m(torch.from_numpy(iou)).numpy()
    got = np.asarray(ssd_match(iou, 0.5))

    best_anchor = iou.argmax(axis=1)
    collide = np.zeros(iou.shape[1], bool)
    uniq, counts = np.unique(best_anchor, return_counts=True)
    collide[uniq[counts > 1]] = True
    # non-colliding anchors: exact equality with the reference
    np.testing.assert_array_equal(got[~collide], ref[~collide])
    # colliding force-assignments (reference last-write-wins vs our
    # unspecified scatter): both must pick SOME gt whose best anchor it is
    for anch in uniq[counts > 1]:
        claimants = set(np.where(best_anchor == anch)[0])
        assert got[anch] in claimants and ref[anch] in claimants


def test_ssd_matcher_force_assign_below_threshold(ref_utils):
    """A gt whose best IoU is under the threshold still claims its best
    anchor in both implementations (_utils.py:357-360)."""
    from demonet_tpu.models.matcher import ssd_match

    iou = np.asarray([[0.3, 0.1, 0.05]])  # best anchor 0, below 0.5
    ref = ref_utils.SSDMatcher(0.5)(torch.from_numpy(iou)).numpy()
    got = np.asarray(ssd_match(iou, 0.5))
    np.testing.assert_array_equal(got, ref)
    assert got[0] == 0 and got[1] == -1 and got[2] == -1


# ---------------------------------------------------------------------------
# encode_boxes free function (reference _utils.py:81-126 batch form)
# ---------------------------------------------------------------------------


def test_encode_boxes_free_function_matches_reference(ref_utils):
    from demonet_tpu.ops.boxes import encode_boxes

    rng = np.random.default_rng(9)
    gt = _rand_boxes(rng, 300)
    anchors = _rand_boxes(rng, 300)
    w = torch.tensor([10.0, 10.0, 5.0, 5.0], dtype=torch.float32)
    ref = ref_utils.encode_boxes(
        torch.from_numpy(gt), torch.from_numpy(anchors), w).numpy()
    got = np.asarray(encode_boxes(gt, anchors))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# DefaultBoxGenerator (reference anchor_utils.py:10-126, torch-only deps)
# vs models/anchors.py::default_boxes
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_anchors():
    if "torchvision.models.detection.image_list" not in sys.modules:
        tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")
        det = types.ModuleType("torchvision.models.detection")
        il = types.ModuleType("torchvision.models.detection.image_list")

        class ImageList:
            def __init__(self, tensors, image_sizes):
                self.tensors = tensors
                self.image_sizes = image_sizes

        il.ImageList = ImageList
        tv.models = models
        models.detection = det
        det.image_list = il
        sys.modules.setdefault("torchvision", tv)
        sys.modules.update({
            "torchvision.models": models,
            "torchvision.models.detection": det,
            "torchvision.models.detection.image_list": il,
        })
    return _load_ref(f"{REF}/models/anchor_utils.py", "ref_anchor_utils")


def _ref_default_boxes(ref_anchors, grid_sizes, image_size, aspect_ratios,
                       **kw):
    gen = ref_anchors.DefaultBoxGenerator(aspect_ratios, **kw)
    h, w = image_size
    il = sys.modules["torchvision.models.detection.image_list"].ImageList(
        torch.zeros((1, 3, h, w)), [(h, w)])
    feats = [torch.zeros((1, 8, gh, gw)) for gh, gw in grid_sizes]
    with torch.no_grad():
        return gen(il, feats)[0].numpy()


ANCHOR_CONFIGS = [
    # the ssdlite320_mobilenet_v3_large builder config
    # (reference ssd_mobilenetv3.py:202)
    dict(grid_sizes=[(20, 20), (10, 10), (5, 5), (3, 3), (2, 2), (1, 1)],
         image_size=(320, 320), aspect_ratios=[[2, 3]] * 6,
         kw=dict(min_ratio=0.2, max_ratio=0.95)),
    # the ssd300_vgg16 builder config (reference ssd_vgg16.py:196-198)
    dict(grid_sizes=[(38, 38), (19, 19), (10, 10), (5, 5), (3, 3), (1, 1)],
         image_size=(300, 300),
         aspect_ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
         kw=dict(scales=[0.07, 0.15, 0.33, 0.51, 0.69, 0.87, 1.05],
                 steps=[8, 16, 32, 64, 100, 300])),
    # non-square image, interpolated scales, no steps (the steps path is
    # square-only: the reference assigns H-derived cell counts to the x
    # axis for non-square inputs, anchor_utils.py:82 — all its shipped
    # configs are square, so parity is only defined there)
    dict(grid_sizes=[(10, 16), (5, 8), (3, 4)], image_size=(160, 256),
         aspect_ratios=[[2], [2, 3], [3]],
         kw=dict(min_ratio=0.1, max_ratio=0.8)),
    # clip=False, single level
    dict(grid_sizes=[(7, 7)], image_size=(224, 224), aspect_ratios=[[2]],
         kw=dict(clip=False, min_ratio=0.3, max_ratio=0.7)),
]


@pytest.mark.parametrize("cfg", range(len(ANCHOR_CONFIGS)))
def test_default_boxes_match_reference(ref_anchors, cfg):
    from demonet_tpu.models.anchors import default_boxes

    c = ANCHOR_CONFIGS[cfg]
    ref = _ref_default_boxes(ref_anchors, c["grid_sizes"], c["image_size"],
                             c["aspect_ratios"], **c["kw"])
    got = default_boxes(c["grid_sizes"], c["image_size"], c["aspect_ratios"],
                        **c["kw"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_num_anchors_per_location_matches_reference(ref_anchors):
    from demonet_tpu.models.anchors import num_anchors_per_location

    for ars in ([[2, 3]] * 6, [[2], [2, 3], [3]], [[2]]):
        gen = ref_anchors.DefaultBoxGenerator(ars)
        assert num_anchors_per_location(ars) == gen.num_anchors_per_location()


# ---------------------------------------------------------------------------
# SSD.compute_loss: the reference's FULL MultiBox training loss
# (generalized_ssd.py:195-269 — smooth-L1 regression + CE with 3:1 hard
# negative mining) executed unbound against models/losses.py::multibox_loss.
# ---------------------------------------------------------------------------


def _tv_box_iou(boxes1, boxes2):
    """Pure-torch torchvision.ops.boxes.box_iou (the stub the reference's
    matching step calls; formula identical to torchvision)."""
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = torch.max(boxes1[:, None, :2], boxes2[:, :2])
    rb = torch.min(boxes1[:, None, 2:], boxes2[:, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[:, :, 0] * wh[:, :, 1]
    return inter / (area1[:, None] + area2 - inter)


@pytest.fixture(scope="module")
def ref_ssd(ref_utils, ref_anchors):
    """Import the reference's generalized_ssd.py as a real package member
    (so its relative imports resolve) under the torchvision stub set."""
    import importlib

    tv = sys.modules["torchvision"]
    if not hasattr(tv, "ops"):
        tv.ops = sys.modules.get("torchvision.ops") or types.ModuleType(
            "torchvision.ops")
        sys.modules.setdefault("torchvision.ops", tv.ops)
    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    boxes_mod.box_iou = _tv_box_iou
    tv.ops.boxes = boxes_mod
    sys.modules["torchvision.ops.boxes"] = boxes_mod
    tv._is_tracing = lambda: False
    det = sys.modules["torchvision.models.detection"]
    rh = types.ModuleType("torchvision.models.detection.roi_heads")

    def _unused(*a, **k):
        raise NotImplementedError("paste_masks_in_image stub")

    rh.paste_masks_in_image = _unused
    det.roi_heads = rh
    sys.modules["torchvision.models.detection.roi_heads"] = rh

    pkg = types.ModuleType("ref_demonet_models")
    pkg.__path__ = [f"{REF}/models"]
    sys.modules["ref_demonet_models"] = pkg
    return importlib.import_module("ref_demonet_models.generalized_ssd")


def _ref_compute_loss(ref_ssd, ref_utils, logits, deltas, anchors,
                      gt_boxes, gt_labels, matched):
    """Unbound SSD.compute_loss with the builder-default coder/ratio
    (generalized_ssd.py:174,201: weights (10,10,5,5), positive_fraction
    0.25 -> neg_to_pos_ratio 3)."""
    self_stub = types.SimpleNamespace(
        box_coder=ref_utils.BoxCoder(weights=(10.0, 10.0, 5.0, 5.0)),
        neg_to_pos_ratio=3)
    b = len(gt_boxes)
    targets = [
        {"boxes": torch.from_numpy(gt_boxes[i]),
         "labels": torch.from_numpy(gt_labels[i]).long()}
        for i in range(b)]
    head_outputs = {
        "bbox_regression": torch.from_numpy(deltas),
        "cls_logits": torch.from_numpy(logits)}
    anchors_l = [torch.from_numpy(anchors)] * b
    matched_l = [torch.from_numpy(matched[i]).long() for i in range(b)]
    with torch.no_grad():
        out = ref_ssd.SSD.compute_loss(
            self_stub, targets, head_outputs, anchors_l, matched_l)
    return {k: float(v) for k, v in out.items()}


def _our_loss(logits, deltas, anchors, gt_boxes, gt_labels, matched):
    """multibox_loss on the zero-padded batched form of the same scene."""
    from demonet_tpu.models.losses import multibox_loss

    b = len(gt_boxes)
    gmax = max(max(len(x) for x in gt_boxes), 1)
    boxes_p = np.zeros((b, gmax, 4), np.float32)
    labels_p = np.zeros((b, gmax), np.int32)
    valid_p = np.zeros((b, gmax), bool)
    for i, (bx, lb) in enumerate(zip(gt_boxes, gt_labels)):
        boxes_p[i, :len(bx)] = bx
        labels_p[i, :len(lb)] = lb
        valid_p[i, :len(lb)] = True
    out = multibox_loss(
        logits, deltas, anchors, boxes_p, labels_p, valid_p,
        matched_idxs=np.stack(matched))
    return {k: float(v) for k, v in out.items()}


def _rand_loss_scene(rng, b=3, a=256, c=11, zero_pos_image=False):
    anchors = _rand_boxes(rng, a)
    logits = rng.normal(0, 2, (b, a, c)).astype(np.float32)
    deltas = rng.normal(0, 1, (b, a, 4)).astype(np.float32)
    gt_boxes, gt_labels, matched = [], [], []
    for i in range(b):
        g = int(rng.integers(1, 6))
        gt_boxes.append(_rand_boxes(rng, g))
        gt_labels.append(rng.integers(1, c, g).astype(np.int32))
        m = np.full(a, -1, np.int32)
        if not (zero_pos_image and i == 0):
            npos = int(rng.integers(1, a // 4))
            pos = rng.choice(a, npos, replace=False)
            m[pos] = rng.integers(0, g, npos)
        matched.append(m)
    return anchors, logits, deltas, gt_boxes, gt_labels, matched


@pytest.mark.parametrize("seed", list(range(6)))
def test_multibox_loss_matches_reference(ref_ssd, ref_utils, seed):
    """Identical matched_idxs into both stacks -> identical loss dict
    (continuous random logits: no CE ties at the negative-mining cutoff)."""
    rng = np.random.default_rng(500 + seed)
    anchors, logits, deltas, gtb, gtl, m = _rand_loss_scene(
        rng, zero_pos_image=bool(seed % 2))
    ref = _ref_compute_loss(ref_ssd, ref_utils, logits, deltas, anchors,
                            gtb, gtl, m)
    got = _our_loss(logits, deltas, anchors, gtb, gtl, m)
    assert ref.keys() == got.keys()
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-5, atol=1e-6,
                                   err_msg=k)


def test_multibox_loss_no_positives_matches_reference(ref_ssd, ref_utils):
    """Whole batch background: both sides define loss 0 via N=max(1, fg)."""
    rng = np.random.default_rng(42)
    anchors, logits, deltas, gtb, gtl, m = _rand_loss_scene(rng, b=2)
    m = [np.full_like(x, -1) for x in m]
    ref = _ref_compute_loss(ref_ssd, ref_utils, logits, deltas, anchors,
                            gtb, gtl, m)
    got = _our_loss(logits, deltas, anchors, gtb, gtl, m)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-7, err_msg=k)


@pytest.mark.parametrize("seed", list(range(4)))
def test_multibox_loss_with_reference_matcher_end_to_end(
        ref_ssd, ref_utils, seed):
    """gt + anchors -> the reference's OWN SSDMatcher -> both losses:
    the full executed-reference training-loss chain (iou -> match ->
    encode -> mine -> reduce) against one dense jit-able call."""
    rng = np.random.default_rng(700 + seed)
    anchors, logits, deltas, gtb, gtl, _ = _rand_loss_scene(rng, b=3)
    matcher = ref_utils.SSDMatcher(0.5)
    matched = []
    for i in range(3):
        iou = _tv_box_iou(torch.from_numpy(gtb[i]),
                          torch.from_numpy(anchors))
        matched.append(matcher(iou).numpy().astype(np.int32))
    ref = _ref_compute_loss(ref_ssd, ref_utils, logits, deltas, anchors,
                            gtb, gtl, matched)
    got = _our_loss(logits, deltas, anchors, gtb, gtl, matched)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=2e-5, atol=1e-6,
                                   err_msg=k)


# ---------------------------------------------------------------------------
# GeneralizedRCNNTransform: the reference's model-side pre/post transform
# (transform.py:66-292) executed against models/detection.py::preprocess and
# the postprocess_detections rescale / host transforms.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_transform(ref_ssd):
    """transform.py is imported by the ref_ssd package fixture."""
    return sys.modules["ref_demonet_models.transform"]


@pytest.mark.parametrize("hw", [(48, 64), (333, 500), (320, 320), (640, 427)])
def test_preprocess_matches_reference_transform(ref_transform, hw):
    """normalize + fixed-size bilinear resize (down- AND up-scaling):
    the reference does NOT antialias (F.interpolate default), so
    preprocess uses antialias=False — divergence would be ~0.23/pixel."""
    from demonet_tpu.models import ssdlite320_mobilenet_v3_large
    from demonet_tpu.models.detection import preprocess

    cfg = ssdlite320_mobilenet_v3_large(num_classes=7).config
    rng = np.random.default_rng(hash(hw) % 2**32)
    img = rng.random((*hw, 3), np.float32)

    tr = ref_transform.GeneralizedRCNNTransform(
        min(cfg.size), max(cfg.size), list(cfg.image_mean),
        list(cfg.image_std), size_divisible=1, fixed_size=tuple(cfg.size))
    tr.eval()
    with torch.no_grad():
        image_list, _ = tr([torch.from_numpy(img).permute(2, 0, 1)])
    ref = image_list.tensors.permute(0, 2, 3, 1).numpy()

    got = np.asarray(preprocess(img[None], cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_postprocess_rescale_matches_reference_resize_boxes(ref_transform):
    """The in-graph original_sizes rescale == the reference's
    transform.postprocess box path (resize_boxes, transform.py:278-292),
    applied to the SAME detections."""
    from demonet_tpu.models import ssdlite320_mobilenet_v3_large
    from demonet_tpu.models.detection import postprocess_detections

    det = ssdlite320_mobilenet_v3_large(num_classes=7)
    cfg = det.config
    a = det.anchors.shape[0]
    rng = np.random.default_rng(11)
    logits = np.full((2, a, 7), -4.0, np.float32)
    for bi in range(2):
        for _ in range(12):
            logits[bi, rng.integers(0, a), rng.integers(1, 7)] = 9.0
    deltas = rng.normal(0, 0.3, (2, a, 4)).astype(np.float32)
    sizes = np.asarray([[480, 640], [427, 640]], np.float32)

    plain = postprocess_detections(
        logits, deltas, jnp.asarray(det.anchors), cfg)
    scaled = postprocess_detections(
        logits, deltas, jnp.asarray(det.anchors), cfg,
        original_sizes=jnp.asarray(sizes))
    np.testing.assert_array_equal(np.asarray(plain["valid"]),
                                  np.asarray(scaled["valid"]))
    assert np.asarray(plain["valid"]).sum() > 0
    for i in range(2):
        m = np.asarray(plain["valid"][i])
        ref = ref_transform.resize_boxes(
            torch.from_numpy(np.asarray(plain["boxes"][i][m])),
            list(cfg.size), [int(sizes[i, 0]), int(sizes[i, 1])]).numpy()
        np.testing.assert_allclose(
            np.asarray(scaled["boxes"][i][m]), ref, rtol=1e-6, atol=1e-4)


def test_host_resize_boxes_keypoints_match_reference(ref_transform):
    """data/transforms.py::Resize box/keypoint scaling == the reference's
    resize_boxes / resize_keypoints (same ratios, same xy-only scaling)."""
    from demonet_tpu.data.transforms import Resize

    rng = np.random.default_rng(5)
    h, w, nh, nw = 333, 500, 320, 320
    img = rng.random((h, w, 3), np.float32)
    boxes = (_rand_boxes(rng, 9) / 600.0 * [w, h, w, h]).astype(np.float32)
    kps = np.concatenate(
        [rng.random((4, 17, 1)) * w, rng.random((4, 17, 1)) * h,
         rng.integers(0, 3, (4, 17, 1)).astype(np.float64)],
        axis=2).astype(np.float32)

    _, tgt = Resize((nh, nw))(img, {"boxes": boxes, "keypoints": kps.copy()})

    ref_b = ref_transform.resize_boxes(
        torch.from_numpy(boxes), [h, w], [nh, nw]).numpy()
    np.testing.assert_allclose(tgt["boxes"], ref_b, rtol=1e-6, atol=1e-4)

    ref_k = ref_transform.resize_keypoints(
        torch.from_numpy(kps.copy()), [h, w], [nh, nw]).numpy()
    got_k = tgt["keypoints"]
    np.testing.assert_allclose(got_k[..., :2], ref_k[..., :2],
                               rtol=1e-6, atol=1e-4)
    np.testing.assert_array_equal(got_k[..., 2], ref_k[..., 2])


# ---------------------------------------------------------------------------
# SSD.postprocess_detections: the reference's FULL inference postprocess
# (generalized_ssd.py:351-397 — softmax, decode, clip, per-class strict->
# threshold + top-k, batched NMS, final top detections_per_img) executed
# unbound against models/detection.py::postprocess_detections.
# The only non-reference code in the oracle chain is a 20-line pure-torch
# greedy NMS with torchvision's exact semantics (suppress IoU > thresh,
# score-descending order).
# ---------------------------------------------------------------------------


def _tv_nms(boxes, scores, iou_threshold):
    order = torch.argsort(scores, descending=True)
    keep = []
    while order.numel() > 0:
        i = order[0]
        keep.append(int(i))
        if order.numel() == 1:
            break
        rest = order[1:]
        iou = _tv_box_iou(boxes[i:i + 1], boxes[rest])[0]
        rest = rest[iou <= iou_threshold]
        order = rest
    return torch.tensor(keep, dtype=torch.int64)


def _tv_batched_nms(boxes, scores, idxs, iou_threshold):
    if boxes.numel() == 0:
        return torch.empty((0,), dtype=torch.int64)
    max_coordinate = boxes.max()
    offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1).to(boxes))
    return _tv_nms(boxes + offsets[:, None], scores, iou_threshold)


def _tv_clip_boxes_to_image(boxes, size):
    h, w = size
    out = boxes.clone()
    out[:, 0::2] = out[:, 0::2].clamp(min=0, max=w)
    out[:, 1::2] = out[:, 1::2].clamp(min=0, max=h)
    return out


@pytest.fixture(scope="module")
def ref_postproc(ref_ssd):
    boxes_mod = sys.modules["torchvision.ops.boxes"]
    boxes_mod.batched_nms = _tv_batched_nms
    boxes_mod.clip_boxes_to_image = _tv_clip_boxes_to_image
    return ref_ssd


@pytest.mark.parametrize("seed", list(range(5)))
def test_postprocess_detections_matches_reference(
        ref_postproc, ref_utils, seed):
    from demonet_tpu.models.detection import (
        SSDConfig, postprocess_detections)
    from demonet_tpu.ops.boxes import box_cxcywh_to_xyxy

    rng = np.random.default_rng(900 + seed)
    a, c, b = 160, 7, 2
    cfg = SSDConfig(size=(64, 64), num_classes=c, score_thresh=0.02,
                    nms_thresh=0.45, detections_per_img=15,
                    topk_candidates=30)
    cxy = rng.random((a, 2)) * 48 + 8
    wh = rng.random((a, 2)) * 24 + 4
    anchors = np.asarray(box_cxcywh_to_xyxy(jnp.asarray(
        np.concatenate([cxy, wh], 1), jnp.float32)))
    # continuous logits: plenty above threshold, overlapping same-class
    # candidates so NMS genuinely suppresses; unique scores (measure zero
    # ties) keep both orderings comparable
    logits = rng.normal(0, 1.5, (b, a, c)).astype(np.float32)
    deltas = rng.normal(0, 0.4, (b, a, 4)).astype(np.float32)

    self_stub = types.SimpleNamespace(
        box_coder=ref_utils.BoxCoder(weights=cfg.box_coder_weights),
        score_thresh=cfg.score_thresh, nms_thresh=cfg.nms_thresh,
        detections_per_img=cfg.detections_per_img,
        topk_candidates=cfg.topk_candidates)
    head_outputs = {"bbox_regression": torch.from_numpy(deltas),
                    "cls_logits": torch.from_numpy(logits)}
    with torch.no_grad():
        ref = ref_postproc.SSD.postprocess_detections(
            self_stub, head_outputs,
            [torch.from_numpy(anchors)] * b, [cfg.size] * b)

    got = postprocess_detections(
        jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(anchors),
        cfg, nms_impl="xla", gather_impl="xla")

    for i in range(b):
        m = np.asarray(got["valid"][i])
        assert int(m.sum()) == ref[i]["boxes"].shape[0]
        assert m.sum() > 0
        np.testing.assert_array_equal(
            np.asarray(got["labels"][i][m]), ref[i]["labels"].numpy())
        np.testing.assert_allclose(
            np.asarray(got["scores"][i][m]), ref[i]["scores"].numpy(),
            rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(got["boxes"][i][m]), ref[i]["boxes"].numpy(),
            rtol=1e-4, atol=1e-3)


# ---------------------------------------------------------------------------
# Mask resize (reference transform.py:58-62: F.interpolate default
# mode='nearest' on the float mask, then .byte()) vs data/transforms.py
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [
    (13, 17, 20, 30), (320, 320, 20, 20), (7, 5, 320, 300),
    (100, 50, 50, 100), (33, 47, 64, 64), (512, 512, 17, 19),
    (3, 3, 9, 9), (1, 1, 4, 4), (29, 31, 29, 31), (300, 300, 300, 300),
])
def test_resize_masks_matches_reference_torch_nearest(shape):
    from demonet_tpu.data.transforms import _resize_masks

    h, w, nh, nw = shape
    rng = np.random.default_rng(h * 1000 + nh)
    masks = (rng.random((3, h, w)) > 0.5).astype(np.uint8)
    # the reference's exact call: interpolate(mask[:, None].float(),
    # size=size)[:, 0].byte()  (transform.py:58-62; default mode='nearest')
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(masks)[:, None].float(),
        size=[nh, nw])[:, 0].byte().numpy()
    got = _resize_masks(masks, nh, nw)
    np.testing.assert_array_equal(got, ref)


def test_resize_masks_fuzz_matches_reference_torch_nearest():
    from demonet_tpu.data.transforms import _resize_masks

    rng = np.random.default_rng(7)
    for _ in range(50):
        h, w = int(rng.integers(1, 160)), int(rng.integers(1, 160))
        nh, nw = int(rng.integers(1, 160)), int(rng.integers(1, 160))
        masks = (rng.random((2, h, w)) > 0.5).astype(np.uint8)
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(masks)[:, None].float(),
            size=[nh, nw])[:, 0].byte().numpy()
        np.testing.assert_array_equal(_resize_masks(masks, nh, nw), ref,
                                      err_msg=f"{(h, w, nh, nw)}")
