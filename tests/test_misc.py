"""Tests for freezing masks, hub registry, pelee builder, native imageio
bindings, logging meters, and debug utilities."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_validate_trainable_layers():
    from demonet_tpu.utils.freeze import validate_trainable_layers

    assert validate_trainable_layers(False, None, 6, 6) == 6
    assert validate_trainable_layers(True, None, 6, 3) == 3
    assert validate_trainable_layers(True, 2, 6, 3) == 2
    with pytest.raises(ValueError):
        validate_trainable_layers(True, 7, 6, 3)


def test_freeze_mask_zeroes_frozen_updates():
    from demonet_tpu.utils.freeze import masked_optimizer, path_mask
    import optax

    params = {"trunk": {"w": jnp.ones((3,))}, "head": {"w": jnp.ones((3,))}}
    mask = path_mask(params, lambda p: "head" in p)
    tx = masked_optimizer(optax.sgd(1.0), mask)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["trunk"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["head"]["w"]).sum()) > 0.0


def test_hub_list_and_load():
    from demonet_tpu import hub

    names = hub.list_models()
    assert "ssdlite320_mobilenet_v3_large" in names
    assert "pelee304" in names
    det, variables = hub.load("ssd_lite_mobilenet_v2", size=(96, 96),
                              num_classes=5)
    out = det.apply(variables, jnp.zeros((1, 96, 96, 3)))
    assert out["cls_logits"].shape[-1] == 5


def test_pelee304_builds_and_runs():
    from demonet_tpu.models import get_model

    det = get_model("pelee304", num_classes=5, size=(160, 160))
    variables = det.init(jax.random.PRNGKey(0))
    out = det.apply(variables, jnp.zeros((1, 160, 160, 3)))
    assert out["cls_logits"].shape[1] == det.anchors.shape[0]
    assert out["cls_logits"].shape[-1] == 5


def test_peleenet_classifier():
    from demonet_tpu.models import get_model

    m = get_model("peleenet_v1", num_classes=7)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert m.apply(v, jnp.zeros((2, 64, 64, 3))).shape == (2, 7)


def test_native_imageio_roundtrip():
    from demonet_tpu.data import native

    if not native.available():
        pytest.skip("libdemonet_imageio.so not built")
    import io

    from PIL import Image

    img = (np.random.RandomState(0).rand(31, 45, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    out, (h, w) = native.decode_jpeg_resize(buf.getvalue(), 16, 16)
    assert (h, w) == (31, 45)
    assert out.shape == (16, 16, 3) and 0 <= out.min() and out.max() <= 1
    imgs, hws = native.decode_jpeg_batch([buf.getvalue()] * 3, 16, 16, 2)
    assert imgs.shape == (3, 16, 16, 3) and hws[0].tolist() == [31, 45]


def test_smoothed_value_and_metric_logger(capsys):
    from demonet_tpu.utils.logging import MetricLogger, SmoothedValue

    v = SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.median == 3.0
    assert v.avg == 3.0
    assert v.global_avg == 2.5
    assert v.max == 4.0 and v.value == 4.0

    logger = MetricLogger()
    for item in logger.log_every(range(5), print_freq=2, header="t:"):
        logger.update(loss=float(item))
    out = capsys.readouterr().out
    assert "eta:" in out and "Total time" in out


def test_debug_bad_gradients():
    from demonet_tpu.utils.debug import find_bad_gradients, tree_finite_report

    def loss(p):
        return jnp.sum(jnp.log(p["w"]))  # grad 1/w explodes at tiny w

    params = {"w": jnp.asarray([1e-9, 1.0]), "ok": jnp.asarray([1.0])}

    def total(p):
        return loss(p) + jnp.sum(p["ok"])

    bad = find_bad_gradients(total, params, magnitude=1e6)
    assert any("w" in path for path, _ in bad)
    rep = tree_finite_report({"a": jnp.asarray([jnp.inf]), "b": jnp.ones(2)})
    assert len(rep["non_finite_paths"]) == 1


def test_grouped_batch_sampler():
    from demonet_tpu.data.group_by_aspect_ratio import GroupedBatchSampler

    groups = [0, 0, 0, 1, 1, 1, 0, 1]
    sampler = GroupedBatchSampler(groups, batch_size=2, shuffle=False)
    batches = list(sampler)
    assert len(batches) == 4
    for b in batches:
        assert len({groups[i] for i in b}) == 1  # homogeneous batches


def test_metrics_writer(tmp_path):
    import json

    from demonet_tpu.utils.metrics_writer import MetricsWriter

    w = MetricsWriter(str(tmp_path))
    w.write(1, {"loss": 2.5, "lr": 0.01})
    w.write(2, {"loss": 2.0, "lr": 0.01})
    lines = [json.loads(x) for x in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["train/loss"] == 2.5 and lines[1]["step"] == 2
