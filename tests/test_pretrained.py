"""Pretrained-weight path: cache resolution, conversion, and the
`--test-only --torch-weights` CLI end-to-end (VERDICT round-1 item 5).

The published .pth files are unreachable offline, so the e2e test
synthesizes a full-size reference-shaped state_dict from the model's own
init (utils.torch_weights.synthesize_torch_state_dict) and checks the CLI
loads it and evaluates."""

import os

import numpy as np
import pytest


def test_resolve_weights_cold_cache_names_url(tmp_path, monkeypatch):
    monkeypatch.setenv("DEMONET_WEIGHTS_DIR", str(tmp_path))
    from demonet_tpu.utils.pretrained import resolve_weights

    with pytest.raises(FileNotFoundError) as ei:
        resolve_weights("ssdlite320_mobilenet_v3_large")
    msg = str(ei.value)
    assert "download.pytorch.org" in msg
    assert "fetch_weights.py" in msg


def test_resolve_weights_cached(tmp_path, monkeypatch):
    monkeypatch.setenv("DEMONET_WEIGHTS_DIR", str(tmp_path))
    from demonet_tpu.utils.pretrained import (
        cached_weights_path, resolve_weights)

    p = cached_weights_path("mobilenet_v2")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb") as f:
        f.write(b"x")
    assert resolve_weights("mobilenet_v2") == p
    # explicit path wins and must exist
    with pytest.raises(FileNotFoundError):
        resolve_weights("mobilenet_v2", path=str(tmp_path / "nope.pth"))


def test_unknown_model_has_no_url():
    from demonet_tpu.utils.pretrained import cached_weights_path

    with pytest.raises(ValueError):
        cached_weights_path("not_a_model")


@pytest.fixture(scope="module")
def synthesized_pth(tmp_path_factory):
    """A full-size reference-shaped .pth for the flagship model, 7 classes."""
    import jax
    import torch

    from demonet_tpu.models import get_model
    from demonet_tpu.utils.torch_weights import synthesize_torch_state_dict

    det = get_model("ssdlite320_mobilenet_v3_large", num_classes=7)
    variables = jax.device_get(det.init(jax.random.PRNGKey(3)))
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in synthesize_torch_state_dict(
              "ssdlite320_mobilenet_v3_large", variables).items()}
    path = tmp_path_factory.mktemp("weights") / "ssdlite320_synth.pth"
    torch.save(sd, str(path))
    return str(path), variables


def test_apply_pretrained_replaces_params(synthesized_pth):
    import jax
    import optax
    from flax.traverse_util import flatten_dict

    from demonet_tpu.engine import create_train_state
    from demonet_tpu.models import get_model
    from demonet_tpu.utils.pretrained import apply_pretrained

    path, want = synthesized_pth
    det = get_model("ssdlite320_mobilenet_v3_large", num_classes=7)
    state = create_train_state(det, jax.random.PRNGKey(0), optax.sgd(0.1))
    state = apply_pretrained(state, "ssdlite320_mobilenet_v3_large", path=path)
    got = flatten_dict(jax.device_get(state.params))
    ref = flatten_dict(want["params"])
    assert set(got) == set(ref)
    for k in list(ref)[:5] + list(ref)[-5:]:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]),
                                      err_msg=str(k))


def test_train_cli_test_only_with_torch_weights(synthesized_pth, tmp_path,
                                                capsys):
    from demonet_tpu import train as train_cli

    path, _ = synthesized_pth
    args = train_cli.get_args_parser().parse_args([
        "--dataset", "synthetic", "--synthetic-size", "8",
        "--model", "ssdlite320_mobilenet_v3_large", "--num-classes", "7",
        "--batch-size", "8", "--test-only", "--torch-weights", path,
        "--output-dir", str(tmp_path),
    ])
    train_cli.main(args)
    out = capsys.readouterr().out
    assert "loaded pretrained weights" in out
    assert "Average Precision" in out
