"""Test config: force CPU with 8 virtual devices BEFORE jax initializes.

This is the JAX-native "fake backend" the reference lacks (SURVEY.md §4):
multi-device sharding tests run on any host via
--xla_force_host_platform_device_count.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not enough when a TPU plugin's sitecustomize has
# already imported jax at interpreter start: the jax_platforms config is
# then frozen from the ORIGINAL environment (e.g. "tpu,cpu"), and
# jax_platform_name only changes the default, so backends() still
# INITIALIZES the TPU client — grabbing a single-client device and
# failing the whole session if another process holds it. Updating the
# jax_platforms config value is the authoritative override: backends()
# then registers cpu only.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

# Guard against regressions: cpu must be the ONLY initialized backend —
# if a TPU plugin client ever appears here, the suite is again holding
# the single-client device for its whole run.
from jax._src import xla_bridge as _xb  # noqa: E402

assert list(_xb.backends().keys()) == ["cpu"], list(_xb.backends())


# ---------------------------------------------------------------------------
# Test tiers (VERDICT r3 item 8). Default dev loop: `pytest -m "not slow"`
# (< 5 min on this 1-core host). CI and tools/check_all.py run everything.
# The slow set is maintained HERE (not as per-file decorators) so
# parametrized cases (e.g. the _pallas kernel variants) and whole modules
# are handled uniformly; timings from the round-4 full-suite duration
# report (anything over ~10 s clean / ~16 s under load).
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

_SLOW_NODE_PATTERNS = (
    # whole modules: multi-process bootstrap, executed-torch oracle
    # batteries, Caffe-export numeric verification, fused-postprocess
    # equality sweeps, multi-step scan programs, weight-converter
    # round-trips, epoch-level train loops
    "test_multiprocess.py::",
    "test_reference_oracle.py::",
    "test_reference_full_model.py::",
    "test_caffe_eval.py::",
    "test_caffe_export.py::",
    "test_postprocess_fused.py::",
    "test_multistep.py::",
    "test_torch_weights.py::",
    "test_train_loop.py::",
    # individual heavy tests in otherwise-fast modules
    "test_sharded_train_step",
    "test_train_loss_decreases",
    "test_packed_trunk_train_stats_and_grads_equivalence",
    "test_stem_s2d_model_equivalence_and_variable_tree",
    "test_stem_s2d_mnv2_equivalence",
    "test_train_cli_lane_pack_fused_wiring",
    "test_train_cli_npz_weights",
    "test_voc_pipeline_end_to_end",
    "test_export_fused_postprocess_roundtrip",
    "test_export_roundtrip_parity",
    "test_predict_cli_main",
    "test_ssdlite_forward_consistency",
    "test_ssdlite_loss_finite_and_train_mode",
    "test_ssdlite_predict_padded_detections",
    "test_pelee304_builds_and_runs",
    "test_peleenet_classifier",
    "test_legacy_v0_model_builds",
    "test_worker_pool_matches_serial",
    "test_loader_worker_pool_carries_keypoints",
    "test_loss_no_foreground_safe",
    "test_loss_is_differentiable",
    "test_multibox_loss_against_numpy",
    "_pallas",  # pallas-interpret kernel variants (xla twins stay fast)
)


def pytest_collection_modifyitems(config, items):
    slow = pytest.mark.slow
    for item in items:
        if any(p in item.nodeid for p in _SLOW_NODE_PATTERNS):
            item.add_marker(slow)
