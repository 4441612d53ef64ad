"""predict CLI main() end-to-end: image file in, visualization file out."""

import os

import numpy as np


def test_predict_cli_main(tmp_path, monkeypatch):
    from PIL import Image

    from demonet_tpu.predict import get_args_parser, main

    img_path = str(tmp_path / "in.jpg")
    Image.fromarray(
        (np.random.RandomState(0).rand(50, 70, 3) * 255).astype(np.uint8)
    ).save(img_path)

    import demonet_tpu.models as models

    orig = models.get_model

    def small_get_model(name, **kw):
        kw.setdefault("size", (64, 64))
        return orig(name, **kw)

    monkeypatch.setattr("demonet_tpu.models.get_model", small_get_model)

    out_dir = str(tmp_path / "vis")
    args = get_args_parser().parse_args([
        "--images", img_path, "--num-classes", "5",
        "--score-thresh", "0.0", "--output-dir", out_dir])
    main(args)
    out_path = os.path.join(out_dir, "in.jpg")
    assert os.path.exists(out_path)
    out = np.asarray(Image.open(out_path))
    assert out.shape == (50, 70, 3)  # visualization in the original frame

    # --postprocess fused routes through the trained-model fast path
    # (exactness-guarded, lax.cond fallback) and must produce output too
    fused_dir = str(tmp_path / "vis_fused")
    args = get_args_parser().parse_args([
        "--images", img_path, "--num-classes", "5",
        "--score-thresh", "0.0", "--output-dir", fused_dir,
        "--postprocess", "fused"])
    main(args)
    assert os.path.exists(os.path.join(fused_dir, "in.jpg"))
