"""Export CLI main() end-to-end: writes a loadable artifact + MLIR text."""

import os


def test_export_cli_main(tmp_path, monkeypatch):
    from demonet_tpu.export.cli import get_args_parser, main
    from demonet_tpu.export.stablehlo import load_exported

    out = str(tmp_path / "m.bin")
    mlir = str(tmp_path / "m.mlir")
    # tiny model via registry override: monkeypatch get_model to shrink size
    import demonet_tpu.models as models

    orig = models.get_model

    def small_get_model(name, **kw):
        kw.setdefault("size", (64, 64))
        return orig(name, **kw)

    monkeypatch.setattr("demonet_tpu.models.get_model", small_get_model)
    args = get_args_parser().parse_args([
        "--model", "ssdlite320_mobilenet_v3_large", "--num-classes", "5",
        "--output", out, "--mlir", mlir, "--platforms", "cpu"])
    main(args)
    assert os.path.getsize(out) > 1000
    assert "stablehlo" in open(mlir).read()[:200000]
    restored = load_exported(out)
    import jax.numpy as jnp

    dets = restored.call(jnp.zeros((1, 64, 64, 3)))
    assert dets["boxes"].shape[0] == 1
