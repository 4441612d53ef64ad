"""Export CLI (reference export/onnx_export.py:7-55 redone for StableHLO,
plus the Caffe converter CLI, reference export/convert.py:22-43).

    python -m demonet_tpu.export.cli --model ssdlite320_mobilenet_v3_large \
        --batch-size 1 --output model.stablehlo.bin --mlir model.mlir \
        --checkpoint ckpts/checkpoint_25

    python -m demonet_tpu.export.cli --model pelee304 --format caffe \
        --output deploy   # writes deploy.prototxt + deploy.caffemodel

Emits the serialized jax.export artifact (.bin, reload with load_exported)
and optionally readable StableHLO MLIR (.mlir) for the C++ PJRT runner;
--format caffe emits prototxt + caffemodel via export/caffe.py.
"""

from __future__ import annotations

import argparse


def get_args_parser(add_help: bool = True) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="demonet_tpu export",
                                add_help=add_help)
    p.add_argument("--model", default="ssdlite320_mobilenet_v3_large")
    p.add_argument("--num-classes", default=91, type=int)
    p.add_argument("--batch-size", default=1, type=int)
    p.add_argument("--checkpoint", default="", help="orbax checkpoint dir")
    p.add_argument("--torch-weights", default="",
                   help=".pth file converted via utils.torch_weights")
    p.add_argument("--npz-weights", default="",
                   help="flat .npz variables (the committed bench-asset "
                        "format: keys 'params/...', 'batch_stats/...'; "
                        "see tools/export_bench_weights.py)")
    p.add_argument("--format", default="stablehlo",
                   choices=["stablehlo", "caffe"],
                   help="caffe = prototxt+caffemodel (reference convert.py)")
    p.add_argument("--generic", action="store_true",
                   help="with --format caffe: convert by tracing the jaxpr "
                        "(export/tracing.py) instead of the hand-built "
                        "family graph — works for any conv model built "
                        "from supported primitives")
    p.add_argument("--verify", action="store_true",
                   help="with --format caffe --generic: execute the emitted "
                        "IR (export/caffe_eval.py) on a random input and "
                        "assert numeric parity with the flax forward before "
                        "writing artifacts (CPU numpy; slow at full size)")
    p.add_argument("--output", default="model.stablehlo.bin")
    p.add_argument("--mlir", default="", help="also dump StableHLO text here")
    p.add_argument("--platforms", default="tpu",
                   help="comma-separated lowering platforms (tpu, cpu)")
    p.add_argument("--postprocess", default="reference",
                   choices=["reference", "fused"],
                   help="'fused' bakes the trained-model fast postprocess "
                        "(~2x serving on sparse scores, exact fallback) "
                        "into the artifact")
    p.add_argument("--raw-outputs", action="store_true",
                   help="export backbone+heads only (no decode/NMS)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute in the exported program")
    return p


def main(args) -> None:
    import jax

    from demonet_tpu.export.stablehlo import (
        export_detector, save_exported, save_stablehlo_text)
    from demonet_tpu.models import get_model

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    detector = get_model(args.model, num_classes=args.num_classes,
                         dtype=dtype)
    if hasattr(detector, "config"):
        variables = detector.init(jax.random.PRNGKey(0))
    else:  # classifier module (e.g. mobilenet_v2 for --format caffe)
        variables = detector.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 224, 224, 3), dtype))

    if args.torch_weights:
        from demonet_tpu.utils.torch_weights import (
            convert_state_dict, load_torch_checkpoint)

        sd = load_torch_checkpoint(args.torch_weights)
        variables = convert_state_dict(args.model, sd)
        print(f"loaded torch weights from {args.torch_weights}")
    elif args.checkpoint:
        from demonet_tpu.utils.checkpoints import load_variables

        variables = load_variables(args.checkpoint)
        print(f"loaded checkpoint {args.checkpoint}")
    elif args.npz_weights:
        from demonet_tpu.utils.checkpoints import load_npz_variables

        variables = load_npz_variables(args.npz_weights)
        print(f"loaded npz weights from {args.npz_weights}")

    if args.format == "caffe":
        prefix = args.output
        for suffix in (".stablehlo.bin", ".bin"):
            if prefix.endswith(suffix):
                prefix = prefix[: -len(suffix)]
        variables = jax.device_get(variables)
        if args.generic:
            from demonet_tpu.export.tracing import trace_to_caffe

            if hasattr(detector, "config"):
                h, w = detector.config.size

                def raw(x):
                    out = detector.model.apply(variables, x, train=False)
                    return out["cls_logits"], out["bbox_regression"]
            else:
                h, w = 224, 224
                raw = lambda x: detector.apply(variables, x, train=False)
            net = trace_to_caffe(
                raw, jnp.zeros((1, h, w, 3), jnp.float32), name=args.model)
            if args.verify:
                import numpy as np

                from demonet_tpu.export.caffe_eval import run_caffenet

                x = (np.random.default_rng(0)
                     .random((1, h, w, 3), np.float32) * 2.0 - 0.5)
                want = raw(jnp.asarray(x))
                want = want if isinstance(want, tuple) else (want,)
                blobs = run_caffenet(net, {"data": np.transpose(x, (0, 3, 1, 2))})
                for top, ref in zip(net.output_tops, want):
                    np.testing.assert_allclose(
                        blobs[top], np.asarray(ref), rtol=5e-3, atol=1e-4)
                print("generic conversion verified numerically vs flax "
                      f"forward ({len(net.output_tops)} outputs)")
            with open(f"{prefix}.prototxt", "w") as f:
                f.write(net.to_prototxt())
            with open(f"{prefix}.caffemodel", "wb") as f:
                f.write(net.to_caffemodel())
        else:
            from demonet_tpu.export.caffe import export_caffe

            export_caffe(args.model, variables, f"{prefix}.prototxt",
                         f"{prefix}.caffemodel",
                         num_classes=args.num_classes)
        print(f"wrote {prefix}.prototxt + {prefix}.caffemodel")
        return

    platforms = tuple(args.platforms.split(","))
    exported = export_detector(
        detector, variables, batch_size=args.batch_size,
        with_postprocess=not args.raw_outputs, platforms=platforms,
        postprocess_impl=args.postprocess)
    save_exported(exported, args.output)
    print(f"wrote {args.output}")
    if args.mlir:
        save_stablehlo_text(exported, args.mlir)
        print(f"wrote {args.mlir}")
        from demonet_tpu.export.stablehlo import save_compile_options

        save_compile_options(args.mlir + ".compile_opts.pb")
        print(f"wrote {args.mlir}.compile_opts.pb")


if __name__ == "__main__":
    main(get_args_parser().parse_args())
