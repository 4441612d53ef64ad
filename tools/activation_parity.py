#!/usr/bin/env python
"""Layer-by-layer activation dump for pretrained-weight parity debugging.

The moment a published .pth is obtainable (tools/fetch_weights.py on a
connected host), verifying the torch->flax conversion is mechanical:

  1. Here:   python tools/activation_parity.py --model ssdlite320_mobilenet_v3_large \
                 --torch-weights ~/.cache/demonet_tpu/weights/ssdlite320_...pth \
                 --dump flax_acts.npz
  2. Anywhere with torchvision: run the reference model on THE SAME input
     (a deterministic ramp, see `parity_input`) with forward hooks dumping
     each module output, then compare the printed (shape, mean, std, sum)
     rows and npz tensors module by module. The first row that diverges
     names the first mis-mapped layer.

Covers the reference's manual parity procedure around its pretrained
loads (ssd_mobilenetv3.py:221-226, hubconf.py:33 "AP50 68.39").
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parity_input(size, batch: int = 1) -> np.ndarray:
    """A deterministic, framework-agnostic input: RGB ramps in [0,1].
    Reproducible in torch as the same meshgrid expression."""
    h, w = size
    yy, xx = np.meshgrid(np.linspace(0.0, 1.0, h, dtype=np.float32),
                         np.linspace(0.0, 1.0, w, dtype=np.float32),
                         indexing="ij")
    img = np.stack([xx, yy, 0.5 * (xx + yy)], axis=-1)
    return np.broadcast_to(img, (batch, h, w, 3)).copy()


def _stats(name: str, arr: np.ndarray) -> str:
    a = np.asarray(arr, np.float64)
    digest = hashlib.sha1(
        np.round(a, 4).astype(np.float32).tobytes()).hexdigest()[:12]
    return (f"{name:70s} {str(list(arr.shape)):>22s} "
            f"mean={a.mean():+.6e} std={a.std():.6e} sum={a.sum():+.6e} "
            f"sha1={digest}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="ssdlite320_mobilenet_v3_large")
    p.add_argument("--torch-weights", default="",
                   help=".pth to convert and load (else: seeded random init)")
    p.add_argument("--pretrained", action="store_true",
                   help="resolve the published checkpoint from the cache")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--dump", default="", help="write all activations to .npz")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args()

    if args.cpu:
        import jax

        # jax_platforms is the authoritative override: with only
        # jax_platform_name, backends() still INITIALIZES the TPU plugin
        # client (frozen env JAX_PLATFORMS) — contending for the
        # single-client device even though compute runs on CPU.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_platform_name", "cpu")
    import jax

    from demonet_tpu.models import get_model

    detector = get_model(args.model)
    variables = detector.init(jax.random.PRNGKey(args.seed))
    if args.pretrained or args.torch_weights:
        from demonet_tpu.utils.pretrained import load_pretrained_variables

        variables = load_pretrained_variables(
            args.model, path=args.torch_weights or None)

    x = parity_input(detector.config.size)
    # capture_intermediates records every submodule's output under its
    # flax path — the layer-by-layer trace.
    out, state = detector.model.apply(
        dict(variables), x, train=False, capture_intermediates=True,
        mutable=["intermediates"])

    rows = {}
    from flax.traverse_util import flatten_dict

    flat = flatten_dict(state["intermediates"])
    for path, value in sorted(flat.items(), key=lambda kv: "/".join(kv[0])):
        name = "/".join(p for p in path if p != "__call__")
        vals = value if isinstance(value, tuple) else (value,)
        for i, v in enumerate(vals):
            leaves = jax.tree_util.tree_leaves(v)
            for j, leaf in enumerate(leaves):
                suffix = (f".{i}" if len(vals) > 1 else "") + (
                    f"[{j}]" if len(leaves) > 1 else "")
                rows[name + suffix] = np.asarray(leaf)
    for k in ("cls_logits", "bbox_regression"):
        rows[f"output/{k}"] = np.asarray(out[k])

    print(f"# model={args.model} input=ramp{detector.config.size} "
          f"weights={'torch:' + args.torch_weights if args.torch_weights else ('pretrained' if args.pretrained else f'init(seed={args.seed})')}")
    for name, arr in rows.items():
        print(_stats(name, arr))

    if args.dump:
        np.savez_compressed(args.dump, **rows)
        print(f"# wrote {len(rows)} tensors to {args.dump}")


if __name__ == "__main__":
    main()
