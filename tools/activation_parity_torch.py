#!/usr/bin/env python
"""Torch-side companion to tools/activation_parity.py.

Run this on any machine WITH torch+torchvision to dump the reference
model's per-module activations for the SAME deterministic ramp input; diff
the printed rows (or npz files) against the flax side to localize the
first mis-mapped layer of a checkpoint conversion.

    # flax side (this repo):
    python tools/activation_parity.py --model ssdlite320_mobilenet_v3_large \
        --torch-weights ssdlite320_....pth --dump flax_acts.npz
    # torch side (connected machine):
    python tools/activation_parity_torch.py \
        --weights ssdlite320_....pth --dump torch_acts.npz

Outputs are NCHW on the torch side; compare per-tensor stats (mean/std/sum
are layout-invariant) or transpose before diffing arrays. Module names
differ between frameworks — match by execution order and shape.

(This script needs torchvision and so cannot run on the offline TPU host;
it is exercised there only up to the import guard.)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.activation_parity import _stats, parity_input  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--weights", required=True, help=".pth checkpoint")
    p.add_argument("--size", default=320, type=int)
    p.add_argument("--dump", default="", help="write activations to .npz")
    args = p.parse_args()

    try:
        import torch
        import torchvision
    except ImportError as e:
        raise SystemExit(
            f"torch+torchvision required ({e}); run on a connected machine")

    model = torchvision.models.detection.ssdlite320_mobilenet_v3_large(
        weights=None)
    sd = torch.load(args.weights, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    model.load_state_dict(sd)
    model.eval()

    rows = {}
    order = [0]

    def hook(name):
        def fn(module, inputs, output):
            outs = output if isinstance(output, (list, tuple)) else [output]
            for j, o in enumerate(outs):
                if hasattr(o, "detach"):
                    key = f"{order[0]:04d}:{name}" + (
                        f"[{j}]" if len(outs) > 1 else "")
                    rows[key] = o.detach().numpy()
                    order[0] += 1
        return fn

    for name, module in model.named_modules():
        if len(list(module.children())) == 0:  # leaves only
            module.register_forward_hook(hook(name))

    # identical deterministic input as the flax side (NHWC ramp -> NCHW)
    x = parity_input((args.size, args.size))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
    with torch.no_grad():
        # bypass the torchvision transform: feed the tensor list API with
        # the already-sized image (the flax side also skips resizing)
        model([xt[0]])

    print(f"# torch reference, input=ramp{args.size}, "
          f"weights={args.weights}")
    for name, arr in rows.items():
        print(_stats(name, arr))
    if args.dump:
        np.savez_compressed(args.dump, **rows)
        print(f"# wrote {len(rows)} tensors to {args.dump}")


if __name__ == "__main__":
    main()
