"""Reference evaluator for the CaffeNet IR — runs an exported graph in
numpy/jax (NCHW) so exports can be verified *numerically* against the flax
model, not just structurally decoded.

The reference had no equivalent (its converter tests stop at prototxt
emission, export/model_converter.py); real Caffe is not installable here,
so this implements the subset of Caffe layer semantics the exporter emits:
Convolution (group/dilation), BatchNorm(use_global_stats)+Scale, ReLU,
Power, Pooling (MAX/AVE, ceil/floor round modes, global), InnerProduct,
Eltwise (SUM/PROD), two-bottom Scale, Concat, Softmax, Flatten, Permute,
Reshape, Normalize (SSD fork).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from demonet_tpu.export.caffe import CaffeNet, Layer


def _conv(x: np.ndarray, w: np.ndarray, b, stride: int, pad: int,
          group: int, dilation: int) -> np.ndarray:
    import jax
    import jax.lax as lax
    import jax.numpy as jnp

    with jax.default_device(jax.devices("cpu")[0]):
        out = lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w),
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            rhs_dilation=(dilation, dilation),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=group)
        out = np.asarray(out)
    if b is not None:
        out = out + np.asarray(b).reshape(1, -1, 1, 1)
    return out


def _pool(x: np.ndarray, layer: Layer) -> np.ndarray:
    p = layer.params
    if p.get("global_pooling"):
        if p.get("pool", 0) == 0:
            return x.max(axis=(2, 3), keepdims=True)
        return x.mean(axis=(2, 3), keepdims=True)
    k, s = p["kernel_size"], p.get("stride", 1)
    pad = p.get("pad", 0)
    ceil = p.get("round_mode", 0) == 0
    n, c, h, w = x.shape
    # Caffe output-size formula (vision_layers: ceil by default)
    def osize(dim):
        num = dim + 2 * pad - k
        o = int(np.ceil(num / s)) + 1 if ceil else int(np.floor(num / s)) + 1
        if pad > 0 and (o - 1) * s >= dim + pad:
            o -= 1  # clip windows that start in padding (caffe pooling_layer)
        return o
    oh, ow = osize(h), osize(w)
    is_max = p.get("pool", 0) == 0
    fill = -np.inf if is_max else 0.0
    out = np.full((n, c, oh, ow), fill, x.dtype)
    counts = np.zeros((oh, ow), np.int64)
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)),
                constant_values=fill if is_max else 0.0)
    for i in range(oh):
        for j in range(ow):
            hs, ws = i * s, j * s
            he = min(hs + k, h + 2 * pad)
            we = min(ws + k, w + 2 * pad)
            win = xp[:, :, hs:he, ws:we]
            if is_max:
                out[:, :, i, j] = win.max(axis=(2, 3))
            else:
                out[:, :, i, j] = win.sum(axis=(2, 3))
                # caffe AVE pool_size: window clipped to the PADDED bounds
                # (zeros in padding count; area beyond it doesn't) —
                # pooling_layer.cpp
                counts[i, j] = (he - hs) * (we - ws)
    if not is_max:
        out = out / np.maximum(counts, 1)
    return out


def run_caffenet(net: CaffeNet, inputs: Dict[str, np.ndarray],
                 stop_at: str = "") -> Dict[str, np.ndarray]:
    """Execute the IR; returns every blob by top name (NCHW activations)."""
    blobs: Dict[str, np.ndarray] = dict(inputs)
    for layer in net.layers:
        t = layer.type
        tops = layer.tops
        if t == "Input":
            if tops[0] not in blobs:
                raise KeyError(f"missing input blob {tops[0]!r}")
        elif t == "Convolution":
            p = layer.params
            w = np.asarray(layer.blobs[0])
            b = layer.blobs[1] if p.get("bias_term") else None
            blobs[tops[0]] = _conv(
                blobs[layer.bottoms[0]], w, b, p.get("stride", 1),
                p.get("pad", 0), p.get("group", 1), p.get("dilation", 1))
        elif t == "BatchNorm":
            mean, var, factor = (np.asarray(v) for v in layer.blobs)
            scale = 1.0 / factor[0] if factor[0] != 0 else 0.0
            x = blobs[layer.bottoms[0]]
            m = (mean * scale).reshape(1, -1, 1, 1)
            v = (var * scale).reshape(1, -1, 1, 1)
            eps = layer.params.get("eps", 1e-5)
            blobs[tops[0]] = (x - m) / np.sqrt(v + eps)
        elif t == "Scale":
            x = blobs[layer.bottoms[0]]
            if len(layer.bottoms) == 2:  # two-bottom (SENet) form
                s = blobs[layer.bottoms[1]]
                axis = layer.params.get("axis", 1)
                shape = list(s.shape) + [1] * (x.ndim - axis - s.ndim)
                blobs[tops[0]] = x * s.reshape(shape)
            else:
                s = np.asarray(layer.blobs[0]).reshape(
                    (1, -1) + (1,) * (x.ndim - 2))
                out = x * s
                if layer.params.get("bias_term") and len(layer.blobs) > 1:
                    out = out + np.asarray(layer.blobs[1]).reshape(s.shape)
                blobs[tops[0]] = out
        elif t == "ReLU":
            blobs[tops[0]] = np.maximum(blobs[layer.bottoms[0]], 0.0)
        elif t == "ReLU6":
            blobs[tops[0]] = np.minimum(
                np.maximum(blobs[layer.bottoms[0]], 0.0), 6.0)
        elif t == "Power":
            p = layer.params
            x = blobs[layer.bottoms[0]]
            y = p.get("shift", 0.0) + p.get("scale", 1.0) * x
            power = p.get("power", 1.0)
            blobs[tops[0]] = y if power == 1.0 else np.power(y, power)
        elif t == "Pooling":
            blobs[tops[0]] = _pool(blobs[layer.bottoms[0]], layer)
        elif t == "InnerProduct":
            x = blobs[layer.bottoms[0]]
            w = np.asarray(layer.blobs[0])  # (O, I)
            x2 = x.reshape(x.shape[0], -1)
            out = x2 @ w.T
            if layer.params.get("bias_term") and len(layer.blobs) > 1:
                out = out + np.asarray(layer.blobs[1])
            blobs[tops[0]] = out
        elif t == "Eltwise":
            a, b = (blobs[x] for x in layer.bottoms[:2])
            op = layer.params.get("operation", 1)
            blobs[tops[0]] = a + b if op == 1 else a * b
        elif t == "Concat":
            axis = layer.params.get("axis", 1)
            blobs[tops[0]] = np.concatenate(
                [blobs[x] for x in layer.bottoms], axis=axis)
        elif t == "Softmax":
            x = blobs[layer.bottoms[0]]
            axis = layer.params.get("axis", 1)
            e = np.exp(x - x.max(axis=axis, keepdims=True))
            blobs[tops[0]] = e / e.sum(axis=axis, keepdims=True)
        elif t == "Flatten":
            x = blobs[layer.bottoms[0]]
            axis = layer.params.get("axis", 1)
            blobs[tops[0]] = x.reshape(x.shape[:axis] + (-1,))
        elif t == "Permute":
            blobs[tops[0]] = np.transpose(
                blobs[layer.bottoms[0]], layer.params["order"])
        elif t == "Reshape":
            x = blobs[layer.bottoms[0]]
            shape = [x.shape[i] if d == 0 else d
                     for i, d in enumerate(layer.params["shape"])]
            blobs[tops[0]] = x.reshape(shape)
        elif t == "Normalize":
            x = blobs[layer.bottoms[0]]
            s = np.asarray(layer.blobs[0]).reshape(1, -1, 1, 1)
            norm = np.sqrt((x * x).sum(axis=1, keepdims=True)) + 1e-10
            blobs[tops[0]] = x / norm * s
        else:
            raise NotImplementedError(f"layer type {t}")
        if stop_at and stop_at in tops:
            break
    return blobs
