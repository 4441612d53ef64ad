"""Fused inverted-residual kernel vs the unfused flax module (eval mode):
numerics must match to BN-folding tolerance. Interpret mode here;
tools/check_fused_tpu.py re-checks compiled on hardware."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from demonet_tpu.models.layers import InvertedResidualV3
from demonet_tpu.ops.fused_block import fold_conv_bn, fused_inverted_residual


def _run_block(in_ch, exp_ch, out_ch, stride, use_hs, h=16, w=16, b=2,
               seed=0):
    blk = InvertedResidualV3(in_ch, exp_ch, out_ch, 3, stride,
                             use_se=False, use_hs=use_hs)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, in_ch)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(seed), x)
    # randomize BN stats so folding is non-trivial
    import flax

    stats = flax.core.unfreeze(variables["batch_stats"])
    params = flax.core.unfreeze(variables["params"])

    def jitter(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                jitter(v)
            else:
                tree[k] = jnp.asarray(
                    v + rng.normal(size=np.shape(v)).astype(np.float32) * 0.3)
    jitter(stats)
    jitter(params)
    variables = {"params": params, "batch_stats": stats}

    want = blk.apply(variables, x, train=False)

    p, s = variables["params"], variables["batch_stats"]
    expand = (fold_conv_bn(p["expand_conv"], s["expand_conv"])
              if exp_ch != in_ch else None)
    dw = fold_conv_bn(p["depthwise"], s["depthwise"])
    pj = fold_conv_bn(p["project"], s["project"])
    got = fused_inverted_residual(
        x, expand, dw, pj, stride=stride,
        act="hswish" if use_hs else "relu", row_tile=8, interpret=True)
    return np.asarray(want), np.asarray(got)


@pytest.mark.parametrize("in_ch,exp_ch,out_ch,stride,hs", [
    (16, 16, 16, 1, False),    # block 0: no expand, residual
    (16, 64, 24, 2, False),    # block 1: expand, stride 2
    (24, 72, 24, 1, False),    # block 2: residual with expand
    (24, 72, 40, 1, True),     # hswish act
])
def test_fused_matches_module(in_ch, exp_ch, out_ch, stride, hs):
    want, got = _run_block(in_ch, exp_ch, out_ch, stride, hs)
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_row_tile_edge_cases():
    # h not divisible by the requested tile; odd-ish tile fallback
    want, got = _run_block(16, 64, 24, 2, False, h=12, w=8)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    want, got = _run_block(16, 16, 16, 1, False, h=10, w=8)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
