"""FusedBatchNorm (hand-written train-mode VJP) vs flax nn.BatchNorm:
forward, all three gradients, and running-statistic updates must match
to float tolerance — the custom VJP is a schedule change, not a math
change (ops/fused_bn.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from udp_pose_tpu.ops.fused_bn import FusedBatchNorm, bn_relu_train


def _data(seed=0, shape=(4, 8, 6, 16)):
    g = np.random.default_rng(seed)
    x = g.normal(size=shape).astype(np.float32)
    scale = g.normal(size=shape[-1]).astype(np.float32) * 0.5 + 1.0
    bias = g.normal(size=shape[-1]).astype(np.float32) * 0.2
    dy = g.normal(size=shape).astype(np.float32)
    return x, scale, bias, dy


@pytest.mark.parametrize("relu", [False, True])
def test_bn_relu_train_matches_flax(relu):
    x, scale, bias, dy = _data()

    def ours(x, scale, bias):
        y = bn_relu_train(x, scale, bias, 1e-5, relu)
        return jnp.sum(y * dy)

    def ref(x, scale, bias):
        mod = nn.BatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5)
        variables = {"params": {"scale": scale, "bias": bias}}
        y, _ = mod.apply(variables, x, mutable=["batch_stats"])
        if relu:
            y = nn.relu(y)
        return jnp.sum(y * dy)

    y1, g1 = jax.value_and_grad(ours, argnums=(0, 1, 2))(x, scale, bias)
    y2, g2 = jax.value_and_grad(ref, argnums=(0, 1, 2))(x, scale, bias)
    np.testing.assert_allclose(y1, y2, rtol=1e-4)
    for a, b, name in zip(g1, g2, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4,
                                   err_msg=name)


@pytest.mark.parametrize("relu", [False, True])
def test_fused_module_matches_flax_module(relu):
    x, scale, bias, _ = _data(seed=3)
    fused = FusedBatchNorm(use_running_average=False, momentum=0.9,
                           epsilon=1e-5, relu=relu)
    flaxbn = nn.BatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5)

    vf = fused.init(jax.random.PRNGKey(0), x)
    vb = flaxbn.init(jax.random.PRNGKey(0), x)
    # identical parameter trees (drop-in contract)
    assert set(vf["params"]) == set(vb["params"])
    assert set(vf["batch_stats"]) == set(vb["batch_stats"])
    variables = {"params": {"scale": scale, "bias": bias},
                 "batch_stats": {"mean": np.zeros(16, np.float32),
                                 "var": np.ones(16, np.float32)}}

    y1, m1 = fused.apply(variables, x, mutable=["batch_stats"])
    y2, m2 = flaxbn.apply(variables, x, mutable=["batch_stats"])
    if relu:
        y2 = nn.relu(y2)
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m1["batch_stats"]["mean"],
                               m2["batch_stats"]["mean"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(m1["batch_stats"]["var"],
                               m2["batch_stats"]["var"],
                               rtol=1e-4, atol=1e-5)


def test_fused_module_eval_mode():
    x, scale, bias, _ = _data(seed=7)
    variables = {"params": {"scale": scale, "bias": bias},
                 "batch_stats": {"mean": np.full(16, 0.3, np.float32),
                                 "var": np.full(16, 2.0, np.float32)}}
    fused = FusedBatchNorm(use_running_average=True)
    flaxbn = nn.BatchNorm(use_running_average=True)
    np.testing.assert_allclose(fused.apply(variables, x),
                               flaxbn.apply(variables, x),
                               rtol=1e-5, atol=1e-5)


def test_bf16_path():
    """bf16 activations: stats/normalize in fp32 inside, output bf16 —
    same contract as flax BN with dtype=bfloat16."""
    x, scale, bias, dy = _data(seed=9)
    xb = x.astype(jnp.bfloat16)

    y = bn_relu_train(xb, scale, bias, 1e-5, True)
    assert y.dtype == jnp.bfloat16
    y32 = bn_relu_train(x, scale, bias, 1e-5, True)
    np.testing.assert_allclose(np.asarray(y, np.float32), y32,
                               rtol=0.05, atol=0.05)

    dx = jax.grad(lambda x: jnp.sum(
        bn_relu_train(x, scale, bias, 1e-5, True)
        .astype(jnp.float32) * dy))(xb)
    assert dx.dtype == jnp.bfloat16
