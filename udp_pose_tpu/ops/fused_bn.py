"""Hand-scheduled train-mode BatchNorm(+ReLU) VJP (round-4 bwd attack).

The round-3 train-step study (DESIGN.md) pinned BN batch-stat math at
12% of the HRNet-w32 step and the hi-res backward as memory-bound.
XLA differentiates flax's BatchNorm mechanically; this module provides
the same math with a hand-written canonical VJP so the backward is
exactly two passes over the activation:

  pass 1: sum(dy_relu), sum(dy_relu * xhat)   (per-channel reductions)
  pass 2: dx = rstd*scale * (dy_relu - sum_dy/N - xhat*sum_dy_xhat/N)

and the ReLU mask is RECOMPUTED from the saved (x, mean, rstd) instead
of saving y or a mask tensor — trading a flop-cheap recompute for one
less hi-res tensor in the residual set (the HBM traffic the study
blamed).  Numerics match flax.nn.BatchNorm(+relu) to float tolerance
(tests/test_fused_bn.py pins fwd, dx, dscale, dbias, running stats).

Measured on v5e (tools/profile_train.py v_fused_bn): see the DESIGN.md
round-4 entry — kept as an A/B path either way.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _stats(x32):
    """Per-channel mean/var over (B, H, W) in fp32 (biased var, like BN)."""
    mean = jnp.mean(x32, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean)
    return mean, var


def _bn_fwd(x, scale, bias, eps, relu):
    x32 = x.astype(jnp.float32)
    mean, var = _stats(x32)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mean) * rstd
    y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype), (x, mean, rstd)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_relu_train(x, scale, bias, eps, relu):
    """Train-mode BN (batch statistics) + optional fused ReLU, with the
    canonical two-pass backward.  x: (B, H, W, C); scale/bias: (C,)."""
    return _bn_fwd(x, scale, bias, eps, relu)[0]


def _bn_vjp_fwd(x, scale, bias, eps, relu):
    y, res = _bn_fwd(x, scale, bias, eps, relu)
    return y, (res, scale, bias)


def _bn_vjp_bwd(eps, relu, carry, dy):
    (x, mean, rstd), scale, bias = carry
    x32 = x.astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)
    s32 = scale.astype(jnp.float32)
    xhat = (x32 - mean) * rstd
    if relu:
        # recompute the mask from the saved residuals (no y/mask tensor)
        dy32 = jnp.where(xhat * s32 + bias.astype(jnp.float32) > 0.0,
                         dy32, 0.0)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    sum_dy = jnp.sum(dy32, axis=(0, 1, 2))
    sum_dy_xhat = jnp.sum(dy32 * xhat, axis=(0, 1, 2))
    dx = (rstd * s32) * (dy32 - sum_dy / n - xhat * (sum_dy_xhat / n))
    return (dx.astype(x.dtype), sum_dy_xhat.astype(scale.dtype),
            sum_dy.astype(bias.dtype))


bn_relu_train.defvjp(_bn_vjp_fwd, _bn_vjp_bwd)


class FusedBatchNorm(nn.Module):
    """Drop-in for ``nn.BatchNorm`` (same variable names/collections)
    with the hand-written train-mode VJP above; optional fused ReLU.

    Eval mode (``use_running_average=True``) is the plain affine
    normalization — no custom VJP needed there."""
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    relu: bool = False

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            x32 = x.astype(jnp.float32)
            rstd = jax.lax.rsqrt(ra_var.value + self.epsilon)
            y = (x32 - ra_mean.value) * rstd * scale + bias
            if self.relu:
                y = jnp.maximum(y, 0.0)
            return y.astype(self.dtype)

        y = bn_relu_train(x, scale, bias, self.epsilon, self.relu)
        # running-stat update: same reduction subgraph as inside the
        # custom_vjp forward — XLA CSEs it, so this costs nothing extra
        if not self.is_initializing():
            mean, var = _stats(
                jax.lax.stop_gradient(x).astype(jnp.float32))
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y.astype(self.dtype)
