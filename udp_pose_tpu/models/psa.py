"""Polarized Self-Attention (NHWC rewrite of deep_hrnet/lib/models/PSA.py).

``PSA_s`` (sequential, :146-269) is the variant inserted into BasicBlocks by
pose_hrnet_psa / pose_resnet_psa; ``PSA_p`` (parallel, :29-144) is kept for
completeness.  Both are 1×1-conv + softmax-pool gates — pure matmuls, so
they map straight onto the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class PSA_s(nn.Module):
    """Sequential polarized self-attention: channel gate then spatial gate."""
    planes: int
    ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inter = self.planes // 2
        B, H, W, C = x.shape

        # --- channel branch ("spatial_pool", PSA.py:191-219) -------------
        v = nn.Conv(inter, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_v_right")(x)                    # B,H,W,inter
        q = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_q_right")(x)                    # B,H,W,1
        attn = nn.softmax(q.reshape(B, H * W, 1), axis=1)
        ctx = jnp.einsum("bpc,bpo->bc", v.reshape(B, H * W, inter), attn,
                         preferred_element_type=jnp.float32)   # B,inter
        ctx = ctx[:, None, None, :].astype(self.dtype)         # B,1,1,inter
        ctx = nn.Conv(inter // self.ratio, (1, 1), dtype=self.dtype,
                      name="conv_up_fc1")(ctx)
        ctx = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                           name="conv_up_ln")(ctx)  # torch LN eps (PSA.py:164)
        ctx = nn.relu(ctx)
        ctx = nn.Conv(self.planes, (1, 1), dtype=self.dtype,
                      name="conv_up_fc2")(ctx)
        x = x * nn.sigmoid(ctx)

        # --- spatial branch ("channel_pool", PSA.py:221-251) -------------
        g = nn.Conv(inter, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_q_left")(x)
        avg = jnp.mean(g, axis=(1, 2))                         # B,inter
        theta = nn.Conv(inter, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_v_left")(x)
        theta = nn.softmax(theta.reshape(B, H * W, inter), axis=2)
        sp = jnp.einsum("bc,bpc->bp", avg, theta,
                        preferred_element_type=jnp.float32)    # B,H*W
        sp = sp.reshape(B, H, W, 1).astype(self.dtype)
        return x * nn.sigmoid(sp)


class PSA_p(nn.Module):
    """Parallel polarized self-attention: channel + spatial gates summed."""
    planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inter = self.planes // 2
        B, H, W, C = x.shape

        v = nn.Conv(inter, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_v_right")(x)
        q = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_q_right")(x)
        attn = nn.softmax(q.reshape(B, H * W, 1), axis=1)
        ctx = jnp.einsum("bpc,bpo->bc", v.reshape(B, H * W, inter), attn,
                         preferred_element_type=jnp.float32)
        ctx = ctx[:, None, None, :].astype(self.dtype)
        ctx = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv_up")(ctx)
        ch_out = x * nn.sigmoid(ctx)

        g = nn.Conv(inter, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_q_left")(x)
        avg = jnp.mean(g, axis=(1, 2))
        theta = nn.Conv(inter, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv_v_left")(x)
        theta = nn.softmax(theta.reshape(B, H * W, inter), axis=2)
        sp = jnp.einsum("bc,bpc->bp", avg, theta,
                        preferred_element_type=jnp.float32)
        sp = sp.reshape(B, H, W, 1).astype(self.dtype)
        sp_out = x * nn.sigmoid(sp)
        return ch_out + sp_out
