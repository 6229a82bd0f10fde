"""RSN decode: blur + double-argmax quarter-shift, batched.

Parity: RSN/exps/RSN18.coco/test.py:25-71 ``get_results`` — 10-px zero
border, k×k Gaussian blur, argmax, then for each configured shift find the
next-highest peak (destructively zeroing found peaks) and move a fixed
fraction toward it; scores come from the unblurred map at the rounded
location (``map/255 + 0.5``); grid mapping ``×4 + 2``; classic (biased)
crop→source transform.  The PRM variant uses shifts (0.25, 0.125) with the
same loop (its test.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .blur import gaussian_blur

BORDER = 10


def _argmax2d(maps):
    """(..., H, W) → y, x int32 of the (first) max."""
    H, W = maps.shape[-2], maps.shape[-1]
    flat = maps.reshape(*maps.shape[:-2], H * W)
    idx = jnp.argmax(flat, axis=-1)
    return (idx // W).astype(jnp.int32), (idx % W).astype(jnp.int32)


def _zero_at(maps, y, x):
    H, W = maps.shape[-2], maps.shape[-1]
    flat = maps.reshape(*maps.shape[:-2], H * W)
    lin = y * W + x
    flat = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, flat.shape, flat.ndim - 1)
        == lin[..., None], 0.0, flat)
    return flat.reshape(maps.shape)


@partial(jax.jit, static_argnames=("kernel", "shifts", "input_size_hw"))
def rsn_decode(outputs, centers, scales, kernel=11, shifts=(0.25,),
               input_size_hw=(256, 192)):
    """outputs (B, J, H, W) raw 255-scale heatmaps → (preds (B, J, 2)
    source-space, maxvals (B, J, 1))."""
    B, J, H, W = outputs.shape
    score_map = outputs / 255.0 + 0.5

    padded = jnp.pad(outputs, ((0, 0), (0, 0), (BORDER, BORDER),
                               (BORDER, BORDER)))
    dr = gaussian_blur(padded, kernel)

    y0, x0 = _argmax2d(dr)
    dr = _zero_at(dr, y0, x0)
    x = (x0 - BORDER).astype(jnp.float32)
    y = (y0 - BORDER).astype(jnp.float32)
    for s in shifts:
        py, px = _argmax2d(dr)
        dr = _zero_at(dr, py, px)
        dx = (px - BORDER).astype(jnp.float32) - x
        dy = (py - BORDER).astype(jnp.float32) - y
        ln = jnp.sqrt(dx * dx + dy * dy)
        ok = ln > 1e-3
        x = x + jnp.where(ok, s * dx / jnp.maximum(ln, 1e-12), 0.0)
        y = y + jnp.where(ok, s * dy / jnp.maximum(ln, 1e-12), 0.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)

    # score at the rounded location of the unblurred map (test.py:61-62)
    xi = jnp.round(x + 1e-9).astype(jnp.int32)
    yi = jnp.round(y + 1e-9).astype(jnp.int32)
    flat = score_map.reshape(B, J, H * W)
    scores = jnp.take_along_axis(flat, (yi * W + xi)[..., None], axis=2)

    # grid mapping ×4+2 then classic crop→source transform (test.py:60-66)
    in_h, in_w = input_size_hw
    kx = x * 4.0 + 2.0
    ky = y * 4.0 + 2.0
    s200 = scales * 200.0
    px_src = kx / in_w * s200[:, None, 0] + centers[:, None, 0] \
        - s200[:, None, 0] * 0.5
    py_src = ky / in_h * s200[:, None, 1] + centers[:, None, 1] \
        - s200[:, None, 1] * 0.5
    preds = jnp.stack([px_src, py_src], axis=-1)
    return preds, scores
