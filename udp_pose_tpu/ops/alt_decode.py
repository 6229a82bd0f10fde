"""Alternative decoders (parity: tools/infer_utils/decode.py).

``simdr_decode`` — SimDR 1-D classification heads (:7-16): per-axis softmax
argmax halved (split_ratio 2) then the *biased* transform (÷ output_size,
no −1).  ``shift_decode`` — argmax with ±0.25 sign shift toward the higher
neighbour (:19-40), the classic SimpleBaseline quarter-offset.  Both
batched jnp; both return integer-cast source-space coords like the
reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _biased_transform(coords, center, scale, output_size_wh):
    """decode.py:56-62: unit = scale*200 over output_size (no −1)."""
    s200 = jnp.asarray(scale, jnp.float32) * 200.0
    sx = (s200[..., 0] / float(output_size_wh[0]))[..., None]
    sy = (s200[..., 1] / float(output_size_wh[1]))[..., None]
    x = coords[..., 0] * sx + (center[..., 0] - s200[..., 0] * 0.5)[..., None]
    y = coords[..., 1] * sy + (center[..., 1] - s200[..., 1] * 0.5)[..., None]
    return jnp.stack([x, y], axis=-1)


@partial(jax.jit, static_argnames=("image_size_wh",))
def simdr_decode(pred_x, pred_y, center, scale, image_size_wh=(192, 256)):
    """pred_x (B, J, W·k), pred_y (B, J, H·k) → int coords (B, J, 2)."""
    x = jnp.argmax(jax.nn.softmax(pred_x, axis=2), axis=2) / 2.0
    y = jnp.argmax(jax.nn.softmax(pred_y, axis=2), axis=2) / 2.0
    coords = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    return _biased_transform(coords, center, scale,
                             image_size_wh).astype(jnp.int32)


@jax.jit
def shift_decode(heatmaps, center, scale):
    """(B, J, H, W) heatmaps → int source coords with ±0.25 shift
    (decode.py:19-40); all-non-positive maps give −1 coords."""
    B, J, H, W = heatmaps.shape
    flat = heatmaps.reshape(B, J, H * W)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.max(flat, axis=2)
    px = (idx % W).astype(jnp.int32)
    py = (idx // W).astype(jnp.int32)
    coords = jnp.stack([px, py], -1).astype(jnp.float32)
    coords = jnp.where((maxvals > 0)[..., None], coords, -1.0)

    def at(dx, dy):
        xi = jnp.clip(px + dx, 0, W - 1)
        yi = jnp.clip(py + dy, 0, H - 1)
        return jnp.take_along_axis(flat, (yi * W + xi)[..., None],
                                   axis=2)[..., 0]

    diff_x = at(1, 0) - at(-1, 0)
    diff_y = at(0, 1) - at(0, -1)
    interior = ((px > 1) & (px < W - 1) & (py > 1) & (py < H - 1)
                & (maxvals > 0))
    shift = jnp.stack([jnp.sign(diff_x), jnp.sign(diff_y)], -1) * 0.25
    coords = coords + shift * interior[..., None]
    return _biased_transform(coords, center, scale, (W, H)).astype(jnp.int32)
