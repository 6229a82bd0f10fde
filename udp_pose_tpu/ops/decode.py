"""Heatmap → keypoint decoders, fully batched / jit-compiled.

TPU-native rewrite of the reference decode path
(deep_hrnet/lib/core/inference.py): argmax peaks (:30-58), DARK Taylor
refinement (:60-145), UDP offset decode inside ``get_final_preds``
(:149-186), and the UDP coordinate transform back to source space (:20-27).
The reference runs per-sample Python loops with cv2 on the host; here every
step is one closed-form array op, so the whole decode fuses into the jit
graph right after the model forward.

Canonical heatmap layout: ``(B, J, H, W)`` float32 (reference layout);
models produce NHWC and transpose at this boundary.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .blur import gaussian_blur

PIXEL_STD = 200.0


def get_max_preds(heatmaps):
    """Peak location + value per joint (reference inference.py:30-58).

    heatmaps: (B, J, H, W) → preds (B, J, 2) xy float32, maxvals (B, J, 1).
    Ties resolve to the first flattened index (numpy argmax parity).
    """
    B, J, H, W = heatmaps.shape
    flat = heatmaps.reshape(B, J, H * W)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.max(flat, axis=2, keepdims=True)
    x = (idx % W).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / W)
    preds = jnp.stack([x, y], axis=-1)
    mask = (maxvals > 0.0).astype(jnp.float32)
    return preds * mask, maxvals


def _gather_at(maps, xi, yi):
    """Gather maps[b, j, yi[b,j], xi[b,j]] → (B, J)."""
    B, J, H, W = maps.shape
    flat = maps.reshape(B, J, H * W)
    lin = yi * W + xi
    return jnp.take_along_axis(flat, lin[..., None], axis=2)[..., 0]


def dark_refine(coords, heatmaps):
    """DARK sub-pixel refinement (reference inference.py:60-145).

    Per map: 7×7 Gaussian blur, renormalise to the original peak value, clip
    to [0.001, 50], log, replicate-pad by 1, then one Newton step
    ``coords - H^{-1} d`` using finite differences at the integer peak.
    A singular Hessian contributes zero shift (reference LinAlgError path
    :129-132).  ``coords`` are the integer argmax locations (B, J, 2).
    """
    maxori = jnp.max(heatmaps, axis=(2, 3), keepdims=True)
    blurred = gaussian_blur(heatmaps, 7)
    bmax = jnp.max(blurred, axis=(2, 3), keepdims=True)
    bmin = jnp.min(blurred, axis=(2, 3), keepdims=True)
    norm = (blurred - bmin) / (bmax - bmin) * maxori
    logm = jnp.log(jnp.clip(norm, 0.001, 50.0))
    pad = jnp.pad(logm, ((0, 0), (0, 0), (1, 1), (1, 1)), mode="edge")

    xi = coords[..., 0].astype(jnp.int32) + 1  # +1: padded-space offset
    yi = coords[..., 1].astype(jnp.int32) + 1
    I = _gather_at(pad, xi, yi)
    Ix1 = _gather_at(pad, xi + 1, yi)
    Ix1_ = _gather_at(pad, xi - 1, yi)
    Iy1 = _gather_at(pad, xi, yi + 1)
    Iy1_ = _gather_at(pad, xi, yi - 1)
    Ix1y1 = _gather_at(pad, xi + 1, yi + 1)
    Ix1_y1_ = _gather_at(pad, xi - 1, yi - 1)

    dx = 0.5 * (Ix1 - Ix1_)
    dy = 0.5 * (Iy1 - Iy1_)
    dxx = Ix1 - 2.0 * I + Ix1_
    dyy = Iy1 - 2.0 * I + Iy1_
    dxy = 0.5 * (Ix1y1 - Ix1 - Iy1 + 2.0 * I - Ix1_ - Iy1_ + Ix1_y1_)

    det = dxx * dyy - dxy * dxy
    safe = jnp.where(det != 0.0, det, 1.0)
    inv_det = jnp.where(det != 0.0, 1.0 / safe, 0.0)
    # closed-form 2x2 inverse; shift = H^-1 @ [dx, dy]
    shift_x = inv_det * (dyy * dx - dxy * dy)
    shift_y = inv_det * (-dxy * dx + dxx * dy)
    shift = jnp.stack([shift_x, shift_y], axis=-1)
    return coords.astype(jnp.float32) - shift


def udp_offset_decode(net_output, kpd):
    """UDP combined heatmap+offset decode (reference inference.py:156-174).

    net_output: (B, 3J, H, W) interleaved [hm, off_x, off_y] per joint.
    Returns coords (B, J, 2) in heatmap space and maxvals (B, J, 1).
    """
    hm = net_output[:, 0::3]
    off_x = net_output[:, 1::3] * kpd
    off_y = net_output[:, 2::3] * kpd
    hm = gaussian_blur(hm, 15)
    off_x = gaussian_blur(off_x, 7)
    off_y = gaussian_blur(off_y, 7)
    coords, maxvals = get_max_preds(hm)
    xi = coords[..., 0].astype(jnp.int32)
    yi = coords[..., 1].astype(jnp.int32)
    coords = coords + jnp.stack(
        [_gather_at(off_x, xi, yi), _gather_at(off_y, xi, yi)], axis=-1)
    return coords, maxvals


def transform_preds(coords, center, scale, output_size_wh):
    """Heatmap-space coords → source-image space, UDP convention.

    Reference inference.py:20-27: unit = scale*200 spans ``output_size - 1``
    heatmap intervals.  coords (..., J, 2); center/scale (..., 2) broadcast.
    """
    s200 = jnp.asarray(scale, jnp.float32) * PIXEL_STD
    w = float(output_size_wh[0]) - 1.0
    h = float(output_size_wh[1]) - 1.0
    sx = (s200[..., 0] / w)[..., None]
    sy = (s200[..., 1] / h)[..., None]
    cx = (center[..., 0] - s200[..., 0] * 0.5)[..., None]
    cy = (center[..., 1] - s200[..., 1] * 0.5)[..., None]
    x = coords[..., 0] * sx + cx
    y = coords[..., 1] * sy + cy
    return jnp.stack([x, y], axis=-1)


@partial(jax.jit, static_argnames=("target_type", "post_process", "kpd"))
def get_final_preds(heatmaps, center, scale, target_type="gaussian",
                    post_process=True, kpd=4.0):
    """Full decode: peaks → sub-pixel refine → source space.

    Parity with reference get_final_preds (inference.py:149-186).
    heatmaps: (B, J, H, W) for 'gaussian', (B, 3J, H, W) for 'offset'.
    Returns (preds (B,J,2), maxvals (B,J,1), preds_in_input_space (B,J,2)).
    """
    H, W = heatmaps.shape[2], heatmaps.shape[3]
    if target_type == "gaussian":
        coords, maxvals = get_max_preds(heatmaps)
        if post_process:
            coords = dark_refine(coords, heatmaps)
    elif target_type == "offset":
        coords, maxvals = udp_offset_decode(heatmaps, kpd)
    else:
        raise ValueError(f"unknown target_type {target_type!r}")

    in_input = jnp.stack([
        coords[..., 0] / (W - 1.0) * (4.0 * W - 1.0),
        coords[..., 1] / (H - 1.0) * (4.0 * H - 1.0),
    ], axis=-1)
    preds = transform_preds(coords, center, scale, (W, H))
    return preds, maxvals, in_input
