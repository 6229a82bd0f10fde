"""Inference pipeline: one jit graph from normalised crops to keypoints.

Replaces the reference validate hot loop (deep_hrnet/lib/core/function.py:
139-217): flip-test is *folded into the batch* (one forward on 2B crops
instead of two sequential forwards with a host round-trip per batch —
reference :151-171 flips on CPU numpy), the un-flip is a channel permute in
the graph (ops/flip.py), and decode (ops/decode.py) fuses right after.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.decode import get_final_preds
from ..ops.flip import flip_back, flip_back_offset
from .train import normalize_images

# COCO flip pairs (deep_hrnet/lib/dataset/coco.py:91-92)
COCO_FLIP_PAIRS = ((1, 2), (3, 4), (5, 6), (7, 8), (9, 10), (11, 12),
                   (13, 14), (15, 16))


def serving_normalizer(cfg):
    """The normalization the serving path applies to raw u8 crops for
    ``cfg``'s model family.  int8 calibration (TPU.QUANTIZE) must measure
    activation amax on the SAME input distribution serving feeds the net:
    RSN normalizes with its BGR constants (core/rsn._rsn_normalize,
    matching RSN/dataset/JointsDataset.py), everything else with the
    ImageNet RGB ones (normalize_images)."""
    if cfg.MODEL.NAME == "rsn":
        from .rsn import _rsn_normalize
        return _rsn_normalize
    return normalize_images
# MPII flip pairs (deep_hrnet/lib/dataset/mpii.py)
MPII_FLIP_PAIRS = ((0, 5), (1, 4), (2, 3), (10, 15), (11, 14), (12, 13))


def cast_to_compute_dtype(model, x):
    """Early cast of normalized inputs to the model's COMPUTE dtype.

    For bf16 models the first conv casts its input anyway, so casting
    right after normalize is value-identical while halving the
    normalized-image HBM traffic (and any flip copy's) — measured +1.8%
    on the w32 int8 flip pipeline at B=128 (round-4 A/B).  The int8
    serving path then rounds from bf16; the decoded drift stays
    sub-pixel (tests/test_quantize.py::test_bf16_early_cast_drift_
    bounded).  No-op for fp32 models."""
    if getattr(model, "dtype", None) == jnp.bfloat16:
        return x.astype(jnp.bfloat16)
    return x


def make_infer_fn(model, *, target_type: str = "gaussian",
                  flip_test: bool = True, post_process: bool = True,
                  kpd: float = 4.0,
                  flip_pairs: Sequence = COCO_FLIP_PAIRS,
                  normalize: bool = True, flip_mode: str = "fold",
                  return_heatmaps: bool = True):
    """Build ``infer(variables, images, center, scale) -> (preds, maxvals)``.

    ``images``: (B, H, W, 3) RGB crops — raw [0,255] if ``normalize`` else
    already normalised.  Output coords are source-image space.

    ``flip_mode`` picks how the flip test runs inside the one jit graph
    (sample-wise math is identical either way; both replace the
    reference's two sequential forwards with host numpy flips between,
    function.py:151-171):
      * ``"fold"`` (default): one forward on the 2B concat — right
        whenever B alone under-fills the chip (the usual eval batch 32,
        and w48 384x288 where two_pass measured 2.6x SLOWER at B=48).
      * ``"two_pass"``: two B-sized forwards.  XLA tiles the convs
        measurably better at the serving batch than at 2B once B fills
        the chip — the round-4 phase study measured +5.8% (int8) / +4%
        (bf16) for w32 at B=128.  Pick per deployment (TEST.FLIP_MODE);
        sample-wise math is identical either way.
    """
    pairs = tuple(tuple(p) for p in flip_pairs)
    if flip_mode not in ("two_pass", "fold"):
        raise ValueError(f"flip_mode {flip_mode!r}: 'two_pass' or 'fold'")
    # ``return_heatmaps=False`` drops the (B, C, Ht, Wt) fp32 heatmap
    # from the graph OUTPUTS (validate fetches it for PCK; serving
    # doesn't) — measured +0.4 ms/it at the w32 B=128 flip point just
    # from not materializing it as a result buffer.

    @jax.jit
    def infer(variables, images, center, scale):
        x = normalize_images(images) if normalize else images
        x = cast_to_compute_dtype(model, x)
        B = x.shape[0]
        if flip_test and flip_mode == "fold":
            x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
        out = model.apply(variables, x, train=False)
        hm = out.transpose(0, 3, 1, 2).astype(jnp.float32)
        if flip_test:
            if flip_mode == "two_pass":
                out_f = model.apply(variables, x[:, :, ::-1, :],
                                    train=False)
                hm_f = out_f.transpose(0, 3, 1, 2).astype(jnp.float32)
            else:
                hm, hm_f = hm[:B], hm[B:]
            if target_type == "offset":
                hm_f = flip_back_offset(hm_f, pairs)
            else:
                hm_f = flip_back(hm_f, pairs)
            hm = (hm + hm_f) * 0.5
        preds, maxvals, _ = get_final_preds(
            hm, center, scale, target_type=target_type,
            post_process=post_process, kpd=kpd)
        return preds, maxvals, (hm if return_heatmaps else None)

    return infer


def make_infer_fn_from_cfg(model, cfg, flip_pairs=COCO_FLIP_PAIRS):
    return make_infer_fn(
        model,
        target_type=cfg.MODEL.TARGET_TYPE,
        flip_test=cfg.TEST.FLIP_TEST,
        post_process=cfg.TEST.POST_PROCESS,
        kpd=cfg.LOSS.KPD,
        flip_pairs=flip_pairs,
        flip_mode=cfg.TEST.get("FLIP_MODE", "fold"),
    )
