"""On-device augmentation + target pipeline (SURVEY.md §7 design).

The reference does all augmentation per-sample on the host with cv2
(JointsDataset.py:204-239).  Here host workers only decode images onto a
fixed-size canvas; everything else — aug parameter sampling, the UDP warp
as one batched gather, AID information-dropping as multiplicative masks,
normalisation and target encoding — happens inside one jit graph driven by
a `jax.random` key, so augmentation overlaps TPU compute and the host
pipeline is pure IO.

Randomness is distributionally identical to the reference
(clip/prob semantics of JointsDataset.py:204-224), not bit-identical.
Horizontal flip is folded into the warp matrix (mirror the source x-axis)
instead of flipping the image.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.affine import udp_rotate_joints, udp_warp_matrix, warp_affine
from ..ops.targets import batch_gaussian_targets, batch_offset_targets


def pad_to_canvas(img, canvas_hw):
    """Host helper: place an image at the top-left of a fixed canvas.

    Returns (canvas uint8, (h, w)) — joints/centers stay valid because the
    placement is at the origin.
    """
    ch, cw = canvas_hw
    out = np.zeros((ch, cw, 3), np.uint8)
    h = min(img.shape[0], ch)
    w = min(img.shape[1], cw)
    out[:h, :w] = img[:h, :w]
    return out, (img.shape[0], img.shape[1])


class RawSampleView:
    """Dataset adapter for the device-aug path (``DATASET.DEVICE_AUG``).

    ``__getitem__`` returns the RAW decoded image on a fixed canvas plus
    geometry — no warp, no aug, no targets: the host residue of the
    SURVEY §7 design (reference does all of it per-sample on the host,
    JointsDataset.py:172-256).  Aug randomness moves to the device key
    in :func:`make_device_augment`, so the loader's epoch-seeded batch
    PLAN is unchanged and mid-epoch resume needs no host-rng replay.
    Implements the loader protocol (``__len__``/``seed``/``db``) by
    delegation, so ``epoch_loader``/``grain_loader`` work unchanged.
    """

    def __init__(self, dataset, canvas_hw):
        self.dataset = dataset
        self.canvas_hw = (int(canvas_hw[0]), int(canvas_hw[1]))

    def __len__(self):
        return len(self.dataset)

    def seed(self, s):
        self.dataset.seed(s)

    @property
    def db(self):
        return self.dataset.db

    def __getitem__(self, idx):
        ds = self.dataset
        rec = ds.db[idx]
        img = ds._read_image(rec["image"])
        canvas, (_h, w) = pad_to_canvas(img, self.canvas_hw)
        vis = np.asarray(rec["joints_3d_vis"], np.float32)
        if vis.ndim == 2:
            vis = vis[:, 0]
        return {
            "canvas": canvas,
            "joints": np.asarray(rec["joints_3d"], np.float32)[:, :2],
            "joints_vis": vis,
            "center": np.asarray(rec["center"], np.float32),
            "scale": np.asarray(rec["scale"], np.float32),
            "width": np.float32(w),
        }


def _sample_aug_params(key, center, scale, joints, joints_vis, *,
                       scale_factor, rotation_factor, prob_half_body,
                       num_joints_half_body, upper_mask, aspect_ratio,
                       do_flip):
    """Per-sample aug parameters (JointsDataset.py:204-224 semantics)."""
    k_hb, k_hbsel, k_s, k_r, k_rgate, k_f = jax.random.split(key, 6)

    vis = joints_vis[:, 0] if joints_vis.ndim == 2 else joints_vis

    # --- half-body (JointsDataset.py:124-167) ---------------------------
    up_sel = vis * upper_mask
    lo_sel = vis * (1.0 - upper_mask)
    n_up = jnp.sum(up_sel)
    n_lo = jnp.sum(lo_sel)
    use_upper = (jax.random.normal(k_hbsel) < 0.5) & (n_up > 2)
    sel = jnp.where(use_upper, up_sel,
                    jnp.where(n_lo > 2, lo_sel, up_sel))
    n_sel = jnp.sum(sel)
    safe = jnp.maximum(n_sel, 1.0)
    sel_pts = joints[:, :2] * sel[:, None]
    hb_center = jnp.sum(sel_pts, axis=0) / safe
    big = 1e9
    lt = jnp.min(jnp.where(sel[:, None] > 0, joints[:, :2], big), axis=0)
    rb = jnp.max(jnp.where(sel[:, None] > 0, joints[:, :2], -big), axis=0)
    w = rb[0] - lt[0]
    h = rb[1] - lt[1]
    h = jnp.where(w > aspect_ratio * h, w / aspect_ratio, h)
    w = jnp.where(w < aspect_ratio * h, h * aspect_ratio, w)
    hb_scale = jnp.stack([w, h]) / 200.0 * 1.5
    hb_ok = ((jnp.sum(vis) > num_joints_half_body)
             & (jax.random.uniform(k_hb) < prob_half_body)
             & (n_sel >= 2))
    center = jnp.where(hb_ok, hb_center, center)
    scale = jnp.where(hb_ok, hb_scale, scale)

    # --- scale / rotation / flip ----------------------------------------
    sf = scale_factor
    s_mult = jnp.clip(jax.random.normal(k_s) * sf + 1, 1 - sf, 1 + sf)
    scale = scale * s_mult
    rf = rotation_factor
    rot = jnp.clip(jax.random.normal(k_r) * rf, -rf * 2, rf * 2)
    rot = jnp.where(jax.random.uniform(k_rgate) <= 0.6, rot, 0.0)
    flip = do_flip & (jax.random.uniform(k_f) <= 0.5)
    return center, scale, rot, flip


def _aid_mask(key, hw, cutout, hide_and_seek):
    """AID masks from jax.random (transforms.py:144-224 semantics)."""
    H, W = hw
    mask = jnp.ones((H, W), jnp.float32)
    py = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    px = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    if cutout:
        prob, radius_factor, num_patch = cutout
        for i in range(int(num_patch)):
            key, kc, kr, kg = jax.random.split(key, 4)
            cx = jax.random.uniform(kc, (2,)) * jnp.array([W, H], jnp.float32)
            radius = radius_factor * (1 + jax.random.uniform(kr, (2,))) * W
            dis = (((cx[0] - px) / radius[0]) ** 2
                   + ((cx[1] - py) / radius[1]) ** 2)
            gate = jax.random.uniform(kg) < prob
            mask = mask * jnp.where(gate & (dis <= 1.0), 0.0, 1.0)
    if hide_and_seek:
        prob, prob_hide, grid_sizes = hide_and_seek
        key, kg, kgrid, kcell = jax.random.split(key, 4)
        gi = jax.random.randint(kgrid, (), 0, len(grid_sizes) - 1)
        grid = jnp.asarray(grid_sizes, jnp.int32)[gi]
        grid_f = jnp.maximum(grid, 1).astype(jnp.float32)
        cell_y = (py // grid_f).astype(jnp.int32)
        cell_x = (px // grid_f).astype(jnp.int32)
        cell_id = cell_y * 64 + cell_x
        rand_cells = jax.random.uniform(kcell, (64 * 64,))
        hide = jnp.take(rand_cells, cell_id) <= prob_hide
        active = (jax.random.uniform(kg) < prob) & (grid > 0)
        mask = mask * jnp.where(active & hide, 0.0, 1.0)
    return mask


def make_device_augment(cfg, num_joints, flip_pairs, upper_body_ids,
                        canvas_hw: Tuple[int, int]):
    """Build ``augment(key, batch) -> (images, target, target_weight)``.

    batch: canvas (B, Hc, Wc, 3) uint8, joints (B, J, 2), joints_vis
    (B, J) or (B, J, K), center (B, 2), scale (B, 2), width (B,) original
    image widths (for flip mirroring).
    """
    img_w, img_h = cfg.MODEL.IMAGE_SIZE
    hm_wh = tuple(cfg.MODEL.HEATMAP_SIZE)
    aspect = img_w / img_h
    upper_mask = np.zeros((num_joints,), np.float32)
    upper_mask[list(upper_body_ids)] = 1.0
    perm = np.arange(num_joints)
    for a, b in flip_pairs:
        perm[a], perm[b] = perm[b], perm[a]
    cutout = tuple(cfg.DATASET.CUTOUT) if cfg.DATASET.CUTOUT else None
    has_ = (tuple(cfg.DATASET.HIDE_AND_SEEK)
            if cfg.DATASET.HIDE_AND_SEEK else None)
    target_type = cfg.MODEL.TARGET_TYPE
    sigma, kpd = cfg.MODEL.SIGMA, cfg.LOSS.KPD

    sample_params = partial(
        _sample_aug_params,
        scale_factor=cfg.DATASET.SCALE_FACTOR,
        rotation_factor=cfg.DATASET.ROT_FACTOR,
        prob_half_body=cfg.DATASET.PROB_HALF_BODY,
        num_joints_half_body=cfg.DATASET.NUM_JOINTS_HALF_BODY,
        upper_mask=jnp.asarray(upper_mask),
        aspect_ratio=aspect,
        do_flip=bool(cfg.DATASET.FLIP),
    )

    @jax.jit
    def augment(key, batch):
        B = batch["canvas"].shape[0]
        keys = jax.random.split(key, B * 2).reshape(B, 2, 2)
        joints = jnp.asarray(batch["joints"], jnp.float32)
        vis = jnp.asarray(batch["joints_vis"], jnp.float32)
        if vis.ndim == 3:
            vis = vis[..., 0]
        width = jnp.asarray(batch["width"], jnp.float32)

        def one(canvas, j, v, c, s, w_img, ks):
            c2, s2, rot, flip = sample_params(ks[0], c, s, j, v)
            # fold flip into geometry: mirror joints/centre, compose the
            # warp with a source-x mirror
            j_f = j.at[:, 0].set(w_img - j[:, 0] - 1)[perm] * v[perm, None]
            v_f = v[perm]
            j_use = jnp.where(flip, j_f, j)
            v_use = jnp.where(flip, v_f, v)
            c_use = jnp.where(flip, c2.at[0].set(w_img - c2[0] - 1), c2)
            M = udp_warp_matrix(rot, c_use, s2, (img_w, img_h))
            # mirror source x: x_src' = (w_img-1) - x_src
            M_flip = jnp.stack([
                jnp.stack([-M[0, 0], -M[0, 1], w_img - 1.0 - M[0, 2]]),
                jnp.stack([M[1, 0], M[1, 1], M[1, 2]]),
            ])
            M_use = jnp.where(flip, M_flip, M)
            # canvas stays uint8 into the warp: the bilinear gather taps
            # u8 and weights in f32 (ops/affine.py) — identical values,
            # 4x less gathered bytes
            crop = warp_affine(canvas, M_use, (img_h, img_w))
            mapped = udp_rotate_joints(j_use, rot, c_use, s2,
                                       (img_w, img_h))
            mask = _aid_mask(ks[1], (img_h, img_w), cutout, has_)
            return crop * mask[..., None], mapped, v_use

        crops, mapped, vises = jax.vmap(one)(
            batch["canvas"], joints, vis,
            jnp.asarray(batch["center"], jnp.float32),
            jnp.asarray(batch["scale"], jnp.float32), width, keys)

        if target_type == "offset":
            target, weight = batch_offset_targets(
                mapped, vises, hm_wh, (img_w, img_h), kpd)
        else:
            target, weight = batch_gaussian_targets(
                mapped, vises, hm_wh, (img_w, img_h), sigma)
        return crops, target, weight

    return augment
