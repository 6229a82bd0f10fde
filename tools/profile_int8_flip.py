"""Phase profile of the w32 int8 flip-test pipeline (VERDICT r3 item 1).

The headline has sat at 2710-2966 crops/s for three rounds while int8
delivers +30% on w48 but only +9% on w32.  This tool answers WHERE the
w32 flip int8 milliseconds go, by timing nested prefixes of the exact
headline graph (same differencing method as bench.py — checksum-synced,
fixed tunnel latency cancels):

  P0 normalize only            (u8 -> fp32 -> bf16 cast chain)
  P1 + forward (2B folded)     (the int8 conv stack)
  P2 + unflip/average          (channel permute + mean, fp32)
  P3 + decode                  (3 gaussian blurs + argmax + offset gather)
  F  one-shot full pipeline    (= bench headline, sanity)

plus A/B variants of the full pipeline:

  --variant fwd-b128    two B-sized forwards in one jit instead of one
                        2B forward (XLA tiles int8 convs better at B=128
                        than 2B=256 — DESIGN.md round-3 int8 study)
  --variant bf16-decode heatmap average + blur inputs kept in bf16

Usage: python tools/profile_int8_flip.py [--batch 128] [--variant ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build(batch):
    import jax
    import jax.numpy as jnp

    import bench
    from udp_pose_tpu.core.infer import serving_normalizer
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.models.quantize import QuantizedModel, calibrate

    cfg = bench._headline_cfg()
    model = build_model(cfg)
    w, h = cfg.MODEL.IMAGE_SIZE
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, h, w, 3)), train=False)
    )(jax.random.PRNGKey(0))
    normalize_images = serving_normalizer(cfg)
    cal = np.random.default_rng(4).integers(
        0, 256, (32, h, w, 3)).astype(np.uint8)
    scales = calibrate(model, variables, [normalize_images(cal)])
    qmodel = QuantizedModel(model, scales)
    variables = qmodel.prepare_variables(variables)

    rng_np = np.random.default_rng(3)
    images = jax.device_put(rng_np.integers(
        0, 256, (batch, h, w, 3)).astype(np.uint8))
    center = jax.device_put(np.tile(
        np.array([[128.0, 128.0]], np.float32), (batch, 1)))
    scale = jax.device_put(np.tile(
        np.array([[0.96, 1.28]], np.float32), (batch, 1)))
    return cfg, qmodel, variables, images, center, scale


def timed_factory(jax, jnp):
    checksum = jax.jit(lambda p: jnp.sum(
        jnp.asarray(p, jnp.float32).ravel()[:4096]))

    def timed(fn, args, iters=(6, 18)):
        def block(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*args)
            first = out[0] if isinstance(out, (tuple, list)) else out
            float(checksum(first))
            return time.perf_counter() - t0

        block(2)                                   # warmup / compile
        t_small, t_large = block(iters[0]), block(iters[1])
        return (t_large - t_small) / (iters[1] - iters[0])
    return timed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--variant", action="append", default=[],
                    choices=["fwd-b128", "bf16-decode", "flat-norm"])
    ap.add_argument("--stages", action="store_true",
                    help="run the P0-P3 stage prefixes (4 extra compiles)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from udp_pose_tpu.core.infer import COCO_FLIP_PAIRS, make_infer_fn
    from udp_pose_tpu.core.train import normalize_images
    from udp_pose_tpu.ops.decode import get_final_preds
    from udp_pose_tpu.ops.flip import flip_back_offset

    B = args.batch
    cfg, qmodel, variables, images, center, scale = build(B)
    kpd = cfg.LOSS.KPD
    pairs = tuple(tuple(p) for p in COCO_FLIP_PAIRS)
    timed = timed_factory(jax, jnp)

    def report(tag, dt):
        print(f"{tag:34s} {dt * 1e3:7.2f} ms/it  "
              f"({B / dt:7.1f} crops/s)", flush=True)

    if args.stages:
        @jax.jit
        def p0(v, imgs):
            return normalize_images(imgs)

        @jax.jit
        def p1(v, imgs):
            x = normalize_images(imgs)
            x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
            return qmodel.apply(v, x, train=False)

        @jax.jit
        def p2(v, imgs):
            x = normalize_images(imgs)
            x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
            out = qmodel.apply(v, x, train=False)
            hm = out.transpose(0, 3, 1, 2).astype(jnp.float32)
            hm, hm_f = hm[:B], hm[B:]
            hm_f = flip_back_offset(hm_f, pairs)
            return (hm + hm_f) * 0.5

        @jax.jit
        def p3(v, imgs, c, s):
            hm = p2.__wrapped__(v, imgs)
            return get_final_preds(hm, c, s, target_type="offset",
                                   post_process=True, kpd=kpd)

        report("P0 normalize", timed(p0, (variables, images)))
        report("P1 +forward 2B int8", timed(p1, (variables, images)))
        report("P2 +unflip/avg", timed(p2, (variables, images)))
        report("P3 +decode (full)",
               timed(p3, (variables, images, center, scale)))

    infer = make_infer_fn(qmodel, target_type="offset", flip_test=True,
                          post_process=True, kpd=kpd)
    report("F  make_infer_fn full",
           timed(infer, (variables, images, center, scale)))

    if "fwd-b128" in args.variant:
        @jax.jit
        def f_two(v, imgs, c, s):
            x = normalize_images(imgs)
            hm = qmodel.apply(v, x, train=False)
            hm_f = qmodel.apply(v, x[:, :, ::-1, :], train=False)
            hm = hm.transpose(0, 3, 1, 2).astype(jnp.float32)
            hm_f = flip_back_offset(
                hm_f.transpose(0, 3, 1, 2).astype(jnp.float32), pairs)
            hm = (hm + hm_f) * 0.5
            return get_final_preds(hm, c, s, target_type="offset",
                                   post_process=True, kpd=kpd)

        report("V  two B-sized forwards",
               timed(f_two, (variables, images, center, scale)))

    if "flat-norm" in args.variant:
        # normalize with the channel constants pre-tiled to a flat
        # (H*W*3,) vector: the standard (..., 3)-broadcast normalize
        # leaves 125/128 VPU lanes idle on the minor dim (P0 measured
        # 3.21 ms for ~95 MB of traffic = 29 GB/s); the flat form feeds
        # full lanes.
        from udp_pose_tpu.core.train import IMAGENET_MEAN, IMAGENET_STD
        h_, w_ = images.shape[1], images.shape[2]
        a_np = np.tile(1.0 / (255.0 * np.asarray(IMAGENET_STD, np.float32)),
                       h_ * w_)
        b_np = np.tile(-np.asarray(IMAGENET_MEAN, np.float32)
                       / np.asarray(IMAGENET_STD, np.float32), h_ * w_)

        def flat_norm(imgs):
            Bn = imgs.shape[0]
            flat = imgs.reshape(Bn, -1).astype(jnp.float32)
            out = flat * jnp.asarray(a_np) + jnp.asarray(b_np)
            return out.reshape(imgs.shape)

        @jax.jit
        def p0_flat(v, imgs):
            return flat_norm(imgs)

        @jax.jit
        def f_flat(v, imgs, c, s):
            x = flat_norm(imgs)
            hm = qmodel.apply(v, x, train=False)
            hm_f = qmodel.apply(v, x[:, :, ::-1, :], train=False)
            hm = hm.transpose(0, 3, 1, 2).astype(jnp.float32)
            hm_f = flip_back_offset(
                hm_f.transpose(0, 3, 1, 2).astype(jnp.float32), pairs)
            hm = (hm + hm_f) * 0.5
            return get_final_preds(hm, c, s, target_type="offset",
                                   post_process=True, kpd=kpd)

        report("V  P0 flat normalize", timed(p0_flat, (variables, images)))
        report("V  full two-pass + flat norm",
               timed(f_flat, (variables, images, center, scale)))

    if "bf16-decode" in args.variant:
        @jax.jit
        def f_bf16(v, imgs, c, s):
            x = normalize_images(imgs)
            x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
            out = qmodel.apply(v, x, train=False)
            hm = out.transpose(0, 3, 1, 2)       # stay bf16
            hm, hm_f = hm[:B], hm[B:]
            hm_f = flip_back_offset(hm_f, pairs)
            hm = ((hm + hm_f) * 0.5)
            return get_final_preds(hm, c, s, target_type="offset",
                                   post_process=True, kpd=kpd)

        report("V  bf16 heatmap avg",
               timed(f_bf16, (variables, images, center, scale)))


if __name__ == "__main__":
    main()
