"""Top-down pose engine: ``infer_pose(img, boxes) → (keypoints, maxvals)``.

TPU-native equivalent of ``UdpPsaPoseAbs`` + backends
(deep_hrnet/pose_engine.py:15-228).  Differences are architectural, not
behavioural: the per-person ``cv2.warpAffine`` loop (:73-80) becomes ONE
batched gather from the HBM-resident frame; preprocessing, forward,
optional flip-test, and UDP decode are a single jit graph.  Person counts
are bucketed to powers of two so the jit cache stays small.

Box → crop geometry matches pose_engine exactly: xyxy → center/scale with
the model aspect ratio and ×1.25 (:55-63), then the *classic* 3-point
affine (tools/infer_utils/utils.py:157-177) — NOT the UDP training warp.
"""

from __future__ import annotations


import numpy as np

SKELETONS = {  # 1-based joint pairs (pose_engine.py:17-26)
    "coco": [[16, 14], [14, 12], [17, 15], [15, 13], [12, 13], [6, 12],
             [7, 13], [6, 7], [6, 8], [7, 9], [8, 10], [9, 11], [2, 3],
             [1, 2], [1, 3], [2, 4], [3, 5], [4, 6], [5, 7]],
    "mpii": [[9, 10], [12, 13], [12, 11], [3, 2], [2, 1], [14, 15],
             [15, 16], [4, 5], [5, 6], [9, 8], [8, 7], [7, 3], [7, 4],
             [9, 13], [9, 14]],
}


def _next_bucket(n, buckets=(1, 2, 4, 8, 16, 32, 64, 128)):
    for b in buckets:
        if n <= b:
            return b
    return ((n + 127) // 128) * 128


class UdpPosePipeline:
    """Build from a config (yaml path or Node) + weights.

    ``weights`` may be a msgpack path (ours), a ``.pth`` path (converted via
    utils/torch_convert), or a ready variables dict; None random-inits
    (smoke mode).
    """

    def __init__(self, cfg, weights=None, flip_test=None, mesh=None,
                 quantize=None, act_scales=None, calib_batches=None):
        import jax
        import jax.numpy as jnp
        from ..config import Node, load_config
        from ..core.infer import COCO_FLIP_PAIRS, MPII_FLIP_PAIRS
        from ..models import build_model

        #: optional jax.sharding.Mesh — crop batches shard over its 'data'
        #: axis for multi-chip serving (weights + frame replicated)
        self.mesh = mesh

        if not isinstance(cfg, Node):
            cfg = load_config(cfg)
        self.cfg = cfg
        self.input_wh = tuple(cfg.MODEL.IMAGE_SIZE)
        self.num_joints = cfg.MODEL.NUM_JOINTS
        dataset = cfg.DATASET.DATASET.lower()
        self.skeleton = SKELETONS.get(dataset)
        self.flip_pairs = (MPII_FLIP_PAIRS if dataset == "mpii"
                           else COCO_FLIP_PAIRS)
        self.model = build_model(cfg)
        self.variables = self._load_weights(weights)
        self._flip = (cfg.TEST.FLIP_TEST if flip_test is None else flip_test)
        # int8 PTQ serving mode (models/quantize.py): with a calibration
        # table the convs run w8a8 on the MXU's 2x int8 path; without one
        # the first ``calib_batches`` infer_pose calls serve in bf16 while
        # recording per-site input amax, then the engine switches itself.
        from ..models.quantize import Calibrator, load_act_scales_maybe
        self.act_scales = load_act_scales_maybe(act_scales)
        # gating (uniform across all engines): explicit quantize= wins
        # (including "" = off), else a provided table IS the int8 request,
        # else cfg.TPU.QUANTIZE
        if quantize is None:
            quantize = ("int8" if self.act_scales is not None
                        else (cfg.TPU.QUANTIZE or None))
        self.quantize = quantize
        self.calib_batches = (calib_batches if calib_batches is not None
                              else cfg.TPU.QUANTIZE_CALIB_BATCHES)
        self._calib = Calibrator(self.calib_batches)
        self._collect = None
        self._collect_crops = None
        self._prep = None
        self._infer_fp = None           # bf16 graph used while calibrating
        # ONE jitted closure; jax.jit caches per padded-bucket shape
        self._infer = None
        self._maybe_prepare()           # table provided up-front

    def _active_model(self):
        if self.quantize == "int8" and self.act_scales is not None:
            from ..models.quantize import QuantizedModel
            return QuantizedModel(self.model, self.act_scales)
        if self.quantize not in (None, "", "int8"):
            raise ValueError(f"unknown quantize mode {self.quantize!r}")
        return self.model

    def _maybe_prepare(self):
        """Once a calibration table exists, hoist the per-channel weight
        requant out of the serving graphs: augment ``variables`` with the
        precomputed int8 kernels (prepare_variables; idempotent)."""
        if self.quantize == "int8" and self.act_scales is not None:
            self.variables = self._active_model().prepare_variables(
                self.variables)

    def save_act_scales(self, path):
        """Persist the calibration table (json) for later runs."""
        from ..models.quantize import save_act_scales
        if self.act_scales is None:
            raise RuntimeError("engine is not calibrated yet")
        save_act_scales(path, self.act_scales)

    def _merge_amax(self, got):
        """Fold one collected batch into the running table
        (models/quantize.Calibrator); freeze into ``act_scales``
        (switching the engine to int8) after ``calib_batches`` batches."""
        if self._calib.update(got):
            # NOTE: no _maybe_prepare() here — the freeze batch is still
            # served by the already-chosen bf16 graph, and mutating the
            # variables treedef now would force one gratuitous recompile
            # of it; preparation runs when the int8 graph is first built
            self.act_scales = self._calib.table()

    def _calibrate_step(self, frame, center_p, scale_p):
        """Record per-conv amax on this (bf16-served) batch; switch the
        engine to int8 once ``calib_batches`` batches were seen."""
        import jax
        from ..models.quantize import collect_conv_amax
        if self._prep is None:
            self._prep = self._build_prep()
        if self._collect is None:
            self._collect = jax.jit(lambda v, x: collect_conv_amax(
                self.model, v, x, train=False))
        x = self._prep(frame, center_p, scale_p)
        self._merge_amax(jax.device_get(self._collect(self.variables, x)))

    def calibrate_crops(self, crops_u8):
        """Record per-conv amax from an ALREADY-CROPPED u8 person batch.

        The fused engine's --low-bw serving path builds its pose crops on
        the host (native OpenMP warp), so — unlike the single-dispatch
        fused graph, whose crops only exist in-graph — it CAN
        self-calibrate; it feeds each warmup batch here while serving it
        bf16, then switches to int8 like infer_pose does."""
        import jax
        from ..core.train import normalize_images
        from ..models.quantize import collect_conv_amax
        if self._collect_crops is None:
            self._collect_crops = jax.jit(
                lambda v, x: collect_conv_amax(
                    self.model, v, normalize_images(x), train=False))
        self._merge_amax(jax.device_get(
            self._collect_crops(self.variables, crops_u8)))

    def _load_weights(self, weights):
        import jax
        import jax.numpy as jnp
        if isinstance(weights, dict):
            return weights
        if weights and str(weights).endswith(".pth"):
            from ..utils.torch_convert import load_torch_state_dict
            sd = load_torch_state_dict(weights)
            return self._convert(sd)
        if weights and str(weights).endswith(".onnx"):
            # the reference ships UdpPsaPoseOnnx (pose_engine.py:130-151);
            # here a .onnx artifact loads back into the NATIVE TPU path:
            # our exporter names initializers with the reference torch
            # keys (export/onnx_families.py), so the graph's weights ARE
            # a torch state_dict and convert like a .pth — full TPU
            # speed instead of a host ONNX runtime.
            from ..export.onnx_pb import load_model
            with open(weights, "rb") as f:
                m = load_model(f.read())
            sd = {t.name: t.array for t in m.graph.initializers}
            return self._convert(sd)
        if weights:
            from ..utils.checkpoint import load_weights
            return load_weights(weights)
        w, h = self.input_wh
        return jax.jit(lambda r: self.model.init(
            r, jnp.zeros((1, h, w, 3), jnp.float32), train=False)
        )(jax.random.PRNGKey(0))

    def _convert(self, sd):
        from ..utils.torch_convert import torch_to_flax_from_cfg
        v, _ = torch_to_flax_from_cfg(sd, self.cfg)
        return v

    def _make_prep(self):
        """(frame, center, scale) → normalised crop batch (model input)."""
        import jax
        import jax.numpy as jnp
        from ..core.train import normalize_images
        from ..ops.affine import classic_affine_matrix, crop_boxes

        w, h = self.input_wh

        def prep(frame, center, scale):
            mats = jax.vmap(lambda c, s: classic_affine_matrix(
                c, s, 0.0, (w, h), inv=True))(center, scale)
            crops = crop_boxes(frame.astype(jnp.float32), mats, (h, w))
            return normalize_images(crops)
        return prep

    def _build_prep(self):
        import jax
        return jax.jit(self._make_prep())

    def _build_infer(self, force_fp=False):
        import jax
        import jax.numpy as jnp
        from ..ops.decode import get_final_preds
        from ..ops.flip import flip_back, flip_back_offset

        cfg = self.cfg
        target_type = cfg.MODEL.TARGET_TYPE
        pairs = tuple(map(tuple, self.flip_pairs))
        flip = self._flip
        prep = self._make_prep()
        model = self.model if force_fp else self._active_model()

        from ..core.infer import cast_to_compute_dtype

        def run(variables, frame, center, scale):
            x = cast_to_compute_dtype(model, prep(frame, center, scale))
            B = x.shape[0]
            if flip:
                x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
            out = model.apply(variables, x, train=False)
            hm = out.transpose(0, 3, 1, 2).astype(jnp.float32)
            if flip:
                hm, hm_f = hm[:B], hm[B:]
                hm_f = (flip_back_offset(hm_f, pairs)
                        if target_type == "offset" else flip_back(hm_f, pairs))
                hm = (hm + hm_f) * 0.5
            preds, maxvals, _ = get_final_preds(
                hm, center, scale, target_type=target_type,
                post_process=cfg.TEST.POST_PROCESS, kpd=cfg.LOSS.KPD)
            return preds, maxvals

        if self.mesh is not None:
            from ..parallel import batch_sharding, replicated
            bs = batch_sharding(self.mesh)
            rep = replicated(self.mesh)
            return jax.jit(run, in_shardings=(rep, rep, bs, bs),
                           out_shardings=rep)
        return jax.jit(run)

    def infer_pose(self, img, boxes):
        """img (H, W, 3) RGB uint8; boxes (N, ≥4) xyxy.
        Returns (keypoints (N, J, 2) float32, maxvals (N, J, 1))."""
        import jax.numpy as jnp
        from ..ops.boxes import xyxy_to_cs

        boxes = np.asarray(boxes, np.float32)
        n = boxes.shape[0]
        if n == 0:
            return (np.zeros((0, self.num_joints, 2), np.float32),
                    np.zeros((0, self.num_joints, 1), np.float32))
        center, scale = xyxy_to_cs(boxes[:, :4], self.input_wh)
        bucket = _next_bucket(n)
        if self.mesh is not None:
            # pad to a data-axis-divisible bucket so crops shard evenly
            n_data = self.mesh.shape["data"]
            bucket = max(bucket, ((bucket + n_data - 1) // n_data) * n_data)
        pad = bucket - n
        center_p = np.concatenate([center, np.tile(center[:1], (pad, 1))])
        scale_p = np.concatenate([scale, np.tile(scale[:1], (pad, 1))])
        frame = jnp.asarray(img)
        if (self.quantize == "int8" and self.act_scales is None):
            # calibration phase: record amax, serve this call in bf16;
            # the int8 graph takes over on the first post-freeze call
            self._calibrate_step(frame, center_p, scale_p)
            if self._infer_fp is None:
                self._infer_fp = self._build_infer(force_fp=True)
            infer = self._infer_fp
        else:
            if self._infer is None:
                self._maybe_prepare()        # one-time, host-side
                self._infer = self._build_infer()
            infer = self._infer
        preds, maxvals = infer(self.variables, frame, center_p, scale_p)
        return np.asarray(preds)[:n], np.asarray(maxvals)[:n]

    def draw_keypoints(self, image, keypoints, radius=1):
        from .io import draw_keypoints
        draw_keypoints(image, keypoints, self.skeleton, radius)
        return image
