"""PyTorch → Flax weight conversion for the published ``.pth`` zoo.

The reference distributes torch checkpoints (README model zoo); bit-level
output parity requires loading them into the Flax models.  Layout rules
(verified numerically against torch in tests/test_torch_convert.py):

* Conv2d          (O,I,kh,kw)  → kernel (kh,kw,I,O)
* ConvTranspose2d (I,O,kh,kw)  → spatial flip + transpose → (kh,kw,I,O)
  (flax ConvTranspose with ``transpose_kernel=False``)
* BatchNorm2d     weight/bias → scale/bias; running stats → batch_stats
* LayerNorm       weight/bias → scale/bias
* ``module.`` DataParallel prefixes are stripped (pose_engine.py:108-117).

Each family has a key-translation function torch-name → flax path; the
assembled tree is shape-checked against a freshly-initialised model.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path):
    """Load a .pth (weights or checkpoint dict) into {name: np.ndarray}."""
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    if isinstance(blob, dict) and "best_state_dict" in blob:
        blob = blob["best_state_dict"]
    out = {}
    for k, v in blob.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


def conv_kernel(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convT_kernel(w):
    return np.ascontiguousarray(
        np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def _has(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) and not hasattr(node, "keys"):
            return False
        if p not in node:
            return False
        node = node[p]
    return True


def conv_kernel_inv(k):
    """flax (kh,kw,I,O) → torch Conv2d (O,I,kh,kw)."""
    return np.ascontiguousarray(np.transpose(k, (3, 2, 0, 1)))


def convT_kernel_inv(k):
    """flax (kh,kw,I,O) → torch ConvTranspose2d (I,O,kh,kw)."""
    return np.ascontiguousarray(
        np.transpose(k, (2, 3, 0, 1))[:, :, ::-1, ::-1])


class Converter:
    """Bidirectional (flax_path ↔ torch_key) copier.

    Forward (default): reads a torch state_dict, builds flax variables.
    Reverse (``reverse=True`` + ``variables``): walks the SAME family
    mapping code and emits a reference-format torch state_dict instead —
    the export path that lets the reference's own ONNX tooling consume
    models trained here.
    """

    def __init__(self, sd: Dict[str, np.ndarray], variables=None,
                 reverse: bool = False, tolerant: bool = False):
        self.reverse = reverse
        #: tolerant (forward only): silently skip mapping units whose torch
        #: keys are absent — partial/backbone-only checkpoints (the
        #: reference's strict=False pretrained loads, pose_hrnet.py:497-505)
        self.tolerant = tolerant
        self.sd = dict(sd) if reverse else sd
        self.params = (variables["params"] if reverse else {})
        self.stats = (variables.get("batch_stats", {}) if reverse else {})
        self.used = set()

    def probe(self, tkey: str, *fpath) -> bool:
        """Structural probe: torch-key presence (forward) or the
        corresponding flax-path presence (reverse)."""
        if self.reverse:
            return _has(self.params, fpath)
        return tkey in self.sd

    def conv(self, tkey: str, *path, transposed=False, bias=False):
        if self.reverse:
            k = _get(self.params, (*path, "kernel"))
            self.sd[tkey + ".weight"] = (convT_kernel_inv(k) if transposed
                                         else conv_kernel_inv(k))
            if _has(self.params, (*path, "bias")):
                self.sd[tkey + ".bias"] = _get(self.params, (*path, "bias"))
            return
        if self.tolerant and (tkey + ".weight") not in self.sd:
            return
        w = self.sd[tkey + ".weight"]
        self.used.add(tkey + ".weight")
        kernel = convT_kernel(w) if transposed else conv_kernel(w)
        _set(self.params, (*path, "kernel"), kernel)
        if bias or (tkey + ".bias") in self.sd:
            if (tkey + ".bias") in self.sd:
                _set(self.params, (*path, "bias"), self.sd[tkey + ".bias"])
                self.used.add(tkey + ".bias")

    def bn(self, tkey: str, *path):
        pairs = {"weight": (self.params, "scale"),
                 "bias": (self.params, "bias"),
                 "running_mean": (self.stats, "mean"),
                 "running_var": (self.stats, "var")}
        if self.reverse:
            for tsuf, (tree, fsuf) in pairs.items():
                self.sd[f"{tkey}.{tsuf}"] = _get(tree, (*path, fsuf))
            self.sd[f"{tkey}.num_batches_tracked"] = np.array(0, np.int64)
            return
        if self.tolerant and any(f"{tkey}.{t}" not in self.sd
                                 for t in pairs):
            return
        for tsuf, (tree, fsuf) in pairs.items():
            _set(tree, (*path, fsuf), self.sd[f"{tkey}.{tsuf}"])
            self.used.add(f"{tkey}.{tsuf}")

    def ln(self, tkey: str, *path, tshape=None):
        """``tshape``: torch normalized_shape when not 1-D (e.g. the PSA
        LayerNorm([C,1,1]), PSA.py:164)."""
        if self.reverse:
            w = _get(self.params, (*path, "scale"))
            b = _get(self.params, (*path, "bias"))
            if tshape == "c11":
                w, b = w.reshape(-1, 1, 1), b.reshape(-1, 1, 1)
            self.sd[tkey + ".weight"] = w
            self.sd[tkey + ".bias"] = b
            return
        if self.tolerant and (tkey + ".weight") not in self.sd:
            return
        _set(self.params, (*path, "scale"), self.sd[tkey + ".weight"].reshape(-1))
        _set(self.params, (*path, "bias"), self.sd[tkey + ".bias"].reshape(-1))
        self.used.update({tkey + ".weight", tkey + ".bias"})

    def dense(self, tkey: str, *path):
        """torch Linear weight (O,I) ↔ flax Dense kernel (I,O)."""
        if self.reverse:
            self.sd[tkey + ".weight"] = np.ascontiguousarray(
                _get(self.params, (*path, "kernel")).T)
            if _has(self.params, (*path, "bias")):
                self.sd[tkey + ".bias"] = _get(self.params, (*path, "bias"))
            return
        if self.tolerant and f"{tkey}.weight" not in self.sd:
            return
        _set(self.params, (*path, "kernel"), self.sd[f"{tkey}.weight"].T)
        self.used.add(f"{tkey}.weight")
        if f"{tkey}.bias" in self.sd:
            _set(self.params, (*path, "bias"), self.sd[f"{tkey}.bias"])
            self.used.add(f"{tkey}.bias")

    def variables(self):
        return {"params": self.params, "batch_stats": self.stats}

    def unused(self):
        return sorted(k for k in self.sd
                      if k not in self.used
                      and "num_batches_tracked" not in k)


def _convert_psa(cv: Converter, tprefix: str, *path):
    """PSA_s weights (PSA.py:146-269)."""
    for name in ("conv_q_right", "conv_v_right", "conv_q_left",
                 "conv_v_left"):
        cv.conv(f"{tprefix}.{name}", *path, name)
    cv.conv(f"{tprefix}.conv_up.0", *path, "conv_up_fc1")
    cv.ln(f"{tprefix}.conv_up.1", *path, "conv_up_ln", tshape="c11")
    cv.conv(f"{tprefix}.conv_up.3", *path, "conv_up_fc2")


def _convert_basic_block(cv, tprefix, fpath, psa=False):
    cv.conv(f"{tprefix}.conv1", *fpath, "cb1", "conv")
    cv.bn(f"{tprefix}.bn1", *fpath, "cb1", "bn")
    cv.conv(f"{tprefix}.conv2", *fpath, "cb2", "conv")
    cv.bn(f"{tprefix}.bn2", *fpath, "cb2", "bn")
    if psa and cv.probe(f"{tprefix}.deattn.conv_q_right.weight",
                        *fpath, "deattn"):
        _convert_psa(cv, f"{tprefix}.deattn", *fpath, "deattn")
    if cv.probe(f"{tprefix}.downsample.0.weight", *fpath, "down"):
        cv.conv(f"{tprefix}.downsample.0", *fpath, "down", "conv")
        cv.bn(f"{tprefix}.downsample.1", *fpath, "down", "bn")


def _convert_bottleneck(cv, tprefix, fpath):
    for i in (1, 2, 3):
        cv.conv(f"{tprefix}.conv{i}", *fpath, f"cb{i}", "conv")
        cv.bn(f"{tprefix}.bn{i}", *fpath, f"cb{i}", "bn")
    if cv.probe(f"{tprefix}.downsample.0.weight", *fpath, "down"):
        cv.conv(f"{tprefix}.downsample.0", *fpath, "down", "conv")
        cv.bn(f"{tprefix}.downsample.1", *fpath, "down", "bn")


def convert_pose_resnet(sd: Dict[str, np.ndarray], num_layers: int,
                        psa: bool = False):
    """pose_resnet[_psa] state_dict → flax variables
    (reference lib/models/pose_resnet.py structure)."""
    cv = Converter(sd)
    _map_pose_resnet(cv, num_layers, psa)
    return cv.variables(), cv.unused()


def _map_pose_resnet(cv: Converter, num_layers: int, psa: bool = False):
    from ..models.resnet import RESNET_SPEC
    block_cls, layers = RESNET_SPEC[num_layers]
    bottleneck = num_layers >= 50
    cv.conv("conv1", "backbone", "conv1")
    cv.bn("bn1", "backbone", "bn1")
    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            tp = f"layer{li + 1}.{bi}"
            fp = ("backbone", f"layer{li + 1}_{bi}")
            if bottleneck:
                _convert_bottleneck(cv, tp, fp)
            else:
                _convert_basic_block(cv, tp, fp, psa=psa)
    i = 0
    di = 0
    while cv.probe(f"deconv_layers.{i}.weight", "deconv", f"deconv{di}"):
        cv.conv(f"deconv_layers.{i}", "deconv", f"deconv{di}",
                transposed=True)
        cv.bn(f"deconv_layers.{i + 1}", "deconv", f"bn{di}")
        i += 3
        di += 1
    cv.conv("final_layer", "final_layer")


def convert_pose_hrnet(sd: Dict[str, np.ndarray], stages_cfg,
                       psa: bool = False):
    """pose_hrnet[_psa] state_dict → flax variables
    (reference lib/models/pose_hrnet.py structure; stages_cfg from
    models.hrnet.stage_cfg)."""
    cv = Converter(sd)
    _map_pose_hrnet(cv, stages_cfg, psa)
    return cv.variables(), cv.unused()


def _map_pose_hrnet(cv: Converter, stages_cfg, psa: bool = False):
    cv.conv("conv1", "stem1", "conv")
    cv.bn("bn1", "stem1", "bn")
    cv.conv("conv2", "stem2", "conv")
    cv.bn("bn2", "stem2", "bn")
    for bi in range(4):
        _convert_bottleneck(cv, f"layer1.{bi}", (f"layer1_{bi}",))

    n_prev = 1
    for si, (num_modules, nb, block, num_blocks, _) in enumerate(stages_cfg):
        t = si + 1  # transition index
        for i in range(nb):
            if cv.probe(f"transition{t}.{i}.0.weight", f"transition{t}_{i}"):
                # single Sequential(Conv,BN,ReLU): channel-change branch
                cv.conv(f"transition{t}.{i}.0", f"transition{t}_{i}", "conv")
                cv.bn(f"transition{t}.{i}.1", f"transition{t}_{i}", "bn")
            else:
                j = 0
                while cv.probe(f"transition{t}.{i}.{j}.0.weight",
                               f"transition{t}_{i}_{j}"):
                    cv.conv(f"transition{t}.{i}.{j}.0",
                            f"transition{t}_{i}_{j}", "conv")
                    cv.bn(f"transition{t}.{i}.{j}.1",
                          f"transition{t}_{i}_{j}", "bn")
                    j += 1
        basic = block == "BASIC"
        for mi in range(num_modules):
            tmod = f"stage{si + 2}.{mi}"
            fmod = f"stage{si + 2}_{mi}"
            for br in range(nb):
                for bi in range(num_blocks[br]):
                    tp = f"{tmod}.branches.{br}.{bi}"
                    fp = (fmod, f"branch{br}_{bi}")
                    if basic:
                        _convert_basic_block(cv, tp, fp, psa=psa)
                    else:
                        _convert_bottleneck(cv, tp, fp)
            # fuse layers
            for i in range(nb):
                for j in range(nb):
                    base = f"{tmod}.fuse_layers.{i}.{j}"
                    if j > i and cv.probe(f"{base}.0.weight",
                                          fmod, f"fuse{i}_{j}"):
                        cv.conv(f"{base}.0", fmod, f"fuse{i}_{j}")
                        cv.bn(f"{base}.1", fmod, f"fuse{i}_{j}_bn")
                    elif j == i and cv.probe(f"{base}.0.weight",
                                             fmod, f"fuse{i}_{j}"):
                        # last-module widening 1x1 (no BN)
                        cv.conv(f"{base}.0", fmod, f"fuse{i}_{j}")
                    elif j < i:
                        k = 0
                        while cv.probe(f"{base}.{k}.0.weight",
                                       fmod, f"fuse{i}_{j}_{k}"):
                            cv.conv(f"{base}.{k}.0", fmod, f"fuse{i}_{j}_{k}")
                            cv.bn(f"{base}.{k}.1", fmod,
                                  f"fuse{i}_{j}_{k}_bn")
                            k += 1
        n_prev = nb
    cv.conv("final_layer", "final_layer")


def _convert_cbr(cv: Converter, tprefix: str, *path, has_bn=True):
    """RSN conv_bn_relu (conv has bias)."""
    cv.conv(f"{tprefix}.conv", *path, "conv")
    if has_bn:
        cv.bn(f"{tprefix}.bn", *path, "bn")


def convert_rsn(sd: Dict[str, np.ndarray], stage_num: int,
                layers=(2, 2, 2, 2), plain=False, se=False, prm=False):
    """RSN state_dict → flax variables (RSN/exps/*/network.py structure).

    Note the torch model stores BN params even for has_bn=False convs
    (conv_bn_relu always builds a bn); those unused BNs never run, so their
    keys are ignored here only when absent from the flax tree — but RSN
    always uses has_bn=True, so every bn maps.
    """
    cv = Converter(sd)
    _map_rsn(cv, stage_num, layers, plain, se, prm)
    return cv.variables(), cv.unused()


def _map_rsn(cv: Converter, stage_num: int,
             layers=(2, 2, 2, 2), plain=False, se=False, prm=False):
    if cv.probe("top.conv.0.conv.weight", "top_conv0"):
        # SE/PRM experiment 3-conv stem (its network.py:188-202)
        for i in range(3):
            _convert_cbr(cv, f"top.conv.{i}", f"top_conv{i}")
    else:
        _convert_cbr(cv, "top.conv", "top")
    steps = ["cbr2_1_1", "cbr2_2_1", "cbr2_2_2", "cbr2_3_1", "cbr2_3_2",
             "cbr2_3_3", "cbr2_4_1", "cbr2_4_2", "cbr2_4_3", "cbr2_4_4"]
    for si in range(stage_num):
        td = f"stage{si}.downsample"
        fd = f"stage{si}_down"
        for li, blocks in enumerate(layers):
            for bi in range(blocks):
                tb = f"{td}.layer{li + 1}.{bi}"
                fb = (fd, f"layer{li + 1}_{bi}")
                if plain:
                    for i in (1, 2, 3):
                        _convert_cbr(cv, f"{tb}.conv_bn_relu{i}",
                                     *fb, f"cbr{i}")
                else:
                    _convert_cbr(cv, f"{tb}.conv_bn_relu1", *fb, "cbr1")
                    for s in steps:
                        tname = s.replace("cbr", "conv_bn_relu")
                        _convert_cbr(cv, f"{tb}.{tname}", *fb, s)
                    _convert_cbr(cv, f"{tb}.conv_bn_relu3", *fb, "cbr3")
                if cv.probe(f"{tb}.downsample.conv.weight", *fb, "down"):
                    _convert_cbr(cv, f"{tb}.downsample", *fb, "down")
                if se and cv.probe(f"{tb}.se.fc.0.weight", *fb, "se"):
                    cv.dense(f"{tb}.se.fc.0", *fb, "se", "fc1")
                    cv.dense(f"{tb}.se.fc.2", *fb, "se", "fc2")
        tu = f"stage{si}.upsample"
        fu = f"stage{si}_up"
        for ui in range(1, 5):
            tup = f"{tu}.up{ui}"
            fup = (fu, f"up{ui}")
            _convert_cbr(cv, f"{tup}.u_skip", *fup, "u_skip")
            if ui > 1:
                _convert_cbr(cv, f"{tup}.up_conv", *fup, "up_conv")
            _convert_cbr(cv, f"{tup}.res_conv1", *fup, "res_conv1")
            _convert_cbr(cv, f"{tup}.res_conv2", *fup, "res_conv2")
            if cv.probe(f"{tup}.skip1.conv.weight", *fup, "skip1"):
                _convert_cbr(cv, f"{tup}.skip1", *fup, "skip1")
                _convert_cbr(cv, f"{tup}.skip2", *fup, "skip2")
            if cv.probe(f"{tup}.cross_conv.conv.weight", *fup, "cross_conv"):
                _convert_cbr(cv, f"{tup}.cross_conv", *fup, "cross_conv")
            if prm and cv.probe(f"{tup}.prm.conv_bn_relu_prm_1.conv.weight",
                                *fup, "prm"):
                names = {"conv_bn_relu_prm_1": "prm1",
                         "conv_bn_relu_prm_2_1": "prm2_1",
                         "conv_bn_relu_prm_2_2": "prm2_2",
                         "conv_bn_relu_prm_3_1": "prm3_1",
                         "conv_bn_relu_prm_3_2": "prm3_2"}
                for tn, fn in names.items():
                    _convert_cbr(cv, f"{tup}.prm.{tn}", *fup, "prm", fn)


def flax_to_torch(variables, family: str, **kwargs) -> Dict[str, np.ndarray]:
    """REVERSE conversion: flax variables → reference-format torch
    state_dict (numpy values).  Walks the same family mapping code as the
    forward converters with structural probes answered from the flax tree,
    so ``torch_model.load_state_dict(strict=True)`` accepts the result —
    this is the portable-export bridge (a .pth the reference's own
    tools/export.py:21-56 can ONNX-ify).

    families: pose_resnet[_psa] (num_layers=), pose_hrnet[_psa]
    (stages_cfg=), rsn (stage_num=, layers=, plain=, se=, prm=).
    """
    cv = Converter({}, variables=variables, reverse=True)
    if family in ("pose_resnet", "pose_resnet_psa"):
        _map_pose_resnet(cv, kwargs["num_layers"],
                         psa=family.endswith("_psa"))
    elif family in ("pose_hrnet", "pose_hrnet_psa"):
        _map_pose_hrnet(cv, kwargs["stages_cfg"],
                        psa=family.endswith("_psa"))
    elif family == "rsn":
        _map_rsn(cv, kwargs["stage_num"],
                 layers=tuple(kwargs.get("layers", (2, 2, 2, 2))),
                 plain=kwargs.get("plain", False),
                 se=kwargs.get("se", False), prm=kwargs.get("prm", False))
    elif family == "pose_mobile":
        _map_pose_mobile(cv, kwargs["cfg"])
    else:
        raise KeyError(f"no reverse mapping for family {family!r}")
    return cv.sd


def torch_to_flax_from_cfg(sd, cfg):
    """Forward conversion with family arguments derived from a config:
    trained reference-format state_dict (or .pth path) → flax variables.
    Returns (variables, unused_keys)."""
    if isinstance(sd, (str, bytes)):
        sd = load_torch_state_dict(sd)
    name = cfg.MODEL.NAME
    extra = cfg.MODEL.EXTRA
    if name.startswith("pose_resnet"):
        return convert_pose_resnet(sd, extra.NUM_LAYERS,
                                   psa=name.endswith("_psa"))
    if name.startswith("pose_hrnet"):
        from ..models.hrnet import stage_cfg
        stages = tuple(
            stage_cfg(extra[k]["NUM_MODULES"], extra[k]["NUM_BRANCHES"],
                      extra[k]["BLOCK"], extra[k]["NUM_BLOCKS"],
                      extra[k]["NUM_CHANNELS"])
            for k in ("STAGE2", "STAGE3", "STAGE4"))
        return convert_pose_hrnet(sd, stages, psa=name.endswith("_psa"))
    if name == "rsn":
        return convert_rsn(
            sd, extra.get("STAGE_NUM", 1),
            layers=tuple(extra.get("LAYERS", (2, 2, 2, 2))),
            plain=extra.get("PLAIN_BOTTLENECK", False),
            se=extra.get("USE_SE", False), prm=extra.get("USE_PRM", False))
    if name.startswith(("pose_shufflenetv2", "pose_mobilenetv3",
                        "pose_mobilevit")):
        return convert_pose_mobile(sd, cfg)
    raise KeyError(f"no converter for model {name!r}")


def flax_to_torch_from_cfg(variables, cfg) -> Dict[str, np.ndarray]:
    """flax_to_torch with the family arguments derived from a config."""
    name = cfg.MODEL.NAME
    extra = cfg.MODEL.EXTRA
    if name in ("pose_resnet", "pose_resnet_psa"):
        return flax_to_torch(variables, name, num_layers=extra.NUM_LAYERS)
    if name in ("pose_hrnet", "pose_hrnet_psa"):
        from ..models.hrnet import stage_cfg
        stages = tuple(
            stage_cfg(extra[k]["NUM_MODULES"], extra[k]["NUM_BRANCHES"],
                      extra[k]["BLOCK"], extra[k]["NUM_BLOCKS"],
                      extra[k]["NUM_CHANNELS"])
            for k in ("STAGE2", "STAGE3", "STAGE4"))
        return flax_to_torch(variables, name, stages_cfg=stages)
    if name == "rsn":
        return flax_to_torch(
            variables, "rsn", stage_num=extra.get("STAGE_NUM", 1),
            layers=extra.get("LAYERS", (2, 2, 2, 2)),
            plain=extra.get("PLAIN_BOTTLENECK", False),
            se=extra.get("USE_SE", False),
            prm=extra.get("USE_PRM", False))
    if name.startswith(("pose_shufflenetv2", "pose_mobilenetv3",
                        "pose_mobilevit")):
        return flax_to_torch(variables, "pose_mobile", cfg=cfg)
    raise KeyError(f"no reverse mapping for model {name!r}")


def _convert_se_hardsigmoid(cv: Converter, tprefix: str, *path):
    """ShuffleNetV2+ SELayer (SE_opr: [1]=conv, [2]=bn, [4]=conv)."""
    cv.conv(f"{tprefix}.SE_opr.1", *path, "fc1")
    cv.bn(f"{tprefix}.SE_opr.2", *path, "bn")
    cv.conv(f"{tprefix}.SE_opr.4", *path, "fc2")


def _convert_shuffle_block(cv: Converter, tp: str, fp, xception: bool):
    """One ShuffleV2Block / Shufflenet / Shuffle_Xception."""
    if xception:
        pairs = [("0", "dw1"), ("2", "pw1"), ("5", "dw2"), ("7", "pw2"),
                 ("10", "dw3"), ("12", "pw3")]
        se_idx = 15
    else:
        pairs = [("0", "pw"), ("3", "dw"), ("5", "pwl")]
        se_idx = 8
    for ti, fn in pairs:
        cv.conv(f"{tp}.branch_main.{ti}", *fp, fn, "conv")
        cv.bn(f"{tp}.branch_main.{int(ti) + 1}", *fp, fn, "bn")
    if cv.probe(f"{tp}.branch_main.{se_idx}.SE_opr.1.weight", *fp, "se"):
        _convert_se_hardsigmoid(cv, f"{tp}.branch_main.{se_idx}", *fp, "se")
    if cv.probe(f"{tp}.branch_proj.0.weight", *fp, "proj_dw"):
        cv.conv(f"{tp}.branch_proj.0", *fp, "proj_dw", "conv")
        cv.bn(f"{tp}.branch_proj.1", *fp, "proj_dw", "bn")
        cv.conv(f"{tp}.branch_proj.2", *fp, "proj_pw", "conv")
        cv.bn(f"{tp}.branch_proj.3", *fp, "proj_pw", "bn")


def _map_shufflenetv2(cv: Converter, prefix="", fr=(), n_blocks=16,
                      arch=None):
    cv.conv(f"{prefix}first_conv.0", *fr, "first_conv", "conv")
    cv.bn(f"{prefix}first_conv.1", *fr, "first_conv", "bn")
    for i in range(n_blocks):
        xcep = arch is not None and arch[i] == 3
        _convert_shuffle_block(cv, f"{prefix}features.{i}",
                               (*fr, f"block{i}"), xcep)
    cv.conv(f"{prefix}conv_last.0", *fr, "conv_last", "conv")
    cv.bn(f"{prefix}conv_last.1", *fr, "conv_last", "bn")


def convert_shufflenetv2(sd: Dict[str, np.ndarray], prefix="",
                         n_blocks=16, arch=None):
    """ShuffleNetV2 / ShuffleNetV2+ backbone state_dict → flax params.

    ``arch`` is the '+'-variant block-type list (3 = Xception); None means
    the vanilla network.  Classifier heads (globalpool/fc/classifier/
    LastSE) are ignored.  Returns (variables, unused_keys).
    """
    cv = Converter(sd)
    _map_shufflenetv2(cv, prefix, (), n_blocks, arch)
    unused = [k for k in cv.unused()
              if not any(s in k for s in ("classifier", "fc.", "LastSE",
                                          "globalpool"))]
    return cv.variables(), unused


# ultralytics yolov5 v6.0 module indices → our layer names
_YOLO_LAYERS = [
    ("0", "b0", "conv"), ("1", "b1", "conv"), ("2", "b2", "c3"),
    ("3", "b3", "conv"), ("4", "b4", "c3"), ("5", "b5", "conv"),
    ("6", "b6", "c3"), ("7", "b7", "conv"), ("8", "b8", "c3"),
    ("9", "b9", "sppf"), ("10", "h10", "conv"), ("13", "h13", "c3"),
    ("14", "h14", "conv"), ("17", "h17", "c3"), ("18", "h18", "conv"),
    ("20", "h20", "c3"), ("21", "h21", "conv"), ("23", "h23", "c3"),
]


def _map_yolov5(cv: Converter):
    def conv_unit(tp, *path):
        cv.conv(f"{tp}.conv", *path, "conv")
        cv.bn(f"{tp}.bn", *path, "bn")

    def c3_unit(tp, *path):
        for cvname in ("cv1", "cv2", "cv3"):
            conv_unit(f"{tp}.{cvname}", *path, cvname)
        j = 0
        while cv.probe(f"{tp}.m.{j}.cv1.conv.weight", *path, f"m{j}"):
            conv_unit(f"{tp}.m.{j}.cv1", *path, f"m{j}", "cv1")
            conv_unit(f"{tp}.m.{j}.cv2", *path, f"m{j}", "cv2")
            j += 1

    for idx, name, kind in _YOLO_LAYERS:
        tp = idx
        if kind == "conv":
            conv_unit(tp, name)
        elif kind == "c3":
            c3_unit(tp, name)
        elif kind == "sppf":
            conv_unit(f"{tp}.cv1", name, "cv1")
            conv_unit(f"{tp}.cv2", name, "cv2")
    for li in range(3):
        cv.conv(f"24.m.{li}", f"detect{li}")


def convert_yolov5(sd: Dict[str, np.ndarray], variant: str = "n"):
    """ultralytics yolov5 (v6.0) state_dict ↔ flax variables for
    models/yolov5.YOLOv5.

    Accepts keys with or without the ``model.`` prefix (``attempt_load``
    checkpoints nest under ``model.model.{i}``).  Detect head biases/weights
    map to ``detect{0,1,2}``.  Returns (variables, unused_keys).
    """
    # normalise prefix: strip leading "model." once or twice
    def norm(k):
        while k.startswith("model."):
            k = k[len("model."):]
        return k
    sd = {norm(k): v for k, v in sd.items()}
    cv = Converter(sd)
    _map_yolov5(cv)
    unused = [k for k in cv.unused() if "anchor" not in k]
    return cv.variables(), unused


def flax_to_torch_yolov5(variables) -> Dict[str, np.ndarray]:
    """REVERSE: flax YOLOv5 variables → ultralytics-layout state_dict."""
    cv = Converter({}, variables=variables, reverse=True)
    _map_yolov5(cv)
    return cv.sd


def _convert_cna(cv: Converter, tkey: str, *path):
    """corenet ConvLayer (.block.conv [+ .block.norm]) → ConvNormAct."""
    cv.conv(f"{tkey}.block.conv", *path, "conv")
    if cv.probe(f"{tkey}.block.norm.weight", *path, "bn"):
        cv.bn(f"{tkey}.block.norm", *path, "bn")


def _convert_corenet_mv2(cv: Converter, tp: str, fp):
    """corenet InvertedResidual (backbones/mobilevit.py:239-366)."""
    if cv.probe(f"{tp}.block.exp_1x1.block.conv.weight", *fp, "exp_1x1"):
        _convert_cna(cv, f"{tp}.block.exp_1x1", *fp, "exp_1x1")
    _convert_cna(cv, f"{tp}.block.conv_3x3", *fp, "conv_3x3")
    _convert_cna(cv, f"{tp}.block.red_1x1", *fp, "red_1x1")


def _convert_mha(cv: Converter, tp: str, fp, dim: int, heads: int):
    """corenet MultiHeadAttention (combined qkv, backbones/mobilevit.py:
    369-466; qkv rows = [q;k;v], head-contiguous) ↔ flax MHDPA."""
    hd = dim // heads
    if cv.reverse:
        Ws, bs = [], []
        for name in ("query", "key", "value"):
            k = _get(cv.params, (*fp, "attn", name, "kernel"))
            Ws.append(np.ascontiguousarray(k.reshape(dim, dim).T))
            bs.append(_get(cv.params, (*fp, "attn", name,
                                       "bias")).reshape(dim))
        cv.sd[f"{tp}.qkv_proj.weight"] = np.concatenate(Ws, axis=0)
        cv.sd[f"{tp}.qkv_proj.bias"] = np.concatenate(bs, axis=0)
        ko = _get(cv.params, (*fp, "attn", "out", "kernel"))
        cv.sd[f"{tp}.out_proj.weight"] = np.ascontiguousarray(
            ko.reshape(dim, dim).T)
        cv.sd[f"{tp}.out_proj.bias"] = _get(cv.params,
                                            (*fp, "attn", "out", "bias"))
        return
    if cv.tolerant and f"{tp}.qkv_proj.weight" not in cv.sd:
        return
    W = cv.sd[f"{tp}.qkv_proj.weight"]
    b = cv.sd[f"{tp}.qkv_proj.bias"]
    for i, name in enumerate(("query", "key", "value")):
        _set(cv.params, (*fp, "attn", name, "kernel"),
             W[i * dim:(i + 1) * dim].T.reshape(dim, heads, hd))
        _set(cv.params, (*fp, "attn", name, "bias"),
             b[i * dim:(i + 1) * dim].reshape(heads, hd))
    _set(cv.params, (*fp, "attn", "out", "kernel"),
         cv.sd[f"{tp}.out_proj.weight"].T.reshape(heads, hd, dim))
    _set(cv.params, (*fp, "attn", "out", "bias"),
         cv.sd[f"{tp}.out_proj.bias"])
    cv.used.update({f"{tp}.qkv_proj.weight", f"{tp}.qkv_proj.bias",
                    f"{tp}.out_proj.weight", f"{tp}.out_proj.bias"})


# (mode, heads=4): transformer depth per vit stage + attn dims, from
# MOBILEVIT_SPEC in models/mobilevit.py (reference configs/mobilevit*.yaml)
_MOBILEVIT_STAGES = {
    "xx_small": ((64, 2), (80, 4), (96, 3)),
    "x_small": ((96, 2), (120, 4), (144, 3)),
    "small": ((144, 2), (192, 4), (240, 3)),
}


def _map_mobilevit(cv: Converter, mode: str = "small", prefix: str = "",
                   fr=(), heads: int = 4):
    p = prefix
    _convert_cna(cv, f"{p}conv_1", *fr, "conv_1")
    _convert_corenet_mv2(cv, f"{p}layer_1.0", (*fr, "layer1_0"))
    for i in range(3):
        _convert_corenet_mv2(cv, f"{p}layer_2.{i}", (*fr, f"layer2_{i}"))
    for li, (dim, L) in zip((3, 4, 5), _MOBILEVIT_STAGES[mode]):
        _convert_corenet_mv2(cv, f"{p}layer_{li}.0", (*fr, f"layer{li}_mv2"))
        tp = f"{p}layer_{li}.1"
        fp = (*fr, f"layer{li}_vit")
        _convert_cna(cv, f"{tp}.local_rep.conv_3x3", *fp, "local_3x3")
        cv.conv(f"{tp}.local_rep.conv_1x1.block.conv", *fp, "local_1x1")
        for b in range(L):
            base = f"{tp}.global_rep.{b}"
            tr = (*fp, f"tr{b}")
            cv.ln(f"{base}.pre_norm_mha.0", *tr, "ln1")
            _convert_mha(cv, f"{base}.pre_norm_mha.1", tr, dim, heads)
            cv.ln(f"{base}.pre_norm_ffn.0", *tr, "ln2")
            cv.dense(f"{base}.pre_norm_ffn.1", *tr, "fc1")
            cv.dense(f"{base}.pre_norm_ffn.4", *tr, "fc2")
        cv.ln(f"{tp}.global_rep.{L}", *fp, "ln_out")
        _convert_cna(cv, f"{tp}.conv_proj", *fp, "conv_proj")
        _convert_cna(cv, f"{tp}.fusion", *fp, "fusion")
    _convert_cna(cv, f"{p}conv_1x1_exp", *fr, "conv_1x1_exp")


def convert_mobilevit(sd: Dict[str, np.ndarray], mode: str = "small",
                      prefix: str = "", heads: int = 4):
    """Reference MobileViT backbone state_dict (backbones/mobilevit.py:931
    get_mobilevit / corenet layout) → flax MobileViT variables."""
    cv = Converter(sd)
    _map_mobilevit(cv, mode, prefix, (), heads)
    unused = [k for k in cv.unused() if "classifier" not in k]
    return cv.variables(), unused


def _map_mobilevitv2(cv: Converter, prefix: str = "", fr=()):
    p = prefix
    _convert_cna(cv, f"{p}conv_1", *fr, "conv_1")
    _convert_corenet_mv2(cv, f"{p}layer_1.0", (*fr, "layer1_0"))
    for i in range(2):
        _convert_corenet_mv2(cv, f"{p}layer_2.{i}", (*fr, f"layer2_{i}"))
    for li, L in zip((3, 4, 5), (2, 4, 3)):
        _convert_corenet_mv2(cv, f"{p}layer_{li}.0", (*fr, f"layer{li}_mv2"))
        tp = f"{p}layer_{li}.1"
        fp = (*fr, f"layer{li}_vit")
        _convert_cna(cv, f"{tp}.local_rep.0", *fp, "local_dw")
        cv.conv(f"{tp}.local_rep.1.block.conv", *fp, "local_1x1")
        for b in range(L):
            base = f"{tp}.global_rep.{b}"
            ab = (*fp, f"attn{b}")
            cv.ln(f"{base}.pre_norm_attn.0", *ab, "norm1")
            cv.conv(f"{base}.pre_norm_attn.1.qkv_proj.block.conv",
                    *ab, "attn", "qkv_proj")
            cv.conv(f"{base}.pre_norm_attn.1.out_proj.block.conv",
                    *ab, "attn", "out_proj")
            cv.ln(f"{base}.pre_norm_ffn.0", *ab, "norm2")
            cv.conv(f"{base}.pre_norm_ffn.1.block.conv", *ab, "ffn1")
            cv.conv(f"{base}.pre_norm_ffn.3.block.conv", *ab, "ffn2")
        cv.ln(f"{tp}.global_rep.{L}", *fp, "norm_out")
        _convert_cna(cv, f"{tp}.conv_proj", *fp, "conv_proj")


def convert_mobilevitv2(sd: Dict[str, np.ndarray], prefix: str = ""):
    """Reference MobileViTv2 backbone state_dict (backbones/mobilevitv2.py:
    1456 factory) → flax MobileViTv2 variables."""
    cv = Converter(sd)
    _map_mobilevitv2(cv, prefix, ())
    unused = [k for k in cv.unused() if "classifier" not in k]
    return cv.variables(), unused


def _map_mobilenetv3_small(cv: Converter, prefix: str = "features.",
                           fr=()):
    from ..models.mobile import MOBILENETV3_SMALL_SPEC
    p = prefix

    def cna(tkey, *path):
        cv.conv(f"{tkey}.0", *path, "conv")
        cv.bn(f"{tkey}.1", *path, "bn")

    cna(f"{p}0", *fr, "stem")
    in_ch = 16
    for bi, (exp, out, _k, _s, se, _act) in enumerate(MOBILENETV3_SMALL_SPEC):
        tb = f"{p}{bi + 1}.block"
        j = 0
        if exp != in_ch:
            cna(f"{tb}.{j}", *fr, f"b{bi}_expand")
            j += 1
        cna(f"{tb}.{j}", *fr, f"b{bi}_dw")
        j += 1
        if se:
            cv.conv(f"{tb}.{j}.fc1", *fr, f"b{bi}_se", "fc1")
            cv.conv(f"{tb}.{j}.fc2", *fr, f"b{bi}_se", "fc2")
            j += 1
        cna(f"{tb}.{j}", *fr, f"b{bi}_project")
        in_ch = out
    cna(f"{p}12", *fr, "conv_last")


def convert_mobilenetv3_small(sd: Dict[str, np.ndarray],
                              prefix: str = "features."):
    """torchvision mobilenet_v3_small features → flax MobileNetV3Small.

    ``prefix`` is whatever precedes the per-feature indices: raw
    torchvision uses ``features.``; the reference consumer
    (backbones/mobilenetv3.py:5-16) wraps ``Sequential(*children[:-2])``
    which flattens to a bare ``0.`` prefix.  Layout: {p}0 stem CNA,
    {p}1..11 InvertedResidual (.block.{i} sub-CNAs + SqueezeExcitation
    fc1/fc2), {p}12 last CNA."""
    cv = Converter(sd)
    _map_mobilenetv3_small(cv, prefix, ())
    unused = [k for k in cv.unused()
              if not any(s in k for s in ("classifier", "avgpool"))]
    return cv.variables(), unused


def _mobile_backbone_map(cv: Converter, cfg, tp: str = "backbone.",
                         fr=("backbone",)):
    """Dispatch the backbone part of a mobile pose wrapper by model name."""
    from ..models.mobile import SHUFFLENETV2_PLUS_ARCH
    name = cfg.MODEL.NAME
    if "shufflenetv2_plus" in name:
        _map_shufflenetv2(cv, tp, fr, n_blocks=20,
                          arch=SHUFFLENETV2_PLUS_ARCH)
    elif "shufflenetv2_10x" in name:
        _map_shufflenetv2(cv, tp, fr, n_blocks=16, arch=None)
    elif "mobilenetv3_small" in name:
        # reference wraps Sequential(features) → "backbone.0.<idx>" keys
        # (backbones/mobilenetv3.py:5-16)
        _map_mobilenetv3_small(cv, f"{tp}0.", fr)
    elif "mobilevitv2" in name:
        _map_mobilevitv2(cv, tp, fr)
    elif "mobilevit" in name:
        from ..models.pose_mobile import _mvit_mode
        _map_mobilevit(cv, _mvit_mode(cfg), tp, fr)
    else:
        raise KeyError(f"not a mobile pose model: {name!r}")


def _map_pose_mobile(cv: Converter, cfg):
    """Full mobile pose wrapper: backbone + deconv/pixel-shuffle head +
    final 1×1 (lib/models/pose_shufflenetv2_plus[_pixel_shuffle].py etc.;
    torch attrs backbone. / deconv_layers. | decoder. / final_layer)."""
    _mobile_backbone_map(cv, cfg)
    if "pixel_shuffle" in cfg.MODEL.NAME:
        cv.conv("decoder.conv_compress", "decoder", "conv_compress")
        arch = tuple(cfg.MODEL.EXTRA.get("ARCHITECTURE", (512, 256, 128)))
        for i in range(len(arch)):
            cv.conv(f"decoder.duc.{i}.conv", "decoder", f"duc{i}",
                    "cb", "conv")
            cv.bn(f"decoder.duc.{i}.bn", "decoder", f"duc{i}", "cb", "bn")
    else:
        i = di = 0
        while cv.probe(f"deconv_layers.{i}.weight", "deconv", f"deconv{di}"):
            cv.conv(f"deconv_layers.{i}", "deconv", f"deconv{di}",
                    transposed=True)
            cv.bn(f"deconv_layers.{i + 1}", "deconv", f"bn{di}")
            i += 3
            di += 1
    cv.conv("final_layer", "final_layer")


_CLASSIFIER_KEYS = ("classifier", "fc.", "LastSE", "globalpool", "avgpool")


def convert_shufflenetv2_test(sd: Dict[str, np.ndarray]):
    """backbones/shufflenetv2_test.py ShuffleNetV2 state_dict → flax
    variables for the registered ``shufflenetv2_test`` pose net.

    That experimental torch class bakes the decoder into the backbone
    (conv_compress / duc1..duc3 / final_layer at top level, :170-182);
    remap its keys into the registered pose-wrapper layout (backbone. /
    decoder.duc.N.) and delegate to :func:`convert_pose_mobile`."""
    remapped: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith(("first_conv", "features", "conv_last")):
            remapped["backbone." + k] = v
        elif k.startswith("conv_compress"):
            remapped["decoder." + k] = v
        elif k.startswith("duc"):
            i = int(k[3]) - 1                    # duc1 -> decoder.duc.0
            remapped[f"decoder.duc.{i}" + k[4:]] = v
        else:                                    # final_layer, classifier...
            remapped[k] = v

    class _NS:
        pass

    cfg = _NS(); cfg.MODEL = _NS()
    cfg.MODEL.NAME = "pose_shufflenetv2_10x_pixel_shuffle"
    cfg.MODEL.EXTRA = {"MODEL_SIZE": "1.0x", "START_CHANNELS": 256,
                       "ARCHITECTURE": (512, 256, 128),
                       "FINAL_CONV_KERNEL": 1}
    return convert_pose_mobile(remapped, cfg)


def convert_pose_mobile(sd: Dict[str, np.ndarray], cfg):
    """Trained mobile pose .pth → flax variables for MobilePoseNet.
    Returns (variables, unused_keys); the backbone's dead classifier-head
    keys (never run in the pose forward) are not reported."""
    cv = Converter(sd)
    _map_pose_mobile(cv, cfg)
    unused = [k for k in cv.unused()
              if not any(s in k for s in _CLASSIFIER_KEYS)]
    return cv.variables(), unused


def _is_map(x):
    return hasattr(x, "items") and not hasattr(x, "shape")


def _deep_merge(base, update):
    """Leaf-wise overlay of ``update`` onto ``base`` (mappings of
    mappings; FrozenDicts come back as plain dicts)."""
    out = dict(base)
    for k, v in update.items():
        if k in out and _is_map(out[k]) and _is_map(v):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def count_leaves(tree):
    return (sum(count_leaves(v) for v in tree.values())
            if isinstance(tree, dict) else 1)


def load_pretrained(variables, pretrained, cfg):
    """``MODEL.PRETRAINED`` semantics of the reference train CLI: graft a
    (possibly partial) torch checkpoint onto freshly-initialised flax
    variables before training.

    Reference behaviour replicated:
    * hrnet/resnet — filter keys by ``EXTRA.PRETRAINED_LAYERS`` top-level
      names ('*' = all) and skip ``stage4.2.fuse_layers`` (the pose net's
      widened last-fuse differs from the classification checkpoint),
      strict=False load (pose_hrnet.py:473-505, pose_resnet.py deconv
      head stays fresh).
    * mobile wrappers — the backbone factory loads the ImageNet
      checkpoint strict=False (e.g. shufflenetv2_plus.py:359-366,
      backbones/mobilevit.py:931-935); bare backbone keys are grafted
      under ``backbone``; a full pose checkpoint (``backbone.``-prefixed)
      loads wholesale.

    ``pretrained``: path to a .pth/.pt file or a ready state-dict mapping.
    Returns (merged_variables, n_loaded_leaves).
    """
    sd = (load_torch_state_dict(pretrained)
          if isinstance(pretrained, (str, bytes)) else dict(pretrained))
    name = cfg.MODEL.NAME
    extra = cfg.MODEL.EXTRA
    if name.startswith(("pose_hrnet", "pose_resnet")):
        pl = list(extra.get("PRETRAINED_LAYERS", ["*"]))
        if pl and pl[0] != "*":
            sd = {k: v for k, v in sd.items() if k.split(".")[0] in pl}
    if name.startswith("pose_hrnet"):
        # pose_hrnet.py:497 (hard-coded last-module index of w32/w48)
        sd = {k: v for k, v in sd.items()
              if "stage4.2.fuse_layers" not in k}

    cv = Converter(sd, tolerant=True)
    if name.startswith("pose_resnet"):
        _map_pose_resnet(cv, extra.NUM_LAYERS, psa=name.endswith("_psa"))
    elif name.startswith("pose_hrnet"):
        from ..models.hrnet import stage_cfg
        stages = tuple(
            stage_cfg(extra[k]["NUM_MODULES"], extra[k]["NUM_BRANCHES"],
                      extra[k]["BLOCK"], extra[k]["NUM_BLOCKS"],
                      extra[k]["NUM_CHANNELS"])
            for k in ("STAGE2", "STAGE3", "STAGE4"))
        _map_pose_hrnet(cv, stages, psa=name.endswith("_psa"))
    elif name == "rsn":
        _map_rsn(cv, extra.get("STAGE_NUM", 1),
                 layers=tuple(extra.get("LAYERS", (2, 2, 2, 2))),
                 plain=extra.get("PLAIN_BOTTLENECK", False),
                 se=extra.get("USE_SE", False),
                 prm=extra.get("USE_PRM", False))
    elif name.startswith(("pose_shufflenetv2", "pose_mobilenetv3",
                          "pose_mobilevit")):
        if any(k.startswith("backbone.") for k in sd):
            _map_pose_mobile(cv, cfg)          # full pose checkpoint
        else:
            # bare ImageNet backbone: detect the torchvision prefix for
            # mobilenetv3 ('features.' raw vs '0.' when Sequential-wrapped)
            tp = ""
            if "mobilenetv3" in name:
                tp = ("features." if any(k.startswith("features.")
                                         for k in sd) else "0.")
                _map_mobilenetv3_small(cv, tp, ("backbone",))
            elif "shufflenetv2_plus" in name:
                from ..models.mobile import SHUFFLENETV2_PLUS_ARCH
                _map_shufflenetv2(cv, tp, ("backbone",), n_blocks=20,
                                  arch=SHUFFLENETV2_PLUS_ARCH)
            elif "shufflenetv2" in name:
                _map_shufflenetv2(cv, tp, ("backbone",), n_blocks=16)
            elif "mobilevitv2" in name:
                _map_mobilevitv2(cv, tp, ("backbone",))
            else:
                from ..models.pose_mobile import _mvit_mode
                _map_mobilevit(cv, _mvit_mode(cfg), tp, ("backbone",))
    else:
        raise KeyError(f"no pretrained mapping for model {name!r}")

    loaded = cv.variables()
    # shape-guard each grafted leaf against the fresh init: e.g. an
    # ImageNet hrnet CLASSIFICATION checkpoint with PRETRAINED_LAYERS '*'
    # carries a final_layer whose cls-head shape must not clobber the
    # pose head (torch strict=False raises on size mismatch; here the
    # mismatched leaf is skipped and reported)
    skipped = []

    def _prune(fresh, update, path=()):
        out = {}
        for k, v in update.items():
            if _is_map(v):
                out[k] = _prune(fresh.get(k, {}) if _is_map(fresh) else {},
                                v, path + (k,))
            elif (_is_map(fresh) and k in fresh
                  and not _is_map(fresh[k])
                  and tuple(np.shape(fresh[k])) != tuple(np.shape(v))):
                skipped.append("/".join(path + (k,)))
            else:
                out[k] = v
        return out

    loaded = {"params": _prune(variables["params"], loaded["params"]),
              "batch_stats": _prune(variables.get("batch_stats", {}),
                                    loaded["batch_stats"])}
    if skipped:
        import logging
        logging.getLogger(__name__).warning(
            "pretrained: skipped %d shape-mismatched leaves (e.g. %s)",
            len(skipped), skipped[:3])
    merged = {"params": _deep_merge(variables["params"], loaded["params"])}
    if "batch_stats" in variables:
        merged["batch_stats"] = _deep_merge(variables["batch_stats"],
                                            loaded["batch_stats"])
    return merged, count_leaves(loaded["params"]) + count_leaves(
        loaded["batch_stats"])


def check_against_model(variables, model, input_shape):
    """Shape-check converted variables against a fresh init; raises on
    mismatch, returns the converted tree with init's missing leaves."""
    import jax
    import jax.numpy as jnp

    ref = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros(input_shape, jnp.float32),
                             train=False), jax.random.PRNGKey(0))

    flat_ref = _flatten(ref)
    flat_new = _flatten(variables)
    missing = sorted(set(flat_ref) - set(flat_new))
    extra = sorted(set(flat_new) - set(flat_ref))
    if missing or extra:
        raise ValueError(f"conversion mismatch: missing={missing[:10]} "
                         f"extra={extra[:10]} "
                         f"(counts {len(missing)}/{len(extra)})")
    for k, v in flat_new.items():
        if tuple(flat_ref[k].shape) != tuple(np.shape(v)):
            raise ValueError(
                f"shape mismatch at {k}: torch {np.shape(v)} vs "
                f"flax {tuple(flat_ref[k].shape)}")
    return variables


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out["/".join(prefix)] = tree
    return out
