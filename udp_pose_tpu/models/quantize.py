"""Post-training int8 quantization (w8a8) as a first-class serving mode.

The TPU v5e MXU executes int8 dots at ~2-3x the bf16 rate (measured 479
vs 148 Top/s on a 4k matmul here), and the HRNet stages run MXU-bound at
51-56% of bf16 peak (DESIGN.md round-2 study) — so int8 is the one
remaining >1.5x single-chip inference lever after the bf16 ceiling was
pinned as structural.  The reference only reaches int8 by exporting
through MNN/OpenVINO (deep_hrnet/scripts/export_mnn.sh); here it is
native.

Scheme (standard PTQ):
  * weights: symmetric per-output-channel int8,
  * activations: symmetric per-tensor int8, amax-calibrated on
    representative batches,
  * conv accumulates in int32; dequant (scale * s_a * s_w + bias) is an
    elementwise epilogue XLA fuses into the conv; BatchNorm, residual
    adds, attention and decode all stay in bf16/fp32.

Only ``nn.Conv`` calls are replaced — via a flax method interceptor
(``nn.intercept_methods``) — so every Flax model in the zoo quantizes
without model changes, and the un-quantized fallback path is byte-for-
byte the original module.
"""

from __future__ import annotations

import fnmatch
import json
from typing import Any, Dict, Iterable, Mapping, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# Keep the output heads in fp by default: their cost is negligible and
# downstream consumers read their values directly — the sub-pixel decode
# (DARK Taylor / UDP offset) for pose nets, the box/objectness decode for
# the YOLOv5 detector ("detect*", models/yolov5.py:166), and RSN's
# per-unit heatmap convs ("*res_conv2*", models/rsn.py:233 — every
# UpsampleUnit's res output feeds the gaussian-blur quarter-offset
# decode / the stage-wise loss directly).
DEFAULT_SKIP = ("final_layer", "*final*", "*attn*", "*deattn*", "detect*",
                "*res_conv2*")


def _is_plain_conv(mod) -> bool:
    """True for nn.Conv instances the int8 path supports (no transposed
    convs, no circular padding, no input dilation)."""
    if type(mod) is not nn.Conv:
        return False
    if isinstance(mod.padding, str) and mod.padding.upper() == "CIRCULAR":
        return False
    in_dil = getattr(mod, "input_dilation", None)
    if in_dil not in (None, 1, (1,), (1, 1)):
        return False
    return True


def _pair(v, default=1):
    if v is None:
        return (default, default)
    if isinstance(v, int):
        return (v, v)
    t = tuple(v)
    return t if len(t) == 2 else (t[0], t[0])


def _conv_padding(mod):
    p = mod.padding
    if isinstance(p, str):
        return p
    if isinstance(p, int):
        return ((p, p), (p, p))
    out = []
    for e in p:
        out.append((e, e) if isinstance(e, int) else tuple(e))
    return tuple(out)


def _path_of(mod) -> str:
    return "/".join(str(p) for p in mod.path)


def _matches(path: str, patterns: Iterable[str]) -> bool:
    return any(fnmatch.fnmatch(path, pat) or path.endswith(pat)
               for pat in patterns)


# --------------------------------------------------------------------------
# Calibration
# --------------------------------------------------------------------------

def collect_conv_amax(model, variables, *args, skip: Sequence[str] = (),
                      **kwargs) -> Dict[str, jnp.ndarray]:
    """One forward pass recording per-conv-site input amax.

    Returns ``{conv_path: scalar amax}`` as traced values — jit-friendly,
    so calibration over many batches is one compiled graph per shape.
    """
    sink: Dict[str, jnp.ndarray] = {}

    def rec(next_fun, a, kw, context):
        mod = context.module
        if (_is_plain_conv(mod) and context.method_name == "__call__"
                and not _matches(_path_of(mod), skip)):
            sink[_path_of(mod)] = jnp.max(jnp.abs(a[0].astype(jnp.float32)))
        return next_fun(*a, **kw)

    with nn.intercept_methods(rec):
        model.apply(variables, *args, **kwargs)
    return sink


def calibrate(model, variables, batches: Iterable, *,
              skip: Sequence[str] = DEFAULT_SKIP,
              apply_kwargs: Optional[Mapping[str, Any]] = None
              ) -> Dict[str, float]:
    """Run ``batches`` (iterable of input arrays) through the model and
    return the running per-site input amax — the activation calibration
    table for :class:`QuantizedModel`."""
    kw = dict(apply_kwargs or {})
    kw.setdefault("train", False)

    step = jax.jit(lambda v, x: collect_conv_amax(model, v, x, skip=skip,
                                                  **kw))
    amax: Dict[str, float] = {}
    for x in batches:
        got = jax.device_get(step(variables, x))
        for k, v in got.items():
            amax[k] = max(amax.get(k, 0.0), float(v))
    return amax


def save_act_scales(path: str, amax: Mapping[str, float]) -> None:
    with open(path, "w") as f:
        json.dump(dict(amax), f, indent=1, sort_keys=True)


def load_act_scales(path: str) -> Dict[str, float]:
    with open(path) as f:
        return {str(k): float(v) for k, v in json.load(f).items()}


def load_act_scales_maybe(act_scales):
    """str path → loaded table; dict/None pass through unchanged."""
    if isinstance(act_scales, str):
        return load_act_scales(act_scales)
    return act_scales


class Calibrator:
    """Running per-site input-amax accumulator with a freeze threshold —
    the ONE state machine behind every self-calibrating engine
    (UdpPosePipeline, FusedDetectPose's detector,
    build_flax_yolo_detector): fold collected batches with max(), count
    them, freeze into a table after ``calib_batches``."""

    def __init__(self, calib_batches):
        self.batches = max(1, int(calib_batches))
        self.amax: Dict[str, float] = {}
        self.seen = 0

    def update(self, got: Mapping[str, Any]) -> bool:
        """Fold one collected batch; True once the table should freeze."""
        for k, v in got.items():
            self.amax[k] = max(self.amax.get(k, 0.0), float(v))
        self.seen += 1
        return self.seen >= self.batches

    def table(self) -> Dict[str, float]:
        return dict(self.amax)


# --------------------------------------------------------------------------
# Quantized apply
# --------------------------------------------------------------------------

def quantize_kernel(kernel):
    """Symmetric per-output-channel int8 weight quantization:
    ``(kh, kw, cin/g, cout) fp -> (int8 kernel, per-cout fp32 scale)``."""
    k = kernel.astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12)
    w_i8 = jnp.clip(jnp.round(k / s_w), -127, 127).astype(jnp.int8)
    return w_i8, s_w


def _quantized_conv(mod, x, amax: float, prepared=None):
    """int8 w8a8 replacement for one nn.Conv call (NHWC).

    ``prepared``: optional ``{"kernel_i8", "scale"}`` from
    :meth:`QuantizedModel.prepare_variables` — the pre-quantized kernel;
    without it the (identical) quantization math runs in-graph, paying an
    O(kernel) requant pass every forward."""
    params = mod.variables["params"]
    if prepared is not None:
        w_i8 = prepared["kernel_i8"]
        s_w = prepared["scale"].astype(jnp.float32)
    else:
        w_i8, s_w = quantize_kernel(params["kernel"])

    s_a = max(float(amax), 1e-12) / 127.0
    x_f = x.astype(jnp.float32)
    x_i8 = jnp.clip(jnp.round(x_f * (1.0 / s_a)), -127, 127).astype(jnp.int8)

    dn = lax.conv_dimension_numbers(x.shape, w_i8.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x_i8, w_i8, _pair(mod.strides), _conv_padding(mod),
        rhs_dilation=_pair(getattr(mod, "kernel_dilation", 1)),
        dimension_numbers=dn,
        feature_group_count=getattr(mod, "feature_group_count", 1),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_a * s_w)
    if mod.use_bias:
        y = y + params["bias"].astype(jnp.float32)
    out_dtype = mod.dtype if mod.dtype is not None else x.dtype
    return y.astype(out_dtype)


def _ste(real, quantized):
    """Straight-through estimator: forward the quantized value, pass the
    gradient through as if it were the identity."""
    return real + lax.stop_gradient(quantized - real)


def _fake_quant_conv(mod, x, amax=None):
    """Fake-quantized (QAT) replacement for one nn.Conv call.

    Simulates the int8 serving path of :func:`_quantized_conv` in fp —
    inputs snap to the symmetric per-tensor int8 grid and kernels to the
    per-output-channel grid, but the conv itself runs in fp so gradients
    flow (straight-through).  ``amax=None`` uses the current batch's
    dynamic amax (training); a float freezes the deployment grid so eval
    matches :class:`QuantizedModel` bit-for-grid.
    """
    params = mod.variables["params"]
    k = params["kernel"].astype(jnp.float32)
    s_w = lax.stop_gradient(
        jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0, 1e-12))
    k_q = _ste(k, jnp.clip(jnp.round(k / s_w), -127, 127) * s_w)

    x_f = x.astype(jnp.float32)
    if amax is None:
        a = lax.stop_gradient(jnp.max(jnp.abs(x_f)))
        s_a = jnp.maximum(a / 127.0, 1e-12)
    else:
        s_a = max(float(amax), 1e-12) / 127.0
    x_q = _ste(x_f, jnp.clip(jnp.round(x_f / s_a), -127, 127) * s_a)

    dn = lax.conv_dimension_numbers(x.shape, k_q.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x_q, k_q, _pair(mod.strides), _conv_padding(mod),
        rhs_dilation=_pair(getattr(mod, "kernel_dilation", 1)),
        dimension_numbers=dn,
        feature_group_count=getattr(mod, "feature_group_count", 1))
    if mod.use_bias:
        y = y + params["bias"].astype(jnp.float32)
    out_dtype = mod.dtype if mod.dtype is not None else x.dtype
    return y.astype(out_dtype)


class FakeQuantModel:
    """QAT adapter: every supported conv runs fake-quantized (STE).

    Wrap the model BEFORE ``create_train_state`` / ``make_infer_fn`` — the
    adapter delegates ``.init`` and attributes, and its ``.apply`` is a
    drop-in (mutable batch_stats, train=True all work), so the standard
    train step optimizes through the quantization grid with zero changes.
    The weights that come out deploy through :class:`QuantizedModel` with
    a post-training amax calibration, exactly like PTQ — but having
    trained against the grid, the drift the PTQ tests bound is reduced to
    (near-)zero.

    ``act_scales``: ``None`` → per-batch dynamic activation amax (the
    standard QAT recipe — nothing saturates, so the STE is exact);
    a calibration table → the frozen deployment grid, making eval output
    match the int8 serving path up to fp-vs-int32 accumulation order.
    """

    def __init__(self, model, act_scales: Optional[Mapping[str, float]] = None,
                 skip: Sequence[str] = DEFAULT_SKIP,
                 min_in_channels: int = 0):
        self.model = model
        self.act_scales = None if act_scales is None else dict(act_scales)
        self.skip = tuple(skip)
        self.min_in_channels = int(min_in_channels)
        #: conv paths actually fake-quantized (filled at trace time)
        self.engaged = set()

    def __getattr__(self, name):
        return getattr(self.model, name)

    def _interceptor(self, next_fun, args, kwargs, context):
        mod = context.module
        if not (_is_plain_conv(mod) and context.method_name == "__call__"):
            return next_fun(*args, **kwargs)
        path = _path_of(mod)
        if _matches(path, self.skip):
            return next_fun(*args, **kwargs)
        if self.act_scales is not None and path not in self.act_scales:
            return next_fun(*args, **kwargs)
        kernel = mod.variables["params"]["kernel"]
        if kernel.shape[2] * getattr(mod, "feature_group_count", 1) \
                < self.min_in_channels:
            return next_fun(*args, **kwargs)
        self.engaged.add(path)
        amax = None if self.act_scales is None else self.act_scales[path]
        return _fake_quant_conv(mod, args[0], amax)

    def apply(self, variables, *args, **kwargs):
        with nn.intercept_methods(self._interceptor):
            return self.model.apply(variables, *args, **kwargs)


class QuantizedModel:
    """Drop-in ``.apply`` adapter running every calibrated conv in int8.

    Works anywhere the framework passes a model with an ``apply``
    (``make_infer_fn``, engines, export): sites present in ``act_scales``
    and not matched by ``skip`` run as int8 convs; everything else is the
    original module code.
    """

    def __init__(self, model, act_scales: Mapping[str, float],
                 skip: Sequence[str] = DEFAULT_SKIP,
                 min_in_channels: int = 0):
        self.model = model
        self.act_scales = dict(act_scales)
        self.skip = tuple(skip)
        # Sites whose contraction dim (9*C_in for a 3x3) underfills the
        # MXU see no int8 win but still pay the quant/dequant passes —
        # the v5e sweep (DESIGN.md round-3 int8 study) measured full
        # quantization ≈ C_in>=64 within noise; 0 quantizes every
        # calibrated site.
        self.min_in_channels = int(min_in_channels)
        #: conv paths actually replaced with int8 (filled at trace time)
        self.engaged = set()

    def __getattr__(self, name):               # delegate e.g. .init, attrs
        return getattr(self.model, name)

    def _interceptor(self, next_fun, args, kwargs, context):
        mod = context.module
        if not (_is_plain_conv(mod) and context.method_name == "__call__"):
            return next_fun(*args, **kwargs)
        path = _path_of(mod)
        if path not in self.act_scales or _matches(path, self.skip):
            return next_fun(*args, **kwargs)
        kernel = mod.variables["params"]["kernel"]
        if kernel.shape[2] * getattr(mod, "feature_group_count", 1) \
                < self.min_in_channels:
            return next_fun(*args, **kwargs)
        self.engaged.add(path)
        prepared = mod.variables.get("quant")
        if prepared is not None and "kernel_i8" not in prepared:
            prepared = None                    # no entry for this site
        return _quantized_conv(mod, args[0], self.act_scales[path], prepared)

    def apply(self, variables, *args, **kwargs):
        with nn.intercept_methods(self._interceptor):
            return self.model.apply(variables, *args, **kwargs)

    def prepare_variables(self, variables):
        """One-time per-channel weight quantization for every calibrated,
        non-skipped site: returns ``variables`` augmented with a 'quant'
        collection (mirroring the params tree) that the interceptor
        consumes instead of requantizing the fp kernel inside every
        serving forward — one dispatch here removes an O(params)
        requant pass + the duplicate int8 kernel materialization per step.
        Sites the interceptor declines at trace time (min_in_channels)
        just leave their entry unused.  Idempotent."""
        if not self.act_scales or "quant" in variables:
            return variables
        params = variables["params"]

        def leaf_of(path):
            node = params
            for part in path.split("/"):
                if not isinstance(node, Mapping) or part not in node:
                    return None
                node = node[part]
            return node if isinstance(node, Mapping) else None

        todo = {}
        for path in self.act_scales:
            if _matches(path, self.skip):
                continue
            leaf = leaf_of(path)
            if leaf is not None and "kernel" in leaf:
                todo[path] = leaf["kernel"]
        if not todo:
            return variables

        prep = jax.jit(lambda ks: {p: quantize_kernel(k)
                                   for p, k in ks.items()})
        done = prep(todo)
        quant: Dict[str, Any] = {}
        for path, (w_i8, s_w) in done.items():
            node = quant
            parts = path.split("/")
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = {"kernel_i8": w_i8, "scale": s_w}
        return {**variables, "quant": quant}


def quantize_for_eval(cfg, model, variables, dataset):
    """``TPU.QUANTIZE int8`` serving wrap shared by the eval CLIs
    (tools/test.py, tools/reproduce_zoo.py): amax-calibrate on the first
    ``TPU.QUANTIZE_CALIB_BATCHES`` val batches — the SAME input
    distribution serving feeds the net (core.infer.serving_normalizer) —
    then serve w8a8 with prepared kernels.  No-op unless the cfg asks
    for int8; returns (model, variables)."""
    if cfg.TPU.QUANTIZE != "int8":
        return model, variables
    import itertools

    from ..core.infer import cast_to_compute_dtype, serving_normalizer
    from ..data.base import epoch_loader

    normalize_images = serving_normalizer(cfg)
    n_calib = max(1, cfg.TPU.QUANTIZE_CALIB_BATCHES)
    # amax is measured on the EXACT distribution serving feeds the stem
    # conv — normalized AND early-cast to the compute dtype (advisor r4:
    # fp32 calibration vs bf16-cast serving skews the stem's scale)
    batches = (cast_to_compute_dtype(model, normalize_images(b["image"]))
               for b in itertools.islice(
        epoch_loader(dataset, cfg.TEST.BATCH_SIZE_PER_GPU, shuffle=False,
                     drop_last=False), n_calib))
    scales = calibrate(model, variables, batches)
    qm = QuantizedModel(model, scales)
    return qm, qm.prepare_variables(variables)
