"""ONNX export trust hardening (VERDICT r2 Missing #5 / item 6).

1. Golden-byte fixtures: one tiny model per family exported with fully
   deterministic weights; the artifact's sha256 + structural digest are
   pinned in tests/fixtures/onnx_golden.json so ANY writer/builder
   regression diffs loudly.  Refresh intentionally with
   ``UPDATE_ONNX_GOLDEN=1 pytest tests/test_onnx_golden.py``.
2. Stock-consumer gate: when the real ``onnx`` / ``onnxruntime``
   packages exist (not in this image), every artifact goes through
   onnx.checker and onnxruntime with output parity vs flax — the first
   environment that has them validates every byte (reference contract:
   deep_hrnet/tools/export.py:56).
"""

import hashlib
import json
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))
from test_onnx_export import (_base_cfg, _small_variables,  # noqa: E402
                              HRNET_EXTRA_SMALL)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "onnx_golden.json")


def _try_import_flag(name):
    import importlib
    try:
        importlib.import_module(name)
        return True
    except ImportError:
        return False


def _families():
    """(family key, cfg) — one tiny deterministic model per export
    family."""
    out = {}

    cfg = _base_cfg("pose_resnet", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 2,
        "NUM_DECONV_FILTERS": [64, 64], "NUM_DECONV_KERNELS": [4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    out["pose_resnet18"] = cfg

    cfg = _base_cfg("pose_hrnet", "offset")
    cfg.MODEL.EXTRA.merge_from_dict(HRNET_EXTRA_SMALL)
    out["pose_hrnet_tiny"] = cfg

    cfg = _base_cfg("pose_shufflenetv2_plus", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict({
        "MODEL_SIZE": "Small", "NUM_DECONV_LAYERS": 2,
        "NUM_DECONV_FILTERS": [64, 64], "NUM_DECONV_KERNELS": [4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    out["pose_shufflenetv2_plus"] = cfg

    cfg = _base_cfg("rsn", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict({
        "STAGE_NUM": 1, "UPSAMPLE_CHANNEL_NUM": 32,
        "LAYERS": [1, 1, 1, 1]})
    out["rsn_tiny"] = cfg
    return out


def _export(cfg):
    from udp_pose_tpu.export import export_onnx_from_cfg
    from udp_pose_tpu.models import build_model

    model = build_model(cfg)
    w, h = cfg.MODEL.IMAGE_SIZE
    variables = _small_variables(model, (1, h, w, 3), seed=11)
    return export_onnx_from_cfg(variables, cfg, batch=1), model, variables


def _digest(blob):
    from udp_pose_tpu.export.onnx_pb import load_model
    m = load_model(blob)
    ops = sorted({n.op_type for n in m.graph.nodes})
    return {
        "sha256": hashlib.sha256(blob).hexdigest(),
        "n_bytes": len(blob),
        "ir_version": m.ir_version,
        "opset": m.opset,
        "n_nodes": len(m.graph.nodes),
        "n_initializers": len(m.graph.initializers),
        "ops": ops,
    }


def test_golden_bytes_per_family():
    families = _families()
    digests = {k: _digest(_export(c)[0]) for k, c in families.items()}

    if os.environ.get("UPDATE_ONNX_GOLDEN"):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        with open(FIXTURE, "w") as f:
            json.dump(digests, f, indent=1, sort_keys=True)
        pytest.skip("golden fixture refreshed")

    assert os.path.exists(FIXTURE), \
        "run UPDATE_ONNX_GOLDEN=1 pytest tests/test_onnx_golden.py once"
    with open(FIXTURE) as f:
        golden = json.load(f)
    assert set(golden) == set(digests)
    for fam, d in digests.items():
        g = golden[fam]
        # structural diff first (loud + debuggable), then the byte hash
        for key in ("ir_version", "opset", "n_nodes", "n_initializers",
                    "ops", "n_bytes"):
            assert d[key] == g[key], (fam, key, d[key], g[key])
        assert d["sha256"] == g["sha256"], (
            fam, "artifact bytes changed with identical structure — "
            "writer wire-format regression (or refresh the fixture "
            "deliberately with UPDATE_ONNX_GOLDEN=1)")


@pytest.mark.skipif(not _try_import_flag("onnx"),
                    reason="stock onnx package not installed")
def test_stock_onnx_checker_accepts_every_family():
    import onnx
    for fam, cfg in _families().items():
        blob, _model, _variables = _export(cfg)
        m = onnx.load_from_string(blob)
        onnx.checker.check_model(m, full_check=True)


@pytest.mark.skipif(not _try_import_flag("onnxruntime"),
                    reason="onnxruntime not installed")
def test_onnxruntime_output_parity_every_family():
    import onnxruntime as ort
    for fam, cfg in _families().items():
        blob, model, variables = _export(cfg)
        w, h = cfg.MODEL.IMAGE_SIZE
        rng = np.random.default_rng(5)
        x = rng.standard_normal((1, 3, h, w)).astype(np.float32)
        sess = ort.InferenceSession(blob)
        (ort_out,) = sess.run(None, {sess.get_inputs()[0].name: x})
        ours = np.asarray(model.apply(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
            train=False)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(ort_out, ours, rtol=1e-3, atol=1e-4)
