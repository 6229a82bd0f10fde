"""tools/reproduce_zoo.py end-to-end on synthetic mini-COCO
(VERDICT r2 Missing #1): a fake manifest whose expected value comes from
a direct validate() run must pass with delta 0; a shifted expectation,
a missing-weights entry, and a broken config must all fail the run (and
--skip-missing must downgrade only the missing-weights case)."""

import io
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ref_harness import make_mini_coco  # noqa: E402

# multi-device compiles / subprocess drives: slow tier (pytest.ini)
pytestmark = pytest.mark.slow


def _tiny_cfg(root):
    from udp_pose_tpu.config import default_config
    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.TARGET_TYPE = "gaussian"
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.MODEL.INIT_WEIGHTS = False
    cfg.TPU.DTYPE = "float32"
    cfg.DATASET.DATASET = "coco"
    cfg.DATASET.ROOT = root
    cfg.DATASET.TEST_SET = "val2017"
    cfg.DATASET.COLOR_RGB = True
    cfg.TEST.USE_GT_BBOX = True
    cfg.TEST.FLIP_TEST = False
    cfg.TEST.BATCH_SIZE_PER_GPU = 4
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [256, 256, 256],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    return cfg


@pytest.fixture(scope="module")
def zoo_env(tmp_path_factory):
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from udp_pose_tpu.core.validate import validate
    from udp_pose_tpu.data.coco import COCODataset
    from udp_pose_tpu.models import build_model

    tmp = tmp_path_factory.mktemp("zoo")
    root = str(tmp / "data")
    make_mini_coco(root, n_images=5, seed=11)
    cfg = _tiny_cfg(root)
    with open(tmp / "tiny.yaml", "w") as f:
        f.write(cfg.dump())

    model = build_model(cfg)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 128, 96, 3)), train=False))(jax.random.PRNGKey(3))
    weights = str(tmp / "tiny.msgpack")
    with open(weights, "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict(jax.device_get(variables))))

    ds = COCODataset(cfg, root, "val2017", False)
    nv, _perf = validate(cfg, ds, model, variables)
    return {"tmp": tmp, "cfg_path": str(tmp / "tiny.yaml"),
            "weights": weights, "ap": float(nv["AP"])}


def _entry(env, **over):
    e = {"name": "tiny", "config": env["cfg_path"],
         "weights": env["weights"], "expected": env["ap"], "metric": "AP"}
    e.update(over)
    return e


def test_matching_manifest_passes(zoo_env):
    from tools.reproduce_zoo import run_manifest
    out = io.StringIO()
    rows, ok = run_manifest([_entry(zoo_env)], tolerance=0.1, out=out)
    assert ok, rows
    assert rows[0]["status"] == "OK"
    assert rows[0]["delta"] == pytest.approx(0.0, abs=1e-9)
    assert "tiny" in out.getvalue() and "OK" in out.getvalue()


def test_shifted_expectation_fails(zoo_env):
    from tools.reproduce_zoo import run_manifest
    rows, ok = run_manifest(
        [_entry(zoo_env, expected=zoo_env["ap"] + 0.5)],
        tolerance=0.1, out=io.StringIO())
    assert not ok
    assert rows[0]["status"].startswith("FAIL")
    assert rows[0]["delta"] == pytest.approx(-0.5, abs=1e-9)


def test_missing_weights_and_skip(zoo_env):
    from tools.reproduce_zoo import run_manifest
    missing = _entry(zoo_env, weights="$UDP_ZOO_NOT_SET/nope.pth")
    _rows, ok = run_manifest([missing], out=io.StringIO())
    assert not ok
    rows, ok = run_manifest([missing, _entry(zoo_env)], skip_missing=True,
                            out=io.StringIO())
    assert ok, rows
    assert rows[0]["status"].startswith("SKIP")
    assert rows[1]["status"] == "OK"


def test_broken_entry_reports_error_but_continues(zoo_env):
    from tools.reproduce_zoo import run_manifest
    broken = _entry(zoo_env, metric="NOPE")
    rows, ok = run_manifest([broken, _entry(zoo_env)], out=io.StringIO())
    assert not ok
    assert rows[0]["status"].startswith("ERROR")
    assert rows[1]["status"] == "OK"


def test_cli_exit_codes(zoo_env, monkeypatch):
    from tools.reproduce_zoo import main
    manifest = [_entry(zoo_env)]
    path = str(zoo_env["tmp"] / "manifest.json")
    with open(path, "w") as f:
        json.dump(manifest, f)
    assert main(["--manifest", path]) == 0
    with open(path, "w") as f:
        json.dump([_entry(zoo_env, expected=zoo_env["ap"] + 1.0)], f)
    assert main(["--manifest", path]) == 1


def test_shipped_manifest_schema():
    """configs/zoo_manifest.json: every entry well-formed, every config
    exists and parses, weights paths are $UDP_ZOO-parameterised."""
    from udp_pose_tpu.config import load_config
    repo = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(repo, "configs", "zoo_manifest.json")) as f:
        manifest = json.load(f)
    assert len(manifest) >= 5
    for e in manifest:
        assert {"name", "config", "weights", "expected",
                "metric"} <= set(e)
        cfg_path = os.path.join(repo, e["config"])
        assert os.path.exists(cfg_path), e["config"]
        load_config(cfg_path)   # parses into our schema
        assert e["weights"].startswith("$UDP_ZOO/")
        assert 40.0 < float(e["expected"]) < 100.0


def test_quantize_int8_columns(zoo_env):
    """--quantize int8 (VERDICT r3 item 9): the same one command must
    also measure the int8 AP so the day real data + weights exist both
    precisions come out of one run.  On this tiny fixture the int8 AP
    exists and its delta is reported but not tolerance-gated."""
    from tools.reproduce_zoo import run_manifest
    out = io.StringIO()
    rows, ok = run_manifest([_entry(zoo_env)], tolerance=0.1, out=out,
                            quantize="int8")
    assert ok, rows
    r = rows[0]
    assert r["status"] == "OK"
    assert isinstance(r["measured_int8"], float)
    assert r["delta_int8"] == pytest.approx(
        r["measured_int8"] - r["measured"], abs=1e-9)
    text = out.getvalue()
    assert "int8" in text and "d_int8" in text
