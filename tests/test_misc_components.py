"""Alt decoders, standalone engine, tolerant loader, summary, plot_coco."""

import json
import os

import cv2
import jax
import numpy as np
import pytest

from udp_pose_tpu.ops.alt_decode import shift_decode, simdr_decode


def _ref_shift_decode(heatmaps, center, scale):
    """Loop replication of tools/infer_utils/decode.py:19-62."""
    import math
    B, C, H, W = heatmaps.shape
    flat = heatmaps.reshape(B, C, -1)
    idx = flat.argmax(2)[..., None]
    maxvals = flat.max(2)[..., None]
    coords = np.tile(idx, (1, 1, 2)).astype(np.float32)
    coords[:, :, 0] = coords[:, :, 0] % W
    coords[:, :, 1] = coords[:, :, 1] // W
    coords = np.where(np.tile(maxvals, (1, 1, 2)) > 0.0, coords, -1)
    for n in range(B):
        for p in range(C):
            hm = heatmaps[n][p]
            px = int(math.floor(coords[n][p][0] + 0.5))
            py = int(math.floor(coords[n][p][1] + 0.5))
            if 1 < px < W - 1 and 1 < py < H - 1:
                diff = np.array([hm[py][px + 1] - hm[py][px - 1],
                                 hm[py + 1][px] - hm[py - 1][px]])
                coords[n][p] += np.sign(diff) * 0.25
    for i in range(B):
        s200 = scale[i] * 200
        coords[i, :, 0] = coords[i, :, 0] * s200[0] / W + center[i, 0] - s200[0] * 0.5
        coords[i, :, 1] = coords[i, :, 1] * s200[1] / H + center[i, 1] - s200[1] * 0.5
    return coords.astype(int)


def test_shift_decode_parity():
    rng = np.random.default_rng(110)
    hm = rng.uniform(0, 1, (2, 5, 32, 24)).astype(np.float32)
    center = rng.uniform(100, 300, (2, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, (2, 2)).astype(np.float32)
    gold = _ref_shift_decode(hm.copy(), center, scale)
    got = np.asarray(shift_decode(hm, center, scale))
    np.testing.assert_array_equal(got, gold)


def test_simdr_decode_shapes():
    rng = np.random.default_rng(111)
    px = rng.normal(size=(2, 17, 384)).astype(np.float32)
    py = rng.normal(size=(2, 17, 512)).astype(np.float32)
    center = rng.uniform(100, 300, (2, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, (2, 2)).astype(np.float32)
    out = np.asarray(simdr_decode(px, py, center, scale, (192, 256)))
    assert out.shape == (2, 17, 2)
    assert out.dtype == np.int32


def test_standalone_engine():
    from udp_pose_tpu.engine.standalone import StandalonePoseEngine

    def fake_model(x):
        # heatmaps with a peak at a fixed relative position
        B = x.shape[0]
        hm = np.zeros((B, 64, 48, 17), np.float32)
        hm[:, 32, 24, :] = 1.0
        return hm

    eng = StandalonePoseEngine(fake_model, (192, 256))
    rng = np.random.default_rng(112)
    img = rng.integers(0, 255, (480, 640, 3), np.uint8)
    boxes = np.array([[100, 100, 300, 400]])
    kps, maxvals = eng.infer_pose(img, boxes)
    assert kps.shape == (1, 17, 2)
    # peak at the crop centre → keypoints at the box centre
    np.testing.assert_allclose(kps[0, 0], [200, 250], atol=8)


def test_standalone_engine_onnx_backend():
    """StandalonePoseEngine over an actual exported .onnx — the
    reference's config-free ONNX deploy path (infer_standalone.py:110)
    reproduced end-to-end: flax backend and onnx backend must agree."""
    import jax
    from test_onnx_export import _base_cfg, _small_variables
    from udp_pose_tpu.engine.standalone import (StandalonePoseEngine,
                                                onnx_model_fn)
    from udp_pose_tpu.export import export_onnx_from_cfg
    from udp_pose_tpu.models import build_model

    cfg = _base_cfg("pose_resnet", "gaussian")
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 2,
        "NUM_DECONV_FILTERS": [64, 64], "NUM_DECONV_KERNELS": [4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    model = build_model(cfg)
    w, h = cfg.MODEL.IMAGE_SIZE
    variables = _small_variables(model, (1, h, w, 3))
    blob = export_onnx_from_cfg(variables, cfg, batch=2)

    flax_fn = jax.jit(lambda x: model.apply(variables, x, train=False))
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (480, 640, 3), np.uint8)
    boxes = np.array([[100, 100, 300, 400], [50, 60, 200, 380],
                      [0, 0, 640, 480]])   # 3 boxes → chunk 2 + padded 1

    eng_flax = StandalonePoseEngine(
        lambda x: np.asarray(flax_fn(x)), (w, h))
    eng_onnx = StandalonePoseEngine(onnx_model_fn(blob), (w, h))
    kf, mf = eng_flax.infer_pose(img, boxes)
    ko, mo = eng_onnx.infer_pose(img, boxes)
    np.testing.assert_allclose(ko, kf, atol=1e-3)
    np.testing.assert_allclose(mo, mf, rtol=1e-3, atol=1e-4)


def test_tolerant_loader_suffix_alignment(tmp_path):
    from udp_pose_tpu.config import default_config
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.checkpoint import (align_suffix_keys,
                                               load_weights_tolerant,
                                               save_weights)
    # suffix alignment on synthetic keys
    model_flat = {"backbone/layer1_0/cb1/conv/kernel": 1,
                  "head/kernel": 2}
    loaded_flat = {"layer1_0/cb1/conv/kernel": np.zeros(3),
                   "kernel": np.ones(2)}
    aligned = align_suffix_keys(model_flat, loaded_flat)
    assert "backbone/layer1_0/cb1/conv/kernel" in aligned
    assert "head/kernel" in aligned

    # end-to-end: weights saved from one model load into the same model
    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.IMAGE_SIZE = [64, 64]
    cfg.MODEL.HEATMAP_SIZE = [16, 16]
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [32, 32, 32],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    cfg.TPU.DTYPE = "float32"
    model = build_model(cfg)
    import jax.numpy as jnp
    v = jax.jit(lambda r: model.init(r, jnp.zeros((1, 64, 64, 3)),
                                     train=False))(jax.random.PRNGKey(0))

    class _S:
        params = v["params"]
        batch_stats = v["batch_stats"]
    save_weights(tmp_path / "w.msgpack", _S)
    restored, skipped = load_weights_tolerant(
        str(tmp_path / "w.msgpack"), model, (1, 64, 64, 3))
    assert not skipped
    out = model.apply(restored, jnp.zeros((1, 64, 64, 3)), train=False)
    gold = model.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gold))


def test_model_summary_flops():
    from udp_pose_tpu.config import default_config
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.utils.summary import get_model_summary, model_flops
    import jax.numpy as jnp
    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.IMAGE_SIZE = [192, 256]
    cfg.MODEL.HEATMAP_SIZE = [48, 64]
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 50, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [256, 256, 256],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    cfg.TPU.DTYPE = "float32"
    model = build_model(cfg)
    v = jax.jit(lambda r: model.init(r, jnp.zeros((1, 256, 192, 3)),
                                     train=False))(jax.random.PRNGKey(0))
    flops = model_flops(model, v, (1, 256, 192, 3))
    # reference publishes 8.9 GFLOPs conv+linear-only for resnet50 256x192
    # (BASELINE.md); XLA counts MACs as 2 flops + all other ops
    assert 7e9 < flops < 25e9, flops
    s = get_model_summary(model, v, (1, 256, 192, 3))
    assert "34.0" in s or "34." in s


def test_plot_coco(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from plot_coco import plot
    rng = np.random.default_rng(113)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / ("%012d.jpg" % 7)),
                rng.integers(0, 255, (240, 320, 3), np.uint8))
    kp = []
    for j in range(17):
        kp += [float(50 + j * 10), float(60 + j * 8), 0.9]
    results = [{"image_id": 7, "category_id": 1, "keypoints": kp,
                "score": 0.95}]
    rf = tmp_path / "results.json"
    rf.write_text(json.dumps(results))
    n = plot(str(rf), str(img_dir), str(tmp_path / "plots"))
    assert n == 1
    out = cv2.imread(str(tmp_path / "plots" / ("%012d.jpg" % 7)))
    assert out is not None and (out != 0).any()


def test_bench_sigterm_dump():
    """bench.py must print its partial JSON line when the driver kills it
    mid-run (SIGTERM), instead of dying silently."""
    import json
    import subprocess
    import sys

    code = """
import json, os, signal, sys, time
sys.path.insert(0, %r)
import bench
result = {"metric": "m", "value": 1.0}
bench._arm_emergency_dump(result)
os.kill(os.getpid(), signal.SIGTERM)
print("UNREACHABLE")
"""
    import os
    repo = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run([sys.executable, "-c", code % repo],
                          capture_output=True, text=True, timeout=60)
    assert "UNREACHABLE" not in proc.stdout
    line = proc.stdout.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["metric"] == "m" and parsed["partial"] is True


def test_bench_backend_failure_dump(capsys, monkeypatch):
    """If the TPU backend is unreachable (bench._run raises before the
    headline), bench.main() must still print ONE JSON line — marked
    partial, value 0, with the error — instead of dying silently."""
    import json

    import bench

    def boom(result):
        raise RuntimeError("Unable to initialize backend 'axon'")

    monkeypatch.setattr(bench, "_run", boom)
    monkeypatch.setitem(bench._DUMPED, "done", False)
    bench.main()
    lines = [l for l in capsys.readouterr().out.strip().splitlines()
             if l.startswith("{")]
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed["metric"].startswith("crops_per_sec_per_chip")
    assert parsed["value"] == 0.0 and parsed["partial"] is True
    assert "axon" in parsed["error"]


def test_bench_backend_init_watchdog():
    """A hanging jax.devices() (a dead axon tunnel hangs in NATIVE code —
    SIGALRM/SIGTERM handlers never run) must be cut off by the watchdog
    THREAD: JSON line printed, hard exit, bounded wall time."""
    import json
    import os
    import subprocess
    import sys
    import time

    code = """
import sys, time, types
sys.path.insert(0, %r)
import bench
fake_jax = types.SimpleNamespace(devices=lambda: time.sleep(60))
result = {"metric": "m", "value": 0.0}
bench._devices_with_watchdog(fake_jax, result, timeout_s=1)
print("UNREACHABLE")
"""
    repo = os.path.join(os.path.dirname(__file__), "..")
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code % repo],
                          capture_output=True, text=True, timeout=60)
    assert time.time() - t0 < 30
    assert proc.returncode == 1
    assert "UNREACHABLE" not in proc.stdout
    line = proc.stdout.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["partial"] is True
    assert "backend init exceeded" in parsed["error"]


def test_profile_tools_import():
    """The profiling tools (TPU-driven by hand, not by CI) must at least
    import cleanly so refactors of the APIs they consume fail loudly."""
    import importlib
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "tools"))
    for mod in ("profile_train", "profile_rsn_train", "profile_int8",
                "profile_serve"):
        m = importlib.import_module(mod)
        assert callable(getattr(m, "main"))


def test_profile_input_runs():
    """profile_input is pure-host (no TPU), so unlike the other profile
    tools it runs end-to-end in CI: synthetic COCO build, every stage
    timed, feed table printed."""
    import subprocess
    import sys
    repo = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "profile_input.py"),
         "--images", "4"],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "full host pipeline" in out
    assert "device-aug host residue" in out
    assert "RSN host pipeline" in out
    assert "worker cores needed" in out


def test_bench_host_variables_shapes_and_stats():
    """bench._host_variables must produce a tree shape-identical to the
    real init with BN statistics at their init values (var/scale=1,
    mean/bias=0) — the zero-compile init the bench sections rely on."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from udp_pose_tpu.config import default_config
    from udp_pose_tpu.models import build_model

    cfg = default_config()
    cfg.MODEL.NAME = "pose_resnet"
    cfg.MODEL.EXTRA.merge_from_dict({
        "NUM_LAYERS": 18, "NUM_DECONV_LAYERS": 3,
        "NUM_DECONV_FILTERS": [64, 64, 64],
        "NUM_DECONV_KERNELS": [4, 4, 4],
        "DECONV_WITH_BIAS": False, "FINAL_CONV_KERNEL": 1})
    model = build_model(cfg)
    host = bench._host_variables(jax, jnp, model, (1, 64, 64, 3))
    ref = jax.eval_shape(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False),
        jax.random.PRNGKey(0))
    assert (jax.tree_util.tree_structure(host)
            == jax.tree_util.tree_structure(ref))
    for (path, leaf), (_, spec) in zip(
            jax.tree_util.tree_leaves_with_path(host),
            jax.tree_util.tree_leaves_with_path(ref)):
        assert leaf.shape == spec.shape and leaf.dtype == spec.dtype
    bs = host["batch_stats"]
    some_var = jax.tree_util.tree_leaves(
        {k: v for k, v in bs.items()})[0]
    # spot-check the BN convention via one module's stats
    flat = jax.tree_util.tree_leaves_with_path(bs)
    vars_ = [l for p, l in flat if p[-1].key == "var"]
    means = [l for p, l in flat if p[-1].key == "mean"]
    assert vars_ and all(np.all(v == 1.0) for v in vars_)
    assert means and all(np.all(m == 0.0) for m in means)


def test_plot_coco_matched_pairs_parity():
    """The --match selection reproduces the reference's matched-rendering
    loop (deep_hrnet/visualization/plot_coco.py:157-212): stable -score
    sort, maxDets cap, both-populations requirement, double-expanded-box
    overlap >= 0.1 AND score >= threshold, dt-per-gt multiplicity —
    compared pairwise against an independent loop replication on 200
    randomized images."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from plot_coco import matched_pairs

    def ref_select(gts, dts, threshold=0.3, max_dets=20):
        # loop replication of plot_coco.py:157-212
        inds = np.argsort([-d["score"] for d in dts], kind="mergesort")
        dts = [dts[i] for i in inds]
        if len(dts) > max_dets:
            dts = dts[:max_dets]
        if len(gts) == 0 or len(dts) == 0:
            return []
        out = []
        for gt in gts:
            bb = gt["bbox"]
            x0 = bb[0] - bb[2]; x1 = bb[0] + bb[2] * 2
            y0 = bb[1] - bb[3]; y1 = bb[1] + bb[3] * 2
            for dt in dts:
                dt_bb = dt["bbox"]
                dt_x0 = dt_bb[0] - dt_bb[2]; dt_x1 = dt_bb[0] + dt_bb[2] * 2
                dt_y0 = dt_bb[1] - dt_bb[3]; dt_y1 = dt_bb[1] + dt_bb[3] * 2
                ol_x = min(x1, dt_x1) - max(x0, dt_x0)
                ol_y = min(y1, dt_y1) - max(y0, dt_y0)
                ol_area = ol_x * ol_y
                s_x = max(x1, dt_x1) - min(x0, dt_x0)
                s_y = max(y1, dt_y1) - min(y0, dt_y0)
                iou = ol_area / (s_x * s_y + np.spacing(1))
                if iou < 0.1 or dt["score"] < 0.3:
                    continue
                out.append((id(gt), id(dt)))
        return out

    rng = np.random.default_rng(217)
    checked_pairs = 0
    for case in range(200):
        n_gt = int(rng.integers(0, 4))
        n_dt = int(rng.integers(0, 6))
        gts = [{"bbox": list(rng.uniform(0, 200, 4)),
                "keypoints": [0.0] * 51} for _ in range(n_gt)]
        dts = [{"bbox": list(rng.uniform(0, 200, 4)),
                "score": float(rng.uniform(0, 1)),
                "keypoints": [0.0] * 51} for _ in range(n_dt)]
        got = [(id(g), id(d)) for g, d in matched_pairs(gts, dts)]
        want = ref_select(gts, dts)
        assert got == want, (case, len(got), len(want))
        checked_pairs += len(want)
    assert checked_pairs > 50   # the fuzz actually exercised matches


def test_plot_coco_matched_mode_e2e(tmp_path):
    """--match gt.json end-to-end: only gt-matched detections above the
    0.3 score render; an image whose detections all miss the gt box (or
    an image with results but no gt) writes nothing."""
    import sys
    sys.path.insert(0, "/root/repo/tools")
    from plot_coco import plot

    rng = np.random.default_rng(311)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for iid in (7, 8, 9):
        cv2.imwrite(str(img_dir / ("%012d.jpg" % iid)),
                    rng.integers(0, 255, (240, 320, 3), np.uint8))

    def kp(conf):
        out = []
        for j in range(17):
            out += [float(60 + j * 8), float(60 + j * 6), conf]
        return out

    gt = {"images": [{"id": i, "width": 320, "height": 240,
                      "file_name": "%012d.jpg" % i} for i in (7, 8)],
          "annotations": [
              {"id": 1, "image_id": 7, "category_id": 1,
               "bbox": [50, 50, 120, 140], "iscrowd": 0,
               "keypoints": [v if (i % 3) != 2 else 2
                             for i, v in enumerate(kp(0))]},
              # image 8's gt is far from its detection IN X ONLY -> the
              # expanded overlap is (negative x-span * positive y-span)
              # < 0.1 -> no match.  (Far in BOTH dims would multiply two
              # negative spans into a positive "iou" — the reference's
              # unclamped arithmetic, reproduced faithfully.)
              {"id": 2, "image_id": 8, "category_id": 1,
               "bbox": [2000, 50, 10, 10], "iscrowd": 0,
               "keypoints": kp(2)}],
          "categories": [{"id": 1, "name": "person"}]}
    results = [
        {"image_id": 7, "category_id": 1, "keypoints": kp(0.9),
         "score": 0.95, "bbox": [55, 55, 110, 130]},
        {"image_id": 7, "category_id": 1, "keypoints": kp(0.9),
         "score": 0.1, "bbox": [55, 55, 110, 130]},   # below threshold
        {"image_id": 8, "category_id": 1, "keypoints": kp(0.9),
         "score": 0.9, "bbox": [50, 50, 100, 100]},   # no gt overlap
        {"image_id": 9, "category_id": 1, "keypoints": kp(0.9),
         "score": 0.9, "bbox": [50, 50, 100, 100]},   # no gt at all
    ]
    gt_f = tmp_path / "gt.json"
    gt_f.write_text(json.dumps(gt))
    rf = tmp_path / "results.json"
    rf.write_text(json.dumps(results))
    n = plot(str(rf), str(img_dir), str(tmp_path / "plots"),
             match_gt=str(gt_f))
    assert n == 1
    assert os.path.exists(str(tmp_path / "plots" / ("%012d.jpg" % 7)))
    assert not os.path.exists(str(tmp_path / "plots" / ("%012d.jpg" % 8)))
    assert not os.path.exists(str(tmp_path / "plots" / ("%012d.jpg" % 9)))


def test_day_one_dry_run():
    """tools/day_one.py --dry-run walks every external-validation step on
    this artifact-free image: the env-gated steps report SKIP with their
    enabling instruction, nothing FAILs, and the scorecard json is
    written (VERDICT r4 item 9 — the drill must not rot)."""
    import subprocess
    import sys
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        report = os.path.join(tmp, "r.json")
        p = subprocess.run(
            [sys.executable, "/root/repo/tools/day_one.py", "--dry-run",
             "--skip-onnx", "--report", report],
            capture_output=True, text=True, timeout=300,
            env={k: v for k, v in os.environ.items()
                 if k not in ("UDP_ZOO", "UDP_COCO", "UDP_YOLOV5_PT")})
        assert p.returncode == 0, (p.stdout, p.stderr[-500:])
        with open(report) as f:
            card = json.load(f)
        assert card["fail"] == 0
        steps = {r["step"]: r for r in card["rows"]}
        assert steps["zoo-fp"]["status"] == "SKIP"
        assert "UDP_ZOO" in steps["zoo-fp"]["detail"]
        assert steps["detector"]["status"] == "SKIP"
        assert "UDP_YOLOV5_PT" in steps["detector"]["detail"]
