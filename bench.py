"""Throughput benchmark: HRNet-w32 256×192 + UDP offset + flip-test.

North-star metric (BASELINE.json): crops/sec/chip for the flagship config,
including normalisation, the folded flip-test forward, heatmap un-flip, and
full UDP offset decode to source-space keypoints — i.e. the complete
per-crop inference pipeline of the reference validate loop
(deep_hrnet/lib/core/function.py:139-217), as one jit graph.

``vs_baseline`` normalises by an estimated PyTorch-A100 throughput for the
same pipeline (fp32, flip test folded as 2 forwards, batch 32):
A100_EST = 350 crops/s.  The reference publishes no top-down crops/sec
(BASELINE.md), so this estimate is the comparison anchor; >5.0 means the
>5× A100 target is met.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

A100_EST_CROPS_PER_SEC = 350.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # The skeleton is armed BEFORE backend init / first compile so a driver
    # SIGTERM mid-compile — or a dead TPU tunnel — still records one JSON
    # line (value 0 + error/partial marks it as a failed run, not a perf
    # regression).
    result = {
        "metric": "crops_per_sec_per_chip_hrnet_w32_256x192_fliptest",
        "value": 0.0,
        "unit": "crops/s",
        "vs_baseline": 0.0,
        "partial": True,
    }
    restore_signals = _arm_emergency_dump(result)
    # Global self-deadline: if the whole bench exceeds it — e.g. the
    # tunnel dies mid-compile, where neither SIGTERM nor SIGALRM can be
    # processed (native-blocked main thread) — dump whatever metrics were
    # collected so far and exit, instead of being SIGKILLed silently.
    import os
    cancel_deadline = _arm_watchdog(
        result, int(os.environ.get("BENCH_DEADLINE_S", 5400)),
        "bench self-deadline exceeded (hung mid-run?)")
    try:
        _run(result)
    except Exception as e:                    # e.g. TPU backend unavailable
        result["error"] = repr(e)[:300]
        log(f"bench failed: {e!r}")
    if not _DUMPED["done"]:
        print(json.dumps(result), flush=True)
        _DUMPED["done"] = True
    # leave no armed timers/handlers behind (in-process callers: tests)
    cancel_deadline()
    restore_signals()


def _run(result):
    import os

    # NOTE: do NOT enable the persistent compilation cache here.  It
    # would collapse this bench's ~8 minutes-long remote compiles, but
    # measured on the axon relay (2026-08-19): a warm-cache rerun of a
    # tiny resnet50 graph took 190.8s and wrote no new entries — i.e.
    # the relay recompiles despite the disk hit (its executables do not
    # round-trip deserialization), and a cache-enabled serving probe
    # fell from a <10-min full scan to no progress in 18 min.  The
    # cache stays a CPU-platform feature (dryrun_multichip, CLIs with
    # TPU.COMPILATION_CACHE on locally-attached hardware).

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _hrnet_w32_cfg
    from udp_pose_tpu.core.infer import make_infer_fn
    from udp_pose_tpu.models import build_model

    dev = _devices_with_watchdog(jax, result)[0]
    log(f"device: {dev}")

    cfg = _hrnet_w32_cfg((192, 256), (48, 64), dtype="bfloat16")
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 256, 192, 3)), train=False)
    )(rng)
    infer = make_infer_fn(model, target_type="offset", flip_test=True,
                          post_process=True, kpd=cfg.LOSS.KPD)

    best = 0.0
    best_batch = 0
    rng_np = np.random.default_rng(0)
    for batch in (128,):   # the measured knee (DESIGN.md perf study);
        # smaller/larger points documented there — each extra batch
        # size costs ~3 min of remote compilation on the axon relay
        images = rng_np.integers(0, 256, (batch, 256, 192, 3)).astype(np.uint8)
        center = np.tile(np.array([[128.0, 128.0]], np.float32), (batch, 1))
        scale = np.tile(np.array([[0.96, 1.28]], np.float32), (batch, 1))
        images_d = jax.device_put(images)
        center_d = jax.device_put(center)
        scale_d = jax.device_put(scale)
        checksum = jax.jit(lambda p: jnp.sum(p))

        def timed(iters):
            # NOTE: on the axon-relay platform block_until_ready() does not
            # actually await remote execution; a scalar device→host readback
            # does, so we sync through a checksum transfer.
            t0 = time.perf_counter()
            for _ in range(iters):
                preds, maxvals, _ = infer(variables, images_d, center_d,
                                          scale_d)
            float(checksum(preds))
            return time.perf_counter() - t0

        timed(3)  # warmup / compile
        t_small, t_large = timed(10), timed(30)
        per_iter = (t_large - t_small) / 20.0  # cancels fixed tunnel latency
        cps = batch / per_iter
        log(f"batch {batch}: {cps:.1f} crops/s ({per_iter * 1e3:.2f} ms/it)")
        if cps > best:
            best, best_batch = cps, batch

    result.update({
        "value": round(best, 1),
        "vs_baseline": round(best / A100_EST_CROPS_PER_SEC, 3),
        "batch": best_batch,
        "notes": "full pipeline: normalize + fwd(2B folded flip) + unflip + "
                 "UDP offset decode; bf16 compute; vs_baseline anchors to "
                 "est. 350 crops/s PyTorch-A100 fp32 (target >5x => 5.0); "
                 "train = HRNet-w32 offset fwd+bwd+adam @ B=128 (knee; "
                 "DESIGN.md); engine = fused detect+pose on 720p",
    })
    # Headline measured; a driver timeout (SIGTERM) or a failed secondary
    # bench from here still records a complete headline.
    result.pop("partial", None)

    # Secondary sections run in VALUE order (train → zoo/no-flip → int8 →
    # engine → scaling child) so a driver timeout truncates the least
    # interesting tail, not the round-over-round comparables.  Each section
    # logs elapsed wall time; the tunnel-variance-bound engine section is
    # skipped past the soft budget (the SIGTERM dump then still carries
    # every comparable metric).
    t0 = time.perf_counter()
    soft_budget = int(os.environ.get("BENCH_SOFT_BUDGET_S", 2400))

    def mark(section):
        log(f"[bench +{time.perf_counter() - t0:.0f}s] {section}")

    # ---- training-step throughput (fwd+bwd+adam, offset loss) -----------
    mark("train step")
    try:
        train_sps, train_tfs = bench_train(jax, jnp)
        result["train_samples_per_sec"] = round(train_sps, 1)
        result["train_tflops_per_sec"] = round(train_tfs, 1)
    except Exception as e:          # secondary metric must not kill the run
        log(f"train bench failed: {e!r}")

    # ---- RSN18 train step (the RSN stack is where the reference burns
    # its training GPU-hours: 8xV100 iteration-based DDP, RSN/README.md:69;
    # study + batch scan in DESIGN.md / tools/profile_rsn_train.py) -------
    mark("rsn18 train step")
    try:
        result["train_samples_per_sec_rsn18"] = round(
            bench_rsn_train(jax, jnp), 1)
    except Exception as e:
        log(f"rsn train bench failed: {e!r}")

    # ---- secondary model zoo points (BASELINE.md matrix) ----------------
    # batch picks are the measured knees: RSN18 6503@128 > 5905@256 >
    # 5296@512; shufflenet 8729@256 > 7449@512
    for label, builder, batch, flip in (
            ("crops_per_sec_rsn18_256x192", _rsn18_cfg, 128, True),
            ("crops_per_sec_shufflenetv2_plus_256x192",
             _shufflenet_cfg, 256, True),
            ("crops_per_sec_w48_384x288", _w48_cfg, 48, True),
            # B=48 is the measured knee: 495.6 (B=32) → 565.9 (B=48)
            # → 517.5 (B=64) crops/s
            # no-flip = the serving protocol (deployments rarely pay the
            # eval-protocol flip fold); measured knee B=128: 5464.5 >
            # 5321 (B=256) > 4939 (B=512) — exactly 2.0x the flip
            # headline, pinning DESIGN.md's protocol-headroom claim
            ("crops_per_sec_w32_256x192_noflip", _headline_cfg, 128,
             False),
    ):
        mark(label)
        try:
            result[label] = round(
                bench_family(jax, jnp, builder(), batch, flip=flip), 1)
        except Exception as e:
            log(f"{label} failed: {e!r}")

    # ---- int8 PTQ serving mode (models/quantize.py): w8a8 convs on the
    # MXU int8 path — measured +17% no-flip / +9% flip over bf16 on v5e
    # (DESIGN.md round-3 int8 study) ----
    for label, flip in (("crops_per_sec_w32_256x192_noflip_int8", False),
                        ("crops_per_sec_w32_256x192_fliptest_int8", True)):
        mark(label)
        try:
            result[label] = round(bench_family(
                jax, jnp, _headline_cfg(), 128, flip=flip, quantize=True), 1)
        except Exception as e:
            log(f"{label} failed: {e!r}")

    # w48 is where int8 pays most (+29.5% flip — wide-conv lever,
    # DESIGN.md); depth metric, so it yields to the soft budget
    if time.perf_counter() - t0 < soft_budget:
        label = "crops_per_sec_w48_384x288_int8"
        mark(label)
        try:
            result[label] = round(bench_family(
                jax, jnp, _w48_cfg(), 48, flip=True, quantize=True), 1)
        except Exception as e:
            log(f"{label} failed: {e!r}")

    # ---- end-to-end engine: detect-then-pose serving latency --------------
    # Tunnel-bandwidth-bound and high-variance (DESIGN.md), so it runs
    # AFTER every comparable metric and is dropped past the soft budget.
    if time.perf_counter() - t0 < soft_budget:
        mark("fused/low-bw/pipelined engine")
        try:
            fps, fps_lb, bytes_lb, fps_pipe = bench_engine(jax)
            result["engine_detect_pose_fps"] = round(fps, 1)
            result["engine_low_bw_fps"] = round(fps_lb, 1)
            result["engine_low_bw_bytes_per_frame"] = int(bytes_lb)
            if fps_pipe is not None:
                result["engine_pipelined_fps"] = round(fps_pipe, 1)
        except Exception as e:
            log(f"engine bench failed: {e!r}")
    else:
        log(f"skipping engine bench: past soft budget ({soft_budget}s)")
        result["engine_skipped_soft_budget"] = True

    # ---- virtual-mesh sharding-overhead child (CPU-only; runs LAST and
    # serially — it saturates host cores, which would skew the host-CPU-
    # heavy low-bw engine bench and its own sps_1-vs-sps_n symmetry) ----
    mark("virtual-mesh scaling child")
    import subprocess
    proc = subprocess.Popen(
        [sys.executable, "tools/bench_scaling.py", "8"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        out, err = proc.communicate(timeout=600)
        line = [l for l in out.strip().splitlines()
                if l.startswith("{")][-1]
        result["virtual_mesh_sharding"] = json.loads(line)
    except Exception as e:
        proc.kill()
        _out, err = proc.communicate()
        log(f"scaling child failed: {e!r}; stderr tail: {err[-500:]}")


def _zoo_cfg(yaml_name):
    """Canonical shipped config → bench config (bf16 compute)."""
    import os

    from udp_pose_tpu.config import load_config
    cfg = load_config(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "configs", "coco", yaml_name))
    cfg.defrost()
    cfg.TPU.DTYPE = "bfloat16"
    return cfg


def _w48_cfg():
    """Second flagship: HRNet-w48 384×288 + UDP offset (README.md:46)."""
    return _zoo_cfg("hrnet_w48_384x288_udp_offset.yaml")


def _headline_cfg():
    """The headline flagship config (HRNet-w32 256×192 + UDP offset)."""
    return _zoo_cfg("hrnet_w32_256x192_udp_offset.yaml")


def _rsn18_cfg():
    """Efficiency champion: RSN18 256×192, 2.5 GFLOPs (README.md:40)."""
    return _zoo_cfg("rsn18_256x192.yaml")


def _shufflenet_cfg():
    """Mobile-zoo point: ShuffleNetV2+ Small 256×192."""
    return _zoo_cfg("shufflenetv2_plus_small_256x192.yaml")


def bench_family(jax, jnp, cfg, batch, iters=(6, 18), flip=True,
                 quantize=False, prepare=True):
    """Full inference pipeline (flip test + decode) crops/s for one
    config, same differencing method as the headline.  ``flip=False``
    is the serving protocol (no flip-test fold) — the raw-throughput
    shape most deployments run.  ``quantize`` amax-calibrates on one
    batch and serves w8a8 int8 (models/quantize.py); ``prepare=False``
    keeps the per-forward in-graph weight requant (A/B knob for
    tools/profile_int8.py)."""
    from udp_pose_tpu.core.infer import make_infer_fn
    from udp_pose_tpu.models import build_model

    model = build_model(cfg)
    w, h = cfg.MODEL.IMAGE_SIZE
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, h, w, 3)), train=False)
    )(jax.random.PRNGKey(0))
    if quantize:
        from udp_pose_tpu.core.infer import serving_normalizer
        from udp_pose_tpu.models.quantize import QuantizedModel, calibrate
        normalize_images = serving_normalizer(cfg)
        cal = np.random.default_rng(4).integers(
            0, 256, (32, h, w, 3)).astype(np.uint8)
        scales = calibrate(model, variables, [normalize_images(cal)])
        model = QuantizedModel(model, scales)
        if prepare:
            variables = model.prepare_variables(variables)
    if cfg.MODEL.NAME == "rsn":
        from udp_pose_tpu.core.infer import COCO_FLIP_PAIRS
        from udp_pose_tpu.core.rsn import make_rsn_infer_fn
        from udp_pose_tpu.data.rsn import RSN_COCO
        infer = make_rsn_infer_fn(
            model, flip_test=flip, flip_pairs=COCO_FLIP_PAIRS,
            kernel=RSN_COCO["test_gaussian_kernel"],
            shifts=tuple(RSN_COCO["test_shift_ratios"]),
            input_size_hw=(h, w))
    else:
        infer = make_infer_fn(model, target_type=cfg.MODEL.TARGET_TYPE,
                              flip_test=flip, post_process=True,
                              kpd=cfg.LOSS.KPD)
    rng_np = np.random.default_rng(3)
    images = jax.device_put(rng_np.integers(
        0, 256, (batch, h, w, 3)).astype(np.uint8))
    center = jax.device_put(np.tile(
        np.array([[128.0, 128.0]], np.float32), (batch, 1)))
    scale = jax.device_put(np.tile(
        np.array([[0.96, 1.28]], np.float32), (batch, 1)))
    checksum = jax.jit(lambda p: jnp.sum(p))

    def timed(n):
        t0 = time.perf_counter()
        for _ in range(n):
            preds, *_rest = infer(variables, images, center, scale)
        float(checksum(preds))
        return time.perf_counter() - t0

    timed(2)
    t_small, t_large = timed(iters[0]), timed(iters[1])
    per_iter = (t_large - t_small) / (iters[1] - iters[0])
    cps = batch / per_iter
    log(f"{cfg.MODEL.NAME} {w}x{h} B={batch}: {cps:.1f} crops/s "
        f"({per_iter * 1e3:.2f} ms/it)")
    return cps


def _arm_watchdog(result, seconds, tag):
    """Daemon-thread watchdog: after ``seconds``, print ``result`` (plus
    the ``tag`` error) as the one JSON line and hard-exit.

    A THREAD, not SIGALRM/SIGTERM: a dead axon tunnel blocks backend init
    (and remote compiles) inside a native call, and Python signal handlers
    only run between main-thread bytecodes — measured here: a hung
    ``jax.devices()`` ignored both SIGALRM and ``timeout``'s SIGTERM
    indefinitely.  The timer thread still runs (the RPC wait releases the
    GIL) and ``os._exit`` needs no cooperation from the stuck main thread.
    Returns a cancel() for the success path."""
    import os
    import threading

    def fire():
        if not _DUMPED["done"]:
            result.setdefault("error", tag)
            result.setdefault("partial", True)
            print(json.dumps(result), flush=True)
            _DUMPED["done"] = True
        os._exit(1)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t.cancel


def _devices_with_watchdog(jax, result, timeout_s=300):
    """`jax.devices()` bounded by a watchdog thread: a healthy backend
    initializes in seconds; a dead tunnel hangs forever in native code."""
    cancel = _arm_watchdog(
        result, timeout_s,
        f"TPU backend init exceeded {timeout_s}s (tunnel down?)")
    try:
        return jax.devices()
    finally:
        cancel()


_DUMPED = {"done": False}


def _arm_emergency_dump(result):
    """On SIGTERM/SIGINT (driver timeout), print the metrics collected so
    far as the one JSON line instead of dying silently mid-compile.
    Returns a restore() that reinstates the previous handlers."""
    import signal

    def dump(signum, frame):
        if not _DUMPED["done"]:
            result.setdefault("partial", True)
            print(json.dumps(result), flush=True)
            _DUMPED["done"] = True
        raise SystemExit(0)

    old_term = signal.signal(signal.SIGTERM, dump)
    old_int = signal.signal(signal.SIGINT, dump)

    def restore():
        signal.signal(signal.SIGTERM, old_term)
        signal.signal(signal.SIGINT, old_int)
    return restore


def bench_train(jax, jnp, batch=128):
    """HRNet-w32 offset train-step samples/s (+ achieved TFLOP/s at
    3x fwd-FLOPs per step; fwd = 7.16 GF/crop, BASELINE.md).
    B=128 is the measured knee: 804.9 (B=64) → 1297.7 (B=128) → 1227.9
    (B=256) samples/s."""
    from __graft_entry__ import _hrnet_w32_cfg
    from udp_pose_tpu.core.loss import make_loss_fn
    from udp_pose_tpu.core.train import (create_train_state, make_optimizer,
                                         make_train_step, normalize_images)
    from udp_pose_tpu.models import build_model

    cfg = _hrnet_w32_cfg((192, 256), (48, 64), dtype="bfloat16")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), 1000)
    step_fn = make_train_step(make_loss_fn(cfg))
    rng_np = np.random.default_rng(1)
    batch_np = {
        "image": rng_np.integers(0, 256, (batch, 256, 192, 3)).astype(np.uint8),
        "target": rng_np.normal(size=(batch, 51, 64, 48)).astype(np.float32),
        "target_weight": rng_np.uniform(size=(batch, 17)).astype(np.float32),
    }
    device_batch = {k: jax.device_put(v) for k, v in batch_np.items()}
    checksum = jax.jit(lambda s: jnp.sum(
        s.params["final_layer"]["kernel"].astype(jnp.float32)))

    def run(iters, state):
        for _ in range(iters):
            db = dict(device_batch)
            db["image"] = normalize_images(db["image"])
            state, _ = step_fn(state, db)
        float(checksum(state))
        return state

    state = run(2, state)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        state = run(6, state)
        dt = (time.perf_counter() - t0) / 6
        best = dt if best is None else min(best, dt)
    sps = batch / best
    tflops = sps * 7.16e9 * 3 / 1e12
    log(f"train step B={batch}: {sps:.1f} samples/s ({best * 1e3:.2f} ms, "
        f"~{tflops:.1f} TF/s)")
    return sps, tflops


def bench_rsn_train(jax, jnp, batch=128):
    """RSN18 train-step samples/s (fwd+bwd+adam, 5-kernel label pyramid,
    OHKM loss — the reference's RSN/exps/RSN18.coco/train.py workload).
    B=128 is the measured knee (tools/profile_rsn_train.py batch scan)."""
    from udp_pose_tpu.core.rsn import make_rsn_optimizer, make_rsn_train_step
    from udp_pose_tpu.core.train import TrainState
    from udp_pose_tpu.models import build_model

    cfg = _rsn18_cfg()
    model = build_model(cfg)
    variables = jax.jit(
        lambda r: model.init(r, jnp.zeros((1, 256, 192, 3)), train=False)
    )(jax.random.PRNGKey(0))
    tx = make_rsn_optimizer(cfg.TRAIN.LR, cfg.TRAIN.WD, 96000)
    state = TrainState.create(
        lambda v, x, **kw: model.apply(v, x, **kw),
        variables["params"], variables["batch_stats"], tx)
    step_fn = make_rsn_train_step(cfg.MODEL.EXTRA["STAGE_NUM"],
                                  ohkm=cfg.LOSS.USE_OHKM, topk=cfg.LOSS.TOPK)
    rng_np = np.random.default_rng(5)
    device_batch = {
        "image": jax.device_put(rng_np.integers(
            0, 256, (batch, 256, 192, 3)).astype(np.uint8)),
        "labels": jax.device_put(rng_np.uniform(
            0, 255, (batch, 5, 17, 64, 48)).astype(np.float32)),
        "valid": jax.device_put(np.ones((batch, 17, 1), np.float32)),
    }
    checksum = jax.jit(lambda s: sum(
        jnp.sum(x.astype(jnp.float32))
        for x in jax.tree_util.tree_leaves(s.params)[:3]))

    def run(iters, state):
        for _ in range(iters):
            state, _ = step_fn(state, dict(device_batch))
        float(checksum(state))
        return state

    state = run(2, state)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        state = run(6, state)
        dt = (time.perf_counter() - t0) / 6
        best = dt if best is None else min(best, dt)
    sps = batch / best
    log(f"rsn18 train step B={batch}: {sps:.1f} samples/s "
        f"({best * 1e3:.2f} ms)")
    return sps


def bench_engine(jax, frames=24):
    """Fused detect+pose serving path (engine/fused.py): 720p frame →
    device letterbox → YOLOv5n → device top-k+NMS → 16 pose crops
    (flip-test) → decode, ONE dispatch + ONE readback per frame — the
    latency a video/webcam user sees (reference inference_engine.py
    round-trips the host 4+ times per frame instead)."""
    from __graft_entry__ import _hrnet_w32_cfg
    from udp_pose_tpu.engine.fused import FusedDetectPose

    cfg = _hrnet_w32_cfg((192, 256), (48, 64), dtype="bfloat16")
    eng = FusedDetectPose(cfg, None, yolo_variant="n", max_persons=16)
    rng_np = np.random.default_rng(2)
    frame = rng_np.integers(0, 256, (720, 1280, 3)).astype(np.uint8)

    eng.infer_frame(frame)   # compile
    eng.infer_frame(frame)
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(frames // 2):
            eng.infer_frame(frame)
        dt = (time.perf_counter() - t0) / (frames // 2)
        best = dt if best is None else min(best, dt)
    log(f"fused engine detect+pose (16-person budget, flip): "
        f"{1.0 / best:.1f} fps ({best * 1e3:.1f} ms/frame)")

    # --low-bw serving mode at a typical-scene 4-person budget: upload
    # bytes = letterbox canvas + bucketed u8 crops instead of the raw
    # frame (the tunnel moves ~18 MB/s, so fps tracks bytes/frame)
    eng_lb = FusedDetectPose(cfg, eng._pose.variables, yolo_variant="n",
                             yolo_weights=eng.yolo_vars, max_persons=4)
    out = eng_lb.infer_frame_low_bw(frame)      # compile
    bytes_lb = out["bytes_uploaded"]
    eng_lb.infer_frame_low_bw(frame)
    best_lb = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(frames // 2):
            eng_lb.infer_frame_low_bw(frame)
        dt = (time.perf_counter() - t0) / (frames // 2)
        best_lb = dt if best_lb is None else min(best_lb, dt)
    log(f"low-bw engine (4-person budget): {1.0 / best_lb:.1f} fps "
        f"({best_lb * 1e3:.1f} ms/frame, {bytes_lb / 1e6:.2f} MB up "
        f"vs {frame.nbytes / 1e6:.2f} MB raw frame)")

    # software-pipelined serving (tools/infer.py --pipeline 3): 3 frames
    # in flight via submit/fetch — upload of frame i+1 overlaps compute +
    # readback of frame i.  Last + non-fatal so a failure here cannot
    # drop the fused/low-bw metrics above.
    fps_pipe = None
    try:
        from collections import deque
        best_pipe = None
        for _ in range(2):
            q = deque()
            t0 = time.perf_counter()
            for i in range(frames // 2):
                q.append(eng.submit_frame(frame))
                if len(q) >= 3:
                    eng.fetch(q.popleft())
            while q:
                eng.fetch(q.popleft())
            dt = (time.perf_counter() - t0) / (frames // 2)
            best_pipe = dt if best_pipe is None else min(best_pipe, dt)
        fps_pipe = 1.0 / best_pipe
        log(f"pipelined engine (depth 3): {fps_pipe:.1f} fps "
            f"({best_pipe * 1e3:.1f} ms/frame)")
    except Exception as e:
        log(f"pipelined engine bench failed: {e!r}")
    return 1.0 / best, 1.0 / best_lb, bytes_lb, fps_pipe


if __name__ == "__main__":
    main()
