"""Throughput benchmark: HRNet-w32 256×192 + UDP offset + flip-test.

North-star metric (BASELINE.json): crops/sec/chip for the flagship
config, including normalisation, flip-test forwards, heatmap un-flip,
and full UDP offset decode to source-space keypoints — i.e. the complete
per-crop inference pipeline of the reference validate loop
(deep_hrnet/lib/core/function.py:139-217), as one jit graph.

Headline protocol (round 4): **int8 PTQ serving** (models/quantize.py —
w8a8 convs on the v5e MXU int8 path, amax-calibrated; the reference's
own int8 deployment story is MNN/OpenVINO export,
deep_hrnet/scripts/export_mnn.sh) with the two_pass flip schedule
(core/infer.py).  Accuracy evidence for the promotion:
tests/test_quantize.py pins PTQ decode drift on a trained model at
median <0.5 px / 95% <2 px / confidence <0.1, and models/quantize.py
QAT (tests/test_qat.py) trains the drift to (near-)zero when needed.
The bf16 value ships alongside (``crops_per_sec_w32_256x192_fliptest_
bf16``) for round-over-round comparability.

``vs_baseline`` normalises by the estimated PyTorch-A100 anchor
(350 crops/s) — see BASELINE.md "anchor bracket" for the measured
host-CPU floor and the A100 fp32 roofline ceiling bracketing it.

Prints ONE JSON line on stdout; diagnostics go to stderr.  Exit is rc=0
whenever the process finalizes itself: sections that do not fit the
time budget (``BENCH_BUDGET_S``, default 1380 s) are skipped in reverse
value order and listed in ``sections_skipped``.
"""

from __future__ import annotations

import json
import os
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
    cancel_deadline = _arm_watchdog(
        result, int(os.environ.get("BENCH_DEADLINE_S", 2400)),
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
    # NOTE: do NOT enable the persistent compilation cache here: measured
    # on the axon relay (2026-08-19) the relay recompiles despite the
    # disk hit (its executables do not round-trip deserialization).  The
    # cache stays a CPU-platform feature (dryrun_multichip, CLIs with
    # TPU.COMPILATION_CACHE on locally-attached hardware).
    import jax
    import jax.numpy as jnp

    dev = _devices_with_watchdog(jax, result)[0]
    log(f"device: {dev}")

    t0 = time.perf_counter()
    budget = int(os.environ.get("BENCH_BUDGET_S", 1380))

    def remaining():
        return budget - (time.perf_counter() - t0)

    def mark(section):
        log(f"[bench +{time.perf_counter() - t0:.0f}s] {section}")

    # ---- headline: w32 flip-test, int8 two_pass (always runs).  A
    # failure anywhere in the quantization machinery must not wipe the
    # round's comparables: fall back to the bf16 protocol as the
    # headline (marked) and keep going.
    mark("headline w32 int8 fliptest")
    headline_protocol = "int8"
    fam_cache = {}
    try:
        cps = bench_family(jax, jnp, _headline_cfg(), 128, flip=True,
                           quantize=True, flip_mode="two_pass",
                           cache=fam_cache)
    except Exception as e:
        log(f"int8 headline failed ({e!r}); falling back to bf16")
        headline_protocol = "bf16-fallback"
        result["headline_int8_error"] = repr(e)[:200]
        fam_cache.clear()       # a poisoned quantize entry must not leak
        cps = bench_family(jax, jnp, _headline_cfg(), 128, flip=True,
                           flip_mode="two_pass", cache=fam_cache)
    result.update({
        "value": round(cps, 1),
        # explicit per-protocol aliases of the headline so no consumer
        # has to infer which precision ``value`` carries (advisor r4:
        # the r3->r4 headline promotion changed value's meaning; since
        # r4 ``value`` is pinned to the int8 protocol and these keys
        # disambiguate any historical comparison)
        ("value_int8" if headline_protocol == "int8" else
         "value_bf16"): round(cps, 1),
        "vs_baseline": round(cps / A100_EST_CROPS_PER_SEC, 3),
        "batch": 128,
        "headline_protocol": headline_protocol,
        "notes": "full pipeline: normalize + two_pass flip forwards + "
                 "unflip + UDP offset decode; HEADLINE IS int8 PTQ "
                 "serving (w8a8 MXU path; drift bound "
                 "tests/test_quantize.py: median <0.5px, 95% <2px; QAT "
                 "closes it) — bf16 ships as _bf16 key; vs_baseline "
                 "anchors to est. 350 crops/s PyTorch-A100 fp32 "
                 "(bracketed in BASELINE.md: measured host-CPU floor + "
                 "A100 fp32 roofline 1362 ceiling; target >5x => 5.0); "
                 "train = HRNet-w32 offset fwd+bwd+adam @ B=128; "
                 "engine = fused detect+pose on 720p",
    })
    if headline_protocol == "int8":
        result["crops_per_sec_w32_256x192_fliptest_int8"] = round(cps, 1)
    result.pop("partial", None)

    # ---- secondary sections, value-ordered; each yields to the budget
    # (estimates are measured r04 wall costs incl. remote compile) -------
    def sec_bf16_flip():
        if headline_protocol != "int8":
            result["crops_per_sec_w32_256x192_fliptest_bf16"] = result[
                "value"]
            return
        bf16 = round(bench_family(jax, jnp, _headline_cfg(), 128,
                                  flip=True, flip_mode="two_pass",
                                  cache=fam_cache), 1)
        result["crops_per_sec_w32_256x192_fliptest_bf16"] = bf16
        result["value_bf16"] = bf16

    def sec_train():
        sps, tfs = bench_train(jax, jnp)
        result["train_samples_per_sec"] = round(sps, 1)
        result["train_tflops_per_sec"] = round(tfs, 1)

    def sec_rsn_train():
        result["train_samples_per_sec_rsn18"] = round(
            bench_rsn_train(jax, jnp), 1)

    def sec_rsn50_train():
        result["train_samples_per_sec_rsn50"] = round(
            bench_rsn_train(jax, jnp, batch=64, cfg_fn=_rsn50_cfg), 1)

    def family_sec(label, builder, batch, flip, quantize=False,
                   flip_mode="fold"):
        def fn():
            result[label] = round(bench_family(
                jax, jnp, builder(), batch, flip=flip,
                quantize=quantize, flip_mode=flip_mode,
                cache=fam_cache), 1)
        return fn

    def sec_engine():
        fps, fps_lb, bytes_lb, fps_pipe, fps_chip = bench_engine(jax)
        result["engine_detect_pose_fps"] = round(fps, 1)
        result["engine_low_bw_fps"] = round(fps_lb, 1)
        result["engine_low_bw_bytes_per_frame"] = int(bytes_lb)
        if fps_pipe is not None:
            result["engine_pipelined_fps"] = round(fps_pipe, 1)
        if fps_chip is not None:
            # frames staged in HBM: chip-bound fps, no relay-link upload
            # (DESIGN.md "serving: chip vs link" — the tunnel-bound fps
            # above under-represents the chip by ~7x)
            result["engine_detect_pose_fps_chip"] = round(fps_chip, 1)

    # batch picks are the measured knees (DESIGN.md batch scans):
    # rsn18 6503@128 > 5905@256; shufflenet 8729@256 > 7449@512; w48
    # 565.9@48; w32 noflip 5464.5@128 > 5321@256
    sections = [
        ("train", 200, sec_train),
        ("w32 noflip int8", 130,
         family_sec("crops_per_sec_w32_256x192_noflip_int8",
                    _headline_cfg, 128, False, True)),
        ("bf16 fliptest", 150, sec_bf16_flip),
        ("rsn18 train", 130, sec_rsn_train),
        ("rsn18 crops", 120,
         family_sec("crops_per_sec_rsn18_256x192", _rsn18_cfg, 128, True)),
        ("shufflenet crops", 120,
         family_sec("crops_per_sec_shufflenetv2_plus_256x192",
                    _shufflenet_cfg, 256, True)),
        ("w32 noflip bf16", 120,
         family_sec("crops_per_sec_w32_256x192_noflip", _headline_cfg,
                    128, False)),
        # engine BEFORE the w48 pair: it carries four keys (incl. the
        # chip-resident point) while w48 is the costliest single-key
        # depth metric — the skip risk belongs on w48
        ("engine", 260, sec_engine),
        ("w48 bf16", 140,
         family_sec("crops_per_sec_w48_384x288", _w48_cfg, 48, True)),
        ("w48 int8", 160,
         family_sec("crops_per_sec_w48_384x288_int8", _w48_cfg, 48, True,
                    True)),
        # depth point for the RSN-50 configs (VERDICT r4 item 3); last =
        # first skipped on slow relays
        ("rsn50 train", 160, sec_rsn50_train),
    ]
    # Adaptive budgeting: the relay's compile speed varies run to run
    # (observed 200 -> 650 s for the same train section across days), so
    # each section's estimate is scaled by the running ratio of actual
    # to estimated wall time of the sections completed so far — slow
    # days skip the tail earlier, fast days fit everything.
    skipped = []
    est_done, act_done = 280.0, time.perf_counter() - t0  # headline est
    for name, est, fn in sections:
        ratio = max(1.0, act_done / max(est_done, 1.0))
        scaled = est * ratio
        if remaining() < scaled:
            log(f"skipping {name}: {remaining():.0f}s left < "
                f"{scaled:.0f}s scaled est (x{ratio:.2f})")
            skipped.append(name)
            continue
        mark(name)
        sec_t0 = time.perf_counter()
        ok = True
        try:
            fn()
        except Exception as e:      # secondary metric must not kill the run
            ok = False
            log(f"{name} failed: {e!r}")
        if ok:
            # only completed sections inform the time-scaling ratio: a
            # crash's near-zero wall time against its full estimate would
            # deflate the ratio and let tail sections start without
            # budget (advisor r4 finding)
            est_done += est
            act_done += time.perf_counter() - sec_t0
    if skipped:
        result["sections_skipped"] = skipped
    mark("done")


def _host_init(jax, jnp, model, shape, seed=0):
    """Bench-grade init with ZERO compiles: eval_shape the init (pure
    tracing), fill the tree host-side with seeded numpy (BN var/scale =
    1, everything else small normal), device_put to the chip.  The init
    COMPILE — not the infer compile — was the bulk of every bench
    section's wall time (~100 s through the axon relay per model; the
    round-4 parallel-compile experiment isolated it), and throughput is
    invariant to the weight values, so the bench skips real
    initialization entirely."""
    return jax.device_put(_host_variables(jax, jnp, model, shape, seed),
                          jax.devices()[0])


def _host_variables(jax, jnp, model, shape, seed=0):
    """eval_shape the init and fill the tree with seeded numpy host
    arrays (no device work at all)."""
    variables = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros(shape, jnp.float32),
                             train=False), jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        last = names[-1] if names else ""
        if last in ("var", "scale"):
            arr = np.ones(leaf.shape, leaf.dtype)
        elif last in ("mean", "bias"):
            arr = np.zeros(leaf.shape, leaf.dtype)
        else:
            arr = (rng.standard_normal(leaf.shape) * 0.03).astype(
                leaf.dtype)
        return arr

    return jax.tree_util.tree_map_with_path(fill, variables)


def _host_train_state(jax, jnp, model, shape, tx, apply_fn=None):
    """TrainState built entirely host-side (numpy variables, CPU-backend
    optax init), then device_put to the chip — replaces the ~100 s
    relay-compiled init per train section."""
    from flax.core import FrozenDict

    from udp_pose_tpu.core.train import TrainState

    host = _host_variables(jax, jnp, model, shape)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = TrainState.create(
            apply_fn or model.apply, host["params"],
            host.get("batch_stats", FrozenDict()), tx)
    return jax.device_put(state, jax.devices()[0])


def _zoo_cfg(yaml_name):
    """Canonical shipped config → bench config (bf16 compute)."""
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


def _rsn50_cfg():
    """RSN-50 256×192, 6.4 GFLOPs (RSN/README.md:29 — LAYERS [3,4,6,3])."""
    return _zoo_cfg("rsn50_256x192.yaml")


def _shufflenet_cfg():
    """Mobile-zoo point: ShuffleNetV2+ Small 256×192."""
    return _zoo_cfg("shufflenetv2_plus_small_256x192.yaml")


def family_setup(jax, jnp, cfg, batch, flip=True, quantize=False,
                 prepare=True, flip_mode="fold", cache=None):
    """Build the EXACT graph a family section times: returns
    ``(infer, variables, (images, center, scale))`` with inputs already
    device_put.  Shared by :func:`bench_family` (which times it) and
    tools/profile_roofline.py (which lowers the same jit fn to account
    its optimized HLO — the attribution is only honest if the lowered
    graph IS the benched graph)."""
    from udp_pose_tpu.core.infer import make_infer_fn
    from udp_pose_tpu.models import build_model

    w, h = cfg.MODEL.IMAGE_SIZE
    # ``cache`` ({} shared across sections) reuses the built model, the
    # host-filled variables, and — between int8 sections of the same
    # family — the calibration forward's compile + the prepared kernels.
    key = (cfg.MODEL.NAME, w, h, cfg.TPU.DTYPE)
    if cache is not None and key in cache:
        model, variables = cache[key]
    else:
        model = build_model(cfg)
        variables = _host_init(jax, jnp, model, (1, h, w, 3))
        if cache is not None:
            cache[key] = (model, variables)
    if quantize:
        from udp_pose_tpu.core.infer import serving_normalizer
        from udp_pose_tpu.models.quantize import QuantizedModel, calibrate
        qkey = key + ("int8", prepare)
        if cache is not None and qkey in cache:
            model, variables = cache[qkey]
        else:
            from udp_pose_tpu.core.infer import cast_to_compute_dtype
            normalize_images = serving_normalizer(cfg)
            cal = np.random.default_rng(4).integers(
                0, 256, (32, h, w, 3)).astype(np.uint8)
            # calibrate on the SAME input distribution serving feeds the
            # stem conv — incl. the early bf16 cast (advisor r4: fp32
            # calibration vs bf16 serving skews the stem's amax)
            scales = calibrate(model, variables, [cast_to_compute_dtype(
                model, normalize_images(cal))])
            model = QuantizedModel(model, scales)
            if prepare:
                variables = model.prepare_variables(variables)
            if cache is not None:
                cache[qkey] = (model, variables)
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
                              kpd=cfg.LOSS.KPD, flip_mode=flip_mode,
                              return_heatmaps=False)
    rng_np = np.random.default_rng(3)
    images = jax.device_put(rng_np.integers(
        0, 256, (batch, h, w, 3)).astype(np.uint8))
    center = jax.device_put(np.tile(
        np.array([[128.0, 128.0]], np.float32), (batch, 1)))
    scale = jax.device_put(np.tile(
        np.array([[0.96, 1.28]], np.float32), (batch, 1)))
    return infer, variables, (images, center, scale)


def bench_family(jax, jnp, cfg, batch, iters=(6, 18), flip=True,
                 quantize=False, prepare=True, flip_mode="fold",
                 cache=None):
    """Full inference pipeline (flip test + decode) crops/s for one
    config, same differencing method as the headline.  ``flip=False``
    is the serving protocol (no flip-test fold) — the raw-throughput
    shape most deployments run.  ``quantize`` amax-calibrates on one
    batch and serves w8a8 int8 (models/quantize.py); ``prepare=False``
    keeps the per-forward in-graph weight requant (A/B knob for
    tools/profile_int8.py).  ``flip_mode``: the w32-class sections pass
    two_pass (two B-sized forwards, +4-6% at B=128 — round-4 phase
    study); w48 keeps fold (two_pass measured 2.6x slower at B=48)."""
    infer, variables, (images, center, scale) = family_setup(
        jax, jnp, cfg, batch, flip=flip, quantize=quantize,
        prepare=prepare, flip_mode=flip_mode, cache=cache)
    w, h = cfg.MODEL.IMAGE_SIZE
    checksum = jax.jit(lambda p: jnp.sum(p))

    def timed(n):
        # NOTE: on the axon-relay platform block_until_ready() does not
        # actually await remote execution; a scalar device→host readback
        # does, so we sync through a checksum transfer.
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
    state = _host_train_state(jax, jnp, model, (1, 256, 192, 3),
                              make_optimizer(cfg, 1000))
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


def bench_rsn_train(jax, jnp, batch=128, cfg_fn=None):
    """RSN-family train-step samples/s (fwd+bwd+adam, 5-kernel label
    pyramid, OHKM loss — the reference's RSN/exps/*/train.py workload).
    Default RSN18 at its measured B=128 knee
    (tools/profile_rsn_train.py batch scan); ``cfg_fn`` picks another
    family member (e.g. _rsn50_cfg)."""
    from udp_pose_tpu.core.rsn import make_rsn_optimizer, make_rsn_train_step
    from udp_pose_tpu.core.train import TrainState
    from udp_pose_tpu.models import build_model

    cfg = (cfg_fn or _rsn18_cfg)()
    model = build_model(cfg)
    tx = make_rsn_optimizer(cfg.TRAIN.LR, cfg.TRAIN.WD, 96000)
    state = _host_train_state(
        jax, jnp, model, (1, 256, 192, 3), tx,
        apply_fn=lambda v, x, **kw: model.apply(v, x, **kw))
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
    layers = tuple(cfg.MODEL.EXTRA.get("LAYERS", (2, 2, 2, 2)))
    log(f"rsn{'50' if layers == (3, 4, 6, 3) else '18'} train step "
        f"B={batch}: {sps:.1f} samples/s ({best * 1e3:.2f} ms)")
    return sps


def bench_engine(jax, frames=16):
    """Fused detect+pose serving path (engine/fused.py): 720p frame →
    device letterbox → YOLOv5n → device top-k+NMS → 16 pose crops
    (flip-test) → decode, ONE dispatch + ONE readback per frame — the
    latency a video/webcam user sees (reference inference_engine.py
    round-trips the host 4+ times per frame instead).

    Returns (fps, fps_low_bw, bytes_low_bw, fps_pipelined, fps_chip):
    ``fps_chip`` re-times the same fused graph with the frame staged in
    HBM (device_put once) — the chip-bound rate with no relay-link
    upload per frame, separating chip capability from tunnel bandwidth
    (VERDICT r3 item 4)."""
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

    # chip-resident variant: same compiled graph, frame pre-staged in
    # HBM; differenced block timing cancels the fixed dispatch latency,
    # leaving per-frame chip time.
    fps_chip = None
    try:
        import jax.numpy as jnp
        run = eng._runs[(720, 1280)]
        frame_d = jax.device_put(frame)
        checksum = jax.jit(lambda p: jnp.sum(p))

        def block(n):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = run(eng._pose.variables, eng.yolo_vars, frame_d)
            float(checksum(out[0]))
            return time.perf_counter() - t0

        block(2)
        t_small, t_large = block(6), block(18)
        per_frame = (t_large - t_small) / 12.0
        fps_chip = 1.0 / per_frame
        log(f"chip-resident fused engine: {fps_chip:.1f} fps "
            f"({per_frame * 1e3:.1f} ms/frame, frame staged in HBM)")
    except Exception as e:
        log(f"chip-resident engine bench failed: {e!r}")

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
    return 1.0 / best, 1.0 / best_lb, bytes_lb, fps_pipe, fps_chip


if __name__ == "__main__":
    main()
