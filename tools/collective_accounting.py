"""HLO collective accounting for the sharded w32 train step.

The virtual-8-device sharding-efficiency figure (tools/bench_scaling.py,
DESIGN.md round-2) is confounded by XLA-CPU host contention — it upper-
bounds real partitioning overhead but predicts nothing.  This tool
replaces it with the honest maximum available without multi-chip
hardware: compile the REAL sharded train step for an 8-device mesh,
walk the optimized (post-GSPMD) HLO, and account every collective —
op kind, count, tensor bytes, and ring-model bytes-on-the-wire per
chip — then model v5e-8 step-time overhead against the measured
single-chip step.

  python tools/collective_accounting.py              # reduced proxy net
  python tools/collective_accounting.py --full       # full w32 256x192

Modes accounted (the dryrun_multichip parallelisms):
  dp8        pure data parallel (8-way batch)
  dp4sp2     batch x input-height ('model' axis: GSPMD conv halos)
  dp4tp2     batch x channel tensor parallel (parallel/mesh.py)

Ring model (the scaling-book recipe): an all-reduce of N payload bytes
over an a-device axis moves 2(a-1)/a * N per chip; an all-gather of
gathered size G moves (a-1)/a * G; a reduce-scatter to output O moves
(a-1) * O; a collective-permute moves its buffer.
v5e ICI: 1600 Gbps per chip per direction (public v5e spec) = 200 GB/s;
a 2x4 v5e-8 slice rings both mesh axes over ICI.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

_SHAPE_RE = re.compile(r"(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\]")
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")
# fusions/calls can't contain collectives; only scan computation bodies
_OP_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\(?.*?\)?)\s*"
    r"(" + "|".join(_COLLECTIVES) + r")(-start|-done)?\(")


def _shape_bytes(shape_text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_GROUPS_LIST_RE = re.compile(r"replica_groups=\{\{([\d,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]<=")


def _group_size(line: str):
    """Per-op participant count from replica_groups (None if absent or
    the all-devices shorthand ``{}``)."""
    m = _GROUPS_LIST_RE.search(line)
    if m:
        return m.group(1).count(",") + 1
    m = _GROUPS_IOTA_RE.search(line)
    if m:                      # iota form [groups, group_size]<=[n]
        return int(m.group(2))
    return None


def _shapes_in(text: str):
    out = []
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append(n * _DTYPE_BYTES[dt])
    return out


def _result_payload(kind: str, is_start: bool, result_text: str) -> int:
    """Payload bytes from an op's RESULT shape(s).

    Operands print as bare ``%names`` in optimized HLO, so the result is
    the only parseable source; its tuple structure is kind-dependent:
    XLA's all-reduce combiner merges many gradients into one op whose
    result tuple lists every reduced tensor (sum), an async
    ``all-reduce-start`` result is (inputs..., outputs...) — equal
    halves (sum/2) — and all-gather/collective-permute ``-start``
    results pair the small input with the payload (max).
    """
    shapes = _shapes_in(result_text)
    if not shapes:
        return 0
    if kind == "all-reduce":
        total = sum(shapes)
        return total // 2 if is_start else total
    if kind in ("all-gather", "collective-permute"):
        return max(shapes)          # gathered size / permuted buffer
    if kind == "reduce-scatter":
        # sync result = scattered output (tuple-combined: sum); -start
        # pairs the big input with the small output: the output is min
        return min(shapes) if is_start else sum(shapes)
    return max(shapes)              # all-to-all


def account_hlo(hlo_text: str, default_group: int = 8):
    """Collective census of one optimized HLO module.

    Returns {op_kind: {"count": n, "bytes": N, "by_group": {a: N_a}}}
    where ``bytes`` is each op's payload from its result shape(s) (see
    :func:`_result_payload`), attributed per replica-group size ``a`` so
    the ring model can cost each op at ITS OWN axis.  ``-start``/
    ``-done`` async pairs are counted once (on the -start).
    """
    out = {}
    for line in hlo_text.splitlines():
        m = _OP_RE.match(line)
        if not m or m.group(3) == "-done":
            continue
        result_text, kind = m.group(1), m.group(2)
        a = _group_size(line) or default_group
        n = _result_payload(kind, m.group(3) == "-start", result_text)
        ent = out.setdefault(kind, {"count": 0, "bytes": 0,
                                    "by_group": {}})
        ent["count"] += 1
        ent["bytes"] += n
        ent["by_group"][a] = ent["by_group"].get(a, 0) + n
    return out


def _ring_factor(kind: str, a: int) -> float:
    """Wire bytes per chip per payload byte N (ring algorithms), with
    N as :func:`_result_payload` defines it: all-reduce 2(a-1)/a * N
    (N = reduced tensors); all-gather (a-1)/a * N (N = gathered size);
    reduce-scatter (a-1) * N (N = scattered output); permute N."""
    if a <= 1:
        return 0.0
    if kind == "all-reduce":
        return 2 * (a - 1) / a
    if kind in ("all-gather", "all-to-all"):
        return (a - 1) / a
    if kind == "reduce-scatter":
        return float(a - 1)
    return 1.0                                  # collective-permute


def wire_bytes_per_chip(census, axis_size: int) -> int:
    """Ring-model bytes through each chip's ICI links for one step.

    Each op is costed at its own replica-group size (``by_group``);
    ``axis_size`` is only the fallback for censuses without group info
    (e.g. hand-written test HLO with ``replica_groups={}``)."""
    total = 0.0
    for kind, ent in census.items():
        groups = ent.get("by_group") or {axis_size: ent["bytes"]}
        for a, n in groups.items():
            total += _ring_factor(kind, a or axis_size) * n
    return int(total)


def build_step(full, per_chip_batch: int, n_data: int, n_model: int):
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _hrnet_w32_cfg, _reduced_flagship_cfg
    from udp_pose_tpu.core.loss import make_loss_fn
    from udp_pose_tpu.core.train import create_train_state, make_train_step
    from udp_pose_tpu.models import build_model
    from udp_pose_tpu.parallel import (make_mesh, replicated,
                                       tensor_parallel_sharding)

    if full in ("full", True):
        cfg = _hrnet_w32_cfg((192, 256), (48, 64), dtype="bfloat16")
        img_hw, tgt_hw = (256, 192), (64, 48)
    elif full == "real-shapes":
        # full 256x192 shapes, 1 module/stage: the per-layer collective
        # SHAPES (halo rows, activation gathers) are exact; only the
        # repeat count differs from the full net — the dp grad
        # all-reduce is scaled analytically instead (bytes = param
        # bytes, exact by construction).  The full-topology XLA-CPU
        # 8-device compile measures in hours on this host; this mode
        # compiles in minutes.
        cfg = _hrnet_w32_cfg((192, 256), (48, 64), dtype="bfloat16")
        for k in ("STAGE2", "STAGE3", "STAGE4"):
            cfg.MODEL.EXTRA[k]["NUM_MODULES"] = 1
        img_hw, tgt_hw = (256, 192), (64, 48)
    else:
        cfg = _reduced_flagship_cfg()
        img_hw, tgt_hw = (64, 64), (16, 16)

    mesh = make_mesh(n_data, n_model,
                     devices=jax.devices()[:n_data * n_model])
    model = build_model(cfg)
    # shapes only — eval_shape the whole state so the (expensive on
    # XLA-CPU) init/optimizer graphs are never compiled; only the step
    # itself compiles, which is the artifact being accounted
    state = jax.eval_shape(
        lambda: create_train_state(cfg, model, jax.random.PRNGKey(0), 10))
    step = make_train_step(make_loss_fn(cfg))

    B = per_chip_batch * n_data
    img_sh = NamedSharding(mesh, P("data", "model" if n_model > 1 else None,
                                   None, None))
    tgt_sh = NamedSharding(mesh, P("data"))
    batch_structs = {
        "image": jax.ShapeDtypeStruct((B, *img_hw, 3), np.float32,
                                      sharding=img_sh),
        "target": jax.ShapeDtypeStruct((B, 51, *tgt_hw), np.float32,
                                       sharding=tgt_sh),
        "target_weight": jax.ShapeDtypeStruct((B, 17), np.float32,
                                              sharding=tgt_sh),
    }

    def sharding_of(s):
        if n_model > 1:
            return tensor_parallel_sharding(s, mesh)
        return jax.tree_util.tree_map(lambda _: replicated(mesh), s)

    state_structs = jax.tree_util.tree_map(
        lambda x, sh: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
        state, sharding_of(state))
    return step, state_structs, batch_structs, mesh


def run_mode(name, full, per_chip_batch, n_data, n_model, sp=False):
    # ``full``: False/'reduced' | 'real-shapes' | True/'full' 
    """Compile one mode and return its census dict."""
    import jax
    step, state_structs, batch_structs, mesh = build_step(
        full, per_chip_batch, n_data, n_model)
    if not sp and n_model > 1:
        # tp-only: keep the image batch-sharded (no height split)
        from jax.sharding import NamedSharding, PartitionSpec as P
        s = batch_structs["image"]
        batch_structs["image"] = jax.ShapeDtypeStruct(
            s.shape, s.dtype,
            sharding=NamedSharding(mesh, P("data", None, None, None)))
    if sp and n_model > 1:
        # sp-only: params replicated, image height sharded
        from udp_pose_tpu.parallel import replicated
        state_structs = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=replicated(mesh)),
            state_structs)
    compiled = step.lower(state_structs, batch_structs).compile()
    census = account_hlo(compiled.as_text(),
                         default_group=n_data * n_model)
    cost = compiled.cost_analysis()
    flops = (cost or {}).get("flops", 0.0)
    return census, flops


MODES = (
    # (name, n_data, n_model, sp)
    ("dp8", 8, 1, False),
    ("dp4sp2", 4, 2, True),
    ("dp4tp2", 4, 2, False),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="full w32 256x192 (XLA-CPU compile: hours)")
    ap.add_argument("--real-shapes", action="store_true",
                    help="1 module/stage at the REAL 256x192 shapes "
                         "(exact per-layer collective shapes, minutes)")
    ap.add_argument("--per-chip-batch", type=int, default=None,
                    help="default: 16 full / 2 reduced")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
    import jax
    jax.config.update("jax_platforms", "cpu")

    mode = ("full" if args.full
            else "real-shapes" if args.real_shapes else False)
    pcb = args.per_chip_batch or (16 if mode else 2)
    ICI_BPS = 200e9          # v5e: 1600 Gbps/chip/direction (public spec)
    rows = []
    for name, n_data, n_model, sp in MODES:
        census, flops = run_mode(name, mode, pcb, n_data, n_model,
                                 sp=sp)
        # each op is costed at its own replica-group size (parsed from
        # the HLO); the fallback only applies to group-less ops
        wire = wire_bytes_per_chip(census, n_data * n_model)
        t_ici_ms = wire / ICI_BPS * 1e3
        rows.append({"mode": name, "census": census,
                     "wire_bytes_per_chip": wire,
                     "t_ici_ms": round(t_ici_ms, 3),
                     "flops_per_step": flops})
        if not args.json:
            print(f"== {name} (per-chip batch {pcb}, "
                  f"{mode or 'reduced proxy'})")
            for kind in sorted(census):
                ent = census[kind]
                print(f"   {kind:20s} x{ent['count']:<4d} "
                      f"{ent['bytes'] / 1e6:10.2f} MB result")
            print(f"   wire/chip {wire / 1e6:.2f} MB -> "
                  f"{t_ici_ms:.3f} ms at {ICI_BPS / 1e9:.0f} GB/s ICI",
                  flush=True)
    if args.json:
        print(json.dumps(rows))
    return rows


if __name__ == "__main__":
    main()
