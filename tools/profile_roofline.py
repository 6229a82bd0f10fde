"""Per-fusion roofline attribution for the serving + train graphs.

VERDICT r4 item 1: the claim "every remaining millisecond is conv HBM
traffic" had never been shown as a per-fusion table.  This tool produces
that table.  `jax.profiler.start_trace` HANGS through the axon relay
(measured round 5: the trace RPC never returns), so attribution uses the
VERDICT's sanctioned alternative — the compiled, *scheduled* HLO
(`compiled.as_text()`), which on the TPU backend carries XLA's own
per-instruction cost model (`backend_config.estimated_cycles`) and the
chosen conv emitter (`convolution_algorithm_config.emitter`).

For every top-level instruction of the entry computation:

* **HBM bytes** — operand + result buffer sizes from a module-wide
  symbol table.  Fusion internals live in VMEM by construction, so a
  fusion's HBM traffic is exactly its operands + outputs; buffers
  annotated ``S(1)`` (VMEM-resident, e.g. prefetched weights via
  copy-start/copy-done) are excluded from the HBM side of the op that
  consumes them and charged once at the prefetch copy.
* **MXU FLOPs** — conv/dot dims parsed from the (possibly fused)
  bodies, recursing through ``calls=``; validated against
  ``compiled.cost_analysis()['flops']``.
* **t_model** — estimated_cycles / implied_clock, where implied_clock
  calibrates sum(cycles) to the MEASURED wall per-iter of the same jit
  graph (bench.family_setup — the lowered graph IS the benched graph).
  The implied clock is printed: if it sits near the physical TPU clock
  the cost model and the hardware agree and the per-op shares are
  trustworthy; if not, the run says so instead of pretending.
* **t_roofline** — max(bytes / HBM_BW, flops / peak(dtype)): the
  instruction's own speed-of-light on v5e (819 GB/s HBM; 197 bf16 /
  394 int8 TFLOP/s peak — public v5e spec).

``achieved %`` = t_roofline / t_model per instruction: how close XLA's
own cost model says the op runs to its own bound.  Ops far from BOTH
bounds are the levers; ops at their memory bound are closed.

Usage:
  python tools/profile_roofline.py --graph serve_int8   # headline
  python tools/profile_roofline.py --graph serve_bf16
  python tools/profile_roofline.py --graph train
  python tools/profile_roofline.py --graph w48_bf16 --batch 48
  python tools/profile_roofline.py --hlo-file f.txt --measured-ms 41.0

Reference anchor: this closes the measurement chain for the north-star
metric (BASELINE.md; reference IPS print deep_hrnet/lib/core/function.py
:141-145 — the reference never attributes its own time at all).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

HBM_BW = 819e9              # v5e HBM: 819 GB/s (public spec)
PEAK = {"s8": 394e12, "u8": 394e12, "s4": 394e12,
        "bf16": 197e12, "f16": 197e12,
        # v5e has no fp32 MXU mode; XLA runs f32 dots via bf16x3-style
        # passes — 1/4 bf16 is the conventional planning number
        "f32": 197e12 / 4, "s32": 394e12}

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

# one buffer: dtype[dims]{layout...} — layout text (incl. S(1)) runs to
# the closing brace; tuples repeat this
_BUF_RE = re.compile(
    r"(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\](\{[^{}]*\})?")

_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\(?.*?\)?)\s*"
    r"([a-z][a-z0-9\-_]*)\(")

_COMP_RE = re.compile(r"^(ENTRY\s+)?%([^\s(]+)\s*\(.*\{\s*$")
_CYCLES_RE = re.compile(r'"estimated_cycles":"(\d+)"')
_CALLS_RE = re.compile(r"calls=%?([\w.\-]+)")
_TO_APPLY_RE = re.compile(r"to_apply=%?([\w.\-]+)")
_WINDOW_RE = re.compile(r"window=\{([^}]*)\}")
_DIMLABELS_RE = re.compile(r"dim_labels=([\w?]+)_([\w?]+)->([\w?]+)")
_FGC_RE = re.compile(r"feature_group_count=(\d+)")
_BGC_RE = re.compile(r"batch_group_count=(\d+)")
_LHS_C_RE = re.compile(r"lhs_contracting_dims=\{([\d,]*)\}")
_OPNAME_RE = re.compile(r'op_name="([^"]*)"')
_EMITTER_RE = re.compile(r'"emitter":"(\w+)"')
_TRIP_RE = re.compile(r'"known_trip_count":\{"n":"(\d+)"\}')

# result-only pseudo-ops / markers: no HBM work of their own
_SKIP_OPS = {"parameter", "constant", "get-tuple-element", "tuple",
             "bitcast", "copy-done", "after-all", "partition-id",
             "replica-id", "iota", "rng-bit-generator", "opt-barrier"}


def _buffers(shape_text):
    """[(dtype, dims, bytes, in_vmem)] for every buffer in a (possibly
    tuple) shape string."""
    out = []
    for dt, dims_s, layout in _BUF_RE.findall(shape_text):
        dims = [int(d) for d in dims_s.split(",") if d]
        n = 1
        for d in dims:
            n *= d
        out.append((dt, dims, n * _DTYPE_BYTES[dt],
                    "S(1)" in (layout or "") or "S(2)" in (layout or "")))
    return out


class Instr:
    __slots__ = ("name", "shape_text", "op", "operands", "rest",
                 "cycles", "line")

    def __init__(self, name, shape_text, op, operands, rest, line):
        self.name, self.shape_text, self.op = name, shape_text, op
        self.operands, self.rest, self.line = operands, rest, line
        m = _CYCLES_RE.search(rest)
        self.cycles = int(m.group(1)) if m else 0


def parse_module(text):
    """{computation_name: [Instr]}, plus entry computation name."""
    comps, cur, cur_name, entry = {}, None, None, None
    for line in text.splitlines():
        m = _COMP_RE.match(line)
        if m and ("->" in line):
            cur_name = m.group(2)
            cur = comps.setdefault(cur_name, [])
            if m.group(1):
                entry = cur_name
            continue
        if line.strip() == "}":
            cur = None
            continue
        if cur is None:
            continue
        mi = _INSTR_RE.match(line)
        if not mi:
            continue
        name, shape_text, op = mi.group(1), mi.group(2), mi.group(3)
        # operand span: from the opcode's '(' to its matching ')'
        start = mi.end()
        depth, i = 1, start
        while i < len(line) and depth:
            if line[i] == "(":
                depth += 1
            elif line[i] == ")":
                depth -= 1
            i += 1
        span = line[start:i - 1]
        operands = re.findall(r"%([\w.\-]+)", span)
        cur.append(Instr(name, shape_text, op, operands, line[i:], line))
    return comps, entry


def _parse_window(rest, ndims):
    """window={size=KxK stride=.. pad=lo_hixlo_hi lhs_dilate=.. rhs_dilate=..}
    → per-dim dicts.  Missing fields default to identity."""
    d = {"size": [1] * ndims, "stride": [1] * ndims,
         "pad": [(0, 0)] * ndims, "lhs_dilate": [1] * ndims,
         "rhs_dilate": [1] * ndims}
    m = _WINDOW_RE.search(rest)
    if not m:
        return d
    for field in m.group(1).split():
        if "=" not in field:
            continue
        key, val = field.split("=", 1)
        parts = val.split("x")
        if key == "pad":
            d["pad"] = [tuple(int(v) for v in p.split("_"))
                        for p in parts]
        elif key in d:
            d[key] = [int(p) for p in parts]
    return d


def _valid_taps(in_size, k, stride, pad, lhs_dil, rhs_dil, out_size):
    """Σ over output positions of valid (non-padding) kernel taps for one
    spatial dim — the exact conv FLOP count honors padding, which is how
    XLA's canonicalized operand-swapped convs (window = input size, pad =
    window-1: ONE valid tap per position) count correctly instead of
    thousands of times too high."""
    in_dilated = (in_size - 1) * lhs_dil + 1 if in_size else 0
    total = 0
    for o in range(out_size):
        start = o * stride - pad[0]
        n = 0
        for t in range(k):
            pos = start + t * rhs_dil
            if 0 <= pos < in_dilated and (lhs_dil == 1
                                          or pos % lhs_dil == 0):
                n += 1
        total += n
    return total


def _conv_flops(instr, table):
    """Exact algorithmic FLOPs of one convolution instruction:
    2 * out_nonspatial * Cin_per_group * prod(valid taps per dim)."""
    bufs = _buffers(instr.shape_text)
    if not bufs:
        return 0
    out_dims = bufs[0][1]
    out_elems = 1
    for d in out_dims:
        out_elems *= d
    if len(instr.operands) < 2 or instr.operands[1] not in table \
            or instr.operands[0] not in table:
        return 0
    kshape = _buffers(table[instr.operands[1]].shape_text)
    ishape = _buffers(table[instr.operands[0]].shape_text)
    if not kshape or not ishape:
        return 0
    kdims, idims = kshape[0][1], ishape[0][1]
    m = _DIMLABELS_RE.search(instr.rest)
    if m:
        ilab, klab, olab = m.group(1), m.group(2), m.group(3)
    else:
        ilab, klab, olab = "b01f", "01io", "b01f"
    spatial_pos = [i for i, c in enumerate(klab) if c.isdigit()]
    # spatial order: sort by digit so window dims line up
    spatial_pos.sort(key=lambda i: klab[i])
    ksp = [kdims[i] for i in spatial_pos]
    cin = kdims[klab.index("i")] if "i" in klab else 1
    isp_pos = sorted([i for i, c in enumerate(ilab) if c.isdigit()],
                     key=lambda i: ilab[i])
    isp = [idims[i] for i in isp_pos]
    osp_pos = sorted([i for i, c in enumerate(olab) if c.isdigit()],
                     key=lambda i: olab[i])
    osp = [out_dims[i] for i in osp_pos]
    out_spatial = 1
    for d in osp:
        out_spatial *= d
    out_nonspatial = out_elems // max(out_spatial, 1)
    win = _parse_window(instr.rest, len(ksp))
    taps = 1
    for dim in range(len(ksp)):
        taps *= _valid_taps(isp[dim], ksp[dim], win["stride"][dim],
                            win["pad"][dim], win["lhs_dilate"][dim],
                            win["rhs_dilate"][dim], osp[dim])
    return 2 * out_nonspatial * cin * taps


def _dot_flops(instr, table):
    bufs = _buffers(instr.shape_text)
    if not bufs or not instr.operands or instr.operands[0] not in table:
        return 0
    out_elems = 1
    for d in bufs[0][1]:
        out_elems *= d
    lhs = _buffers(table[instr.operands[0]].shape_text)
    if not lhs:
        return 0
    m = _LHS_C_RE.search(instr.rest)
    k = 1
    if m:
        for idx in m.group(1).split(","):
            if idx:
                k *= lhs[0][1][int(idx)]
    return 2 * out_elems * k


def _mxu_dtype(instr, table):
    """dtype the MXU sees: the lhs operand's element type."""
    if instr.operands and instr.operands[0] in table:
        bufs = _buffers(table[instr.operands[0]].shape_text)
        if bufs:
            return bufs[0][0]
    bufs = _buffers(instr.shape_text)
    return bufs[0][0] if bufs else "f32"


def flops_of(instr, comps, table, _depth=0):
    """MXU flops of an instruction, recursing into called computations.
    Returns (flops, mxu_dtype or None)."""
    if _depth > 12:
        return 0, None
    if instr.op == "convolution":
        return _conv_flops(instr, table), _mxu_dtype(instr, table)
    if instr.op == "dot":
        return _dot_flops(instr, table), _mxu_dtype(instr, table)
    total, dt = 0, None
    for attr_re in (_CALLS_RE,):
        m = attr_re.search(instr.rest)
        if m and m.group(1) in comps:
            trip = 1
            if instr.op == "while":
                t = _TRIP_RE.search(instr.rest)
                trip = int(t.group(1)) if t else 1
            for sub in comps[m.group(1)]:
                f, d = flops_of(sub, comps, table, _depth + 1)
                total += f * trip
                dt = dt or d
    # while bodies hang off a different attr
    if instr.op == "while":
        for mm in re.finditer(r"(?:body|condition)=%?([\w.\-]+)",
                              instr.rest):
            if mm.group(1) in comps:
                for sub in comps[mm.group(1)]:
                    f, d = flops_of(sub, comps, table, _depth + 1)
                    total += f
                    dt = dt or d
    return total, dt


def _hbm_bytes(instr, table):
    """HBM bytes an entry-level instruction moves: non-VMEM operand
    reads + non-VMEM result writes.  copy-start counts its source read
    once (the VMEM write is free HBM-wise); async -done markers are
    skipped entirely by the caller."""
    read = 0
    for op_name in instr.operands:
        prod = table.get(op_name)
        if prod is None:
            continue
        for _, _, nbytes, in_vmem in _buffers(prod.shape_text):
            if not in_vmem:
                read += nbytes
    write = 0
    if instr.op != "copy-start":
        for _, _, nbytes, in_vmem in _buffers(instr.shape_text):
            if not in_vmem:
                write += nbytes
    return read + write


def _group_key(instr):
    """Layer-ish grouping from the op_name metadata path."""
    m = _OPNAME_RE.search(instr.line)
    if not m:
        return "(no-metadata)"
    parts = [p for p in m.group(1).split("/")
             if not p.startswith("jit(") and p]
    return "/".join(parts[:2]) if parts else "(top)"


def analyze(text):
    """Account every entry instruction; returns (rows, totals)."""
    comps, entry = parse_module(text)
    table = {}
    for instrs in comps.values():
        for ins in instrs:
            table[ins.name] = ins
    rows = []
    for ins in comps.get(entry, []):
        if ins.op in _SKIP_OPS or ins.op.endswith("-done"):
            continue
        flops, mxu_dt = flops_of(ins, comps, table)
        if ins.op.endswith("-start"):
            # async DMA (copy-start / slice-start / async-start): the
            # result tuple ALIASES the full source buffer, so naive
            # operand+result counting multiplies the traffic.  Real HBM
            # bytes = the transferred extent (the smallest non-sync
            # result buffer), once if the destination is VMEM (S(1) —
            # the usual prefetch), twice for HBM->HBM.
            bufs = [(b, v) for _, _, b, v in _buffers(ins.shape_text)
                    if b > 16]
            if bufs:
                size = min(b for b, _ in bufs)
                to_vmem = any(v for b, v in bufs if b == size)
                nbytes = size if to_vmem else 2 * size
            else:
                nbytes = 0
        else:
            nbytes = _hbm_bytes(ins, table)
        em = _EMITTER_RE.search(ins.line)
        rows.append({
            "name": ins.name, "op": ins.op, "cycles": ins.cycles,
            "bytes": nbytes, "flops": flops,
            "mxu_dtype": mxu_dt, "emitter": em.group(1) if em else None,
            "group": _group_key(ins),
        })
    totals = {
        "cycles": sum(r["cycles"] for r in rows),
        "bytes": sum(r["bytes"] for r in rows),
        "flops": sum(r["flops"] for r in rows),
        "n_instructions": len(rows),
    }
    return rows, totals


def _t_roofline(row):
    t_mem = row["bytes"] / HBM_BW
    peak = PEAK.get(row["mxu_dtype"] or "f32", PEAK["f32"])
    t_mxu = row["flops"] / peak if row["flops"] else 0.0
    return max(t_mem, t_mxu), ("mxu" if t_mxu > t_mem else "hbm")


def report(rows, totals, measured_s=None, top=15, label=""):
    """Assemble the attribution report dict + print the table."""
    cyc_total = max(totals["cycles"], 1)
    clock = (cyc_total / measured_s) if measured_s else None
    out_rows = []
    for r in rows:
        t_roof, bound = _t_roofline(r)
        t_model = r["cycles"] / clock if clock else None
        out_rows.append(dict(
            r, t_roofline_us=t_roof * 1e6, bound=bound,
            t_model_us=(t_model * 1e6 if t_model is not None else None),
            achieved_pct=(100.0 * t_roof / t_model
                          if t_model else None),
            cycles_share_pct=100.0 * r["cycles"] / cyc_total))
    out_rows.sort(key=lambda r: -r["cycles"])
    sum_roof = sum(r["t_roofline_us"] for r in out_rows) / 1e6

    print(f"\n== {label}: {totals['n_instructions']} entry instructions, "
          f"{totals['flops'] / 1e9:.1f} GFLOP, "
          f"{totals['bytes'] / 1e6:.0f} MB HBM touched")
    if measured_s:
        print(f"   measured {measured_s * 1e3:.2f} ms/it | sum-of-rooflines "
              f"{sum_roof * 1e3:.2f} ms ({100 * sum_roof / measured_s:.0f}% "
              f"of measured) | implied clock "
              f"{cyc_total / measured_s / 1e9:.2f} GHz")
    hdr = (f"   {'instruction':34s} {'op':12s} {'cyc%':>5s} "
           f"{'t_model':>8s} {'t_roof':>8s} {'ach%':>5s} {'MB':>7s} "
           f"{'GFLOP':>7s} {'bound':>5s}  emitter")
    print(hdr)
    for r in out_rows[:top]:
        print(f"   {r['name'][:34]:34s} {r['op'][:12]:12s} "
              f"{r['cycles_share_pct']:5.1f} "
              f"{(r['t_model_us'] or 0):8.1f} {r['t_roofline_us']:8.1f} "
              f"{(r['achieved_pct'] or 0):5.0f} {r['bytes'] / 1e6:7.2f} "
              f"{r['flops'] / 1e9:7.2f} {r['bound']:>5s}  "
              f"{r['emitter'] or ''}")

    # category + layer-group rollups
    cats = defaultdict(lambda: [0, 0, 0.0])
    for r in out_rows:
        cat = ("conv" if r["flops"] else
               "copy" if "copy" in r["op"] else
               r["op"] if r["op"] in ("fusion",) else "other")
        if cat == "fusion":
            cat = "elementwise-fusion"
        c = cats[cat]
        c[0] += r["cycles"]
        c[1] += r["bytes"]
        c[2] += r["t_roofline_us"]
    print("   -- category rollup --")
    for cat, (cyc, nb, troof) in sorted(cats.items(),
                                        key=lambda kv: -kv[1][0]):
        print(f"   {cat:22s} {100 * cyc / cyc_total:5.1f}% cycles  "
              f"{nb / 1e6:8.1f} MB  roofline {troof / 1e3:7.2f} ms")
    groups = defaultdict(int)
    for r in out_rows:
        groups[r["group"]] += r["cycles"]
    print("   -- top layer groups (by cycles) --")
    for g, cyc in sorted(groups.items(), key=lambda kv: -kv[1])[:10]:
        print(f"   {g[:60]:60s} {100 * cyc / cyc_total:5.1f}%")

    return {"label": label, "rows": out_rows[:max(top, 40)],
            "totals": totals, "measured_s": measured_s,
            "sum_roofline_s": sum_roof,
            "implied_clock_ghz": (cyc_total / measured_s / 1e9
                                  if measured_s else None),
            "categories": {k: {"cycles": v[0], "bytes": v[1],
                               "t_roofline_us": v[2]}
                           for k, v in cats.items()}}


# ---------------------------------------------------------------- graphs


def _measure(infer_or_step, args, jax, jnp, n=(4, 12)):
    import time as _t
    checksum = jax.jit(lambda p: jnp.sum(
        jax.tree_util.tree_leaves(p)[0].astype(jnp.float32)))

    def timed(k):
        t0 = _t.perf_counter()
        out = None
        for _ in range(k):
            out = infer_or_step(*args)
        lead = out[0] if isinstance(out, tuple) else out
        float(checksum(lead))
        return _t.perf_counter() - t0

    timed(2)
    t_small, t_large = timed(n[0]), timed(n[1])
    return (t_large - t_small) / (n[1] - n[0])


def build_graph(name, batch, flip_mode):
    """(jit_fn, args, label) for one named graph, matching bench.py."""
    import jax
    import jax.numpy as jnp

    import bench

    if name.startswith("serve") or name.startswith("w48") \
            or name == "rsn18":
        cfgs = {"serve_int8": (bench._headline_cfg, True),
                "serve_bf16": (bench._headline_cfg, False),
                "w48_bf16": (bench._w48_cfg, False),
                "w48_int8": (bench._w48_cfg, True),
                "rsn18": (bench._rsn18_cfg, False)}
        cfg_fn, quant = cfgs[name]
        infer, variables, inputs = bench.family_setup(
            jax, jnp, cfg_fn(), batch, flip=True, quantize=quant,
            flip_mode=flip_mode)
        return infer, (variables,) + inputs, f"{name} B={batch} " \
                                             f"{flip_mode}"
    if name == "train":
        from __graft_entry__ import _hrnet_w32_cfg
        from udp_pose_tpu.core.loss import make_loss_fn
        from udp_pose_tpu.core.train import (make_optimizer,
                                             make_train_step,
                                             normalize_images)
        from udp_pose_tpu.models import build_model
        import numpy as np

        cfg = _hrnet_w32_cfg((192, 256), (48, 64), dtype="bfloat16")
        model = build_model(cfg)
        state = bench._host_train_state(
            jax, jnp, model, (1, 256, 192, 3),
            make_optimizer(cfg, 1000))
        raw_step = make_train_step(make_loss_fn(cfg))

        @jax.jit
        def step(state, batch_d):
            b = dict(batch_d)
            b["image"] = normalize_images(b["image"])
            new_state, metrics = raw_step(state, b)
            return new_state, metrics

        rng = np.random.default_rng(1)
        batch_d = {
            "image": jax.device_put(rng.integers(
                0, 256, (batch, 256, 192, 3)).astype(np.uint8)),
            "target": jax.device_put(rng.normal(
                size=(batch, 51, 64, 48)).astype(np.float32)),
            "target_weight": jax.device_put(rng.uniform(
                size=(batch, 17)).astype(np.float32)),
        }
        return step, (state, batch_d), f"train B={batch}"
    raise SystemExit(f"unknown graph {name!r}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="serve_int8",
                    choices=["serve_int8", "serve_bf16", "train",
                             "w48_bf16", "w48_int8", "rsn18"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--flip-mode", default="two_pass",
                    choices=["two_pass", "fold"])
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--no-measure", action="store_true")
    ap.add_argument("--hlo-file", help="analyze a dumped HLO instead of "
                                       "compiling (offline mode)")
    ap.add_argument("--measured-ms", type=float,
                    help="wall ms/it to calibrate against (offline)")
    ap.add_argument("--dump-hlo", help="save the optimized HLO here")
    ap.add_argument("--json", dest="json_out",
                    help="write the report JSON here")
    args = ap.parse_args()

    if args.hlo_file:
        text = open(args.hlo_file).read()
        rows, totals = analyze(text)
        rep = report(rows, totals,
                     (args.measured_ms or 0) / 1e3 or None,
                     args.top, label=os.path.basename(args.hlo_file))
    else:
        import jax
        import jax.numpy as jnp
        fn, fn_args, label = build_graph(args.graph, args.batch,
                                         args.flip_mode)
        lowered = fn.lower(*fn_args)
        compiled = lowered.compile()
        text = compiled.as_text()
        if args.dump_hlo:
            open(args.dump_hlo, "w").write(text)
        ca = compiled.cost_analysis() or {}
        rows, totals = analyze(text)
        if ca.get("flops"):
            print(f"parser flops {totals['flops'] / 1e9:.2f} G vs XLA "
                  f"cost_analysis {ca['flops'] / 1e9:.2f} G "
                  f"({100 * totals['flops'] / ca['flops']:.0f}%)")
        measured = None
        if not args.no_measure:
            measured = _measure(fn, fn_args, jax, jnp)
        rep = report(rows, totals, measured, args.top, label=label)
        rep["xla_cost_flops"] = ca.get("flops")
        rep["xla_bytes_accessed"] = ca.get("bytes accessed")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rep, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
