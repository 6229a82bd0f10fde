"""Published-zoo reproduction harness (VERDICT r2 Missing #1).

Reads a manifest of (config, weights, expected AP) entries — the eval
matrix of /root/reference/README.md:28-46 as shipped in
``configs/zoo_manifest.json`` — and for each entry runs
convert → validate → COCOeval, then prints a delta table and exits
nonzero if any |Δ| exceeds ``--tolerance`` (default 0.1, the BASELINE.md
north-star budget).

The day COCO val + the published .pth zoo are on disk, reproduction is:

    UDP_ZOO=/path/to/pth python tools/reproduce_zoo.py \
        --manifest configs/zoo_manifest.json DATASET.ROOT /path/to/coco

Manifest entry schema (JSON list):
    {"name": "...",                 # display name
     "config": "configs/...yaml",   # our config (repo-relative ok)
     "weights": "$UDP_ZOO/x.pth",   # .pth (converted on the fly) or
                                    # .msgpack; env vars are expanded
     "expected": 76.8,              # published value (BASELINE.md)
     "metric": "AP",                # key into validate() name_values
     "opts": ["TEST.FLIP_TEST", "true"]}   # optional dotted overrides
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_entry_weights(cfg, weights_path, model):
    """weights → flax variables: .pth via the bidirectional converter
    (reference checkpoints work untouched), .msgpack via our loader."""
    if weights_path.endswith((".pth", ".pt", ".tar")):
        from udp_pose_tpu.utils.torch_convert import torch_to_flax_from_cfg
        variables, _unused = torch_to_flax_from_cfg(weights_path, cfg)
        return variables
    from udp_pose_tpu.utils.checkpoint import load_weights
    return load_weights(weights_path)


def run_entry(entry, opts=(), data_dir=None, output_dir="",
              quantize=""):
    """One manifest row → (measured value, name_values).

    ``quantize='int8'`` serves the entry through the PTQ int8 path
    (amax-calibrated on the first val batches, models/quantize.py) —
    the same one command then measures the int8 AP delta the day real
    data + weights exist (VERDICT r3 item 9)."""
    from udp_pose_tpu.config import load_config
    from udp_pose_tpu.core.validate import validate
    from udp_pose_tpu.data import build_dataset
    from udp_pose_tpu.models import build_model

    cfg_path = entry["config"]
    if not os.path.isabs(cfg_path) and not os.path.exists(cfg_path):
        cfg_path = os.path.join(REPO, cfg_path)
    merged_opts = list(entry.get("opts", [])) + list(opts)
    if quantize:
        merged_opts += ["TPU.QUANTIZE", quantize]
    cfg = load_config(cfg_path, merged_opts)
    if data_dir:
        cfg.defrost()
        cfg.DATASET.ROOT = data_dir
        cfg.freeze()

    model = build_model(cfg)
    ds = build_dataset(cfg, is_train=False)
    weights = os.path.expandvars(entry["weights"])
    variables = _load_entry_weights(cfg, weights, model)
    if cfg.TPU.QUANTIZE == "int8":
        from udp_pose_tpu.models.quantize import quantize_for_eval
        model, variables = quantize_for_eval(cfg, model, variables, ds)
    name_values, _perf = validate(cfg, ds, model, variables, output_dir)
    metric = entry.get("metric", "AP")
    if metric not in name_values:
        raise KeyError(f"metric {metric!r} not in evaluate() output "
                       f"{sorted(name_values)}")
    return float(name_values[metric]), name_values


def run_manifest(manifest, opts=(), data_dir=None, tolerance=0.1,
                 output_dir="", skip_missing=False, out=sys.stdout,
                 quantize=""):
    """Run every manifest entry; returns (rows, ok).

    rows: [{name, expected, measured, delta, status}].  ok is False when
    any entry exceeds tolerance or errors (missing weights count as
    errors unless ``skip_missing``).

    ``quantize='int8'`` ADDITIONALLY serves each entry through the int8
    PTQ path and reports ``measured_int8`` / ``delta_int8`` (int8 minus
    fp) — informational columns, not tolerance-gated: the published
    numbers are fp, and the int8 drift is the deployment trade-off being
    measured."""
    rows, ok = [], True
    for entry in manifest:
        name = entry.get("name") or entry["config"]
        expected = float(entry["expected"])
        weights = os.path.expandvars(entry["weights"])
        if not os.path.exists(weights):
            status = "SKIP (weights missing)" if skip_missing else \
                "FAIL (weights missing)"
            if not skip_missing:
                ok = False
            rows.append({"name": name, "expected": expected,
                         "measured": None, "delta": None, "status": status,
                         "weights": weights})
            continue
        try:
            measured, _nv = run_entry(entry, opts, data_dir, output_dir)
        except Exception as e:    # an entry failing must not hide the rest
            ok = False
            rows.append({"name": name, "expected": expected,
                         "measured": None, "delta": None,
                         "status": f"ERROR ({type(e).__name__}: {e})"})
            continue
        delta = measured - expected
        good = abs(delta) <= tolerance
        ok = ok and good
        row = {"name": name, "expected": expected,
               "measured": measured, "delta": delta,
               "status": "OK" if good else
               f"FAIL (|delta| > {tolerance})"}
        if quantize:
            try:
                m_q, _ = run_entry(entry, opts, data_dir, output_dir,
                                   quantize=quantize)
                row["measured_int8"] = m_q
                row["delta_int8"] = m_q - measured
            except Exception as e:
                row["status"] += f"; int8 ERROR ({type(e).__name__}: {e})"
                ok = False
        rows.append(row)

    w = max((len(r["name"]) for r in rows), default=4)
    int8_cols = quantize and any("measured_int8" in r for r in rows)
    hdr = (f"{'model':<{w}} {'expected':>9} {'measured':>9} {'delta':>8}")
    if int8_cols:
        hdr += f" {'int8':>9} {'d_int8':>8}"
    print(hdr + "  status", file=out)
    for r in rows:
        meas = f"{r['measured']:.3f}" if r["measured"] is not None else "-"
        dl = f"{r['delta']:+.3f}" if r["delta"] is not None else "-"
        line = (f"{r['name']:<{w}} {r['expected']:>9.3f} {meas:>9} "
                f"{dl:>8}")
        if int8_cols:
            mq = (f"{r['measured_int8']:.3f}"
                  if r.get("measured_int8") is not None else "-")
            dq = (f"{r['delta_int8']:+.3f}"
                  if r.get("delta_int8") is not None else "-")
            line += f" {mq:>9} {dq:>8}"
        print(line + f"  {r['status']}", file=out)
    return rows, ok


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Reproduce the published zoo AP matrix")
    p.add_argument("--manifest", required=True)
    p.add_argument("--tolerance", type=float, default=0.1,
                   help="max |measured - expected| (BASELINE north-star)")
    p.add_argument("--data-dir", default=None,
                   help="override DATASET.ROOT for every entry")
    p.add_argument("--output-dir", default="",
                   help="where results jsons land ('' = nowhere)")
    p.add_argument("--skip-missing", action="store_true",
                   help="entries whose weights are absent are skipped "
                        "instead of failing the run")
    p.add_argument("--quantize", default="", choices=["", "int8"],
                   help="also serve each entry int8 (PTQ) and report the "
                        "AP delta vs the fp run")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="extra dotted config overrides for every entry")
    args = p.parse_args(argv)

    with open(args.manifest) as f:
        manifest = json.load(f)
    _rows, ok = run_manifest(manifest, args.opts, args.data_dir,
                             args.tolerance, args.output_dir,
                             args.skip_missing, quantize=args.quantize)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
