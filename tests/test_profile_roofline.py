"""tools/profile_roofline.py parser unit tests on a pinned optimized-HLO
fixture (a real axon-TPU compile of a 2-conv model, captured round 5).

The attribution is only as honest as the parser: these pin the conv-FLOP
arithmetic (incl. padding-aware valid-tap counting — XLA's
operand-swapped conv canonicalization with pad = window-1 must count ONE
tap per position, not thousands), the VMEM-space byte exclusion, the
estimated_cycles extraction, and the async-start/-done handling."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from profile_roofline import (_conv_flops, _valid_taps, analyze,
                              parse_module)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "sample_tpu_hlo.txt")


def _table(comps):
    t = {}
    for instrs in comps.values():
        for ins in instrs:
            t[ins.name] = ins
    return t


def test_fixture_flops_match_hand_count():
    text = open(FIXTURE).read()
    rows, totals = analyze(text)
    # conv1: 3x3 pad1 on 8x64x48x3 -> 32ch; conv2: 3x3 stride2 -> 64ch.
    # padding-aware: edge rows/cols lose taps (sum over outputs of valid
    # taps, not out*K) — XLA's own cost_analysis for this graph was
    # 265.3 MF; the parser must land within 2%.
    assert abs(totals["flops"] - 265.3e6) / 265.3e6 < 0.02, totals["flops"]
    convs = [r for r in rows if r["flops"]]
    assert len(convs) == 2
    assert all(r["mxu_dtype"] == "bf16" for r in convs)
    assert {r["emitter"] for r in convs} == {
        "EmitAllInputFeaturePackedInSublanesOutputBatchInSublanes",
        "EmitAllBatchInSublanes"}


def test_valid_taps_padding_arithmetic():
    # plain 3x3 pad1 over 64: edges lose one tap each -> 64*3 - 2
    assert _valid_taps(64, 3, 1, (1, 1), 1, 1, 64) == 64 * 3 - 2
    # the operand-swap canonicalization: input size 1, window 64,
    # pad 63 both sides -> exactly ONE valid tap per output position
    assert _valid_taps(1, 64, 1, (63, 63), 1, 1, 64) == 64
    # stride-2 downsample 3x3 pad (0,1) over 64 -> 32 outputs
    taps = _valid_taps(64, 3, 2, (0, 1), 1, 1, 32)
    assert 32 * 2 < taps <= 32 * 3


def test_cycles_and_vmem_exclusion():
    text = open(FIXTURE).read()
    rows, totals = analyze(text)
    by_name = {r["name"]: r for r in rows}
    # the first conv fusion carries the cost model's cycle estimate
    assert by_name["fusion.11"]["cycles"] == 57993
    # its result is S(1) (VMEM) and its big operand was prefetched by a
    # copy to VMEM -> its HBM bytes are only the small fp32 kernel
    assert by_name["fusion.11"]["bytes"] < 5000
    # the copy-start of the conv2 kernel counts its payload ONCE
    # (f32[3,3,32,64] = 73728 B, destination S(1))
    assert by_name["copy-start"]["bytes"] == 73728
    # copy-done rows are skipped entirely
    assert "copy-done" not in by_name


def test_entry_detection_and_instruction_count():
    comps, entry = parse_module(open(FIXTURE).read())
    assert entry == "main.3"
    assert len(comps[entry]) >= 10
    # nested fused computations parsed too (conv flops recursion source)
    assert any(n.startswith("fused_computation") for n in comps)
