"""VERDICT r4 item 4: bound the int8 PTQ AP cost on a NON-overfit model.

Drives tools/generalization_proof.py --tiny --quantize int8 --qat in a
subprocess (CPU scale): train WITH augmentation on a synthetic train
split, eval on UNSEEN val images fp32 vs int8-PTQ vs QAT→int8, assert
the deltas inside the tool.  The full-scale (192x256, 5000-step) numbers
run on the chip and live in DESIGN.md; this test keeps the machinery and
the assertion wired so the harness cannot rot.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_generalization_int8_qat_tiny(tmp_path):
    """Machinery drill: --tiny runs fp32 train → unseen-val eval →
    int8-PTQ eval → QAT train → QAT-int8 deployment eval in one
    process; on this 1-core host the schedule is too short to LEARN
    (~4.5 s/step measured), so quality gates apply only at full scale
    (chip run, DESIGN.md) — here every pipeline stage must execute and
    report its delta."""
    env = dict(os.environ, UDP_POSE_PLATFORM="cpu")
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "generalization_proof.py"),
         "--tiny", "--root", str(tmp_path / "gen"), "--gen-data",
         "--steps", "40", "--pool-epochs", "2",
         "--quantize", "int8", "--qat"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=2400)
    out = p.stdout + p.stderr
    assert p.returncode == 0, out[-3000:]
    assert "GENERALIZATION PROOF (tiny machinery drill)" in out
    assert "INT8 PTQ on unseen val" in out
    assert "QAT->INT8 deployment on unseen val" in out
