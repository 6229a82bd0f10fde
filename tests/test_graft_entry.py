"""Driver-contract tests: entry() compiles, dryrun_multichip(8) runs."""

import pytest

import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

# multi-device compiles / subprocess drives: slow tier (pytest.ini)
pytestmark = pytest.mark.slow


def test_entry_jits():
    from __graft_entry__ import entry
    fn, (variables, images) = entry()
    out = jax.jit(fn)(variables, images[:2])
    assert out.shape == (2, 64, 48, 51)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
