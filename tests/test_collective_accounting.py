"""HLO collective accounting (VERDICT r3 item 7).

Replaces the contention-confounded virtual-mesh scaling figure with
compile-time truth: the sharded train step's optimized HLO must contain
the collectives the sharding design predicts, with byte totals in the
right ballpark — all-reduce bytes ~ gradient bytes for pure dp,
collective-permutes (conv halo exchanges) for spatial sharding.

Runs on the 8-virtual-CPU-device mesh (conftest) with the reduced proxy
net — the same program dryrun_multichip compiles.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.collective_accounting import (account_hlo, run_mode,
                                         wire_bytes_per_chip)


# multi-device compiles / subprocess drives: slow tier (pytest.ini)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def censuses():
    out = {}
    for name, n_data, n_model, sp in (("dp8", 8, 1, False),
                                      ("dp4sp2", 4, 2, True),
                                      ("dp4tp2", 4, 2, False)):
        out[name] = run_mode(name, full=False, per_chip_batch=2,
                             n_data=n_data, n_model=n_model, sp=sp)[0]
    return out


def test_dp_allreduce_matches_grad_bytes(censuses):
    """Pure dp: the dominant collective is the gradient all-reduce, so
    total all-reduce bytes ≈ fp32 param bytes (grads) within 2x (loss
    scalars, BN-stat reductions and counters ride along)."""
    import jax

    from __graft_entry__ import _reduced_flagship_cfg
    from udp_pose_tpu.models import build_model
    import jax.numpy as jnp

    census = censuses["dp8"]
    assert "all-reduce" in census
    assert "all-gather" not in census       # params replicated: no gather
    assert "collective-permute" not in census

    cfg = _reduced_flagship_cfg()
    model = build_model(cfg)
    variables = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 64, 64, 3)), train=False),
        jax.random.PRNGKey(0))
    param_bytes = sum(int(np.prod(x.shape)) * 4 for x in
                      jax.tree_util.tree_leaves(variables["params"]))
    ar = census["all-reduce"]["bytes"]
    assert param_bytes <= ar <= 2 * param_bytes, (ar, param_bytes)


def test_sp_has_halo_exchanges(censuses):
    """Height sharding: GSPMD must exchange conv halos — the signature is
    collective-permutes between the two 'model' neighbours."""
    census = censuses["dp4sp2"]
    assert census.get("collective-permute", {}).get("count", 0) > 0


def test_tp_channel_sharding_collectives(censuses):
    """Channel tensor parallelism must reduce partial activations or
    gather channel shards (GSPMD picks either all-reduce or all-gather
    per conv); both kinds' byte totals must be nonzero."""
    census = censuses["dp4tp2"]
    total = sum(e["bytes"] for k, e in census.items())
    assert census.get("all-reduce", {}).get("count", 0) > 0
    assert total > 0


def test_wire_model_and_parser():
    """Ring-model arithmetic + parser on a hand-written HLO snippet:
    per-op replica-group sizes (explicit list, iota form, and the
    all-devices shorthand falling back to default_group)."""
    hlo = """
  %ar = f32[1024]{0} all-reduce(f32[1024]{0} %x), replica_groups={{0,1,2,3},{4,5,6,7}}
  %ag.1 = bf16[8,128]{1,0} all-gather(bf16[1,128]{1,0} %y), replica_groups=[4,2]<=[8], dimensions={0}
  %cp = f32[4,4]{1,0} collective-permute(f32[4,4]{1,0} %z)
  %ar2 = f32[512]{0} all-reduce(f32[512]{0} %w), replica_groups={}
  %other = f32[2]{0} add(f32[2]{0} %a, f32[2]{0} %b)
"""
    census = account_hlo(hlo, default_group=8)
    assert census["all-reduce"]["count"] == 2
    assert census["all-reduce"]["bytes"] == 4096 + 2048
    assert census["all-reduce"]["by_group"] == {4: 4096, 8: 2048}
    # all-gather payload = the GATHERED result size
    assert census["all-gather"]["by_group"] == {2: 8 * 128 * 2}
    assert census["collective-permute"]["bytes"] == 64
    assert "add" not in census

    wire = wire_bytes_per_chip(census, 8)
    # ar@4: 2*(3/4)*4096 = 6144; ar@8: 2*(7/8)*2048 = 3584;
    # ag@2: (1/2)*2048 = 1024; cp: 64
    assert wire == 6144 + 3584 + 1024 + 64


def test_async_start_done_counted_once_with_tuple():
    """Async pairs count once (-done skipped; the -start's
    (inputs..., outputs...) tuple halves for all-reduce, and the
    all-gather-start pair takes the gathered max), while XLA's combined
    multi-tensor all-reduce result tuple SUMS (every element is a
    distinct reduced gradient)."""
    hlo = """
  %s = (f32[256]{0}, f32[256]{0}) all-reduce-start(%x), replica_groups={{0,1}}
  %d = f32[256]{0} all-reduce-done(%s)
  %g = (bf16[1,64]{1,0}, bf16[4,64]{1,0}) all-gather-start(%y), replica_groups={{0,1,2,3}}
  %c = (f32[100]{0}, f32[28]{0}) all-reduce(%p, %q), replica_groups={{0,1}}
"""
    census = account_hlo(hlo)
    assert census["all-reduce"]["count"] == 2
    # start: (1024+1024)/2 = 1024; combined sync: (100+28)*4 = 512
    assert census["all-reduce"]["by_group"] == {2: 1024 + 512}
    assert census["all-gather"]["bytes"] == 4 * 64 * 2
