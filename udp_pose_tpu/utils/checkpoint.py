"""Checkpointing (parity: deep_hrnet/lib/utils/utils.py:79-110,
tools/train.py:169-223 AUTO_RESUME flow).

Format: flax msgpack of the full TrainState pytree plus run metadata.
Files: ``checkpoint.msgpack`` (rolling), ``model_best.msgpack`` (weights
only), ``final_state.msgpack`` (weights only) — same roles as the
reference's checkpoint.pth / model_best.pth / final_state.pth.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(output_dir, state, epoch, perf, is_best=False):
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    payload = {
        "epoch": epoch,
        "perf": float(perf),
        # to_state_dict flattens optax's NamedTuple/tuple state into dicts
        "state": serialization.to_state_dict(
            _to_host({"params": state.params,
                      "batch_stats": state.batch_stats,
                      "opt_state": state.opt_state,
                      "step": state.step})),
    }
    with open(out / "checkpoint.msgpack", "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    if is_best:
        save_weights(out / "model_best.msgpack", state)


def save_weights(path, state):
    blob = serialization.msgpack_serialize(serialization.to_state_dict(
        _to_host({"params": state.params, "batch_stats": state.batch_stats})))
    with open(path, "wb") as f:
        f.write(blob)


def load_weights(path):
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_checkpoint(output_dir, state):
    """Restore a TrainState from checkpoint.msgpack; returns
    (state, begin_epoch, best_perf) or (state, 0, 0.0) if absent."""
    ckpt = Path(output_dir) / "checkpoint.msgpack"
    if not ckpt.exists():
        return state, 0, 0.0
    with open(ckpt, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    tpl = {"params": state.params, "batch_stats": state.batch_stats,
           "opt_state": state.opt_state, "step": state.step}
    restored = serialization.from_state_dict(tpl, payload["state"])
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"],
                          step=restored["step"])
    return state, int(payload["epoch"]) + 1, float(payload["perf"])
