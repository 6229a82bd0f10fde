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


def save_checkpoint(output_dir, state, epoch, perf, is_best=False,
                    step_in_epoch=0):
    """``step_in_epoch`` > 0 marks a MID-epoch (preemption) save: the
    state has consumed that many batches of epoch ``epoch + 1``; resume
    skips the prefix (the loader is epoch-seeded + deterministic, so the
    continuation is exact — see utils/preemption.py)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    payload = {
        "epoch": epoch,
        "step_in_epoch": int(step_in_epoch),
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


def save_iter_checkpoint(output_dir, state, iteration):
    """RSN iteration-checkpoint semantics (engine.py:162-169):
    ``iter-<N>.msgpack`` plus an ``iter-last.msgpack`` symlink."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    payload = {
        "iteration": int(iteration),
        "state": serialization.to_state_dict(
            _to_host({"params": state.params,
                      "batch_stats": state.batch_stats,
                      "opt_state": state.opt_state,
                      "step": state.step})),
    }
    name = f"iter-{int(iteration)}.msgpack"
    with open(out / name, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    link = out / "iter-last.msgpack"
    if link.is_symlink() or link.exists():
        link.unlink()
    link.symlink_to(name)
    return str(out / name)


def load_iter_checkpoint(output_dir, state):
    """Resume from iter-last.msgpack; returns (state, iteration) or
    (state, 0)."""
    ckpt = Path(output_dir) / "iter-last.msgpack"
    if not ckpt.exists():
        return state, 0
    with open(ckpt, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    tpl = {"params": state.params, "batch_stats": state.batch_stats,
           "opt_state": state.opt_state, "step": state.step}
    restored = serialization.from_state_dict(tpl, payload["state"])
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"],
                          step=restored["step"])
    return state, int(payload["iteration"]) + 1


def save_weights(path, state):
    blob = serialization.msgpack_serialize(serialization.to_state_dict(
        _to_host({"params": state.params, "batch_stats": state.batch_stats})))
    with open(path, "wb") as f:
        f.write(blob)


def load_weights(path):
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def align_suffix_keys(model_flat: dict, loaded_flat: dict) -> dict:
    """Longest-suffix key alignment for tolerant weight loading.

    Parity: RSN/cvpack/torch_modeling/engine/checkpoint.py:50-89 — for each
    model key, pick the loaded key that is its longest suffix (handles
    prefix changes like ``module.`` nesting or backbone re-rooting).
    Operates on flat ``a/b/c`` path dicts; returns a re-keyed loaded dict.
    """
    out = dict(loaded_flat)
    loaded_keys = sorted(loaded_flat)
    for mk in sorted(model_flat):
        best, best_len = None, 0
        for lk in loaded_keys:
            if mk.endswith(lk) and len(lk) > best_len:
                best, best_len = lk, len(lk)
        if best is not None and best != mk:
            out[mk] = out.pop(best)
    return out


def load_weights_tolerant(path, model, input_shape):
    """Load weights with suffix alignment + shape filtering against a fresh
    init (the reference's tolerant ``load_model``, checkpoint.py:6-47)."""
    import jax
    import jax.numpy as jnp

    ref = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros(input_shape, jnp.float32),
                             train=False), jax.random.PRNGKey(0))
    ref_flat = _flatten_tree(serialization.to_state_dict(ref))
    loaded_flat = _flatten_tree(load_weights(path))
    aligned = align_suffix_keys(ref_flat, loaded_flat)
    kept, skipped = {}, []
    for k, shape_struct in ref_flat.items():
        if k in aligned and tuple(np.shape(aligned[k])) == \
                tuple(shape_struct.shape):
            kept[k] = aligned[k]
        else:
            skipped.append(k)
    return _unflatten_tree(kept), skipped


def _flatten_tree(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def _unflatten_tree(flat):
    out = {}
    for k, v in flat.items():
        node = out
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def load_checkpoint(output_dir, state):
    """Restore a TrainState from checkpoint.msgpack; returns
    (state, begin_epoch, best_perf, step_in_epoch) or (state, 0, 0.0, 0)
    if absent.  ``step_in_epoch`` > 0 → the save was mid-epoch
    (preemption): resume epoch ``begin_epoch`` skipping that many
    batches."""
    ckpt = Path(output_dir) / "checkpoint.msgpack"
    if not ckpt.exists():
        return state, 0, 0.0, 0
    with open(ckpt, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    tpl = {"params": state.params, "batch_stats": state.batch_stats,
           "opt_state": state.opt_state, "step": state.step}
    restored = serialization.from_state_dict(tpl, payload["state"])
    state = state.replace(params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"],
                          step=restored["step"])
    return (state, int(payload["epoch"]) + 1, float(payload["perf"]),
            int(payload.get("step_in_epoch", 0)))
