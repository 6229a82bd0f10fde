"""Orbax checkpoint backend — async, sharded, production-grade.

SURVEY.md §5.4 names orbax as the TPU-native equivalent of the
reference's torch.save checkpoints (deep_hrnet tools/train.py:204-212,
RSN engine.py:95-160).  The default msgpack backend
(utils/checkpoint.py) keeps the reference's artifact roles 1:1 but is
host-gathered and synchronous — fine single-host; at pod scale the
save blocks the step loop while O(params + opt_state) bytes funnel
through one process.  ``TPU.CKPT_BACKEND: orbax`` switches the rolling
train-state checkpoint to orbax.checkpoint:

 * **async commit** — ``save()`` snapshots device state and returns;
   the write happens on a background thread while training continues
 * **per-shard parallel IO** — under a mesh every process writes only
   its addressable shards (OCDBT), and ``load()`` restores each leaf
   DIRECTLY into the target sharding (no host gather → re-place hop)
 * **atomic step directories + retention** (``TPU.CKPT_MAX_TO_KEEP``)

Scope: the ROLLING checkpoint only (epoch mode ``checkpoint.msgpack``
role, RSN-iteration ``iter-*.msgpack`` role).  ``model_best`` /
``final_state`` stay msgpack — they are deployment *weights* artifacts
consumed by tools/test.py, the exporters and the torch bridge.
"""

from __future__ import annotations

import os

import jax


def _array_subtree(state):
    return {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}


def _abstract_like(tree):
    """ShapeDtypeStructs carrying each live leaf's sharding, so restore
    places shards straight onto the current mesh layout."""

    def one(x):
        x = jax.numpy.asarray(x) if not hasattr(x, "dtype") else x
        sharding = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    return jax.tree_util.tree_map(one, tree)


class OrbaxBackend:
    """Rolling train-state checkpoints via an orbax CheckpointManager.

    ``step`` is the save key: the global optimizer step in epoch mode,
    the iteration in RSN iteration mode — monotonic either way.
    """

    def __init__(self, output_dir, max_to_keep: int = 2):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        path = os.path.abspath(os.path.join(str(output_dir), "orbax"))
        self._mgr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=True))

    def save(self, state, meta: dict):
        ocp = self._ocp
        self._mgr.save(
            int(state.step),
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(_array_subtree(state)),
                meta=ocp.args.JsonSave({k: (int(v) if isinstance(v, bool)
                                            or hasattr(v, "__index__")
                                            else float(v))
                                        for k, v in meta.items()})))

    def load(self, state):
        """Restore the latest checkpoint INTO ``state``'s shardings;
        returns (state, meta) or (state, None) when no checkpoint
        exists."""
        ocp = self._ocp
        step = self._mgr.latest_step()
        if step is None:
            return state, None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(
                    _abstract_like(_array_subtree(state))),
                meta=ocp.args.JsonRestore()))
        tree = restored["state"]
        state = state.replace(params=tree["params"],
                              batch_stats=tree["batch_stats"],
                              opt_state=tree["opt_state"],
                              step=tree["step"])
        return state, dict(restored["meta"])

    def wait(self):
        """Block until the in-flight async save commits (call before
        process exit — end of training or preemption)."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def load_any(backend, output_dir, state, iter_mode: bool):
    """AUTO_RESUME entry point for the orbax backend: returns the same
    tuples the msgpack loaders do — (state, begin_epoch, best_perf,
    step_in_epoch) in epoch mode, (state, start_iter) in iteration
    mode."""
    state, meta = backend.load(state)
    if iter_mode:
        if meta is None:
            return state, 0
        return state, int(meta.get("iteration", -1)) + 1
    if meta is None:
        return state, 0, 0.0, 0
    return (state, int(meta.get("epoch", -1)) + 1,
            float(meta.get("perf", 0.0)),
            int(meta.get("step_in_epoch", 0)))
