"""GPipe-style pipeline parallelism for multi-stage RSN.

The reference trains its multi-stage networks fully replicated on every
GPU (RSN/exps/*/train.py, DDP) — it has no pipeline parallelism anywhere.
This module is the TPU-native extension: stage ``s`` of the network lives
on pipeline rank ``s`` of the mesh ``'model'`` axis, microbatches stream
through a ``lax.scan`` schedule, and :func:`jax.lax.ppermute` shifts the
inter-stage payload (the 64-ch ``cross`` feature plus the two 4-level
skip pyramids, network.py:383-391) one rank forward per tick.  The
backward pass is plain ``jax.grad`` through the scan — ppermute transposes
to the reverse permutation, so the symmetric reverse pipeline falls out of
autodiff with no hand-written 1F1B schedule.

Why the stages can stack: every RSN stage is structurally identical once
the inter-stage plumbing is always generated and skips always consumed
(models/rsn.RSNUniformStage) — the skip injection is a parameter-free add,
and the last stage merely discards its skip/cross outputs.  Stage params
therefore stack on a leading ``(S, ...)`` axis sharded ``P('model')``:
per-chip params + adam moments drop to ``1/S`` — the memory lever for
4XRSN50-scale training (the reference's best published model).

Semantics vs the replicated step (documented, tested):

* BatchNorm batch stats are per-microbatch and per-data-shard (the
  standard GPipe trade) — running stats update sequentially over the
  microbatches of a step and are pmean'd over the ``'data'`` axis.  The
  equivalence tests compare against a sequential-microbatch reference
  with identical semantics and match to fp tolerance.
* Bubble ticks compute on zeros; their outputs are masked out of the
  loss buffer, so they contribute exactly zero gradient.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.loss import rsn_multi_stage_loss
from ..core.rsn import _rsn_normalize
from ..core.train import TrainState
from ..models.rsn import stem_from_cfg, uniform_stage_from_cfg

STEM_KEYS = ("top", "top_conv0", "top_conv1", "top_conv2")


# ---------------------------------------------------------------------------
# variable layout: standard RSN tree <-> (stem, stacked stages)
# ---------------------------------------------------------------------------

def _merge_missing(template, partial):
    """Fill keys absent from ``partial`` with ``template`` values (the last
    stage lacks skip1/skip2/cross_conv params — their uniform-stage outputs
    are computed and discarded, so template values are inert)."""
    if not isinstance(template, Mapping):
        return partial
    return {k: (_merge_missing(v, partial[k]) if k in partial else v)
            for k, v in template.items()}


def _take_matching(src, like):
    """Project ``src`` down to the key structure of ``like`` (drops the
    padded last-stage leaves when converting back)."""
    if not isinstance(like, Mapping):
        return src
    return {k: _take_matching(src[k], v) for k, v in like.items()}


def split_rsn_variables(variables, stage_num: int, stage_template):
    """Standard RSN variables -> (stem_vars, stacked_stage_vars).

    ``stage_template``: a fresh ``RSNUniformStage.init`` result supplying
    values for the leaves the standard tree's last stage doesn't have.
    Stacked leaves carry a leading ``(stage_num, ...)`` axis.
    """
    stem, per_stage = {}, []
    for col, tree in variables.items():
        stem[col] = {k: v for k, v in tree.items() if k in STEM_KEYS}
    for i in range(stage_num):
        st = {}
        for col, tree in variables.items():
            st[col] = _merge_missing(
                stage_template[col],
                {"down": tree[f"stage{i}_down"], "up": tree[f"stage{i}_up"]})
        per_stage.append(st)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_stage)
    return stem, stacked


def merge_rsn_variables(stem, stacked, like):
    """(stem, stacked) -> standard RSN variables shaped like ``like``
    (an RSN init/checkpoint tree); padded last-stage leaves are dropped.
    Use this to run the standard validate/infer path on pipeline-trained
    weights."""
    out = {}
    for col, tree in like.items():
        new = {}
        for k, v in tree.items():
            if k in STEM_KEYS:
                new[k] = stem[col][k]
            elif k.startswith("stage"):
                i = int(k[len("stage"):].split("_")[0])
                part = "down" if k.endswith("_down") else "up"
                sub = jax.tree_util.tree_map(lambda x: x[i],
                                             stacked[col][part])
                new[k] = _take_matching(sub, v)
            else:
                new[k] = v
        out[col] = new
    return out


# ---------------------------------------------------------------------------
# the pipeline itself
# ---------------------------------------------------------------------------

def _stage_io_shapes(output_shape, mb: int, dtype):
    """Analytic local shapes of the inter-stage payload (asserted against
    eval_shape at trace time): cross/x is (mb, h, w, 64) at the stem
    resolution (= heatmap resolution, input/4); skip level li is
    (mb, ceil(h/2^li), ceil(w/2^li), [64,128,256,512][li])."""
    h, w = output_shape
    x_sh = jax.ShapeDtypeStruct((mb, h, w, 64), dtype)
    skips = tuple(
        jax.ShapeDtypeStruct(
            (mb, -(-h // (1 << li)), -(-w // (1 << li)), c), dtype)
        for li, c in enumerate((64, 128, 256, 512)))
    return x_sh, skips


def make_pipeline_forward(cfg, mesh: Mesh, n_micro: int):
    """Build ``forward(stem_vars, stacked_vars, images, train) ->
    (out, new_stem_bs, new_stage_bs)``.

    ``out``: (S, n_micro, 4, mb_global, h, w, J) NHWC — stage-major stack
    of every stage's 4-scale heatmaps, microbatch-major within a stage;
    reshaping (n_micro, mb) back to B recovers input row order.
    """
    stage_num = int(cfg.MODEL.EXTRA.get("STAGE_NUM", 1))
    n_pipe = mesh.shape["model"]
    if n_pipe != stage_num:
        raise ValueError(
            f"pipeline parallelism needs mesh 'model' axis == STAGE_NUM "
            f"({n_pipe} != {stage_num})")
    n_data = mesh.shape["data"]
    stem = stem_from_cfg(cfg)
    stage = uniform_stage_from_cfg(cfg)
    S, T = stage_num, n_micro + stage_num - 1

    def forward(stem_vars, stacked_vars, images, train: bool):
        sv = {"params": stem_vars["params"],
              "batch_stats": stem_vars["batch_stats"]}
        x = _rsn_normalize(images)
        if train:
            x0, mut = stem.apply(sv, x, train=True,
                                 mutable=["batch_stats"])
            stem_bs = mut["batch_stats"]
        else:
            x0 = stem.apply(sv, x, train=False)
            stem_bs = stem_vars["batch_stats"]
        if tuple(x0.shape[1:3]) != tuple(stage.output_shape):
            raise ValueError(
                f"pipeline assumes heatmap == input/4 (stem out "
                f"{x0.shape[1:3]} != output_shape {stage.output_shape})")
        B = x0.shape[0]
        if B % (n_micro * n_data):
            raise ValueError(f"batch {B} not divisible by "
                             f"n_micro*n_data={n_micro * n_data}")
        mb = B // n_micro
        x_stack = x0.reshape(n_micro, mb, *x0.shape[1:])

        x_sh, skip_sh = _stage_io_shapes(stage.output_shape,
                                         mb // n_data, x0.dtype)

        def body(p_loc, bs_loc, x_loc):
            # one pipeline rank: squeeze the local (1, ...) stage axis
            p_loc = jax.tree_util.tree_map(lambda a: a[0], p_loc)
            bs0 = jax.tree_util.tree_map(lambda a: a[0], bs_loc)
            sid = jax.lax.axis_index("model")
            mb_l = x_loc.shape[1]
            h, w = stage.output_shape
            J = stage.output_chl_num
            # zeros are device-unvarying; the scan carry becomes varying
            # over both mesh axes after tick 1, so pre-cast (VMA typing)
            vary = lambda a: jax.lax.pcast(a, ("data", "model"),
                                           to="varying")
            buf0 = vary(jnp.zeros((n_micro, 4, mb_l, h, w, J), x_loc.dtype))
            act0 = jax.tree_util.tree_map(vary, (
                jnp.zeros(x_sh.shape, x_loc.dtype),
                tuple(jnp.zeros(s.shape, x_loc.dtype) for s in skip_sh),
                tuple(jnp.zeros(s.shape, x_loc.dtype) for s in skip_sh)))
            # bs came in 'model'-varying (sharded input); it additionally
            # becomes 'data'-varying through the masked train update
            bs0 = jax.tree_util.tree_map(
                lambda a: jax.lax.pcast(a, "data", to="varying"), bs0)

            def tick(carry, t):
                (ax, as1, as2), bs, buf = carry
                fresh = jax.lax.dynamic_index_in_dim(
                    x_loc, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
                is0 = sid == 0
                x_in = jnp.where(is0, fresh, ax)
                s1_in = [jnp.where(is0, jnp.zeros_like(s), s) for s in as1]
                s2_in = [jnp.where(is0, jnp.zeros_like(s), s) for s in as2]
                if train:
                    (res, s1, s2, cross), mut = stage.apply(
                        {"params": p_loc, "batch_stats": bs},
                        x_in, s1_in, s2_in, train=True,
                        mutable=["batch_stats"])
                else:
                    res, s1, s2, cross = stage.apply(
                        {"params": p_loc, "batch_stats": bs},
                        x_in, s1_in, s2_in, train=False)
                valid = (t >= sid) & (t - sid < n_micro)
                if train:
                    bs = jax.tree_util.tree_map(
                        lambda new, old: jnp.where(valid, new, old),
                        mut["batch_stats"], bs)
                upd = jax.lax.dynamic_update_index_in_dim(
                    buf, jnp.stack(res), jnp.clip(t - sid, 0, n_micro - 1),
                    0)
                buf = jnp.where(valid, upd, buf)
                perm = [(d, d + 1) for d in range(S - 1)]
                nxt = jax.lax.ppermute((cross, tuple(s1), tuple(s2)),
                                       "model", perm)
                return (nxt, bs, buf), None

            (_, bs_f, buf), _ = jax.lax.scan(tick, (act0, bs0, buf0),
                                             jnp.arange(T))
            # batch stats differ per data shard — average them (the pp
            # analogue of the dp path's global-batch stats)
            bs_f = jax.lax.pmean(bs_f, "data")
            return (buf[None],
                    jax.tree_util.tree_map(lambda a: a[None], bs_f))

        out, stage_bs = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P("model"), P("model"), P(None, "data")),
            out_specs=(P("model", None, None, "data"), P("model")))(
                stacked_vars["params"], stacked_vars["batch_stats"], x_stack)
        return out, stem_bs, stage_bs

    return forward


def pipeline_state_sharding(tree, mesh: Mesh):
    """Shardings for a pipelined train state: every leaf under a
    ``'stages'`` key shards its leading (stage) axis over ``'model'``;
    everything else (stem, schedules, counters) replicates."""
    rep = NamedSharding(mesh, P())

    def spec(path, x):
        in_stages = any(
            getattr(k, "key", getattr(k, "name", None)) == "stages"
            for k in path)
        if in_stages and getattr(x, "ndim", 0) >= 1:
            return NamedSharding(mesh, P("model"))
        return rep

    return jax.tree_util.tree_map_with_path(spec, tree)


def create_pipelined_rsn_state(cfg, rng, tx,
                               init_variables=None) -> TrainState:
    """TrainState whose params/batch_stats are ``{'stem': ..., 'stages':
    stacked}``.  ``init_variables``: an existing standard-RSN variables
    tree to convert (checkpoint/pretrained); ``None`` inits fresh —
    per-stage RNG streams, like stage modules under one init."""
    stage_num = int(cfg.MODEL.EXTRA.get("STAGE_NUM", 1))
    stem = stem_from_cfg(cfg)
    stage = uniform_stage_from_cfg(cfg)
    w, h = cfg.MODEL.IMAGE_SIZE
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)

    def init_all(r):
        rs = jax.random.split(r, stage_num + 1)
        sv = stem.init(rs[0], dummy, train=False)
        x0 = stem.apply(sv, dummy, train=False)
        x_sh, skip_sh = _stage_io_shapes(stage.output_shape, 1, x0.dtype)
        zs = [jnp.zeros(s.shape, x0.dtype) for s in skip_sh]
        per = [stage.init(rs[i + 1], x0, zs, zs, train=False)
               for i in range(stage_num)]
        return sv, per

    sv, per = jax.jit(init_all)(rng)
    template = per[0]
    if init_variables is not None:
        stem_v, stacked = split_rsn_variables(init_variables, stage_num,
                                              template)
    else:
        stem_v = sv
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per)
    params = {"stem": stem_v["params"], "stages": stacked["params"]}
    bs = {"stem": stem_v.get("batch_stats", {}),
          "stages": stacked.get("batch_stats", {})}
    return TrainState.create(None, params, bs, tx)


def make_pipelined_rsn_train_step(cfg, mesh: Mesh, n_micro: int,
                                  ohkm: bool = True, topk: int = 8,
                                  coarse_to_fine: bool = True):
    """Pipelined twin of core.rsn.make_rsn_train_step — same batch dict
    (image (B,H,W,3), labels (B,5,J,h,w), valid (B,J,1)), same loss
    (core.loss.rsn_multi_stage_loss), GPipe execution over the mesh
    'model' axis."""
    stage_num = int(cfg.MODEL.EXTRA.get("STAGE_NUM", 1))
    forward = make_pipeline_forward(cfg, mesh, n_micro)

    def step(state: TrainState, batch):
        def loss_of(params):
            out, stem_bs, stage_bs = forward(
                {"params": params["stem"],
                 "batch_stats": state.batch_stats["stem"]},
                {"params": params["stages"],
                 "batch_stats": state.batch_stats["stages"]},
                batch["image"], True)
            B = batch["image"].shape[0]
            h, w, J = out.shape[-3], out.shape[-2], out.shape[-1]
            outputs = [
                [out[i, :, j].reshape(B, h, w, J)
                 .transpose(0, 3, 1, 2).astype(jnp.float32)
                 for j in range(4)]
                for i in range(stage_num)]
            loss = rsn_multi_stage_loss(outputs, batch["valid"],
                                        batch["labels"], stage_num,
                                        ohkm=ohkm, topk=topk,
                                        coarse_to_fine=coarse_to_fine)
            return loss, {"stem": stem_bs, "stages": stage_bs}

        (loss, new_bs), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs,
                             opt_state=new_opt), {"total_loss": loss}

    return jax.jit(step, donate_argnums=(0,))
