"""Train step: optax optimizer + pjit-sharded update (TPU-native DDP).

Replaces the reference's epoch loop + DataParallel
(deep_hrnet/lib/core/function.py:27-111, tools/train.py:116-214): one jitted
``train_step(state, batch)`` whose batch shards over the mesh 'data' axis;
XLA inserts the gradient all-reduce.  Optimizer parity:
``get_optimizer`` (lib/utils/utils.py:60-76 — note adam ignores WD there,
reproduced) and MultiStepLR (tools/train.py:181-184).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

# torchvision Normalize constants used across the reference
# (pose_engine.py:40-43, tools/train.py transform)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   tx=tx, apply_fn=apply_fn)


def multistep_lr(base_lr, lr_step_epochs, lr_factor, steps_per_epoch):
    """MultiStepLR parity (tools/train.py:181-184) as an optax schedule."""
    boundaries = {int(e) * int(steps_per_epoch): lr_factor
                  for e in lr_step_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    """Parity with get_optimizer (lib/utils/utils.py:60-76): sgd uses
    momentum/WD/nesterov; adam takes only LR (the reference drops WD)."""
    sched = multistep_lr(cfg.TRAIN.LR, cfg.TRAIN.LR_STEP, cfg.TRAIN.LR_FACTOR,
                         steps_per_epoch)
    if cfg.TRAIN.OPTIMIZER == "sgd":
        return optax.chain(
            optax.add_decayed_weights(cfg.TRAIN.WD),
            optax.sgd(sched, momentum=cfg.TRAIN.MOMENTUM,
                      nesterov=cfg.TRAIN.NESTEROV),
        )
    return optax.adam(sched)


# RSN normalises BGR-loaded images with BGR-ordered constants
# (RSN/exps/RSN18.coco/config.py INPUT.MEANS/STDS "# bgr")
RSN_BGR_MEAN = (0.406, 0.456, 0.485)
RSN_BGR_STD = (0.225, 0.224, 0.229)


def normalize_images(images_uint8_or_float, mean=IMAGENET_MEAN,
                     std=IMAGENET_STD):
    """uint8/float [0,255] NHWC → normalised float32.

    The constants are applied to whatever channel order the loader
    produced, exactly like the reference's fixed-constant Normalize
    transforms; RSN passes the BGR-ordered RSN_BGR_MEAN/STD."""
    x = images_uint8_or_float.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(mean, jnp.float32)) / \
        jnp.asarray(std, jnp.float32)


def create_train_state(cfg, model, rng, steps_per_epoch: int) -> TrainState:
    w, h = cfg.MODEL.IMAGE_SIZE
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    # jitted init: one compiled program instead of per-op dispatch (crucial
    # over the axon relay where each eager op is a round trip)
    variables = jax.jit(lambda r: model.init(r, dummy, train=False))(rng)
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState.create(model.apply, variables["params"],
                             variables.get("batch_stats", FrozenDict()), tx)


def make_train_step(loss_fn, remat: bool = False, with_output: bool = False):
    """Build the jitted train step.

    ``batch``: dict(image (B,H,W,3) float32 normalised, target (B,C,Ht,Wt),
    target_weight (B,J)).  The model outputs NHWC; the loss sees NCHW
    (reference layout).  Donates the state for in-place buffer reuse.
    ``with_output`` adds the NCHW heatmaps to the metrics (fetched only at
    PRINT_FREQ steps for train-time PCK / DEBUG images — no per-step sync).
    """

    def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_of(params):
            out, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"])
            nchw = out.transpose(0, 3, 1, 2).astype(jnp.float32)
            loss, aux = loss_fn(nchw, batch["target"],
                                batch["target_weight"])
            return loss, (aux, mut["batch_stats"], nchw)

        (loss, (aux, new_bs, nchw)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_bs, opt_state=new_opt)
        metrics = {"loss": loss, **aux}
        if with_output:
            metrics["output"] = nchw
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))
