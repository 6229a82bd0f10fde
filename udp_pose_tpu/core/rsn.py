"""RSN-specific train step and inference pipeline.

Parity: RSN/exps/*/train.py (iteration-based loop, warmup-linear-decay LR
:76, loss-dict sum :78), solver.py:8-31 (LR×num_gpu, LambdaLR), test.py
(flip-test averaging :88-96 + ``get_results`` decode).  The jit bodies
reuse core/train machinery; only the loss plumbing (stage-list outputs,
multi-kernel labels) and decode differ from the UDP stack.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.flip import flip_back
from ..ops.rsn_decode import rsn_decode
from .loss import rsn_multi_stage_loss
from .train import (RSN_BGR_MEAN, RSN_BGR_STD, TrainState,
                    normalize_images)


def _rsn_normalize(images):
    """RSN reads BGR (attribute.py COLOR_RGB=False) and normalises with the
    BGR-ordered INPUT.MEANS/STDS (RSN config.py:37-39)."""
    return normalize_images(images, RSN_BGR_MEAN, RSN_BGR_STD)


def warmup_linear_decay(base_lr, warmup_iters, max_iters,
                        warmup_factor=0.1):
    """RSN solver.py:22-31 LambdaLR: linear warmup then linear decay."""
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_factor + (1 - warmup_factor) * step / warmup_iters
        decay = 1.0 - (step - warmup_iters) / float(max_iters - warmup_iters)
        return base_lr * jnp.where(step < warmup_iters, warm,
                                   jnp.maximum(decay, 0.0))
    return sched


def make_rsn_optimizer(base_lr, weight_decay, max_iters,
                       warmup_iters=1000):
    """Adam + WD (RSN solver.py:8-19 uses Adam(lr, weight_decay=wd))."""
    sched = warmup_linear_decay(base_lr, warmup_iters, max_iters)
    return optax.chain(optax.add_decayed_weights(weight_decay),
                       optax.adam(sched))


def make_rsn_train_step(stage_num: int, ohkm=True, topk=8,
                        coarse_to_fine=True):
    """batch: image (B,H,W,3) uint8/float, labels (B,5,J,h,w),
    valid (B,J,1)."""

    def step(state: TrainState, batch):
        def loss_of(params):
            out, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                _rsn_normalize(batch["image"]), train=True,
                mutable=["batch_stats"])
            # NHWC stage outputs → NCHW for the loss
            outputs = [[o.transpose(0, 3, 1, 2).astype(jnp.float32)
                        for o in stage] for stage in out]
            loss = rsn_multi_stage_loss(outputs, batch["valid"],
                                        batch["labels"], stage_num,
                                        ohkm=ohkm, topk=topk,
                                        coarse_to_fine=coarse_to_fine)
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs,
                             opt_state=new_opt), {"total_loss": loss}

    return jax.jit(step, donate_argnums=(0,))


def make_rsn_infer_fn(model, *, flip_test=True, flip_pairs,
                      kernel=5, shifts=(0.25,), input_size_hw=(256, 192),
                      flip_mode="fold"):
    """Flip-test + RSN decode in one jit graph (RSN test.py:74-116).

    ``flip_mode`` as in core.infer.make_infer_fn: ``fold`` (default)
    concats to one 2B forward; ``two_pass`` runs two B-sized forwards —
    faster once B alone fills the chip (round-4 phase study); sample-
    wise math is identical."""
    pairs = tuple(map(tuple, flip_pairs))

    @jax.jit
    def infer(variables, images, center, scale):
        from .infer import cast_to_compute_dtype
        x = cast_to_compute_dtype(model, _rsn_normalize(images))
        B = x.shape[0]
        if flip_test and flip_mode == "fold":
            x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
        out = model.apply(variables, x, train=False)
        hm = out.transpose(0, 3, 1, 2).astype(jnp.float32)
        if flip_test:
            if flip_mode == "two_pass":
                out_f = model.apply(variables, x[:, :, ::-1, :],
                                    train=False)
                hm_f = out_f.transpose(0, 3, 1, 2).astype(jnp.float32)
            else:
                hm, hm_f = hm[:B], hm[B:]
            hm = (hm + flip_back(hm_f, pairs)) * 0.5
        preds, maxvals = rsn_decode(hm, center, scale, kernel=kernel,
                                    shifts=shifts,
                                    input_size_hw=input_size_hw)
        return preds, maxvals, hm

    return infer
