"""Train-step perf study harness (round 3).

Measures HRNet-w32 offset train-step (fwd+bwd+adam) variants at B=128 on
the real chip, using the DESIGN.md marginal-cost methodology: checksum-
synced block timing, min of blocks, variant ablations selected by CLI.

Usage: python tools/profile_train.py v0 v_loss_sum ...   (names below)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(variants, B=128):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _hrnet_w32_cfg
    from udp_pose_tpu.core.loss import make_loss_fn
    from udp_pose_tpu.core.train import (TrainState, create_train_state,
                                         make_train_step, normalize_images)
    from udp_pose_tpu.models import build_model

    rng_np = np.random.default_rng(1)
    batch_np = {
        "image": rng_np.integers(0, 256, (B, 256, 192, 3)).astype(np.uint8),
        "target": rng_np.normal(size=(B, 51, 64, 48)).astype(np.float32),
        "target_weight": rng_np.uniform(size=(B, 17)).astype(np.float32),
    }
    device_batch = {k: jax.device_put(v) for k, v in batch_np.items()}

    def build_state(modules=(1, 4, 3), remat_stem=False, w48=False):
        cfg = _hrnet_w32_cfg((288, 384) if w48 else (192, 256),
                             (72, 96) if w48 else (48, 64),
                             dtype="bfloat16")
        for k, m in zip(("STAGE2", "STAGE3", "STAGE4"), modules):
            cfg.MODEL.EXTRA[k]["NUM_MODULES"] = m
        if w48:   # second flagship: w48 channel widths (README.md:46)
            for st, chs in (("STAGE2", [48, 96]), ("STAGE3", [48, 96, 192]),
                            ("STAGE4", [48, 96, 192, 384])):
                cfg.MODEL.EXTRA[st]["NUM_CHANNELS"] = chs
        model = build_model(cfg)
        if remat_stem:
            model = model.clone(remat_stem=True)
        state = create_train_state(cfg, model, jax.random.PRNGKey(0), 1000)
        return cfg, model, state

    def timeit(name, state, step_fn, prep, iters=6, blocks=2, gf=7.16,
               B_local=None):
        Bn = B_local or B
        checksum = jax.jit(lambda s: jnp.sum(
            s.params["final_layer"]["kernel"].astype(jnp.float32)))

        def run(n, state):
            for _ in range(n):
                state, _ = step_fn(state, prep())
            float(checksum(state))
            return state

        state = run(2, state)  # compile + warm
        best = None
        for _ in range(blocks):
            t0 = time.perf_counter()
            state = run(iters, state)
            dt = (time.perf_counter() - t0) / iters
            best = dt if best is None else min(best, dt)
        sps = Bn / best
        tfs = sps * gf * 1e9 * 3 / 1e12
        print(f"{name:28s} {best * 1e3:8.2f} ms  {sps:8.1f} samples/s "
              f"(~{tfs:.1f} TF/s)", flush=True)
        return best

    def prep_norm():
        db = dict(device_batch)
        db["image"] = normalize_images(db["image"])
        return db

    def prep_raw():
        return dict(device_batch)

    results = {}

    for v in variants:
        if v == "v0":
            # baseline: round-2 shipping config
            cfg, model, state = build_state()
            step = make_train_step(make_loss_fn(cfg))
            results[v] = timeit("v0 baseline", state, step, prep_norm)
        elif v == "v_norm_inside":
            # normalize folded INTO the donated step (single dispatch)
            cfg, model, state = build_state()
            loss_fn = make_loss_fn(cfg)

            def step(state, batch):
                def loss_of(params):
                    img = normalize_images(batch["image"])
                    out, mut = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        img, train=True, mutable=["batch_stats"])
                    nchw = out.transpose(0, 3, 1, 2).astype(jnp.float32)
                    loss, aux = loss_fn(nchw, batch["target"],
                                        batch["target_weight"])
                    return loss, (aux, mut["batch_stats"])

                (loss, (aux, bs)), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(state.params)
                updates, new_opt = state.tx.update(grads, state.opt_state,
                                                   state.params)
                return state.replace(
                    step=state.step + 1,
                    params=optax.apply_updates(state.params, updates),
                    batch_stats=bs, opt_state=new_opt), {"loss": loss}

            results[v] = timeit("v_norm_inside", state,
                               jax.jit(step, donate_argnums=(0,)), prep_raw)
        elif v == "v_loss_sum":
            # loss = sum(out^2) in NHWC — no transpose, no targets
            cfg, model, state = build_state()

            def step(state, batch):
                def loss_of(params):
                    out, mut = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        batch["image"], train=True, mutable=["batch_stats"])
                    return jnp.mean(out.astype(jnp.float32) ** 2), \
                        mut["batch_stats"]

                (loss, bs), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(state.params)
                updates, new_opt = state.tx.update(grads, state.opt_state,
                                                   state.params)
                return state.replace(
                    step=state.step + 1,
                    params=optax.apply_updates(state.params, updates),
                    batch_stats=bs, opt_state=new_opt), {"loss": loss}

            results[v] = timeit("v_loss_sum (no NCHW/target)", state,
                               jax.jit(step, donate_argnums=(0,)), prep_norm)
        elif v == "v_bn_frozen":
            # BN running stats (train=False semantics) but full grads —
            # isolates BN batch-stat + its bwd cost
            cfg, model, state = build_state()
            loss_fn = make_loss_fn(cfg)

            def step(state, batch):
                def loss_of(params):
                    out = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        batch["image"], train=False)
                    nchw = out.transpose(0, 3, 1, 2).astype(jnp.float32)
                    loss, aux = loss_fn(nchw, batch["target"],
                                        batch["target_weight"])
                    return loss, aux

                (loss, aux), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(state.params)
                updates, new_opt = state.tx.update(grads, state.opt_state,
                                                   state.params)
                return state.replace(
                    step=state.step + 1,
                    params=optax.apply_updates(state.params, updates),
                    opt_state=new_opt), {"loss": loss}

            results[v] = timeit("v_bn_frozen", state,
                               jax.jit(step, donate_argnums=(0,)), prep_norm)
        elif v == "v_no_adam":
            # grads only, no optimizer update — isolates adam+donation cost
            cfg, model, state = build_state()
            loss_fn = make_loss_fn(cfg)

            def step(state, batch):
                def loss_of(params):
                    out, mut = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        batch["image"], train=True, mutable=["batch_stats"])
                    nchw = out.transpose(0, 3, 1, 2).astype(jnp.float32)
                    loss, aux = loss_fn(nchw, batch["target"],
                                        batch["target_weight"])
                    return loss, (aux, mut["batch_stats"])

                (loss, (aux, bs)), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(state.params)
                gsum = sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads))
                # fold a grad-dependent perturbation into params so the
                # checksum forces full bwd execution
                new_params = jax.tree_util.tree_map(
                    lambda p: p + 0 * gsum.astype(p.dtype), state.params)
                return state.replace(step=state.step + 1,
                                     params=new_params,
                                     batch_stats=bs), {"loss": loss}

            results[v] = timeit("v_no_adam", state,
                               jax.jit(step, donate_argnums=(0,)), prep_norm)
        elif v == "v_fused_bn":
            # round-4 bwd attack: every train-mode BatchNorm rerouted to
            # the hand-written canonical VJP (ops/fused_bn.py — bf16 x
            # saved + relu-mask recompute instead of whatever residual
            # set XLA's mechanical differentiation picks).  ReLU stays
            # outside (ConvBN applies it after), so this isolates the
            # BN-residual/schedule effect.
            import flax.linen as nn
            from jax import lax

            from udp_pose_tpu.ops.fused_bn import _stats, bn_relu_train

            cfg, model, state = build_state()

            def bn_interceptor(next_fun, args, kwargs, context):
                mod = context.module
                if (type(mod) is not nn.BatchNorm
                        or context.method_name != "__call__"
                        or mod.use_running_average):
                    return next_fun(*args, **kwargs)
                x = args[0]
                scale = mod.variables["params"]["scale"]
                bias = mod.variables["params"]["bias"]
                y = bn_relu_train(x, scale, bias, mod.epsilon, False)
                mean, var = _stats(
                    lax.stop_gradient(x).astype(jnp.float32))
                m = mod.momentum
                ra_mean = mod.variables["batch_stats"]["mean"]
                ra_var = mod.variables["batch_stats"]["var"]
                mod.put_variable("batch_stats", "mean",
                                 m * ra_mean + (1 - m) * mean)
                mod.put_variable("batch_stats", "var",
                                 m * ra_var + (1 - m) * var)
                return y.astype(x.dtype)

            class _FusedBNModel:
                def __init__(self, inner):
                    self._inner = inner

                def __getattr__(self, name):
                    return getattr(self._inner, name)

                def apply(self, *a, **kw):
                    with nn.intercept_methods(bn_interceptor):
                        return self._inner.apply(*a, **kw)

            fm = _FusedBNModel(model)
            state = state.replace(apply_fn=fm.apply)
            step = make_train_step(make_loss_fn(cfg))
            results[v] = timeit("v_fused_bn (custom BN VJP)", state,
                                step, prep_norm)
        elif v == "v_fused_bn_relu":
            # like v_fused_bn but the ConvBN-level ReLU is fused INTO the
            # custom VJP (no separate relu residual/mask tensor at all):
            # temporarily swap layers.ConvBN.__call__ for a body that
            # ends in FusedBatchNorm(relu=...).
            import flax.linen as nn

            import udp_pose_tpu.models.layers as L
            from udp_pose_tpu.ops.fused_bn import FusedBatchNorm

            def patched_call(self, x, train=False):
                pad = (self.kernel - 1) // 2
                x = nn.Conv(self.features, (self.kernel, self.kernel),
                            strides=(self.stride, self.stride),
                            padding=((pad, pad), (pad, pad)),
                            use_bias=self.use_bias, dtype=self.dtype,
                            name="conv")(x)
                return FusedBatchNorm(
                    use_running_average=not train, momentum=L.BN_MOMENTUM,
                    epsilon=1e-5, dtype=self.dtype, relu=self.relu,
                    name="bn")(x)

            # a proper flax subclass (ModuleMeta wraps the method) swapped
            # into the two module-global lookup sites for the build
            import udp_pose_tpu.models.hrnet as H

            class FusedConvBN(L.ConvBN):
                __call__ = nn.compact(patched_call)

            orig = L.ConvBN
            L.ConvBN = H.ConvBN = FusedConvBN
            try:
                cfg, model, state = build_state()
                step = make_train_step(make_loss_fn(cfg))
                results[v] = timeit("v_fused_bn_relu (BN+ReLU VJP)",
                                    state, step, prep_norm)
            finally:
                L.ConvBN = H.ConvBN = orig
        elif v == "v_remat_stem":
            # selective remat: recompute only the memory-bound hi-res
            # stem/layer1 activations in bwd
            cfg, model, state = build_state(remat_stem=True)
            step = make_train_step(make_loss_fn(cfg))
            results[v] = timeit("v_remat_stem", state, step, prep_norm)
        elif v.startswith("v_w48_b"):
            # second flagship: HRNet-w48 384x288 offset (README.md:46);
            # fwd FLOPs from compiled cost_analysis (~35.4 GF/crop)
            Bw = int(v[len("v_w48_b"):])
            cfg, model, state = build_state(w48=True)
            from udp_pose_tpu.utils.summary import model_flops
            try:
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}
                gf = model_flops(model, variables, (1, 384, 288, 3)) / 1e9
            except Exception:
                gf = 35.4
            wb = {
                "image": jax.device_put(rng_np.integers(
                    0, 256, (Bw, 384, 288, 3)).astype(np.uint8)),
                "target": jax.device_put(rng_np.normal(
                    size=(Bw, 51, 96, 72)).astype(np.float32)),
                "target_weight": jax.device_put(rng_np.uniform(
                    size=(Bw, 17)).astype(np.float32)),
            }

            def prep_w48():
                db = dict(wb)
                db["image"] = normalize_images(db["image"])
                return db

            step = make_train_step(make_loss_fn(cfg))
            results[v] = timeit(f"w48@384 B={Bw}", state, step, prep_w48,
                                gf=gf, B_local=Bw)
        elif v.startswith("v_mod_"):
            # marginal stage cost, e.g. v_mod_1_1_3
            mods = tuple(int(c) for c in v.split("_")[2:])
            cfg, model, state = build_state(mods)
            step = make_train_step(make_loss_fn(cfg))
            results[v] = timeit(f"modules={mods}", state, step, prep_norm)
        elif v.startswith("v_scan"):
            # N train steps under one lax.scan dispatch — isolates
            # per-dispatch overhead (axon relay) from compute
            n_steps = int(v[len("v_scan"):])
            cfg, model, state = build_state()
            loss_fn = make_loss_fn(cfg)

            def one(state, batch):
                def loss_of(params):
                    out, mut = state.apply_fn(
                        {"params": params, "batch_stats": state.batch_stats},
                        batch["image"], train=True, mutable=["batch_stats"])
                    nchw = out.transpose(0, 3, 1, 2).astype(jnp.float32)
                    loss, aux = loss_fn(nchw, batch["target"],
                                        batch["target_weight"])
                    return loss, (aux, mut["batch_stats"])

                (loss, (aux, bs)), grads = jax.value_and_grad(
                    loss_of, has_aux=True)(state.params)
                updates, new_opt = state.tx.update(grads, state.opt_state,
                                                   state.params)
                return state.replace(
                    step=state.step + 1,
                    params=optax.apply_updates(state.params, updates),
                    batch_stats=bs, opt_state=new_opt), loss

            def step(state, batch):
                def body(s, _):
                    s, loss = one(s, batch)
                    return s, loss
                state, losses = jax.lax.scan(body, state, None,
                                             length=n_steps)
                return state, {"loss": losses[-1]}

            t = timeit(f"v_scan{n_steps} ({n_steps} steps/call)", state,
                       jax.jit(step, donate_argnums=(0,)), prep_norm,
                       iters=max(2, 6 // n_steps))
            results[v] = t / n_steps
            print(f"  -> {t / n_steps * 1e3:.2f} ms/step, "
                  f"{B * n_steps / t:.1f} samples/s", flush=True)
        elif v == "v_remat_hr":
            # remat every HRModule (recompute in bwd; less HBM traffic)
            results[v] = run_remat(jax, jnp, optax, timeit, prep_norm,
                                   build_state, policy="hr")
        elif v == "v_remat_dots":
            results[v] = run_remat(jax, jnp, optax, timeit, prep_norm,
                                   build_state, policy="dots")
        else:
            print(f"unknown variant {v}", file=sys.stderr)

    print(results)


def run_remat(jax, jnp, optax, timeit, prep_norm, build_state, policy):
    """Remat the whole apply with a checkpoint policy."""
    from udp_pose_tpu.core.loss import make_loss_fn

    cfg, model, state = build_state()
    loss_fn = make_loss_fn(cfg)
    if policy == "dots":
        pol = jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
    else:
        pol = jax.checkpoint_policies.nothing_saveable

    def apply(params, batch_stats, img):
        return state.apply_fn({"params": params, "batch_stats": batch_stats},
                              img, train=True, mutable=["batch_stats"])

    apply_r = jax.checkpoint(apply, policy=pol)

    def step(state, batch):
        def loss_of(params):
            out, mut = apply_r(params, state.batch_stats, batch["image"])
            nchw = out.transpose(0, 3, 1, 2).astype(jnp.float32)
            loss, aux = loss_fn(nchw, batch["target"], batch["target_weight"])
            return loss, (aux, mut["batch_stats"])

        (loss, (aux, bs)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state,
                                           state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            batch_stats=bs, opt_state=new_opt), {"loss": loss}

    return timeit(f"v_remat_{policy}", state,
                  jax.jit(step, donate_argnums=(0,)), prep_norm)


if __name__ == "__main__":
    main(sys.argv[1:] or ["v0"], B=int(os.environ.get("PROF_B", "128")))
