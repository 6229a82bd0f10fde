"""Model summary + profiling (parity: lib/utils/utils.py:113-229
get_model_summary hook-based params/FLOPs; SURVEY §5.1 TPU equivalents).

Params come from the variables tree; FLOPs from XLA's own cost analysis of
the jitted forward (exact for the compiled graph, vs the reference's
conv/linear-only hook estimate).  ``profile_trace`` wraps jax.profiler.
"""

from __future__ import annotations

import contextlib

import numpy as np


def count_params(variables) -> int:
    import jax
    return int(sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(variables.get("params",
                                                           variables))))


def model_flops(model, variables, input_shape) -> float:
    """Total forward FLOPs from compiled-graph cost analysis."""
    import jax
    import jax.numpy as jnp

    fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
    lowered = fn.lower(variables, jnp.zeros(input_shape, jnp.float32))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return float(cost.get("flops", -1.0))


def get_model_summary(model, variables, input_shape) -> str:
    n_params = count_params(variables)
    flops = model_flops(model, variables, input_shape)
    return (f"params: {n_params / 1e6:.2f}M  "
            f"fwd flops @ {tuple(input_shape)}: {flops / 1e9:.2f} GFLOPs")


@contextlib.contextmanager
def profile_trace(logdir="/tmp/jax_trace"):
    """jax.profiler trace context (TensorBoard-viewable)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
