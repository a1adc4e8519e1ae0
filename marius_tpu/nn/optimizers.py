"""Dense functional optimizers: SGD / Adagrad / Adam.

Behavioral parity with the reference's hand-written optimizers (nn/optim.cpp:
SGD :50, Adagrad :85-145, Adam :149-234, defaults in tools/configuration/
datatypes.py:43-79), re-expressed as pure (params, state, grads) -> (params,
state) transforms over pytrees so they compose with jit/scan/pjit. The sparse
embedding-table Adagrad (Batch::accumulateGradients) lives in
parallel/embedding_table.py, mirroring the reference's split (SURVEY §2 Optimizers).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    optimizer_type: str = "ADAGRAD"   # SGD | ADAGRAD | ADAM
    learning_rate: float = 0.1
    # Adagrad (datatypes.py:56-58 + optim.cpp:85-145)
    eps: float = 1e-10
    lr_decay: float = 0.0
    weight_decay: float = 0.0
    init_value: float = 0.0
    # Adam (datatypes.py:74-79)
    beta_1: float = 0.9
    beta_2: float = 0.999
    adam_eps: float = 1e-8
    amsgrad: bool = False
    # SGD
    momentum: float = 0.0


class OptState(NamedTuple):
    step: jax.Array          # int32 scalar
    slots: Any               # pytree of per-param state dicts


def _zeros_like_tree(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def init_optimizer(config: OptimizerConfig, params) -> OptState:
    ot = config.optimizer_type.upper()
    if ot == "SGD":
        slots = {"momentum": _zeros_like_tree(params)} if config.momentum else {}
    elif ot == "ADAGRAD":
        slots = {"sum": jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, config.init_value), params)}
    elif ot == "ADAM":
        slots = {"exp_avg": _zeros_like_tree(params),
                 "exp_avg_sq": _zeros_like_tree(params)}
        if config.amsgrad:
            slots["max_exp_avg_sq"] = _zeros_like_tree(params)
    else:
        raise ValueError(f"Unknown optimizer type: {config.optimizer_type}")
    return OptState(step=jnp.zeros((), jnp.int32), slots=slots)


def _match_dtypes(new_params, ref_params):
    return jax.tree_util.tree_map(lambda n, r: n.astype(r.dtype), new_params, ref_params)


def apply_optimizer(config: OptimizerConfig, params, state: OptState, grads) -> Tuple[Any, OptState]:
    """One optimizer step; returns (new_params, new_state). Step math runs in
    f32 (Python-scalar lr/beta promote), so low-precision params (bf16 tables)
    are cast back to their stored dtype afterwards."""
    ot = config.optimizer_type.upper()
    step = state.step
    in_params = params

    if config.weight_decay:
        grads = jax.tree_util.tree_map(
            lambda g, p: g + config.weight_decay * p, grads, params)

    if ot == "SGD":
        if config.momentum:
            new_mom = jax.tree_util.tree_map(
                lambda m, g: config.momentum * m + g, state.slots["momentum"], grads)
            new_params = jax.tree_util.tree_map(
                lambda p, m: p - config.learning_rate * m, params, new_mom)
            return _match_dtypes(new_params, in_params), OptState(step + 1, {"momentum": new_mom})
        new_params = jax.tree_util.tree_map(
            lambda p, g: p - config.learning_rate * g, params, grads)
        return _match_dtypes(new_params, in_params), OptState(step + 1, state.slots)

    if ot == "ADAGRAD":
        # lr / (1 + num_steps * lr_decay); sum += g²; p -= lr * g / (sqrt(sum)+eps)
        lr = config.learning_rate / (1.0 + step.astype(jnp.float32) * config.lr_decay)
        new_sum = jax.tree_util.tree_map(
            lambda s, g: s + g * g, state.slots["sum"], grads)
        new_params = jax.tree_util.tree_map(
            lambda p, g, s: p - lr * g / (jnp.sqrt(s) + config.eps),
            params, grads, new_sum)
        return _match_dtypes(new_params, in_params), OptState(step + 1, {"sum": new_sum})

    if ot == "ADAM":
        b1, b2 = config.beta_1, config.beta_2
        t = step.astype(jnp.float32) + 1.0
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        new_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.slots["exp_avg"], grads)
        new_sq = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.slots["exp_avg_sq"], grads)
        new_slots = {"exp_avg": new_avg, "exp_avg_sq": new_sq}
        if config.amsgrad:
            new_max = jax.tree_util.tree_map(
                jnp.maximum, state.slots["max_exp_avg_sq"], new_sq)
            new_slots["max_exp_avg_sq"] = new_max
            denom_src = new_max
        else:
            denom_src = new_sq
        step_size = config.learning_rate / bc1
        new_params = jax.tree_util.tree_map(
            lambda p, m, v: p - step_size * m / (jnp.sqrt(v) / jnp.sqrt(bc2) + config.adam_eps),
            params, new_avg, denom_src)
        return _match_dtypes(new_params, in_params), OptState(step + 1, new_slots)

    raise ValueError(f"Unknown optimizer type: {config.optimizer_type}")
