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


@dataclasses.dataclass(frozen=True)
class GroupedOptimizerConfig:
    """Per-layer/per-decoder optimizers (setup_optimizers, nn/model.cpp:
    161-218): every param leaf is assigned the most specific matching
    override by its tree path, falling back to ``default``. Overrides are
    keyed by normalized path prefixes — ``("encoder", stage, layer)`` for a
    layer's params, ``("decoder",)`` for the decoder's."""

    default: OptimizerConfig
    overrides: Tuple[Tuple[Tuple, OptimizerConfig], ...] = ()

    def config_for(self, path: Tuple) -> OptimizerConfig:
        best, best_len = self.default, -1
        for prefix, cfg in self.overrides:
            k = len(prefix)
            if k > best_len and path[:k] == prefix:
                best, best_len = cfg, k
        return best


def _norm_path(key_path) -> Tuple:
    """jax KeyPath -> plain tuple of dict keys / sequence indices."""
    out = []
    for k in key_path:
        if hasattr(k, "key"):
            out.append(k.key)
        elif hasattr(k, "idx"):
            out.append(k.idx)
        else:
            out.append(str(k))
    return tuple(out)


class OptState(NamedTuple):
    step: jax.Array          # int32 scalar
    slots: Any               # pytree of per-param state dicts


def _zeros_like_tree(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def _leaf_init(config: OptimizerConfig, p) -> Dict[str, Any]:
    ot = config.optimizer_type.upper()
    if ot == "SGD":
        return {"momentum": jnp.zeros_like(p)} if config.momentum else {}
    if ot == "ADAGRAD":
        return {"sum": jnp.full_like(p, config.init_value)}
    if ot == "ADAM":
        slots = {"exp_avg": jnp.zeros_like(p), "exp_avg_sq": jnp.zeros_like(p)}
        if config.amsgrad:
            slots["max_exp_avg_sq"] = jnp.zeros_like(p)
        return slots
    raise ValueError(f"Unknown optimizer type: {config.optimizer_type}")


def _leaf_apply(config: OptimizerConfig, p, g, slots: Dict[str, Any],
                step: jax.Array):
    """One leaf's optimizer step — the same formulas as the tree-level
    branches of apply_optimizer, applied to a single (param, grad, slots)."""
    ot = config.optimizer_type.upper()
    if config.weight_decay:
        g = g + config.weight_decay * p
    if ot == "SGD":
        if config.momentum:
            m = config.momentum * slots["momentum"] + g
            return (p - config.learning_rate * m).astype(p.dtype), {"momentum": m}
        return (p - config.learning_rate * g).astype(p.dtype), slots
    if ot == "ADAGRAD":
        lr = config.learning_rate / (
            1.0 + step.astype(jnp.float32) * config.lr_decay)
        s = slots["sum"] + g * g
        return (p - lr * g / (jnp.sqrt(s) + config.eps)).astype(p.dtype), {"sum": s}
    if ot == "ADAM":
        b1, b2 = config.beta_1, config.beta_2
        t = step.astype(jnp.float32) + 1.0
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t
        m = b1 * slots["exp_avg"] + (1.0 - b1) * g
        v = b2 * slots["exp_avg_sq"] + (1.0 - b2) * g * g
        new_slots = {"exp_avg": m, "exp_avg_sq": v}
        if config.amsgrad:
            vmax = jnp.maximum(slots["max_exp_avg_sq"], v)
            new_slots["max_exp_avg_sq"] = vmax
            denom_src = vmax
        else:
            denom_src = v
        step_size = config.learning_rate / bc1
        new_p = p - step_size * m / (jnp.sqrt(denom_src) / jnp.sqrt(bc2)
                                     + config.adam_eps)
        return new_p.astype(p.dtype), new_slots
    raise ValueError(f"Unknown optimizer type: {config.optimizer_type}")


def init_optimizer(config, params) -> OptState:
    if isinstance(config, GroupedOptimizerConfig):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
        slot_leaves = [_leaf_init(config.config_for(_norm_path(path)), p)
                       for path, p in leaves]
        return OptState(step=jnp.zeros((), jnp.int32),
                        slots=jax.tree_util.tree_unflatten(treedef, slot_leaves))
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


def apply_optimizer(config, params, state: OptState, grads) -> Tuple[Any, OptState]:
    """One optimizer step; returns (new_params, new_state). Step math runs in
    f32 (Python-scalar lr/beta promote), so low-precision params (bf16 tables)
    are cast back to their stored dtype afterwards. ``config`` may be a plain
    OptimizerConfig or a GroupedOptimizerConfig (per-layer optimizers)."""
    if isinstance(config, GroupedOptimizerConfig):
        p_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
        g_leaves = treedef.flatten_up_to(grads)
        s_leaves = treedef.flatten_up_to(state.slots)
        new_p, new_s = [], []
        for (path, p), g, s in zip(p_leaves, g_leaves, s_leaves):
            np_, ns_ = _leaf_apply(config.config_for(_norm_path(path)),
                                   p, g, s, state.step)
            new_p.append(np_)
            new_s.append(ns_)
        return (jax.tree_util.tree_unflatten(treedef, new_p),
                OptState(state.step + 1,
                         jax.tree_util.tree_unflatten(treedef, new_s)))
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
