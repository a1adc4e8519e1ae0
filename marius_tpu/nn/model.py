"""Model: encoder + decoder + loss + optimizers, and the per-batch math.

Parity with the reference Model (nn/model.cpp): forward_lp (:252-288) with
CORRUPT_NODE scoring, forward_nc (:246-250), train_batch loss composition
lhs+rhs when inverse relations are on (:290-333), evaluate_batch rank results
(:335-359). The functional split here: `Model` is a static description;
parameters live in a pytree {"encoder": ..., "decoder": ...}; batch math is
pure functions consumed by the jitted trainer (train/trainer.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from marius_tpu.data.batch import NeighborBatch
from marius_tpu.nn.decoders.edge import EdgeDecoder
from marius_tpu.nn.encoder import EncoderConfig, encoder_forward, init_encoder_params
from marius_tpu.nn.losses import classification_cross_entropy, get_loss_function
from marius_tpu.nn.optimizers import OptimizerConfig
from marius_tpu.reporting.metrics import compute_ranks

Array = jax.Array

LINK_PREDICTION = "LINK_PREDICTION"
NODE_CLASSIFICATION = "NODE_CLASSIFICATION"


@dataclasses.dataclass(frozen=True)
class Model:
    learning_task: str
    encoder: EncoderConfig
    decoder: Optional[EdgeDecoder] = None       # None -> NoOp node decoder
    loss_type: str = "SOFTMAX_CE"
    loss_reduction: str = "SUM"
    loss_margin: float = 0.1
    # async staleness grouping under MEAN reduction: the grouped K-batch step
    # must apply the SUM of the K sub-batches' mean-gradients, not their
    # average — the manager sets this to K so the merged gradient matches K
    # reference optimizer steps at one snapshot (trainer.cpp:35-74)
    loss_scale: float = 1.0
    dense_optimizer: OptimizerConfig = dataclasses.field(
        default_factory=lambda: OptimizerConfig("ADAM", learning_rate=0.1))
    sparse_lr: float = 0.1                       # embedding-table Adagrad lr

    def loss_fn(self):
        f = get_loss_function(self.loss_type, reduction=self.loss_reduction,
                              margin=self.loss_margin)
        if self.loss_scale == 1.0:
            return f
        scale = self.loss_scale
        return lambda *a, **kw: f(*a, **kw) * scale

    @property
    def has_embeddings(self) -> bool:
        return self.encoder.has_embeddings


def init_model_params(key: jax.Array, model: Model, dtype=jnp.float32) -> Dict[str, Any]:
    k_enc, _ = jax.random.split(key)
    params: Dict[str, Any] = {"encoder": init_encoder_params(k_enc, model.encoder, dtype)}
    if model.decoder is not None:
        params["decoder"] = model.decoder.init_params(dtype)
    return params


def lp_batch_loss(
    model: Model,
    params: Dict[str, Any],
    encoded: Array,          # (U, d) encoded representations of the batch's unique nodes
    inv_src: Array,          # (B,) positions of edge sources in `encoded`
    inv_dst: Array,          # (B,)
    rel_ids: Optional[Array],  # (B,) or None
    inv_dst_negs: Array,     # (C, N) positions of dst-corruption negatives
    inv_src_negs: Optional[Array],  # (C, N) or None
    edge_mask: Array,        # (B,) valid edges
    dst_neg_filter: Optional[Array] = None,  # (B, N) True = false negative
    src_neg_filter: Optional[Array] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Corrupt-node LP loss for one batch (train_batch, model.cpp:290-333).

    Returns (loss, aux) where aux carries the raw scores for evaluation reuse.
    """
    c, n = inv_dst_negs.shape
    d = encoded.shape[-1]

    src = encoded[inv_src]
    dst = encoded[inv_dst]
    dst_negs = encoded[inv_dst_negs.reshape(-1)].reshape(c, n, d)
    src_negs = None
    if inv_src_negs is not None:
        src_negs = encoded[inv_src_negs.reshape(-1)].reshape(c, n, d)
    return lp_batch_loss_direct(model, params, src, dst, rel_ids, dst_negs,
                                src_negs, edge_mask, dst_neg_filter,
                                src_neg_filter)


def lp_batch_loss_direct(
    model: Model,
    params: Dict[str, Any],
    src: Array,              # (B, d) source embeddings
    dst: Array,              # (B, d)
    rel_ids: Optional[Array],
    dst_negs: Array,         # (C, N, d) dst-corruption negative embeddings
    src_negs: Optional[Array],
    edge_mask: Array,
    dst_neg_filter: Optional[Array] = None,
    src_neg_filter: Optional[Array] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """lp_batch_loss on pre-gathered embeddings. Trainers whose batch layout
    is already [src; dst; negs] slice instead of gathering — backward of a
    slice is a pad, which XLA fuses, while backward of a gather is a serialized
    row scatter (~7ns/row on v5e)."""
    decoder = model.decoder
    assert decoder is not None
    pos, neg, inv_pos, inv_neg = decoder.node_corrupt_forward(
        params["decoder"], src, dst, rel_ids, dst_negs, src_negs)

    # score filters push known true edges to -1e9 (apply_score_filter)
    if dst_neg_filter is not None:
        neg = jnp.where(dst_neg_filter, -1e9, neg)
    if inv_neg is not None and src_neg_filter is not None:
        inv_neg = jnp.where(src_neg_filter, -1e9, inv_neg)

    loss_fn = model.loss_fn()
    loss = loss_fn(pos, neg, mask=edge_mask)
    if inv_neg is not None:
        loss = loss + loss_fn(inv_pos, inv_neg, mask=edge_mask)

    aux = {"pos": pos, "neg": neg, "inv_pos": inv_pos, "inv_neg": inv_neg}
    return loss, aux


def lp_batch_loss_rel(
    model: Model,
    params: Dict[str, Any],
    src: Array,              # (B, d) source embeddings
    dst: Array,              # (B, d)
    rel_ids: Array,          # (B,) true relation ids
    neg_rel_ids: Array,      # (C, N) corrupting relation ids
    edge_mask: Array,
) -> Tuple[Array, Dict[str, Array]]:
    """CORRUPT_REL LP loss (EdgeDecoderMethod::CORRUPT_REL dispatch,
    model.cpp:271-273 — the reference declares the branch but throws
    'currently unsupported' at runtime; here it trains): negatives re-score
    each chunk's positives under sampled relations, both directions when
    inverse relations are on (decoder_methods.cpp:119-146)."""
    decoder = model.decoder
    assert decoder is not None
    pos, neg, inv_pos, inv_neg = decoder.rel_corrupt_forward(
        params["decoder"], src, dst, rel_ids, neg_rel_ids)
    loss_fn = model.loss_fn()
    loss = loss_fn(pos, neg, mask=edge_mask)
    if inv_neg is not None:
        loss = loss + loss_fn(inv_pos, inv_neg, mask=edge_mask)
    aux = {"pos": pos, "neg": neg, "inv_pos": inv_pos, "inv_neg": inv_neg}
    return loss, aux


def nc_batch_loss(model: Model, logits: Array, labels: Array, mask: Array) -> Array:
    """Node-classification CE over seed logits (model.cpp:318-320)."""
    loss = classification_cross_entropy(
        logits, labels, reduction=model.loss_reduction, mask=mask)
    return loss * model.loss_scale if model.loss_scale != 1.0 else loss
