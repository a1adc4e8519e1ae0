"""Edge decoders for link prediction: DistMult / ComplEx / TransE.

Behavioral parity with the reference's comparator ∘ relation-operator design
(nn/decoders/edge/{comparators,relation_operators,distmult,complex,transe}.cpp
and decoder_methods.cpp), re-expressed functionally:

  * decoder parameters are a pytree {"relations": (R, d)[, "inverse_relations"]},
  * scoring is pure: score(params, src_emb, rel_ids, dst_emb) and chunked
    corrupt-node scoring score_neg(...) that contracts (C, B/C, d) x (C, N, d)ᵀ
    on the MXU (reference: chunked bmm, comparators.cpp:63-77),
  * batch sizes are padded so B % num_chunks == 0 (static shapes; the reference
    pads dynamically in pad_and_reshape, comparators.cpp:7-20).

Scores follow the reference conventions exactly, including TransE ranking on raw
L2 distance (transe.cpp uses L2Compare output directly).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# ---------------------------------------------------------------------------
# Relation operators (relation_operators.cpp:7-46)
# ---------------------------------------------------------------------------


def hadamard(embs: Array, rels: Optional[Array]) -> Array:
    return embs if rels is None else embs * rels


def complex_hadamard(embs: Array, rels: Optional[Array]) -> Array:
    """Complex multiply with [re | im] packed halves (relation_operators.cpp:14-35)."""
    if rels is None:
        return embs
    dim = embs.shape[-1]
    real_len = dim // 2
    re_e, im_e = embs[..., :real_len], embs[..., real_len:]
    re_r, im_r = rels[..., :real_len], rels[..., real_len:]
    return jnp.concatenate([re_e * re_r - im_e * im_r, re_e * im_r + im_e * re_r], axis=-1)


def translation(embs: Array, rels: Optional[Array]) -> Array:
    return embs if rels is None else embs + rels


def no_op(embs: Array, rels: Optional[Array]) -> Array:
    return embs


# ---------------------------------------------------------------------------
# Comparators (comparators.cpp)
# ---------------------------------------------------------------------------


def dot_compare_pos(src: Array, dst: Array) -> Array:
    """(B, d) x (B, d) -> (B,) — DotCompare same-shape branch."""
    return jnp.sum(src * dst, axis=-1)


def dot_compare_neg(src: Array, neg: Array, num_chunks: int) -> Array:
    """Chunked negative scoring: src (B, d) against neg (C, N, d) -> (B, N).

    Edges in chunk c score against that chunk's shared negatives; one batched
    matmul per chunk rides the MXU (comparators.cpp:63-77).
    """
    b, d = src.shape
    c, n, _ = neg.shape
    assert c == num_chunks and b % num_chunks == 0, (src.shape, neg.shape, num_chunks)
    src_c = src.reshape(num_chunks, b // num_chunks, d)
    scores = jax.lax.dot_general(
        src_c, neg,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (C, B/C, N)
    return scores.reshape(b, n)


def l2_compare_pos(src: Array, dst: Array, eps: float = 1e-6) -> Array:
    """torch::pairwise_distance semantics: ||src - dst + eps||_2 (comparators.cpp:28)."""
    diff = src - dst + eps
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1))


def l2_compare_neg(src: Array, neg: Array, num_chunks: int, tol: float = 1e-8) -> Array:
    """Chunked pairwise L2 via x²+y²-2xy (comparators.cpp:30-40)."""
    b, d = src.shape
    c, n, _ = neg.shape
    src_c = src.reshape(num_chunks, b // num_chunks, d)
    x2 = jnp.sum(src_c * src_c, axis=2)[:, :, None]
    y2 = jnp.sum(neg * neg, axis=2)[:, None, :]
    xy = jax.lax.dot_general(
        src_c, neg,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return jnp.sqrt(jnp.maximum(x2 + y2 - 2.0 * xy, tol)).reshape(b, n)


def cosine_compare_pos(src: Array, dst: Array) -> Array:
    """NOTE: reference CosineCompare (comparators.cpp:43-60) computes norms but
    returns the *unnormalized* dot product; we reproduce that behavior."""
    return jnp.sum(src * dst, axis=-1)


def cosine_compare_neg(src: Array, neg: Array, num_chunks: int) -> Array:
    return dot_compare_neg(src, neg, num_chunks)


_COMPARATORS = {
    "DOT": (dot_compare_pos, dot_compare_neg),
    "L2": (l2_compare_pos, l2_compare_neg),
    "COSINE": (cosine_compare_pos, cosine_compare_neg),
}

_RELATION_OPS = {
    "HADAMARD": hadamard,
    "COMPLEX_HADAMARD": complex_hadamard,
    "TRANSLATION": translation,
    "NONE": no_op,
}


# ---------------------------------------------------------------------------
# Edge decoders
# ---------------------------------------------------------------------------

_DECODER_SPECS = {
    # decoder -> (comparator, relation_op, relation init style)
    "DISTMULT": ("DOT", "HADAMARD", "ones"),           # distmult.cpp
    "COMPLEX": ("DOT", "COMPLEX_HADAMARD", "re_ones"),  # complex.cpp
    "TRANSE": ("L2", "TRANSLATION", "zeros"),           # transe.cpp
}


def _lookup_comparator(name: str):
    if name in _COMPARATORS:
        return _COMPARATORS[name]
    from marius_tpu.nn import registry
    custom = registry.comparator(name)
    if custom is None:
        raise ValueError(f"Unknown comparator: {name}")
    return custom


def _lookup_relation_op(name: str):
    if name in _RELATION_OPS:
        return _RELATION_OPS[name]
    from marius_tpu.nn import registry
    custom = registry.relation_op(name)
    if custom is None:
        raise ValueError(f"Unknown relation operator: {name}")
    return custom


def normalize_decoder_method(name: str) -> str:
    """EdgeDecoderMethod parse with the reference's aliases
    (getEdgeDecoderMethod, options.cpp:199-218: TRAIN -> CORRUPT_NODE,
    INFER -> ONLY_POS)."""
    up = str(name).upper()
    return {"TRAIN": "CORRUPT_NODE", "INFER": "ONLY_POS"}.get(up, up)


@dataclasses.dataclass(frozen=True)
class EdgeDecoder:
    """A comparator ∘ relation-operator edge decoder (edge_decoder.cpp:7-21)."""

    decoder_type: str
    num_relations: int
    embedding_dim: int
    use_inverse_relations: bool = True  # DecoderOptions.inverse_edges default (datatypes.py:150)
    # EdgeDecoderMethod (options.h:64; dispatched in forward_lp,
    # model.cpp:252-288): CORRUPT_NODE | CORRUPT_REL | ONLY_POS. The
    # reference's CORRUPT_REL branch throws "currently unsupported" at
    # runtime (model.cpp:271-273); here it trains and evaluates.
    decoder_method: str = "CORRUPT_NODE"

    @property
    def _spec(self):
        dt = self.decoder_type.upper()
        if dt in _DECODER_SPECS:
            return _DECODER_SPECS[dt]
        from marius_tpu.nn import registry
        custom = registry.edge_decoder(dt)
        if custom is None:
            raise ValueError(f"Unknown edge decoder: {self.decoder_type}")
        return custom

    def init_params(self, dtype=jnp.float32) -> Dict[str, Array]:
        _, _, style = self._spec
        shape = (self.num_relations, self.embedding_dim)
        if callable(style):  # registered custom relation init
            base = jnp.asarray(style(shape, dtype))
        elif style == "ones":
            base = jnp.ones(shape, dtype)
        elif style == "zeros":
            base = jnp.zeros(shape, dtype)
        elif style == "re_ones":  # real half 1, imaginary half 0 (complex.cpp reset)
            base = jnp.concatenate(
                [jnp.ones((shape[0], shape[1] // 2), dtype),
                 jnp.zeros((shape[0], shape[1] - shape[1] // 2), dtype)], axis=1)
        else:  # pragma: no cover
            raise AssertionError(style)
        params = {"relations": base}
        if self.use_inverse_relations:
            # distinct buffer: params must be donatable without aliasing
            params["inverse_relations"] = base + jnp.zeros_like(base)
        return params

    # -- scoring ------------------------------------------------------------

    def apply_relation(self, embs: Array, rels: Optional[Array]) -> Array:
        _, rel_op, _ = self._spec
        return _lookup_relation_op(rel_op)(embs, rels)

    def select_relations(self, params, rel_ids: Optional[Array], inverse: bool = False):
        if rel_ids is None:
            return None
        table = params["inverse_relations" if inverse else "relations"]
        return jnp.take(table, rel_ids, axis=0)

    def pos_scores(self, adjusted_src: Array, dst: Array) -> Array:
        pos_fn, _ = _lookup_comparator(self._spec[0])
        return pos_fn(adjusted_src, dst)

    def neg_scores(self, adjusted_src: Array, neg_embs: Array, num_chunks: int) -> Array:
        _, neg_fn = _lookup_comparator(self._spec[0])
        return neg_fn(adjusted_src, neg_embs, num_chunks)

    def node_corrupt_forward(
        self,
        params: Dict[str, Array],
        src: Array,            # (B, d) source node embeddings
        dst: Array,            # (B, d) destination node embeddings
        rel_ids: Optional[Array],   # (B,) or None for untyped graphs
        dst_neg_embs: Array,   # (C, N, d) negatives replacing dst
        src_neg_embs: Optional[Array],  # (C, N, d) negatives replacing src
    ):
        """Corrupt-node scoring for both directions (decoder_methods.cpp:57-117).

        Returns (pos, neg, inv_pos, inv_neg); inv_* are None unless
        use_inverse_relations and src_neg_embs are given.
        """
        num_chunks = dst_neg_embs.shape[0]
        rels = self.select_relations(params, rel_ids)
        adj_src = self.apply_relation(src, rels)
        pos = self.pos_scores(adj_src, dst)
        neg = self.neg_scores(adj_src, dst_neg_embs, num_chunks)

        inv_pos = inv_neg = None
        if self.use_inverse_relations and src_neg_embs is not None:
            inv_rels = self.select_relations(params, rel_ids, inverse=True)
            adj_dst = self.apply_relation(dst, inv_rels)
            inv_pos = self.pos_scores(adj_dst, src)
            inv_neg = self.neg_scores(adj_dst, src_neg_embs, num_chunks)
        return pos, neg, inv_pos, inv_neg

    def rel_corrupt_forward(
        self,
        params: Dict[str, Array],
        src: Array,            # (B, d)
        dst: Array,            # (B, d)
        rel_ids: Array,        # (B,)
        neg_rel_ids: Array,    # (C, N) corrupting relation ids
    ):
        """Corrupt-relation scoring (rel_corrupt_forward,
        decoder_methods.cpp:119-146): positives score (src, r, dst); negatives
        re-score each chunk's positives under sampled relations; the inverse
        direction re-scores (dst, r'⁻¹, src) under the inverse relation table
        when use_inverse_relations (decoder_methods.cpp:137-142).

        Returns (pos (B,), neg (B, N), inv_pos, inv_neg) — inv_* None
        without inverse relations, matching node_corrupt_forward's shape.
        """
        c, n = neg_rel_ids.shape
        b, d = src.shape
        rels = self.select_relations(params, rel_ids)
        pos = self.pos_scores(self.apply_relation(src, rels), dst)
        pos_fn, _ = _lookup_comparator(self._spec[0])

        def corrupt(anchor, other, inverse):
            # (C, N, d) relation embeddings; chunked like node corruption:
            # chunk i's positives pair with chunk i's sampled relations
            neg_rels = self.select_relations(params, neg_rel_ids.reshape(-1),
                                             inverse=inverse)
            neg_rels = None if neg_rels is None else neg_rels.reshape(c, n, d)
            a_c = anchor.reshape(c, b // c, d)
            o_c = other.reshape(c, b // c, d)
            # adjusted (C, per, N, d): relation applied to every (pos, neg-rel)
            adj = self.apply_relation(
                a_c[:, :, None, :],
                None if neg_rels is None else neg_rels[:, None, :, :])
            return pos_fn(adj.reshape(-1, d),
                          jnp.broadcast_to(o_c[:, :, None, :], adj.shape)
                          .reshape(-1, d)).reshape(b, n)

        neg = corrupt(src, dst, inverse=False)
        inv_pos = inv_neg = None
        if self.use_inverse_relations:
            inv_rels = self.select_relations(params, rel_ids, inverse=True)
            inv_pos = self.pos_scores(self.apply_relation(dst, inv_rels), src)
            inv_neg = corrupt(dst, src, inverse=True)
        return pos, neg, inv_pos, inv_neg

    def rel_all_scores(self, params: Dict[str, Array], src: Array, dst: Array,
                       inverse: bool = False):
        """Score every relation for each (src, dst) pair: (B, R) — the
        rel-corrupt evaluation analogue of filtered all-node ranking. Used by
        the evaluator to rank the true relation against ALL relations (the
        relation table is small, so exhaustive beats sampled)."""
        b, d = src.shape
        table = params["inverse_relations" if inverse else "relations"]  # (R, d)
        r = table.shape[0]
        adj = self.apply_relation(src[:, None, :], table[None, :, :])  # (B, R, d)
        pos_fn, _ = _lookup_comparator(self._spec[0])
        return pos_fn(adj.reshape(-1, d),
                      jnp.broadcast_to(dst[:, None, :], adj.shape)
                      .reshape(-1, d)).reshape(b, r)

    def only_pos_forward(self, params, src: Array, dst: Array, rel_ids: Optional[Array]):
        """Positive-edge scoring only (decoder_methods.cpp:7-42)."""
        rels = self.select_relations(params, rel_ids)
        pos = self.pos_scores(self.apply_relation(src, rels), dst)
        inv_pos = None
        if self.use_inverse_relations and rel_ids is not None:
            inv_rels = self.select_relations(params, rel_ids, inverse=True)
            inv_pos = self.pos_scores(self.apply_relation(dst, inv_rels), src)
        return pos, inv_pos


def get_edge_decoder(decoder_type: str, num_relations: int, embedding_dim: int,
                     use_inverse_relations: bool = True) -> EdgeDecoder:
    return EdgeDecoder(decoder_type, num_relations, embedding_dim, use_inverse_relations)
