"""Evaluators: compiled whole-split evaluation with on-device filtering.

Parity with the reference evaluation path (evaluator.cpp:22-96 + model.cpp
evaluate_batch :335-359 + reporting.cpp computeRanks :55): filtered MRR scores
every edge against ALL nodes (CorruptNodeNegativeSampler filtered mode,
negative.cpp:321-325) with known true edges pushed to -1e9. The reference's
CPU searchsorted filter becomes an on-device lexicographic binary search over
the full edge set (ops/edge_keys.py) evaluated for the whole (B, num_nodes)
score matrix at once; ranks reduce to streaming sums, so evaluation is one
jitted scan and only ~10 scalars ever reach the host.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from marius_tpu.parallel.mesh import put_arg
from marius_tpu.data.samplers.negative import (
    NegativeSamplingConfig,
    local_filter_mask_dir,
    sample_negatives,
)
from marius_tpu.nn.model import Model
from marius_tpu.ops.edge_keys import (
    build_edge_key_set,
    filter_mask_sampled,
    isin_triples,
)
from marius_tpu.reporting.metrics import compute_ranks, rank_statistics
from marius_tpu.reporting.reporters import LinkPredictionReporter
from marius_tpu.train.trainer import TrainState, pad_edges

Array = jax.Array


def _pow2_ceil(x: int) -> int:
    """Smallest power of two >= x (>= 1)."""
    return 1 << max(0, (x - 1)).bit_length()

HITS_KS = (1, 3, 5, 10, 50, 100)

# max per-edge true-candidate pad width for the fast in-scan rank correction;
# hub-heavy filter sets beyond this fall back to the per-chunk membership test
# ((B, tail_cap) blocks at 1M-tail hubs would be multi-GB)
TAIL_CAP_LIMIT = 32_768

# host-tiled eval pre-stages one (edge_slice, tail_cap) candidate block PER
# EDGE SLICE on device (reused across every node tile); the total footprint
# is E x tail_cap x 5 bytes, which at large eval splits can exceed device
# memory — beyond this budget the per-chunk membership test runs instead
# (slower, memory-bounded)
HOST_EVAL_CAND_BUDGET_BYTES = 2 << 30


class LinkPredictionEvaluator:
    """Filtered (all-node) or unfiltered (sampled) ranking evaluation."""

    def __init__(
        self,
        model: Model,
        num_nodes: int,
        num_relations: int,
        eval_edges: np.ndarray,
        all_edges: Optional[np.ndarray] = None,   # train+valid+test for filtering
        batch_size: int = 1000,
        filtered: bool = True,
        neg_config: Optional[NegativeSamplingConfig] = None,
        seed: int = 7,
        graph=None,                 # DeviceGraph, required for GNN encoders
        nbr_configs=(),             # eval-time NeighborSamplingConfigs
        features=None,              # (N+1, F) device array with sentinel row
        full_graph=None,            # FullGraphAdjacency: exact-ALL one-pass
                                    # all-node encoding (callers gate on all
                                    # eval samplers being ALL)
        fg_ops=None,                # pre-prepared ops (share the const-agg /
                                    # inverse-map work across evaluators)
        node_chunk: Optional[int] = None,  # streamed-scan chunk override
    ):
        self.model = model
        self.num_nodes = num_nodes
        self.num_relations = num_relations
        self.batch_size = batch_size
        self.filtered = filtered
        # EdgeDecoderMethod (options.h:64): CORRUPT_NODE ranks against node
        # corruptions; CORRUPT_REL ranks the true relation against ALL
        # relations (exhaustive — the relation table is small). ONLY_POS is
        # inference-only (alias INFER) and has no rank semantics.
        from marius_tpu.nn.decoders.edge import normalize_decoder_method
        self.decoder_method = (normalize_decoder_method(model.decoder.decoder_method)
                               if model.decoder is not None else "CORRUPT_NODE")
        assert self.decoder_method in ("CORRUPT_NODE", "CORRUPT_REL"), \
            (f"evaluation supports CORRUPT_NODE/CORRUPT_REL; {self.decoder_method} "
             f"is inference-only (marius_predict --save_scores)")
        self.neg_config = neg_config or NegativeSamplingConfig()
        self.seed = seed
        self.graph = graph
        self.nbr_configs = tuple(nbr_configs)
        self.features = features
        self.full_graph = full_graph
        self._fg_ops = fg_ops
        if full_graph is not None and fg_ops is None and self.nbr_configs:
            from marius_tpu.nn.full_graph_encoder import prepare_full_graph
            feats = None if features is None else features[:-1]
            self.full_graph, self._fg_ops = prepare_full_graph(
                full_graph, model.encoder, feats)

        if not filtered:
            assert batch_size % self.neg_config.num_chunks == 0, \
                (f"evaluation batch_size {batch_size} must be divisible by "
                 f"num_chunks {self.neg_config.num_chunks}")
        padded, self.num_edges, self.num_batches = pad_edges(eval_edges, batch_size)
        self.edges = put_arg(padded)
        self.has_rels = padded.shape[1] == 3
        if self.decoder_method == "CORRUPT_REL":
            assert self.has_rels, "CORRUPT_REL needs a 3-column (typed) edge list"

        self.dst_keys = self.src_keys = None
        if filtered:
            assert all_edges is not None, "filtered evaluation needs the full edge set"
            # sortAllEdges analogue (graph_storage.cpp:745): filter against
            # train+valid+test (+extra filter edges) in both directions.
            self.dst_keys = build_edge_key_set(all_edges, corrupt_dst=True)
            self.src_keys = build_edge_key_set(all_edges, corrupt_dst=False)
            # static pad width of per-edge true-candidate lists (the rank
            # correction; 64-multiples bound recompiles across datasets)
            from marius_tpu.ops.edge_keys import max_anchor_tail
            self.dst_tail_cap = -(-max_anchor_tail(all_edges, True) // 64) * 64
            self.src_tail_cap = -(-max_anchor_tail(all_edges, False) // 64) * 64

        # filtered mode streams all-node scoring over fixed node chunks so
        # device memory stays (B, chunk) regardless of graph size (the (B, N)
        # score matrix at 1M nodes would be 4GB/batch). Chunk sizing: per-
        # chunk scan overhead is ~fixed, so large graphs want large chunks
        # (N/8192 scan steps at 86M nodes = 10.5k steps/batch); 32k chunks
        # measured best at >=10M nodes on v5e (bench_eval_scale.py), 8k
        # below that. Overridable via ``node_chunk``.
        if node_chunk is not None:
            self.node_chunk = min(_pow2_ceil(num_nodes), int(node_chunk))
        else:
            self.node_chunk = min(_pow2_ceil(num_nodes),
                                  32_768 if num_nodes >= 4_000_000 else 8_192)

        self._eval_fn = jax.jit(self._build_eval_fn())

    # ------------------------------------------------------------------
    def _streamed_filtered_ranks(self, encoded: Array, adj_anchor: Array,
                                 pos: Array, anchors: Array,
                                 rels: Optional[Array], keys,
                                 tail_cap: int) -> Array:
        """Filtered rank vs ALL nodes = (unfiltered >=-count) minus the
        true-candidate >=-count, plus 1.

        The unfiltered pass is a pure matmul+compare scan over node chunks.
        The correction gathers each edge's TRUE-candidate list — a contiguous
        run of the (anchor, rel, other)-sorted key set found with two binary
        searches per edge — and rescores only those (<= tail_cap per edge).
        The positive itself appears in both counts and cancels. This replaces
        the old per-(edge x node) membership test, whose E x N binary
        searches dominated large-N evaluation (~50x slower at N=50k and
        crashing the TPU runtime beyond ~100k nodes)."""
        from marius_tpu.ops.edge_keys import anchor_ranges
        from marius_tpu.ops.gather1d import take_1d

        decoder = self.model.decoder
        num_nodes = self.num_nodes
        C = self.node_chunk
        num_chunks = -(-num_nodes // C)
        b = pos.shape[0]

        use_tail = tail_cap <= TAIL_CAP_LIMIT
        if use_tail:
            lo, hi = anchor_ranges(keys, anchors, rels)
            rows = lo[:, None] + jnp.arange(tail_cap, dtype=jnp.int32)[None, :]
            tvalid = rows < hi[:, None]
            n_keys = keys.other.shape[0]
            cand = take_1d(keys.other, jnp.minimum(rows, n_keys - 1))  # (B, K)

        def body(counts, start):
            ids = start + jnp.arange(C, dtype=jnp.int32)
            embs = encoded[jnp.minimum(ids, num_nodes - 1)]
            scores = decoder.neg_scores(adj_anchor, embs[None, :, :], num_chunks=1)
            valid = ids < num_nodes
            ge = (scores >= pos[:, None]) & valid[None, :]
            if use_tail:
                # subtract true candidates that fall in THIS chunk, read
                # from the SAME score matrix — exact cancellation (the
                # positive included), no per-(edge x node) membership test
                rel_col = cand - start
                in_chunk = tvalid & (rel_col >= 0) & (rel_col < C)
                g = jnp.take_along_axis(scores, jnp.clip(rel_col, 0, C - 1),
                                        axis=1)
                true_ge = in_chunk & (g >= pos[:, None])
            else:
                # hub-heavy filter set (a (B, tail_cap) candidate block
                # would not fit): per-chunk membership test — slower but
                # memory-bounded
                true_ge = ge & isin_triples(
                    keys, anchors[:, None],
                    None if rels is None else rels[:, None], ids[None, :])
            delta = (jnp.sum(ge, axis=1) - jnp.sum(true_ge, axis=1))
            return counts + delta.astype(jnp.int32), None

        starts = jnp.arange(num_chunks, dtype=jnp.int32) * C
        counts, _ = jax.lax.scan(body, jnp.zeros((b,), jnp.int32), starts)
        return counts + 1

    def _key_args(self):
        """Filter key sets as one jit-argument pytree. Closing over them
        would embed the full sorted edge set as compiled-module constants —
        at freebase86m scale that is gigabytes in the remote compile
        request (the same 413-class failure the trainers fixed in round 4)
        — and captured arrays break donation elsewhere (see
        tests/test_no_jit_captures.py)."""
        return {"dst": self.dst_keys, "src": self.src_keys}

    def _rel_directions(self, encoded: Array, params, edges_b: Array,
                        keys=None):
        """CORRUPT_REL ranking: the true relation vs ALL relations for each
        (src, dst) pair. Filtered mode masks every relation forming a known
        true triple (src, r', dst) — including the positive's own column,
        matching apply_score_filter semantics (negative.cpp:306-311);
        unfiltered masks only the positive's own column (self-corruption)."""
        decoder = self.model.decoder
        src = edges_b[:, 0]
        dst = edges_b[:, -1]
        rel = edges_b[:, 1]
        src_e = encoded[src]
        dst_e = encoded[dst]
        cand = jnp.arange(self.num_relations, dtype=jnp.int32)
        if self.filtered:
            dst_keys = (keys or self._key_args())["dst"]
            mask = isin_triples(dst_keys, src[:, None], cand[None, :],
                                dst[:, None])
        else:
            mask = cand[None, :] == rel[:, None]
        directions = []
        use_inv = decoder.use_inverse_relations
        for inverse in ((False, True) if use_inv else (False,)):
            a_e, o_e = (dst_e, src_e) if inverse else (src_e, dst_e)
            scores = decoder.rel_all_scores(params["decoder"], a_e, o_e,
                                            inverse=inverse)
            pos = jnp.take_along_axis(scores, rel[:, None], axis=1)[:, 0]
            neg = jnp.where(mask, -1e9, scores)
            directions.append((compute_ranks(pos, neg), pos))
        return directions

    def _batch_directions(self, encoded: Array, params, edges_b: Array,
                          idx, keys=None):
        """Per-direction (ranks, pos_scores) for one batch; shared by the
        stats scan and the rank-export scan. ``keys`` carries the filter
        key sets as jit arguments (see _key_args); None falls back to the
        attribute lookup for non-jit callers."""
        if keys is None:
            keys = self._key_args()
        if self.decoder_method == "CORRUPT_REL":
            return self._rel_directions(encoded, params, edges_b, keys)
        decoder = self.model.decoder
        num_nodes = self.num_nodes
        cfg = self.neg_config
        src = edges_b[:, 0]
        dst = edges_b[:, -1]
        rel = edges_b[:, 1] if self.has_rels else None

        src_e = encoded[src]
        dst_e = encoded[dst]

        directions = []
        # corrupt dst: anchor = src
        rels_f = None if rel is None else decoder.select_relations(params["decoder"], rel)
        adj_src = decoder.apply_relation(src_e, rels_f)
        pos = decoder.pos_scores(adj_src, dst_e)
        if self.filtered:
            ranks = self._streamed_filtered_ranks(
                encoded, adj_src, pos, src, rel, keys["dst"],
                self.dst_tail_cap)
            directions.append((ranks, pos))
        else:
            k = jax.random.fold_in(jax.random.key(self.seed), idx)
            # the final batch is zero-padded; cap in-batch (degree-fraction)
            # sampling at the real row count or node 0 gets over-drawn
            valid_rows = jnp.clip(
                self.num_edges - idx * edges_b.shape[0], 1, edges_b.shape[0])
            ns = sample_negatives(
                jax.random.fold_in(k, 0), cfg, edges_b, num_nodes,
                inverse=False, valid_rows=valid_rows)
            neg_e = encoded[ns.ids.reshape(-1)].reshape(
                cfg.num_chunks, cfg.negatives_per_positive, -1)
            neg = decoder.neg_scores(adj_src, neg_e, cfg.num_chunks)
            # local (in-batch) false-negative filter, eval-config parity
            # (dataloader.cpp:39-40 passes the eval local_filter_mode)
            row_mask = jnp.arange(edges_b.shape[0]) < valid_rows
            f = local_filter_mask_dir(cfg, edges_b, row_mask, ns, False)
            if f is not None:
                neg = jnp.where(f, -1e9, neg)
            directions.append((compute_ranks(pos, neg), pos))

        if decoder.use_inverse_relations and rel is not None:
            inv_rels = decoder.select_relations(params["decoder"], rel, inverse=True)
            adj_dst = decoder.apply_relation(dst_e, inv_rels)
            inv_pos = decoder.pos_scores(adj_dst, src_e)
            if self.filtered:
                inv_ranks = self._streamed_filtered_ranks(
                    encoded, adj_dst, inv_pos, dst, rel, keys["src"],
                    self.src_tail_cap)
                directions.append((inv_ranks, inv_pos))
            else:
                k = jax.random.fold_in(jax.random.key(self.seed), idx)
                valid_rows = jnp.clip(
                    self.num_edges - idx * edges_b.shape[0], 1,
                    edges_b.shape[0])
                ns = sample_negatives(
                    jax.random.fold_in(k, 1), cfg, edges_b, num_nodes,
                    inverse=True, valid_rows=valid_rows)
                neg_e = encoded[ns.ids.reshape(-1)].reshape(
                    cfg.num_chunks, cfg.negatives_per_positive, -1)
                inv_neg = decoder.neg_scores(adj_dst, neg_e, cfg.num_chunks)
                row_mask = jnp.arange(edges_b.shape[0]) < valid_rows
                f = local_filter_mask_dir(cfg, edges_b, row_mask, ns, True)
                if f is not None:
                    inv_neg = jnp.where(f, -1e9, inv_neg)
                directions.append((compute_ranks(inv_pos, inv_neg), inv_pos))
        return directions

    def _build_eval_fn(self):
        nb, b = self.num_batches, self.batch_size

        def eval_fn(encoded: Array, params, edges: Array, keys=None):
            def body(stats, xs):
                edges_b, mask_b, idx = xs
                for ranks, _ in self._batch_directions(
                        encoded, params, edges_b, idx, keys):
                    s = rank_statistics(ranks, mask_b, HITS_KS)
                    stats = {k: stats[k] + v for k, v in s.items()}
                return stats, None

            zero = {k: jnp.zeros((), jnp.float32)
                    for k in ["count", "rr_sum", "rank_sum"] + [f"hits{k}_sum" for k in HITS_KS]}
            stats, _ = jax.lax.scan(
                body, zero,
                (edges.reshape(nb, b, edges.shape[1]),
                 (jnp.arange(nb * b) < self.num_edges).reshape(nb, b),
                 jnp.arange(nb)))
            return stats

        return eval_fn

    def _host_fns(self):
        if getattr(self, "_host_fns_cache", None) is not None:
            return self._host_fns_cache
        decoder = self.model.decoder
        num_nodes = self.num_nodes

        @partial(jax.jit, static_argnames=("inverse",))
        def adjust(params, anchor_e, other_e, rel_ids, inverse):
            rels = (None if rel_ids is None else decoder.select_relations(
                params["decoder"], rel_ids, inverse=inverse))
            adj = decoder.apply_relation(anchor_e, rels)
            return adj, decoder.pos_scores(adj, other_e)

        @partial(jax.jit, static_argnames=("use_tail",))
        def tile_counts(adj, pos, tile, tile_start, cand, tvalid, anchors,
                        rels, keys, use_tail=True):
            # filtered >=-counts over one node tile, scanned in 8192-node
            # sub-chunks: the transient score block stays (edge_slice, 8192)
            # — the full (edge_slice, node_tile) matrix at the defaults
            # would be multi-GB, defeating the host-streaming memory bound.
            # True candidates falling inside each sub-chunk are subtracted
            # from the SAME score matrix (exact cancellation; same
            # restructure as _streamed_filtered_ranks).
            sub = min(8192, tile.shape[0])
            n_sub = tile.shape[0] // sub

            def body(counts, ci):
                start_c = ci * sub
                blk = jax.lax.dynamic_slice_in_dim(tile, start_c, sub, 0)
                scores = decoder.neg_scores(adj, blk[None, :, :], num_chunks=1)
                ids = tile_start + start_c + jnp.arange(sub, dtype=jnp.int32)
                valid = ids < num_nodes
                ge = (scores >= pos[:, None]) & valid[None, :]
                if use_tail:
                    rel_col = cand - (tile_start + start_c)
                    in_chunk = tvalid & (rel_col >= 0) & (rel_col < sub)
                    g = jnp.take_along_axis(scores,
                                            jnp.clip(rel_col, 0, sub - 1),
                                            axis=1)
                    true_ge = in_chunk & (g >= pos[:, None])
                else:
                    true_ge = ge & isin_triples(
                        keys, anchors[:, None],
                        None if rels is None else rels[:, None], ids[None, :])
                delta = jnp.sum(ge, axis=1) - jnp.sum(true_ge, axis=1)
                return counts + delta.astype(jnp.int32), None

            counts, _ = jax.lax.scan(
                body, jnp.zeros((adj.shape[0],), jnp.int32),
                jnp.arange(n_sub, dtype=jnp.int32))
            return counts

        @jax.jit
        def slice_ranges(keys, anchors, rels):
            from marius_tpu.ops.edge_keys import anchor_ranges
            return anchor_ranges(keys, anchors, rels)

        self._host_fns_cache = (adjust, tile_counts, slice_ranges)
        return self._host_fns_cache

    def evaluate_from_host_table(self, host_values: "np.ndarray", params,
                                 edge_slice: int = 4096,
                                 node_tile: int = 262_144,
                                 features_host: Optional["np.ndarray"] = None,
                                 ) -> Dict[str, float]:
        """Filtered evaluation when the table does NOT fit in HBM: the raw
        table stays in host RAM, every node tile is encoded through the
        device (with neighborhood sampling for GNN encoders — see
        ``encode_all_nodes_host``), and scoring streams the encoded host
        table back through in (edge_slice x node_tile) blocks — the
        out-of-core twin of the in-HBM streamed scan. Supports ANY encoder.

        Device memory: O(edge_slice * d + node_tile * d + hop_cap * d)
        regardless of num_nodes. Completes the reference's full-graph eval
        for PartitionBuffer-backed tables (graph_storage.cpp:31-51 reads an
        InMemory mirror; here nothing is mirrored).
        """
        assert self.filtered, "host-tiled evaluation is for filtered mode"
        assert self.decoder_method == "CORRUPT_NODE", \
            "host-tiled evaluation streams node corruption; CORRUPT_REL " \
            "ranks relations and never needs host streaming"
        from marius_tpu.train.graph_encoder import encode_all_nodes_host

        decoder = self.model.decoder
        num_nodes = self.num_nodes
        if features_host is None and self.features is not None:
            features_host = np.asarray(self.features)   # (N+1, F) sentinel kept
        host = encode_all_nodes_host(
            self.model, params, host_values, graph=self.graph,
            nbr_configs=self.nbr_configs, features_host=features_host,
            batch_size=self.batch_size)

        edges = np.asarray(self.edges)[:self.num_edges]
        rels_np = edges[:, 1] if self.has_rels else None
        # clamp tiles to the problem size so small graphs don't pay (and
        # possibly OOM on) padding up to the large-graph defaults
        node_tile = min(node_tile, _pow2_ceil(num_nodes))
        edge_slice = min(edge_slice, _pow2_ceil(len(edges)))

        adjust, tile_counts, slice_ranges = self._host_fns()

        directions = []
        src_e = put_arg(host[edges[:, 0]])
        dst_e = put_arg(host[edges[:, -1]])
        rel_j = None if rels_np is None else put_arg(rels_np)
        adj, pos = adjust(params, src_e, dst_e, rel_j, False)
        directions.append((adj, pos, put_arg(edges[:, 0]), self.dst_keys,
                           self.dst_tail_cap))
        if decoder.use_inverse_relations and rels_np is not None:
            adj2, pos2 = adjust(params, dst_e, src_e, rel_j, True)
            directions.append((adj2, pos2, put_arg(edges[:, -1]),
                               self.src_keys, self.src_tail_cap))

        e = len(edges)
        n_slices = -(-e // edge_slice)

        # per-direction edge-slice blocks, pre-padded ONCE (device arrays
        # reused across all node tiles — re-converting per tile would
        # re-transfer the whole E x d anchor block thousands of times)
        dir_state = []
        for adj, pos, anchors, keys, tail_cap in directions:
            adj_np = np.asarray(adj)
            pos_np = np.asarray(pos)
            anchors_np = np.asarray(anchors)
            slices = []
            for s in range(n_slices):
                sl = slice(s * edge_slice, min((s + 1) * edge_slice, e))
                pad = edge_slice - (sl.stop - sl.start)
                slices.append((
                    sl,
                    put_arg(np.pad(adj_np[sl], ((0, pad), (0, 0)))),
                    put_arg(np.pad(pos_np[sl], (0, pad),
                                       constant_values=np.inf)),
                    put_arg(np.pad(anchors_np[sl], (0, pad))),
                    None if rels_np is None else
                    put_arg(np.pad(rels_np[sl.start:sl.stop], (0, pad))),
                ))
            # per-slice true-candidate lists (contiguous runs of the
            # sorted key set; two binary searches per edge); hub-heavy sets
            # AND splits whose total E x tail_cap candidate footprint would
            # blow device memory fall back to the per-chunk membership test
            # (use_tail=False) — the whole point of this path is to stay
            # memory-bounded
            use_tail = (tail_cap <= TAIL_CAP_LIMIT
                        and n_slices * edge_slice * tail_cap * 5
                        * len(directions) <= HOST_EVAL_CAND_BUDGET_BYTES)
            slice_cands = []
            dummy = (put_arg(np.full((edge_slice, 1), -1, np.int32)),
                     put_arg(np.zeros((edge_slice, 1), bool)))
            for sl, a, p, an, r in slices:
                if not use_tail:
                    slice_cands.append(dummy)
                    continue
                lo, hi = slice_ranges(keys, an, r)
                lo_np = np.asarray(lo)
                hi_np = np.asarray(hi)
                rows = lo_np[:, None] + np.arange(tail_cap)
                tvalid = rows < hi_np[:, None]
                n_keys = int(keys.other.shape[0])
                cand = np.asarray(jnp.take(
                    keys.other, jnp.asarray(np.minimum(rows, n_keys - 1))))
                cand = np.where(tvalid, cand, -1)
                slice_cands.append((put_arg(cand.astype(np.int32)),
                                    put_arg(tvalid)))
            dir_state.append((slices, slice_cands, keys, use_tail,
                              np.zeros(e, np.int64)))

        # Node tiles stream OUTERMOST so the encoded host table crosses the
        # link ONCE for all directions (the round-4 layout streamed it per
        # direction — 2x the transfer on typed graphs), and the next tile's
        # host->device put is issued BEFORE this tile's scoring so transfer
        # and compute overlap (async dispatch double-buffering). Optional
        # per-phase accounting (self.last_host_eval_timings) serializes one
        # sync per tile and is off unless profile_host_eval is set.
        profile = bool(getattr(self, "profile_host_eval", False))
        t_transfer = t_compute = 0.0

        def fetch(start):
            block = host[start:start + node_tile]
            if len(block) < node_tile:
                block = np.concatenate(
                    [block, np.zeros((node_tile - len(block),
                                      block.shape[1]), block.dtype)])
            return put_arg(block)

        starts = list(range(0, num_nodes, node_tile))
        tile = fetch(starts[0])
        for i, start in enumerate(starts):
            if profile:
                t0 = time.perf_counter()
                jax.block_until_ready(tile)
                t_transfer += time.perf_counter() - t0
            nxt = fetch(starts[i + 1]) if i + 1 < len(starts) else None
            t0 = time.perf_counter()
            for slices, slice_cands, keys, use_tail, counts in dir_state:
                for (sl, a, p, an, r), (cd, tv) in zip(slices, slice_cands):
                    c = np.asarray(tile_counts(a, p, tile, start, cd, tv,
                                               an, r, keys,
                                               use_tail=use_tail))
                    counts[sl] += c[:sl.stop - sl.start]
            if profile:
                t_compute += time.perf_counter() - t0
            tile = nxt
        if profile:
            self.last_host_eval_timings = {
                "transfer_s": t_transfer, "compute_s": t_compute,
                "table_bytes": int(host.nbytes), "tiles": len(starts)}

        all_ranks = [counts + 1 for _, _, _, _, counts in dir_state]

        reporter = LinkPredictionReporter(HITS_KS)
        stats = {k2: 0.0 for k2 in ["count", "rr_sum", "rank_sum"]
                 + [f"hits{k2}_sum" for k2 in HITS_KS]}
        for ranks in all_ranks:
            r = ranks.astype(np.float64)
            stats["count"] += len(r)
            stats["rr_sum"] += float(np.sum(1.0 / r))
            stats["rank_sum"] += float(np.sum(r))
            for k2 in HITS_KS:
                stats[f"hits{k2}_sum"] += float(np.sum(r <= k2))
        reporter.add_statistics(stats)
        results = reporter.results()
        reporter.report()
        return results

    def _encode(self, state: TrainState) -> Array:
        """All-node encoder outputs for this evaluator's configuration —
        shared by evaluate() and compute_all_ranks() so their encodings can
        never diverge."""
        from marius_tpu.train.graph_encoder import encode_all_nodes
        table_values = state.table.values if state.table is not None else None
        return encode_all_nodes(
            self.model, state.params, table_values, graph=self.graph,
            nbr_configs=self.nbr_configs, features=self.features,
            batch_size=self.batch_size, full_graph=self.full_graph,
            fg_ops=self._fg_ops)

    def compute_all_ranks(self, state: TrainState, encoded: Optional[Array] = None):
        """Per-edge (rank, positive score) for every eval edge and corruption
        direction — the data behind marius_predict's ranks/scores CSV export
        (LinkPredictionReporter::save, reporting.cpp:97-181).

        Returns (ranks, scores): float arrays of shape (num_directions, E).
        """
        if encoded is None:
            encoded = self._encode(state)
        nb, b = self.num_batches, self.batch_size

        @jax.jit
        def ranks_fn(encoded, params, edges, keys=None):
            def body(_, xs):
                edges_b, idx = xs
                outs = self._batch_directions(encoded, params, edges_b, idx,
                                              keys)
                return None, (jnp.stack([o[0] for o in outs]),
                              jnp.stack([o[1] for o in outs]))

            _, (ranks, scores) = jax.lax.scan(
                body, None,
                (edges.reshape(nb, b, edges.shape[1]), jnp.arange(nb)))
            return ranks, scores

        ranks, scores = jax.device_get(
            ranks_fn(encoded, state.params, self.edges, self._key_args()))
        # (nb, D, b) -> (D, nb*b) -> trim padding
        d = ranks.shape[1]
        ranks = np.asarray(ranks).transpose(1, 0, 2).reshape(d, -1)
        scores = np.asarray(scores).transpose(1, 0, 2).reshape(d, -1)
        return ranks[:, :self.num_edges], scores[:, :self.num_edges]

    def compute_pos_scores(self, state: TrainState,
                           encoded: Optional[Array] = None) -> np.ndarray:
        """Positive-edge scores per direction, no corruption — the
        ONLY_POS / INFER decoder method (only_pos_forward,
        decoder_methods.cpp:7-42; EdgeDecoderMethod::ONLY_POS dispatch,
        model.cpp:263-264). Backs marius_predict's score export when the
        config sets ``edge_decoder_method: ONLY_POS``.

        Returns (num_directions, E) float scores."""
        if encoded is None:
            encoded = self._encode(state)

        @jax.jit
        def fn(encoded, params, edges):
            src = encoded[edges[:, 0]]
            dst = encoded[edges[:, -1]]
            rel = edges[:, 1] if self.has_rels else None
            return self.model.decoder.only_pos_forward(
                params["decoder"], src, dst, rel)

        pos, inv_pos = fn(encoded, state.params, self.edges)
        outs = [np.asarray(pos)[:self.num_edges]]
        if inv_pos is not None:
            outs.append(np.asarray(inv_pos)[:self.num_edges])
        return np.stack(outs)

    # ------------------------------------------------------------------
    def evaluate(self, state: TrainState, encoded: Optional[Array] = None) -> Dict[str, float]:
        t0 = time.perf_counter()
        if encoded is None:
            encoded = self._encode(state)
        stats = self._eval_fn(encoded, state.params, self.edges,
                              self._key_args())
        stats = jax.device_get(stats)
        dt = time.perf_counter() - t0
        reporter = LinkPredictionReporter(HITS_KS)
        reporter.add_statistics(stats)
        results = reporter.results()
        results["eval_time_s"] = dt
        reporter.report()
        return results
