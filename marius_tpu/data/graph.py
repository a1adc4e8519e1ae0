"""Device-resident graph structure (CSR both directions) and host construction.

Equivalent of MariusGraph (data/graph.cpp:16-44): edge lists sorted by src and
by dst with searchsorted offsets. Here the CSR is built once on the host with
numpy and uploaded as jax Arrays; every downstream operation (degree lookup,
neighbor gather, sampling) is a static-shape device gather, so the graph can be
consumed directly inside jit/scan (the reference re-derives offsets per batch
on CPU threads).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceGraph:
    """CSR adjacency in both directions + degrees, all on device.

    Offsets have length num_nodes+2: index with ids clamped to num_nodes for
    padded lookups (degree 0 at the sentinel row).
    """

    out_offsets: Array   # (num_nodes+2,) int32 — CSR over src-sorted edges
    out_cols: Array      # (E,) int32 dst of src-sorted edges
    out_rels: Optional[Array]  # (E,) int32 or None
    in_offsets: Array    # (num_nodes+2,) int32 — CSR over dst-sorted edges
    in_cols: Array       # (E,) int32 src of dst-sorted edges
    in_rels: Optional[Array]
    degrees: Array       # (num_nodes+1,) int32 total (in+out) degree; sentinel 0
    num_nodes: int = dataclasses.field(metadata=dict(static=True))
    num_relations: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_edges(self) -> int:
        return int(self.out_cols.shape[0])


def _csr_from_sorted(anchor_sorted: np.ndarray, num_nodes: int) -> np.ndarray:
    """Offsets (num_nodes+2,) from a sorted anchor column, via searchsorted
    (graph.cpp:26-32 computes offsets the same way)."""
    offsets = np.searchsorted(anchor_sorted, np.arange(num_nodes + 1)).astype(np.int32)
    return np.concatenate([offsets, offsets[-1:]]).astype(np.int32)


def build_device_graph(edges: np.ndarray, num_nodes: int, num_relations: int = 0) -> DeviceGraph:
    """Build both-direction CSR from an (E, 2|3) numpy edge array."""
    e = np.asarray(edges)
    has_rel = e.shape[-1] == 3
    src = e[:, 0].astype(np.int32)
    dst = e[:, -1].astype(np.int32)
    rel = e[:, 1].astype(np.int32) if has_rel else None

    src_order = np.argsort(src, kind="stable")
    dst_order = np.argsort(dst, kind="stable")

    out_offsets = _csr_from_sorted(src[src_order], num_nodes)
    in_offsets = _csr_from_sorted(dst[dst_order], num_nodes)

    deg = np.zeros(num_nodes + 1, np.int32)
    np.add.at(deg, src, 1)
    np.add.at(deg, dst, 1)
    deg[num_nodes] = 0

    return DeviceGraph(
        out_offsets=jnp.asarray(out_offsets),
        out_cols=jnp.asarray(dst[src_order]),
        out_rels=jnp.asarray(rel[src_order]) if has_rel else None,
        in_offsets=jnp.asarray(in_offsets),
        in_cols=jnp.asarray(src[dst_order]),
        in_rels=jnp.asarray(rel[dst_order]) if has_rel else None,
        degrees=jnp.asarray(deg),
        num_nodes=int(num_nodes),
        num_relations=int(num_relations),
    )
