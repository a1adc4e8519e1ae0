"""Driver-side assembly half of the Spark distributed converter
(marius_tpu/tools/preprocess/spark_stages.py).

The cluster-side half needs a pyspark installation (absent here); these
tests emulate Spark's parquet part-file output with pyarrow and verify the
pure assembly functions produce the exact binary/offsets layout the
ChunkedEdgeListConverter's tested partitioner produces on the same edges.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from marius_tpu.tools.preprocess.spark_stages import (
    DST,
    REL,
    SRC,
    parquet_parts_in_order,
    stream_mapping_to_txt,
    stream_parts_to_binary,
    stream_parts_to_bucketed_binary,
)


def _write_parts(directory, frames, columns):
    """Emulate Spark range-partitioned parquet output: one part file per
    frame, lexicographic part names."""
    os.makedirs(directory, exist_ok=True)
    for i, arr in enumerate(frames):
        t = pa.table({c: arr[:, j] for j, c in enumerate(columns)})
        pq.write_table(t, os.path.join(
            directory, f"part-{i:05d}-deadbeef.parquet"))


def _bucket_sorted_frames(edges, P, part_size, n_parts):
    """Globally bucket-sort edges and slice into contiguous part frames —
    exactly what write_bucket_sorted_parquet yields cluster-side."""
    keys = (edges[:, 0] // part_size) * P + edges[:, -1] // part_size
    order = np.argsort(keys, kind="stable")
    s = edges[order]
    cuts = np.linspace(0, len(s), n_parts + 1).astype(int)
    return [s[cuts[i]:cuts[i + 1]] for i in range(n_parts)]


def test_bucketed_assembly_matches_chunked_partitioner(tmp_path):
    """Binary + offsets from the parquet stream must equal the chunked
    converter's counting-sort partitioner on the same remapped edges
    (same bucket layout; within-bucket order is unspecified)."""
    from marius_tpu.tools.preprocess.partitioner import (
        read_partition_offsets,
    )

    rng = np.random.default_rng(0)
    n, r, e, P = 100, 5, 2000, 4
    edges = np.stack([rng.integers(0, n, e), rng.integers(0, r, e),
                      rng.integers(0, n, e)], 1).astype(np.int32)
    part_size = -(-n // P)

    pq_dir = tmp_path / "parts"
    _write_parts(pq_dir, _bucket_sorted_frames(edges, P, part_size, 7),
                 [SRC, REL, DST])
    out_bin = tmp_path / "train_edges.bin"
    off_txt = tmp_path / "train_partition_offsets.txt"
    cnt, counts = stream_parts_to_bucketed_binary(
        parquet_parts_in_order(str(pq_dir)), str(out_bin), [SRC, REL, DST],
        P, part_size, offsets_path=str(off_txt))
    assert cnt == e

    # reference layout from the tested out-of-core counting sort
    ref_bin = tmp_path / "ref.bin"
    edges.tofile(ref_bin)
    from marius_tpu.tools.preprocess.chunked_converter import (
        ChunkedEdgeListConverter,
    )
    conv = ChunkedEdgeListConverter.__new__(ChunkedEdgeListConverter)
    conv.num_partitions = P
    conv.has_rels = True
    conv.chunk_rows = 333
    conv._partition_file(str(ref_bin), e, n, str(tmp_path), "ref")

    got = np.fromfile(out_bin, np.int32).reshape(e, 3)
    ref = np.fromfile(ref_bin, np.int32).reshape(e, 3)
    ref_counts = read_partition_offsets(
        str(tmp_path / "ref_partition_offsets.txt"))
    np.testing.assert_array_equal(counts, ref_counts)
    # identical bucket SETS at identical offsets
    starts = np.concatenate([[0], np.cumsum(counts)])
    for b in range(P * P):
        g = got[starts[b]:starts[b + 1]]
        f = ref[starts[b]:starts[b + 1]]
        assert sorted(map(tuple, g)) == sorted(map(tuple, f))


def test_bucketed_assembly_rejects_unsorted_parts(tmp_path):
    rng = np.random.default_rng(1)
    edges = np.stack([rng.integers(0, 40, 500), rng.integers(0, 40, 500)],
                     1).astype(np.int32)
    pq_dir = tmp_path / "parts"
    # NOT bucket-sorted
    _write_parts(pq_dir, [edges[:250], edges[250:]], [SRC, DST])
    with pytest.raises(ValueError, match="not bucket-sorted"):
        stream_parts_to_bucketed_binary(
            parquet_parts_in_order(str(pq_dir)), str(tmp_path / "o.bin"),
            [SRC, DST], 4, 10)


def test_plain_stream_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    edges = np.stack([rng.integers(0, 50, 700), rng.integers(0, 3, 700),
                      rng.integers(0, 50, 700)], 1).astype(np.int32)
    pq_dir = tmp_path / "parts"
    _write_parts(pq_dir, [edges[:100], edges[100:400], edges[400:]],
                 [SRC, REL, DST])
    out = tmp_path / "e.bin"
    n = stream_parts_to_binary(parquet_parts_in_order(str(pq_dir)),
                               str(out), [SRC, REL, DST])
    assert n == 700
    np.testing.assert_array_equal(
        np.fromfile(out, np.int32).reshape(700, 3), edges)


def test_mapping_stream(tmp_path):
    labels = np.array(["/m/0abc", "/m/0def", "/m/0ghi"])
    ids = np.array([2, 0, 1], np.int64)
    t = pa.table({"node_label": labels, "node_id": ids})
    pq_dir = tmp_path / "map"
    os.makedirs(pq_dir)
    pq.write_table(t, os.path.join(pq_dir, "part-00000.parquet"))
    out = tmp_path / "node_mapping.txt"
    n = stream_mapping_to_txt(parquet_parts_in_order(str(pq_dir)),
                              str(out), "node_label", "node_id")
    assert n == 3
    assert out.read_text() == "/m/0abc,2\n/m/0def,0\n/m/0ghi,1\n"


def test_spark_converter_requires_pyspark():
    """Without a pyspark install the constructor raises with guidance
    (both modes need a session)."""
    from marius_tpu.tools.preprocess.spark_converter import (
        SparkEdgeListConverter,
    )
    try:
        import pyspark  # noqa: F401
        pytest.skip("pyspark installed; gate not reachable")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="requires pyspark"):
        SparkEdgeListConverter(output_dir="/tmp/x", train_edges="/tmp/y")
