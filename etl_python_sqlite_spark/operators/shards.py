"""Training-shard writer: deterministic, size-bounded, globally ordered
output layout for packed training data.

A training job wants shards that are (a) size-bounded so loader workers
balance, (b) globally range-ordered so shard N's content is a stable
function of the data (reshuffling the cluster must not reshuffle the
curriculum), and (c) many-per-executor so stragglers rebalance. That is
``repartitionByRange`` (one range-partitioned shuffle — sampled bounds,
no driver collect) + ``sortWithinPartitions`` (merge-sort inside each
shard, no extra exchange) + ``maxRecordsPerFile`` (splits oversized
partitions at write time without a coalesce barrier).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

from pyspark.sql import DataFrame


def write_training_shards(
    df: DataFrame,
    path: str | Path,
    order_cols: Sequence[str],
    num_shards: int,
    max_records_per_file: int = 1_000_000,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``num_shards`` range-ordered shards at ``path``.

    ``order_cols`` defines the global order (e.g. ``["source",
    "seq_id"]`` from the sequence-packing pass); rows within each shard
    file are sorted by it, and shard i's key range precedes shard
    i+1's. ``num_shards`` sizes the range shuffle — pick
    total_rows / records_per_shard at the caller (a count you usually
    already have from the packing audit; never computed here to keep
    this a single-job write).
    """
    writer = (
        df.repartitionByRange(num_shards, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    writer.format(fmt).save(str(path))
