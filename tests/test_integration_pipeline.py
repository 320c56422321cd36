"""End-to-end training-data pipeline integration: curate → pack → shard.

Chains the real operators (curation predicates from the funnel, the
sequence-packing window, the range-ordered shard writer) over the
driver's documents table and asserts the invariants a training job
relies on: every kept doc lands in exactly one shard, shards are
globally range-ordered, and token mass is conserved.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_python_sqlite_spark.functions import text as X
from etl_python_sqlite_spark.operators.shards import write_training_shards
from etl_python_sqlite_spark.sources.parquet import load_table
from tests.conftest import SF_SMOKE


def test_curate_pack_shard_end_to_end(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")

    # curation: the funnel's keep-path predicates (train split only)
    keeper = F.min("doc_id").over(Window.partitionBy(F.sha2(F.col("text"), 256)))
    h = F.pmod(F.col("doc_id") * 2654435761, F.lit(2**32)) % 100
    kept = (
        docs.withColumn("_keeper", keeper)
        .filter(
            (X.langid(F.col("text")) != "und")
            & (F.round(X.quality_score(F.col("text")), 6) >= 0.5)
            & (F.col("doc_id") == F.col("_keeper"))
            & (h < 80)
        )
        .select("doc_id", "source", "text")
    )

    # packing: per-source exclusive-cumsum chunking at 512 tokens
    toks = kept.select(
        "doc_id",
        "source",
        F.size(X.regex_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        toks.withColumn("prev", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .withColumn("seq_id", F.expr("prev div 512"))
        .select("doc_id", "source", "n_tokens", "seq_id")
    )

    out = tmp_path / "train_shards"
    write_training_shards(
        packed, out, order_cols=["source", "seq_id", "doc_id"], num_shards=3
    )

    files = sorted(out.glob("part-*.parquet"))
    assert files, "shards must be written"

    back = spark.read.parquet(str(out))
    n_kept = kept.count()
    assert back.count() == n_kept, "every kept doc in exactly one shard"
    assert back.select("doc_id").distinct().count() == n_kept

    # token mass conserved through the pipeline
    assert (
        back.agg(F.sum("n_tokens")).collect()[0][0]
        == toks.agg(F.sum("n_tokens")).collect()[0][0]
    )

    # global range order across shard files on the (source, seq_id) key
    spans = []
    for p in files:
        t = pq.read_table(p, columns=["source", "seq_id", "doc_id"])
        keys = list(
            zip(t["source"].to_pylist(), t["seq_id"].to_pylist(), t["doc_id"].to_pylist())
        )
        assert keys == sorted(keys), "rows inside a shard must be sorted"
        if keys:
            spans.append((keys[0], keys[-1]))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo, "shard key ranges must not interleave"
