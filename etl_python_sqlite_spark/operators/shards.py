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


def write_webdataset_shards(
    df: DataFrame,
    path: str | Path,
    key_col: str,
    members: dict[str, str],
    num_shards: int,
) -> None:
    """WebDataset-style tar shards — the standard packaging for
    multimodal training loaders (one POSIX tar per shard; members named
    ``{key}.{ext}``, consecutive same-key members form one sample;
    format per the public webdataset spec, github.com/webdataset).

    ``members`` maps member EXTENSION → source column (``bytes``
    columns land verbatim, strings UTF-8-encoded); ``key_col`` must be
    unique per row. Shards are range-partitioned and sorted by key:
    keys are globally ordered across shards, and a rewrite of the same
    data READ THE SAME WAY is BYTE-identical (tar metadata pinned:
    mtime 0, uid/gid 0, mode 0644, USTAR) — diffable shards. Caveat,
    stated rather than overclaimed: ``repartitionByRange`` samples its
    bounds per input partition, so a DIFFERENT upstream layout
    (changed file splits / parallelism) can move boundary keys between
    adjacent shards; exact layout-independence would need
    rank-computed cuts (the operators/selection.py machinery).

    Two-phase commit on a non-transactional filesystem (the
    ``avro_py.write_avro_dataset`` pattern): each task streams its tar
    to a temp name carrying THIS JOB's id and the DRIVER renames the
    winning attempts into place — a lost speculative attempt leaves
    only a temp file, which the commit sweep deletes. The sweep is
    scoped to this job's id (avro_py's rule): a CONCURRENT writer's
    in-progress temp files are never touched. Per-row work is plain
    streaming IO; nothing is ever collected.
    """
    import tarfile
    import uuid

    out_dir = Path(path)
    out_dir.mkdir(parents=True, exist_ok=True)
    job_id = uuid.uuid4().hex
    exts = sorted(members)
    cols = [key_col] + [members[e] for e in exts]

    def _write_partition(it):
        import io as _io
        import os

        pid = None
        tmp = None
        tf = None
        n = 0
        for row in it:
            if tf is None:
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
                tmp = str(
                    out_dir
                    / f".shard-{pid:05d}.inprogress-{job_id}-{uuid.uuid4().hex}"
                )
                tf = tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT)
            key = str(row[0])
            for ext, val in zip(exts, row[1:]):
                if val is None:
                    continue
                data = val if isinstance(val, (bytes, bytearray)) else str(
                    val
                ).encode("utf-8")
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.mode = 0o644
                tf.addfile(info, _io.BytesIO(bytes(data)))
                n += 1
        if tf is not None:
            tf.close()
            yield (pid, os.path.basename(tmp), n)

    results = (
        df.select(*cols)
        .repartitionByRange(num_shards, key_col)
        .sortWithinPartitions(key_col)
        .rdd.mapPartitions(_write_partition)
        .collect()  # bounded: one 3-tuple per non-empty shard
    )
    import os

    winners = {}
    for pid, tmpname, _ in results:
        winners[pid] = tmpname  # last winning attempt per partition
    for pid, tmpname in winners.items():
        os.replace(out_dir / tmpname, out_dir / f"shard-{pid:05d}.tar")
    # sweep THIS JOB's lost speculative attempts only — an unscoped
    # glob would unlink a concurrent writer's in-progress files
    for p in out_dir.glob(f".shard-*.inprogress-{job_id}-*"):
        p.unlink(missing_ok=True)
