"""JSONL source (schema-explicit scan, corrupt-line routing, bounded
write) and the range-ordered training-shard writer."""

from __future__ import annotations

import json
from pathlib import Path

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_python_sqlite_spark.operators.shards import write_training_shards
from etl_python_sqlite_spark.sources import jsonl as J


def _write_lines(path: Path, lines: list[str]) -> None:
    path.write_text("\n".join(lines) + "\n")


def test_jsonl_read_good_and_corrupt(spark, tmp_path):
    f = tmp_path / "docs.jsonl"
    good = [
        {"doc_id": i, "text": f"doc {i}", "lang": "en", "source": "web"}
        for i in range(5)
    ]
    lines = [json.dumps(g) for g in good]
    lines.insert(2, '{"doc_id": broken')  # unparseable line
    lines.insert(4, "not json at all")
    _write_lines(f, lines)

    df = J.read_jsonl(spark, f, J.DOCUMENT_SCHEMA)
    ok, rejects = J.split_rejects(df)

    assert ok.count() == 5
    assert {r["doc_id"] for r in ok.collect()} == {0, 1, 2, 3, 4}
    # rejects carry the raw line verbatim (reference reject parity)
    raw = {r["raw_line"] for r in rejects.collect()}
    assert raw == {'{"doc_id": broken', "not json at all"}


def test_jsonl_missing_fields_are_null_not_rejected(spark, tmp_path):
    f = tmp_path / "sparse.jsonl"
    _write_lines(f, ['{"doc_id": 1, "text": "no lang"}'])
    ok, rejects = J.split_rejects(J.read_jsonl(spark, f, J.DOCUMENT_SCHEMA))
    assert rejects.count() == 0
    row = ok.collect()[0]
    assert row["doc_id"] == 1 and row["lang"] is None


def test_jsonl_write_bounds_file_sizes(spark, tmp_path):
    out = tmp_path / "out"
    df = spark.range(250).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text")
    )
    J.write_jsonl(df.coalesce(1), out, max_records_per_file=100)
    files = [p for p in out.glob("part-*") if not p.name.endswith(".crc")]
    assert len(files) == 3  # 100+100+50
    back = spark.read.schema("doc_id long, text string").json(str(out))
    assert back.count() == 250


def test_training_shards_are_range_ordered_and_bounded(spark, tmp_path):
    out = tmp_path / "shards"
    df = spark.range(1000).select(
        F.col("id").alias("seq_id"),
        (F.col("id") % 7).alias("payload"),
    )
    write_training_shards(
        df, out, order_cols=["seq_id"], num_shards=4, max_records_per_file=200
    )
    files = sorted(p for p in out.glob("part-*.parquet"))
    # 4 range partitions of ~250 rows, each split by the 200-record cap
    assert len(files) >= 5
    # global range order: each file's seq_id span must not overlap the next
    spans = []
    for p in files:
        col = pq.read_table(p, columns=["seq_id"])["seq_id"].to_pylist()
        assert col == sorted(col), "rows inside a shard must be sorted"
        assert len(col) <= 200
        spans.append((min(col), max(col), p.name))
    spans.sort()
    for (_, hi, _), (lo, _, _) in zip(spans, spans[1:]):
        assert hi < lo, "shard key ranges must not overlap"
    total = sum(
        pq.ParquetFile(p).metadata.num_rows for p in files
    )
    assert total == 1000


def test_shards_empty_input_writes_valid_dataset(spark, tmp_path):
    out = tmp_path / "empty_shards"
    df = spark.range(0).select(F.col("id").alias("seq_id"))
    write_training_shards(df, out, order_cols=["seq_id"], num_shards=2)
    assert spark.read.parquet(str(out)).count() == 0


def test_jsonl_all_corrupt_file(spark, tmp_path):
    f = tmp_path / "junk.jsonl"
    _write_lines(f, ["not json", "{broken", "[1,2"])
    ok, rejects = J.split_rejects(J.read_jsonl(spark, f, J.DOCUMENT_SCHEMA))
    assert ok.count() == 0
    assert rejects.count() == 3


def test_webdataset_shards_round_trip_and_determinism(spark, tmp_path):
    """WebDataset tar shards: samples group by key with all members,
    keys are range-ordered across shards, bytes round-trip verbatim,
    and a rewrite of identical data is BYTE-identical (pinned tar
    metadata)."""
    import hashlib
    import tarfile

    from etl_python_sqlite_spark.operators.shards import (
        write_webdataset_shards,
    )

    rows = [
        (f"k{i:03d}", bytes([i, 255 - i, 0]), f'{{"i": {i}}}')
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "key string, payload binary, meta string")
    out = tmp_path / "wds"
    write_webdataset_shards(
        df, out, "key", {"bin": "payload", "json": "meta"}, num_shards=3
    )

    shards = sorted(out.glob("shard-*.tar"))
    assert 1 <= len(shards) <= 3
    assert not list(out.glob(".shard-*"))  # temp files swept
    seen = {}
    order = []
    for sh in shards:
        with tarfile.open(sh) as tf:
            names = tf.getnames()
            # members appear key-grouped and key-sorted within a shard
            keys = [n.rsplit(".", 1)[0] for n in names]
            assert keys == sorted(keys)
            order.extend(dict.fromkeys(keys))
            for n in names:
                seen[n] = tf.extractfile(n).read()
    # global range order across shards
    assert order == sorted(order)
    for i in range(20):
        assert seen[f"k{i:03d}.bin"] == bytes([i, 255 - i, 0])
        assert seen[f"k{i:03d}.json"] == f'{{"i": {i}}}'.encode()

    digests1 = [hashlib.md5(p.read_bytes()).hexdigest() for p in shards]
    write_webdataset_shards(
        df, out, "key", {"bin": "payload", "json": "meta"}, num_shards=3
    )
    digests2 = [
        hashlib.md5(p.read_bytes()).hexdigest()
        for p in sorted(out.glob("shard-*.tar"))
    ]
    assert digests1 == digests2


def test_training_shards_seeded_shuffle(spark, tmp_path):
    """shuffle_salt: deterministic across reruns for the same salt,
    decorrelated from key order, independent across salts, and the
    shuffle key never leaks into the output schema."""
    import glob

    df = spark.createDataFrame(
        [(i, f"p{i}") for i in range(500)], "seq_id long, payload string"
    )

    def run(out, salt):
        write_training_shards(
            df, out, order_cols=["seq_id"], num_shards=4,
            shuffle_salt=salt,
        )
        got = spark.read.parquet(out)
        assert set(got.columns) == {"seq_id", "payload"}
        rows = []
        for f in sorted(glob.glob(f"{out}/part-*.parquet")):
            rows += [
                r["seq_id"]
                for r in spark.read.parquet(f"file://{f}").collect()
            ]
        return rows

    a1 = run(str(tmp_path / "a1"), "salt-a")
    a2 = run(str(tmp_path / "a2"), "salt-a")
    b1 = run(str(tmp_path / "b1"), "salt-b")
    assert a1 == a2                      # same salt: byte-stable layout
    assert sorted(a1) == list(range(500))
    assert a1 != b1                      # different salt: new permutation
    assert a1 != sorted(a1)              # decorrelated from key order
    # decorrelation beyond mere inequality: adjacent-key runs are rare
    adjacent = sum(1 for x, y in zip(a1, a1[1:]) if y == x + 1)
    assert adjacent < 25


def test_webdataset_shards_seeded_shuffle(spark, tmp_path):
    import tarfile

    from etl_python_sqlite_spark.operators.shards import (
        write_webdataset_shards,
    )

    df = spark.createDataFrame(
        [(f"k{i:04d}", f"body{i}") for i in range(200)],
        "key string, txt string",
    )

    def member_order(out, salt):
        write_webdataset_shards(
            df, out, key_col="key", members={"txt": "txt"},
            num_shards=3, shuffle_salt=salt,
        )
        names = []
        import pathlib

        for tar in sorted(pathlib.Path(out).glob("shard-*.tar")):
            with tarfile.open(tar) as tf:
                names += [m.name for m in tf.getmembers()]
        return names

    o1 = member_order(str(tmp_path / "w1"), "s")
    o2 = member_order(str(tmp_path / "w2"), "s")
    o3 = member_order(str(tmp_path / "w3"), "t")
    assert o1 == o2
    assert o1 != o3
    assert sorted(o1) == [f"k{i:04d}.txt" for i in range(200)]
    assert o1 != sorted(o1)


def test_webdataset_roundtrip(spark, tmp_path):
    """The WebDataset reader (r11) inverts the writer: keys, member
    bytes and NULL members all survive; one task per shard; member
    extensions discoverable from the first sample."""
    from etl_python_sqlite_spark.operators.shards import (
        write_webdataset_shards,
    )
    from etl_python_sqlite_spark.sources.webdataset import (
        discover_member_extensions,
        read_webdataset,
    )

    rows = [
        (i, f"text body {i}".encode(), None if i % 5 == 0 else f'{{"i":{i}}}')
        for i in range(37)
    ]
    df = spark.createDataFrame(
        rows, "sample_id long, payload binary, meta string"
    )
    out = str(tmp_path / "wds")
    write_webdataset_shards(
        df, out, key_col="sample_id",
        members={"bin": "payload", "json": "meta"}, num_shards=3,
    )
    import glob
    tars = sorted(glob.glob(f"{out}/*.tar"))
    assert len(tars) == 3
    assert discover_member_extensions(tars[0]) == ["bin", "json"]

    back = read_webdataset(spark, out)
    got = {int(r["key"]): r for r in back.collect()}
    assert set(got) == set(range(37))
    for i, payload, meta in rows:
        r = got[i]
        assert bytes(r["bin"]) == payload
        if meta is None:
            assert r["json"] is None  # missing member -> NULL
        else:
            assert bytes(r["json"]).decode() == meta
    # one task per shard: partition count equals tar count
    assert back.rdd.getNumPartitions() == 3
    # explicit member subset: extra extensions ignored
    only_bin = read_webdataset(spark, out, members=["bin"])
    assert only_bin.columns == ["key", "shard", "bin"]
    assert only_bin.count() == 37


def test_webdataset_discovery_sees_sparse_members(spark, tmp_path):
    """A member NULL for every key in shard 0's range must still be
    discovered (the writer skips NULL members; discovery sweeps ALL
    shards' headers, not just the first)."""
    from etl_python_sqlite_spark.operators.shards import (
        write_webdataset_shards,
    )
    from etl_python_sqlite_spark.sources.webdataset import read_webdataset

    rows = [
        (i, f"t{i}".encode(), None if i < 20 else f"m{i}")
        for i in range(37)
    ]
    df = spark.createDataFrame(
        rows, "sample_id long, payload binary, meta string"
    )
    out = str(tmp_path / "wds_sparse")
    write_webdataset_shards(
        df, out, key_col="sample_id",
        members={"bin": "payload", "json": "meta"}, num_shards=3,
    )
    back = read_webdataset(spark, out)  # members discovered
    assert set(back.columns) == {"key", "shard", "bin", "json"}
    got = {int(r["key"]): r for r in back.collect()}
    assert got[0]["json"] is None and bytes(got[36]["json"]) == b"m36"


def test_wds_scratch_sweep_age_floor(tmp_path, monkeypatch):
    """Dead sessions' scratch dirs sweep once past the age floor;
    fresh foreign dirs (a concurrent session) and the current dir
    survive."""
    import os
    import time

    from etl_python_sqlite_spark.plans import ext as E

    old_dir = "/tmp/spark_graft_wds_deadbeef0001"
    fresh_dir = "/tmp/spark_graft_wds_peer00000001"
    keep_dir = "/tmp/spark_graft_wds_current00001"
    for d in (old_dir, fresh_dir, keep_dir):
        os.makedirs(d, exist_ok=True)
    past = time.time() - (E._WDS_ORPHAN_AGE_SEC + 3600)
    os.utime(old_dir, (past, past))
    os.utime(keep_dir, (past, past))  # even an old keep dir survives
    try:
        E._sweep_stale_wds_scratch(keep=keep_dir)
        assert not os.path.exists(old_dir)
        assert os.path.exists(fresh_dir)
        assert os.path.exists(keep_dir)
    finally:
        for d in (old_dir, fresh_dir, keep_dir):
            import shutil
            shutil.rmtree(d, ignore_errors=True)


def test_webdataset_split_read_matches_streaming_read(spark, tmp_path):
    """The r12 member-range split reader (splits_per_shard > 1) must
    return exactly the streaming one-task-per-shard reader's rows —
    same keys, same member bytes, same NULLs — with MORE read tasks,
    and sample contiguity preserved (chunks cut at sample boundaries)."""
    from etl_python_sqlite_spark.operators.shards import (
        write_webdataset_shards,
    )
    from etl_python_sqlite_spark.sources.webdataset import read_webdataset

    rows = [
        (i, f"payload {i}".encode() * (1 + i % 7),
         None if i % 4 == 1 else f'{{"k":{i}}}')
        for i in range(53)
    ]
    df = spark.createDataFrame(
        rows, "sample_id long, payload binary, meta string"
    )
    out = str(tmp_path / "wds_split")
    write_webdataset_shards(
        df, out, key_col="sample_id",
        members={"bin": "payload", "json": "meta"}, num_shards=3,
    )

    def canon(frame):
        return sorted(
            (r["key"], bytes(r["bin"]),
             None if r["json"] is None else bytes(r["json"]))
            for r in frame.collect()
        )

    streaming = read_webdataset(spark, out, members=["bin", "json"])
    split = read_webdataset(
        spark, out, members=["bin", "json"], splits_per_shard=4
    )
    assert canon(split) == canon(streaming)
    # more read tasks than shards (3 shards -> up to 12 chunks)
    assert split.rdd.getNumPartitions() > 3
    # splits larger than the sample count degrade gracefully
    tiny = read_webdataset(
        spark, out, members=["bin", "json"], splits_per_shard=1000
    )
    assert canon(tiny) == canon(streaming)
