"""64× scale-up probe for the heaviest dedup pipelines (VERDICT r2 §6).

Builds a salt-sharded replication of the sf0.1 ``documents`` table:
factor f produces f disjoint "shards", each a copy of the corpus with a
per-shard salt token injected between every pair of words. The salt
changes every shingle, so shards never near-dup-match each other — match
DENSITY stays natural while corpus size scales by f (the alternative,
verbatim replication, scales true-match count quadratically and measures
match volume, not corpus scale; the r2 BASELINE 8× probe covered that
regime). The 1× baseline applies the same salt transformation (shard 0),
so the per-document work is identical on both sides and the ratio is a
clean f×.

Measured per pipeline and factor:

* wall seconds (cold per-pipeline, shared warm session);
* shuffle write bytes, from the Spark UI REST API stage metrics
  (sum of per-stage shuffleWriteBytes deltas — local[32] UI);
* for connected components: the number of large-star/small-star rounds
  (``round_stats``) with the edge count after each round, with the
  single-task union-find finisher DISABLED (``local_edge_limit=0``) so
  the distributed path's O(log n) convergence is what's measured.

Scratch parquet goes under ``.probe_tmp/`` (gitignored).

Round-6 additions: ``ext_dsir_importance`` joins the documents-sharded
pipeline list, and ``part_triangle_stats`` gets its own probe over a
key-offset replication of lineitem (f disjoint copies of the
co-occurrence graph: ``l_orderkey·f+i, l_partkey·f+i`` — |E| and the
true wedge/triangle volume scale exactly f×, so the wall ratio isolates
the operator's scaling, not match-density drift).

Usage: python scale_probe.py [factor ...] [--only name1,name2]
       (default factors: 1 64)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request
from functools import reduce

UI_PORT = 4055


def shuffle_write_bytes(app_id: str) -> int:
    url = f"http://127.0.0.1:{UI_PORT}/api/v1/applications/{app_id}/stages?status=complete"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception as exc:  # UI off / port taken — report unmeasured
        print(f"probe: shuffle metric unavailable: {exc}", file=sys.stderr)
        return -1


def main() -> None:
    argv = sys.argv[1:]
    only: set | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    factors = [int(a) for a in argv] or [1, 64]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    scratch = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".probe_tmp")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("scale_probe")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    from etl_python_sqlite_spark.functions.text import WS_CLASS
    from etl_python_sqlite_spark.operators import dedup as D
    from etl_python_sqlite_spark.operators.graph import connected_components
    from etl_python_sqlite_spark.plans import ext as E
    from etl_python_sqlite_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")

    def shard_dir(factor: int) -> str:
        """Materialize the salt-sharded corpus once per factor."""
        out = os.path.join(scratch, f"x{factor}")
        path = os.path.join(out, "documents.parquet")
        if not os.path.exists(path):
            shards = [
                docs.select(
                    (F.col("doc_id") * factor + i).alias("doc_id"),
                    F.regexp_replace(
                        "text", f"{WS_CLASS}+", f" s{i} "
                    ).alias("text"),
                    "lang",
                    "source",
                )
                for i in range(factor)
            ]
            reduce(lambda a, b: a.unionAll(b), shards).repartition(
                int(cpus)
            ).write.mode("overwrite").parquet(path)
        return out

    results: dict = {}
    warmed = False
    for factor in factors:
        d = shard_dir(factor)
        n_docs = spark.read.parquet(f"{d}/documents.parquet").count()
        row: dict = {"n_docs": n_docs}

        pipelines = [
            ("minhash_near_dups", E.ext_minhash_near_dups),
            ("minhash_dedup_clusters", E.ext_minhash_dedup_clusters),
            ("contamination_scan", E.ext_contamination_scan),
            # round-3 ops (linear by construction; probed to prove it —
            # ext_substring_contamination is deliberately absent: its
            # snippet set is corpus-derived in the contract query, so a
            # replicated-corpus probe would scale BOTH sides and measure
            # the f² snippet×doc product, not the operator; production
            # decontamination runs against a FIXED benchmark set)
            ("doc_chunking", E.ext_doc_chunking),
            ("cross_source_dedup", E.ext_cross_source_dedup),
            # round-6: the DSIR wall was graded weak at sf0.1 — probe
            # proves the residual is fixed overhead, not a scaling term
            ("dsir_importance", E.ext_dsir_importance),
            # round-7: ExactSubstr-style mining — candidate volume must
            # track true repetition (the salt keeps per-shard repetition
            # natural, so duplicated-gram volume scales exactly f×)
            ("repeated_substring_mine", E.ext_repeated_substring_mine),
            # the APPLY half shares the memoized span stage — its row
            # isolates the cut's own join + string surgery cost
            ("repeated_span_cut", E.ext_repeated_span_cut),
            # round-10: image dedup — replicated doc_ids make distinct
            # md5 payloads, so the image count (and planted-twin count)
            # scales exactly f× while cross-base hash collisions stay
            # band-rare: the honest linear probe for decode+hash+LSH
            ("image_near_dups", E.ext_image_near_dups),
            ("trigram_lm_score", E.ext_trigram_lm_score),
            ("audio_near_dups", E.ext_audio_near_dups),
            ("video_near_dups", E.ext_video_near_dups),
            # r11: the Hamming-banded video variant (per-frame band join
            # instead of exact identity) and the 5-gram LM point —
            # replicated doc_ids keep twin density natural for both
            ("video_noisy_near_dups", E.ext_video_noisy_near_dups),
            ("fivegram_lm_score", E.ext_fivegram_lm_score),
            # r11b: passage dedup — the salt token sits inside every
            # 20-word window, so passages never collide across shards
            # and dup density stays natural; ccnet buckets ride the
            # 5-gram score stage + a per-language rank
            ("passage_dedup", E.ext_passage_dedup),
            ("ccnet_quality_buckets", E.ext_ccnet_quality_buckets),
            # shares the memoized _image_pairs stage with
            # image_near_dups — this row isolates the CC + summary cost
            ("image_dedup_clusters", E.ext_image_dedup_clusters),
            # r10: the one >1.3x-vs-r9 bench mover (corpus-density
            # effect on shingle-set sizes) — probed to show the
            # prefix-filter stack stays sub-linear on THIS corpus
            ("containment_join", E.ext_containment_join),
        ]
        if only is not None:
            pipelines = [(n, f) for n, f in pipelines if n in only]
        if not warmed:
            # whole-stage-codegen compile off the clock (r2 measured it
            # dominating cold minhash cost); warm timings on both sides
            # keep the ratio honest
            for _, fn in pipelines:
                fn(spark, d).write.mode("overwrite").format("noop").save()
            warmed = True

        for name, fn in pipelines:
            sw0 = shuffle_write_bytes(app_id)
            t0 = time.perf_counter()
            fn(spark, d).write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            sw1 = shuffle_write_bytes(app_id)
            row[name] = {
                "wall_sec": round(wall, 2),
                "shuffle_write_mb": round((sw1 - sw0) / 1e6, 1)
                if sw0 >= 0 and sw1 >= 0
                else None,
            }
            print(f"x{factor} {name}: {row[name]}", file=sys.stderr)

        if only is not None and "cc" not in only:
            results[f"x{factor}"] = row
            continue
        # CC round-count: forced distributed star rounds (no union-find
        # finisher), edges from the production xxhash64 LSH path
        pairs = D.minhash_near_dups(
            spark.read.parquet(f"{d}/documents.parquet"), threshold=0.3
        ).select("id_a", "id_b")
        rounds: list = []
        t0 = time.perf_counter()
        comp = connected_components(
            pairs, local_edge_limit=0, round_stats=rounds
        )
        n_comp = comp.select("component").distinct().count()
        row["cc_forced_distributed"] = {
            "wall_sec": round(time.perf_counter() - t0, 2),
            "n_components": n_comp,
            "star_rounds": len(rounds),
            "edges_per_round": [int(n) for _, n in rounds],
        }
        print(f"x{factor} cc: {row['cc_forced_distributed']}", file=sys.stderr)
        results[f"x{factor}"] = row

    # ---- triangle probe: key-offset lineitem replication (r6) --------
    if only is None or "triangle" in only:
        from etl_python_sqlite_spark.plans import relational as R

        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        tri_warm = False
        for factor in factors:
            d = os.path.join(scratch, f"li_x{factor}")
            path = os.path.join(d, "lineitem.parquet")
            if not os.path.exists(path):
                shards = [
                    li.select(
                        (F.col("l_orderkey") * factor + i).alias("l_orderkey"),
                        (F.col("l_partkey") * factor + i).alias("l_partkey"),
                    )
                    for i in range(factor)
                ]
                reduce(lambda a, b: a.unionAll(b), shards).repartition(
                    int(cpus)
                ).write.mode("overwrite").parquet(path)
            if not tri_warm:
                R.part_triangle_stats(spark, d).write.mode(
                    "overwrite"
                ).format("noop").save()
                tri_warm = True
            sw0 = shuffle_write_bytes(app_id)
            t0 = time.perf_counter()
            out = R.part_triangle_stats(spark, d)
            out.write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            sw1 = shuffle_write_bytes(app_id)
            results.setdefault(f"x{factor}", {})["part_triangle_stats"] = {
                "wall_sec": round(wall, 2),
                "shuffle_write_mb": round((sw1 - sw0) / 1e6, 1)
                if sw0 >= 0 and sw1 >= 0
                else None,
            }
            print(
                f"x{factor} part_triangle_stats:"
                f" {results[f'x{factor}']['part_triangle_stats']}",
                file=sys.stderr,
            )

    # ---- semantic-dedup probe: rotated-embedding replication (r7) ----
    # Per-shard CYCLIC DIMENSION ROTATION: within-shard cosines are
    # preserved EXACTLY (a coordinate permutation is orthogonal), while
    # cross-shard pairs decorrelate (a vector vs its rotation ≈ random
    # cosine for generic data) — match density stays natural as volume
    # scales f×, the same design goal as the documents salt.
    sem_pipelines = [
        ("semantic_dedup", "ext_semantic_dedup"),
        # r11: the E14 contamination scan rides the same replicated
        # embeddings — its one-row audit is bounded (vec_id < 150 no
        # matter the factor), so the probe isolates the CLUSTERING +
        # within-cluster pair-search scaling
        ("semantic_contamination", "ext_semantic_contamination"),
        # r11: the map-only cross-modal filter — probed to prove the
        # no-shuffle claim (wall must track the scan, shuffle ~0)
        ("crossmodal_consistency", "ext_crossmodal_consistency"),
    ]
    if only is not None:
        sem_pipelines = [(n, a) for n, a in sem_pipelines if n in only]
    if sem_pipelines:
        emb = load_table(spark, sf_dir, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        sem_warm = False
        for factor in factors:
            d = os.path.join(scratch, f"emb_x{factor}")
            path = os.path.join(d, "embeddings.parquet")
            if not os.path.exists(path):
                shards = [
                    emb.select(
                        (F.col("vec_id") * factor + i).alias("vec_id"),
                        F.expr(
                            f"concat(slice(embedding, {i % dim} + 1,"
                            f" {dim} - {i % dim}),"
                            f" slice(embedding, 1, {i % dim}))"
                        ).alias("embedding"),
                        "label",
                    )
                    for i in range(factor)
                ]
                reduce(lambda a, b: a.unionAll(b), shards).repartition(
                    int(cpus)
                ).write.mode("overwrite").parquet(path)
            if not sem_warm:
                for _, attr in sem_pipelines:
                    getattr(E, attr)(spark, d).write.mode(
                        "overwrite"
                    ).format("noop").save()
                sem_warm = True
            for name, attr in sem_pipelines:
                sw0 = shuffle_write_bytes(app_id)
                t0 = time.perf_counter()
                getattr(E, attr)(spark, d).write.mode("overwrite").format(
                    "noop"
                ).save()
                wall = time.perf_counter() - t0
                sw1 = shuffle_write_bytes(app_id)
                results.setdefault(f"x{factor}", {})[attr] = {
                    "wall_sec": round(wall, 2),
                    "shuffle_write_mb": round((sw1 - sw0) / 1e6, 1)
                    if sw0 >= 0 and sw1 >= 0
                    else None,
                }
                print(
                    f"x{factor} {attr}:"
                    f" {results[f'x{factor}'][attr]}",
                    file=sys.stderr,
                )

    # ---- SCD2 late-rebuild probe: key-offset events replication (r7) --
    # user_id·f+i / event_id·f+i:16× keys, identical per-key history
    # depth — the rebuild's O(touched keys) claim is what's measured.
    if only is None or "scd2_rebuild" in only:
        from etl_python_sqlite_spark.plans import relational as R

        ev = load_table(spark, sf_dir, "events")
        ev_cols = [c for c in ev.columns if c not in ("user_id", "event_id")]
        scd_warm = False
        for factor in factors:
            d = os.path.join(scratch, f"ev_x{factor}")
            path = os.path.join(d, "events.parquet")
            if not os.path.exists(path):
                shards = [
                    ev.select(
                        (F.col("user_id") * factor + i).alias("user_id"),
                        (F.col("event_id") * factor + i).alias("event_id"),
                        *ev_cols,
                    )
                    for i in range(factor)
                ]
                reduce(lambda a, b: a.unionAll(b), shards).repartition(
                    int(cpus)
                ).write.mode("overwrite").parquet(path)
            if not scd_warm:
                R.scd2_rebuild_late_events(spark, d).write.mode(
                    "overwrite"
                ).format("noop").save()
                scd_warm = True
            sw0 = shuffle_write_bytes(app_id)
            t0 = time.perf_counter()
            R.scd2_rebuild_late_events(spark, d).write.mode(
                "overwrite"
            ).format("noop").save()
            wall = time.perf_counter() - t0
            sw1 = shuffle_write_bytes(app_id)
            results.setdefault(f"x{factor}", {})["scd2_rebuild_late_events"] = {
                "wall_sec": round(wall, 2),
                "shuffle_write_mb": round((sw1 - sw0) / 1e6, 1)
                if sw0 >= 0 and sw1 >= 0
                else None,
            }
            print(
                f"x{factor} scd2_rebuild_late_events:"
                f" {results[f'x{factor}']['scd2_rebuild_late_events']}",
                file=sys.stderr,
            )

    # ---- containment-join probe: salt-sharded documents (r8) ---------
    # The contract query bounds its sample at doc_id < 400 (to keep the
    # oracle's quadratic twin cheap); the probe scales the SAMPLE with
    # the factor (doc_id < 400·f over the salt-sharded corpus) so the
    # operator's own growth is measured: per-shard containment pairs
    # replicate f×, cross-shard pairs decorrelate via the salt tokens.
    if only is None or "containment" in only:
        from etl_python_sqlite_spark.operators import dedup as DD

        cont_warm = False
        for factor in factors:
            d = shard_dir(factor)
            sample = (
                spark.read.parquet(f"{d}/documents.parquet")
                .filter(F.col("doc_id") < 400 * factor)
                .select("doc_id", "text")
            )
            if not cont_warm:
                DD.containment_join_prefix(
                    sample, threshold_micro=800_000
                ).write.mode("overwrite").format("noop").save()
                cont_warm = True
            sw0 = shuffle_write_bytes(app_id)
            t0 = time.perf_counter()
            out = DD.containment_join_prefix(sample, threshold_micro=800_000)
            out.write.mode("overwrite").format("noop").save()
            wall = time.perf_counter() - t0
            sw1 = shuffle_write_bytes(app_id)
            results.setdefault(f"x{factor}", {})["ext_containment_join"] = {
                "wall_sec": round(wall, 2),
                "shuffle_write_mb": round((sw1 - sw0) / 1e6, 1)
                if sw0 >= 0 and sw1 >= 0
                else None,
            }
            print(
                f"x{factor} ext_containment_join:"
                f" {results[f'x{factor}']['ext_containment_join']}",
                file=sys.stderr,
            )

    # ---- k-means probe: rotated-embedding replication (r8) -----------
    # Same scratch layout as the semantic-dedup probe. What must hold:
    # per-iteration wall grows ~linearly in n (one window pass over the
    # n·dim flat frame), never super-linearly — the driver-side state is
    # k·dim integers regardless of n.
    if only is None or "kmeans" in only:
        emb = load_table(spark, sf_dir, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        km_warm = False
        for factor in factors:
            d = os.path.join(scratch, f"emb_x{factor}")
            path = os.path.join(d, "embeddings.parquet")
            if not os.path.exists(path):
                shards = [
                    emb.select(
                        (F.col("vec_id") * factor + i).alias("vec_id"),
                        F.expr(
                            f"concat(slice(embedding, {i % dim} + 1,"
                            f" {dim} - {i % dim}),"
                            f" slice(embedding, 1, {i % dim}))"
                        ).alias("embedding"),
                        "label",
                    )
                    for i in range(factor)
                ]
                reduce(lambda a, b: a.unionAll(b), shards).repartition(
                    int(cpus)
                ).write.mode("overwrite").parquet(path)
            if not km_warm:
                E.ext_kmeans_clusters(spark, d).write.mode(
                    "overwrite"
                ).format("noop").save()
                km_warm = True
            sw0 = shuffle_write_bytes(app_id)
            t0 = time.perf_counter()
            E.ext_kmeans_clusters(spark, d).write.mode("overwrite").format(
                "noop"
            ).save()
            wall = time.perf_counter() - t0
            sw1 = shuffle_write_bytes(app_id)
            results.setdefault(f"x{factor}", {})["ext_kmeans_clusters"] = {
                "wall_sec": round(wall, 2),
                "shuffle_write_mb": round((sw1 - sw0) / 1e6, 1)
                if sw0 >= 0 and sw1 >= 0
                else None,
            }
            print(
                f"x{factor} ext_kmeans_clusters:"
                f" {results[f'x{factor}']['ext_kmeans_clusters']}",
                file=sys.stderr,
            )

    # ---- NB quality-classifier probe: salt-sharded documents (r9) ----
    # Training + scoring cost is (bigram pass + B-row bucket table +
    # per-doc weighted sums): must scale ~linearly in corpus size — the
    # bucket table is B rows at ANY factor (the broadcast side), so the
    # only growing stages are the two uniform-key doc-side groupBys.
    if only is None or "nb" in only:
        nb_warm = False
        for factor in factors:
            d = shard_dir(factor)
            if not nb_warm:
                E.ext_quality_classifier(spark, d).write.mode(
                    "overwrite"
                ).format("noop").save()
                nb_warm = True
            sw0 = shuffle_write_bytes(app_id)
            t0 = time.perf_counter()
            E.ext_quality_classifier(spark, d).write.mode(
                "overwrite"
            ).format("noop").save()
            wall = time.perf_counter() - t0
            sw1 = shuffle_write_bytes(app_id)
            results.setdefault(f"x{factor}", {})["ext_quality_classifier"] = {
                "wall_sec": round(wall, 2),
                "shuffle_write_mb": round((sw1 - sw0) / 1e6, 1)
                if sw0 >= 0 and sw1 >= 0
                else None,
            }
            print(
                f"x{factor} ext_quality_classifier:"
                f" {results[f'x{factor}']['ext_quality_classifier']}",
                file=sys.stderr,
            )

    # ---- KMV source-overlap probe: salt-sharded documents (r9) -------
    # Sketch size is k rows per source at ANY corpus size; the growing
    # stage is the distinct (source, word-hash) pass. The per-shard salt
    # token adds ONE distinct word per source per shard — sketch content
    # drifts but volume math is unchanged.
    if only is None or "kmv" in only:
        kmv_warm = False
        for factor in factors:
            d = shard_dir(factor)
            if not kmv_warm:
                E.ext_kmv_source_overlap(spark, d).write.mode(
                    "overwrite"
                ).format("noop").save()
                kmv_warm = True
            sw0 = shuffle_write_bytes(app_id)
            t0 = time.perf_counter()
            E.ext_kmv_source_overlap(spark, d).write.mode(
                "overwrite"
            ).format("noop").save()
            wall = time.perf_counter() - t0
            sw1 = shuffle_write_bytes(app_id)
            results.setdefault(f"x{factor}", {})["ext_kmv_source_overlap"] = {
                "wall_sec": round(wall, 2),
                "shuffle_write_mb": round((sw1 - sw0) / 1e6, 1)
                if sw0 >= 0 and sw1 >= 0
                else None,
            }
            print(
                f"x{factor} ext_kmv_source_overlap:"
                f" {results[f'x{factor}']['ext_kmv_source_overlap']}",
                file=sys.stderr,
            )

    # ---- unigram tokenizer probe: salt-sharded documents (r9) --------
    # Trainer driver work is max_vocab-bounded (corpus-independent);
    # the growing stages are the ONE histogram shuffle and the
    # Arrow-batched Viterbi encoder (linear in docs, distinct-word
    # cache per batch).
    if only is None or "unigram" in only:
        ug_warm = False
        for factor in factors:
            d = shard_dir(factor)
            if not ug_warm:
                E.ext_unigram_tokenizer(spark, d).write.mode(
                    "overwrite"
                ).format("noop").save()
                ug_warm = True
            sw0 = shuffle_write_bytes(app_id)
            t0 = time.perf_counter()
            E.ext_unigram_tokenizer(spark, d).write.mode(
                "overwrite"
            ).format("noop").save()
            wall = time.perf_counter() - t0
            sw1 = shuffle_write_bytes(app_id)
            results.setdefault(f"x{factor}", {})["ext_unigram_tokenizer"] = {
                "wall_sec": round(wall, 2),
                "shuffle_write_mb": round((sw1 - sw0) / 1e6, 1)
                if sw0 >= 0 and sw1 >= 0
                else None,
            }
            print(
                f"x{factor} ext_unigram_tokenizer:"
                f" {results[f'x{factor}']['ext_unigram_tokenizer']}",
                file=sys.stderr,
            )

    # ---- k-means|| probe: rotated-embedding replication (r9) ---------
    # Same scratch layout as the kmeans probe; adds the bounded
    # seeding collect + corpus-wide weight pass before the unchanged
    # single-action Lloyd chain.
    if only is None or "kmeanspar" in only:
        emb2 = load_table(spark, sf_dir, "embeddings")
        dim2 = len(emb2.select("embedding").first()[0])
        kp_warm = False
        for factor in factors:
            d = os.path.join(scratch, f"emb_x{factor}")
            path = os.path.join(d, "embeddings.parquet")
            if not os.path.exists(path):
                shards = [
                    emb2.select(
                        (F.col("vec_id") * factor + i).alias("vec_id"),
                        F.expr(
                            f"concat(slice(embedding, {i % dim2} + 1,"
                            f" {dim2} - {i % dim2}),"
                            f" slice(embedding, 1, {i % dim2}))"
                        ).alias("embedding"),
                        "label",
                    )
                    for i in range(factor)
                ]
                reduce(lambda a, b: a.unionAll(b), shards).repartition(
                    int(cpus)
                ).write.mode("overwrite").parquet(path)
            if not kp_warm:
                E.ext_kmeans_par_seeded(spark, d).write.mode(
                    "overwrite"
                ).format("noop").save()
                kp_warm = True
            sw0 = shuffle_write_bytes(app_id)
            t0 = time.perf_counter()
            E.ext_kmeans_par_seeded(spark, d).write.mode(
                "overwrite"
            ).format("noop").save()
            wall = time.perf_counter() - t0
            sw1 = shuffle_write_bytes(app_id)
            results.setdefault(f"x{factor}", {})["ext_kmeans_par_seeded"] = {
                "wall_sec": round(wall, 2),
                "shuffle_write_mb": round((sw1 - sw0) / 1e6, 1)
                if sw0 >= 0 and sw1 >= 0
                else None,
            }
            print(
                f"x{factor} ext_kmeans_par_seeded:"
                f" {results[f'x{factor}']['ext_kmeans_par_seeded']}",
                file=sys.stderr,
            )

    print(json.dumps(results))
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
