"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one named callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (sf0.01 check).

Column names are aliased identically on both sides (the driver's compare
sorts columns by name before hashing). Floating aggregates are computed
through exact decimal/integer arithmetic on BOTH sides so the value-hash
cannot drift by an ulp (see plans/relational._dsum/_avg_expr and the
cross-engine notes in README.md).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_python_sqlite_spark.functions.portable import (
    PHASH60_SQL,
    UNIVERSAL_HASH_SQL,
    universal_salt_constants,
)
from etl_python_sqlite_spark.functions.text import LANG_CHAR_NGRAMS, LANG_STOPWORDS
from etl_python_sqlite_spark.operators.layout import zvalue_expr
from etl_python_sqlite_spark.operators.stats import OLS_SQL as _OLS_SQL
from etl_python_sqlite_spark.operators.bloom import bloom_probes_sql as _bloom_probes
from etl_python_sqlite_spark.plans import ext as E
from etl_python_sqlite_spark.plans import relational as R


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped pricing summary on sf0.001 lineitem."""
    return R.agg_pricing_summary(spark, "/root/testdata/sf0.001")


# -- SQL fragments reused by the EXT oracles (kept in Python so the Spark
#    expressions and the SQL stay provably in sync) ------------------------

# NOT trim(): trim strips only 0x20 spaces, so trailing tab/newline would
# leave a phantom empty token after the split — mirrors functions.text's
# _ws_strip (tests/test_text_fuzz.py pins Python str.split() parity)
_WS_STRIP = "regexp_replace({c}, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g')"
_WORDS = f"string_split_regex({_WS_STRIP.format(c='{c}')}, '[ \\t\\n\\x0B\\f\\r]+')"
_N_WORDS = (
    f"CASE WHEN length({_WS_STRIP.format(c='{c}')}) = 0 THEN 0 "
    f"ELSE len(string_split_regex({_WS_STRIP.format(c='{c}')}, '[ \\t\\n\\x0B\\f\\r]+')) END"
)
_TOKEN_RE_SQL = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\x0B\\f\\r]"

# distinct 3-word shingles from a word list `w` (truncated whole-doc
# shingle for <3-word docs) — mirrors operators/dedup.exploded_shingles
# Empty-doc guard (ADVICE r8): for len(w)=0 the range(1, greatest(..,1)+1)
# branch would still yield i=1 and array_to_string([]) = '' — one phantom
# empty shingle Spark's exploded_shingles (posexplode of zero words → no
# rows) never emits. CASE returns [] so both engines agree on empty/
# whitespace-only documents, which corpus regeneration can introduce.
_SHINGLES_SQL = (
    "CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[]) "
    "ELSE list_distinct(list_transform("
    "range(1, greatest(len(w) - 2, 1) + 1), "
    "i -> array_to_string(w[i:i+2], ' '))) END"
)

# Portable MinHash+LSH near-dup pipeline (mirrors
# operators/dedup.minhash_near_dups_portable: 64 min-hashes from the
# Carter-Wegman universal family (a_s·h + b_s) mod 2^61−1 over one
# md5-derived hash per shingle — constants embedded as literals from the
# SAME Python source on both sides — 16 bands of 4, ordered-decimal band
# keys, exact-Jaccard verify floor-quantized to micro-units). Ends with
# CTE `mh_verified`.
_SALT_VALUES = ", ".join(
    f"({s}, {a}, {b})" for s, a, b in universal_salt_constants(64)
)
_MINHASH_PIPELINE_SQL = f"""
            base AS (
                SELECT doc_id, {{words}} AS w FROM documents
            ),
            sh AS (
                SELECT doc_id, {_SHINGLES_SQL} AS shingles FROM base
            ),
            srows AS (
                SELECT doc_id, unnest(shingles) AS shingle FROM sh
            ),
            hashed AS (
                SELECT doc_id, {PHASH60_SQL.format(c='shingle')} AS h FROM srows
            ),
            salts AS (
                SELECT * FROM (VALUES {_SALT_VALUES}) AS v(s, a, b)
            ),
            mins AS (
                SELECT doc_id, s,
                       MIN({UNIVERSAL_HASH_SQL.format(h='h', a='a', b='b')}) AS mh
                FROM hashed CROSS JOIN salts GROUP BY doc_id, s
            ),
            bands AS (
                SELECT doc_id, CAST(s // 4 AS INT) AS band,
                       string_agg(CAST(mh AS VARCHAR), ',' ORDER BY s) AS band_key
                FROM mins GROUP BY doc_id, CAST(s // 4 AS INT)
            ),
            cands AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.band_key = b.band_key
                 AND a.doc_id < b.doc_id
            ),
            mh_verified AS (
                SELECT id_a, id_b,
                       (1000000 * len(list_intersect(sa.shingles, sb.shingles)))
                       // (len(sa.shingles) + len(sb.shingles)
                           - len(list_intersect(sa.shingles, sb.shingles)))
                       AS jaccard_micro
                FROM cands
                JOIN sh sa ON sa.doc_id = cands.id_a
                JOIN sh sb ON sb.doc_id = cands.id_b
            )
"""

# Portable 60-bit SimHash (mirrors operators/dedup.simhash_portable).
# Ends with CTE `sim` = (doc_id, simhash).
_SIMHASH_PIPELINE_SQL = f"""
            toks AS (
                SELECT doc_id, unnest({{words}}) AS tok FROM documents
            ),
            hashed AS (
                SELECT doc_id, {PHASH60_SQL.format(c='tok')} AS h FROM toks
            ),
            bits AS (
                SELECT doc_id, h, unnest(range(60)) AS s FROM hashed
            ),
            bsums AS (
                SELECT doc_id, s,
                       SUM(CASE WHEN (h >> CAST(s AS INT)) & 1 = 1
                                THEN 1 ELSE -1 END) AS bsum
                FROM bits GROUP BY doc_id, s
            ),
            sim AS (
                SELECT doc_id,
                       CAST(SUM(CASE WHEN bsum > 0
                                     THEN CAST(1 AS BIGINT) << CAST(s AS INT)
                                     ELSE CAST(0 AS BIGINT) END) AS BIGINT)
                       AS simhash
                FROM bsums GROUP BY doc_id
            )
"""


def _langid_sql(text: str = "text") -> str:
    """CASE cascade mirroring functions.text.langid (alphabetical
    tie-break, 'und' when no stopword fires)."""
    langs = sorted(LANG_STOPWORDS)
    scores = {}
    for lang in langs:
        in_list = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        scores[lang] = (
            f"len(list_filter(string_split_regex(regexp_replace(lower({text}), '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+'), "
            f"w -> w IN ({in_list})))"
        )
    best = "greatest(" + ", ".join(scores[lang] for lang in langs) + ")"
    whens = " ".join(
        f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in langs
    )
    return f"CASE WHEN {best} = 0 THEN 'und' {whens} END"


def _langid_char_sql(text: str = "text") -> str:
    """CASE cascade mirroring functions.text.langid_char_ngrams (substring
    counts via the portable len-replace formula, left-assoc double sums)."""
    langs = sorted(LANG_CHAR_NGRAMS)
    scores = {}
    for lang in langs:
        terms = [
            f"(length(lower({text})) - length(replace(lower({text}), '{g}', ''))) / {len(g)}"
            for g in LANG_CHAR_NGRAMS[lang]
        ]
        scores[lang] = "(CAST(0 AS DOUBLE) + " + " + ".join(terms) + ")"
    best = "greatest(" + ", ".join(scores[lang] for lang in langs) + ")"
    whens = " ".join(f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in langs)
    return f"CASE WHEN {best} = 0 THEN 'und' {whens} END"


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:

    # ORDERING CONTRACT: the driver records at most 50 CORRECTNESS rows,
    # taken from the head of this dict. Round-11 rotation (VERDICT r10
    # item 1): the 15 keys last attested ROUND 7 lead, then the queries
    # NEW in r11 (never attested), then the block last attested ROUND 8
    # fills the window -- whatever of it does not fit the 50-row window
    # stays @r8 and MUST lead the r12 rotation (see the marker comment
    # inside the r8 block). The r9- and r10-attested blocks close the
    # dict in recency order.
    return {
        # -- last attested ROUND 7 (15 keys) -- lead the r11 window --
        "ext_bigram_lm_score": E.ext_bigram_lm_score,
        "ext_dsir_importance": E.ext_dsir_importance,
        "ext_leakage_free_split": E.ext_leakage_free_split,
        "scd2_event_intervals": R.scd2_event_intervals,
        "incremental_rollup_merge": R.incremental_rollup_merge,
        "part_basket_pairs": R.part_basket_pairs,
        "scd1_latest_state": R.scd1_latest_state,
        "ext_bm25_topk": E.ext_bm25_topk,
        "ext_pq_topk": E.ext_pq_topk,
        "dq_expectations_orders": R.dq_expectations_orders,
        "regression_price_trend": R.regression_price_trend,
        "ext_bloom_prefilter": E.ext_bloom_prefilter,
        "part_cooccurrence_pagerank": R.part_cooccurrence_pagerank,
        "ext_langid_char_ngrams": E.ext_langid_char_ngrams,
        "ext_ann_knn_join": E.ext_ann_knn_join,
        # -- NEW in round 11 (never driver-attested) --
        "ext_video_noisy_near_dups": E.ext_video_noisy_near_dups,
        "ext_crossmodal_consistency": E.ext_crossmodal_consistency,
        "ext_fivegram_lm_score": E.ext_fivegram_lm_score,
        "ext_video_dedup_clusters": E.ext_video_dedup_clusters,
        "ext_audio_dedup_clusters": E.ext_audio_dedup_clusters,
        "ext_webdataset_roundtrip": E.ext_webdataset_roundtrip,
        "ext_passage_dedup": E.ext_passage_dedup,
        "ext_ccnet_quality_buckets": E.ext_ccnet_quality_buckets,
        "ext_orc_roundtrip": E.ext_orc_roundtrip,
        "ext_classifier_calibration": E.ext_classifier_calibration,
        "ext_corpus_snapshot_diff": E.ext_corpus_snapshot_diff,
        "ext_hard_negative_mining": E.ext_hard_negative_mining,
        # -- last attested ROUND 8 (fills the rest of the r11 window:
        # positions 28-50 = the 23 keys through case_cascade_classify;
        # the tail past the 50-row window stays @r8 and MUST lead the
        # r12 rotation -- see the boundary marker at position 51) --
        "ext_kmeans_clusters": E.ext_kmeans_clusters,
        "ewma_revenue_smoothing": R.ewma_revenue_smoothing,
        "ext_containment_join": E.ext_containment_join,
        "ext_kmeans_label_purity": E.ext_kmeans_label_purity,
        "ext_multimodal_decode": E.ext_multimodal_decode,
        "part_triangle_stats": R.part_triangle_stats,
        "ext_cms_word_counts": E.ext_cms_word_counts,
        "ext_vocab_edit_pairs": E.ext_vocab_edit_pairs,
        "scd2_apply_changes_events": R.scd2_apply_changes_events,
        "ext_embedding_dim_stats": E.ext_embedding_dim_stats,
        "ext_dedup_survivor_quality": E.ext_dedup_survivor_quality,
        "ext_source_ngram_novelty": E.ext_source_ngram_novelty,
        "fact_dim_join": R.fact_dim_join,
        "join_filter_by_key": R.join_filter_by_key,
        "groupby_count_avg": R.groupby_count_avg,
        "filter_projection": R.filter_projection,
        "distinct_dim": R.distinct_dim,
        "anti_join_new_rows": R.anti_join_new_rows,
        "semi_join_existing": R.semi_join_existing,
        "agg_pricing_summary": R.agg_pricing_summary,
        "agg_minmax_distinct": R.agg_minmax_distinct,
        "topk_per_group": R.topk_per_group,
        "case_cascade_classify": R.case_cascade_classify,
        # -- r11 window boundary: the 27 keys from here
        # (strict_cast_json) through skew_salted_agg are positions
        # 51-77 -- they slip out of the 50-row r11 window (last
        # attested r8) and MUST lead the r12 rotation --
        "strict_cast_json": R.strict_cast_json,
        "normalize_names": R.normalize_names,
        "hourly_event_rollup": R.hourly_event_rollup,
        "set_except_users": R.set_except_users,
        "rollup_region_nation": R.rollup_region_nation,
        "inline_cascade_annotated": R.inline_cascade_annotated,
        "cube_status_priority": R.cube_status_priority,
        "string_funcs": R.string_funcs,
        "date_parts_agg": R.date_parts_agg,
        "sql_exists_subquery": R.sql_exists_subquery,
        "percentiles_by_group": R.percentiles_by_group,
        "pivot_event_types": R.pivot_event_types,
        "union_all_tagged": R.union_all_tagged,
        "having_filter": R.having_filter,
        "sessionize_events": R.sessionize_events,
        "top_orders_limit": R.top_orders_limit,
        "null_handling_outer_join": R.null_handling_outer_join,
        "ext_exact_dedup": E.ext_exact_dedup,
        "ext_normalized_dedup": E.ext_normalized_dedup,
        "ext_ngram_jaccard_pairs": E.ext_ngram_jaccard_pairs,
        "ext_cosine_topk": E.ext_cosine_topk,
        "ext_cosine_pairs_sample": E.ext_cosine_pairs_sample,
        "ext_text_stats": E.ext_text_stats,
        "ext_langid": E.ext_langid,
        "ext_quality_scores": E.ext_quality_scores,
        "ext_token_count_by_source": E.ext_token_count_by_source,
        "skew_salted_agg": R.skew_salted_agg,
        # -- attested r9 --
        "asof_purchase_click": R.asof_purchase_click,
        "range_join_errors": R.range_join_errors,
        "ext_pii_scan": E.ext_pii_scan,
        "ext_stratified_split": E.ext_stratified_split,
        "multires_rollup": R.multires_rollup,
        "ext_kmeans_par_seeded": E.ext_kmeans_par_seeded,
        "ext_unigram_tokenizer": E.ext_unigram_tokenizer,
        "ext_quality_classifier": E.ext_quality_classifier,
        "ext_kmv_source_overlap": E.ext_kmv_source_overlap,
        "scd2_rebuild_late_events": R.scd2_rebuild_late_events,
        "ext_unicode_normalize": E.ext_unicode_normalize,
        "ext_curation_funnel": E.ext_curation_funnel,
        "ext_sketch_distinct_rollup": E.ext_sketch_distinct_rollup,
        "ext_dedup_clusters": E.ext_dedup_clusters,
        "ext_minhash_dedup_clusters": E.ext_minhash_dedup_clusters,
        "ext_repetition_filter": E.ext_repetition_filter,
        "ext_contamination_scan": E.ext_contamination_scan,
        "ext_tfidf_top_terms": E.ext_tfidf_top_terms,
        "supplier_profit_by_nation": R.supplier_profit_by_nation,
        "window_moving_avg": R.window_moving_avg,
        "lag_gap_analysis": R.lag_gap_analysis,
        "string_agg_nations": R.string_agg_nations,
        "grouping_sets_status_year": R.grouping_sets_status_year,
        "ext_seq_packing": E.ext_seq_packing,
        "ext_domain_mixture": E.ext_domain_mixture,
        "ext_word_df_histogram": E.ext_word_df_histogram,
        "ext_incremental_dedup": E.ext_incremental_dedup,
        "ext_quality_sample": E.ext_quality_sample,
        "range_interval_window": R.range_interval_window,
        "unpivot_nation_metrics": R.unpivot_nation_metrics,
        "ntile_value_quartiles": R.ntile_value_quartiles,
        "ship_delay_histogram": R.ship_delay_histogram,
        "orders_above_customer_avg": R.orders_above_customer_avg,
        "ext_pii_redact": E.ext_pii_redact,
        "numeric_profile": R.numeric_profile,
        "dq_referential_audit": R.dq_referential_audit,
        "shipping_priority_topn": R.shipping_priority_topn,
        "local_supplier_volume": R.local_supplier_volume,
        "returned_items_by_customer": R.returned_items_by_customer,
        "rank_tie_semantics": R.rank_tie_semantics,
        "ext_word_rarity_score": E.ext_word_rarity_score,
        "ext_label_centroid_quality": E.ext_label_centroid_quality,
        "set_intersect_users": R.set_intersect_users,
        "window_value_zoo": R.window_value_zoo,
        "event_funnel_conversion": R.event_funnel_conversion,
        "cohort_weekly_retention": R.cohort_weekly_retention,
        "skew_salted_join": R.skew_salted_join,
        "recursive_month_spine": R.recursive_month_spine,
        "ext_minhash_near_dups": E.ext_minhash_near_dups,
        "ext_simhash_fingerprints": E.ext_simhash_fingerprints,
        # -- attested r10 (most recent, tail) --
        "ext_simhash_near_dups": E.ext_simhash_near_dups,
        "ext_winnowing_pairs": E.ext_winnowing_pairs,
        "ext_ann_topk_lsh": E.ext_ann_topk_lsh,
        "ext_ivf_topk": E.ext_ivf_topk,
        "ext_embedding_near_dups": E.ext_embedding_near_dups,
        "ext_heavy_hitters": E.ext_heavy_hitters,
        "ext_kll_quantiles": E.ext_kll_quantiles,
        "promo_revenue_ratio": R.promo_revenue_ratio,
        "nation_market_share": R.nation_market_share,
        "ext_image_near_dups": E.ext_image_near_dups,
        "ext_trigram_lm_score": E.ext_trigram_lm_score,
        "ext_semantic_contamination": E.ext_semantic_contamination,
        "ext_image_dedup_clusters": E.ext_image_dedup_clusters,
        "ext_audio_near_dups": E.ext_audio_near_dups,
        "ext_video_near_dups": E.ext_video_near_dups,
        "ext_repeated_substring_mine": E.ext_repeated_substring_mine,
        "ext_repeated_span_cut": E.ext_repeated_span_cut,
        "large_volume_customers": R.large_volume_customers,
        "disjunctive_revenue": R.disjunctive_revenue,
        "idle_customer_balance": R.idle_customer_balance,
        "ext_doc_chunking": E.ext_doc_chunking,
        "ext_substring_contamination": E.ext_substring_contamination,
        "cheapest_supplier_per_part": R.cheapest_supplier_per_part,
        "supplier_variety_by_brand": R.supplier_variety_by_brand,
        "daily_volume_anomaly": R.daily_volume_anomaly,
        "ext_cross_source_dedup": E.ext_cross_source_dedup,
        "priority_order_counts": R.priority_order_counts,
        "shipmode_priority_split": R.shipmode_priority_split,
        "top_supplier_revenue": R.top_supplier_revenue,
        "ext_chunk_dedup": E.ext_chunk_dedup,
        "ext_dataset_card": E.ext_dataset_card,
        "ext_embedding_quantization": E.ext_embedding_quantization,
        "ext_setsim_prefix_join": E.ext_setsim_prefix_join,
        "ext_semantic_dedup": E.ext_semantic_dedup,
        "ts_gap_fill_interpolate": R.ts_gap_fill_interpolate,
        "robust_price_stats": R.robust_price_stats,
        "snapshot_diff_orders": R.snapshot_diff_orders,
        "forecast_revenue_change": R.forecast_revenue_change,
        "volume_shipping_bilateral": R.volume_shipping_bilateral,
        "important_stock_parts": R.important_stock_parts,
        "customer_order_distribution": R.customer_order_distribution,
        "small_quantity_order_revenue": R.small_quantity_order_revenue,
        "supplier_part_promotion": R.supplier_part_promotion,
        "sole_failing_supplier": R.sole_failing_supplier,
        "json_props_rollup": R.json_props_rollup,
        "zorder_orders_layout": R.zorder_orders_layout,
        "ext_bpe_tokenizer": E.ext_bpe_tokenizer,
        "ext_embedding_pooling": E.ext_embedding_pooling,
        "impute_group_median": R.impute_group_median,
        "mad_outlier_scan": R.mad_outlier_scan,
    }


def _pagerank_sql(iters: int = 5, total_mass: int = 10**12) -> str:
    """Unrolled-CTE DuckDB twin of operators/graph.pagerank over the
    part co-occurrence graph (see part_cooccurrence_pagerank). One CTE
    per iteration — fixed iteration count needs no recursion, and every
    quantity is a positive BIGINT so `//` replays Spark's `div`."""
    ctes = [
        "op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk"
        " FROM lineitem)",
        "e AS (SELECT DISTINCT a.pk AS u, b.pk AS v FROM op a"
        " JOIN op b ON a.ok = b.ok AND a.pk <> b.pk)",
        # both orientations exist, so the node set is exactly the u-set
        "nodes AS (SELECT DISTINCT u AS node FROM e)",
        "od AS (SELECT u, COUNT(*) AS d FROM e GROUP BY u)",
        f"k AS (SELECT {total_mass} // COUNT(*) AS r0,"
        f" (15 * ({total_mass} // COUNT(*))) // 100 AS base FROM nodes)",
        "rr0 AS (SELECT node, (SELECT r0 FROM k) AS r FROM nodes)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"rr{t} AS (SELECT n.node,"
            " (SELECT base FROM k) + COALESCE(s.c, 0) AS r"
            " FROM nodes n LEFT JOIN ("
            "SELECT e.v AS node,"
            " CAST(SUM((85 * r.r) // (100 * od.d)) AS BIGINT) AS c"
            f" FROM e JOIN rr{t - 1} r ON e.u = r.node"
            " JOIN od ON e.u = od.u"
            " GROUP BY e.v) s ON n.node = s.node)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node AS part, CAST(r AS BIGINT) AS pr_units"
        f" FROM rr{iters} ORDER BY r DESC, node LIMIT 25"
    )


def _km_dist_cte(name: str, cents: str) -> str:
    """One Lloyd assignment CTE: per vid, the (cid, dist) of the nearest
    centroid in `cents`; ties to the lowest cid via the (dist, cid)
    row_number order — the exact rule the Spark operator uses."""
    return (
        f"{name} AS (SELECT vid, cid, dist FROM ("
        "SELECT f.vid, c.cid, SUM((f.q - c.c) * (f.q - c.c)) AS dist,"
        " row_number() OVER (PARTITION BY f.vid"
        " ORDER BY SUM((f.q - c.c) * (f.q - c.c)), c.cid) AS rn"
        f" FROM flat f JOIN {cents} c USING (d)"
        " GROUP BY f.vid, c.cid) WHERE rn = 1)"
    )


def _km_upd_cte(name: str, assign: str) -> str:
    """Centroid update CTE: floor-division means (all quantities
    non-negative, so `//` replays Spark's `div`)."""
    return (
        f"{name} AS (SELECT a.cid, f.d, SUM(f.q) // COUNT(*) AS c"
        f" FROM flat f JOIN {assign} a USING (vid)"
        " GROUP BY a.cid, f.d)"
    )


def _kmeans_chain_ctes(k: int, iters: int):
    """The unrolled Lloyd CTE chain shared by the summary and purity
    twins; returns (cte_list, final_assignment_name, last_update_name)."""
    ctes = [
        "flat AS (SELECT vec_id AS vid,"
        " unnest(generate_series(1, len(embedding))) - 1 AS d,"
        " CAST(floor((CAST(unnest(embedding) AS DOUBLE) + 1.0) * 1000000)"
        " AS BIGINT) AS q FROM embeddings)",
        "sr AS (SELECT vid, rn - 1 AS cid FROM ("
        "SELECT vec_id AS vid, row_number() OVER (ORDER BY "
        + PHASH60_SQL.format(c="CAST(vec_id AS VARCHAR)")
        + f", vec_id) AS rn FROM embeddings) WHERE rn <= {k})",
        "c0 AS (SELECT sr.cid, f.d, f.q AS c FROM flat f"
        " JOIN sr USING (vid))",
    ]
    prev = "c0"
    for t in range(1, iters + 1):
        ctes.append(_km_dist_cte(f"a{t}", prev))
        ctes.append(_km_upd_cte(f"u{t}", f"a{t}"))
        prev = f"u{t}"
    ctes.append(_km_dist_cte(f"a{iters + 1}", prev))
    return ctes, f"a{iters + 1}", f"u{iters}"


def _kmeans_sql(k: int = 8, iters: int = 2) -> str:
    """Unrolled-CTE DuckDB twin of operators/clustering.kmeans_lloyd:
    replays the ENTIRE algorithm from the parquet — phash60 seed ranks,
    per-iteration argmin assignment (lowest-cid tie break via the
    (dist, cid) row_number order), floor-division centroid update (all
    quantities non-negative, so `//` replays Spark's `div`), and the
    final per-cluster (size, inertia, centroid-L1) summary. Fixed
    iteration count → no recursion, pure integer arithmetic → exact
    value-hash match."""
    ctes, final_a, last_u = _kmeans_chain_ctes(k, iters)
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT a.cid AS cluster,"
        " COUNT(*) AS n_vecs, CAST(SUM(a.dist) AS BIGINT) AS inertia,"
        " MAX(cs.s) AS centroid_l1"
        f" FROM {final_a} a JOIN (SELECT cid,"
        f" CAST(SUM(c) AS BIGINT) AS s FROM {last_u} GROUP BY cid) cs"
        " USING (cid) GROUP BY a.cid ORDER BY cluster"
    )


def _kmeans_purity_sql(k: int = 8, iters: int = 2) -> str:
    """Twin of ext_kmeans_label_purity: the same full Lloyd replay, then
    the label join + majority pick (count desc, label asc — lowest label
    wins ties) and the integer purity ratio."""
    ctes, final_a, _ = _kmeans_chain_ctes(k, iters)
    ctes.append(
        f"lab AS (SELECT a.cid, CAST(e.label AS BIGINT) AS label,"
        f" CAST(COUNT(*) AS BIGINT) AS c FROM {final_a} a"
        " JOIN embeddings e ON e.vec_id = a.vid GROUP BY a.cid, e.label)"
    )
    ctes.append(
        "tot AS (SELECT cid, CAST(SUM(c) AS BIGINT) AS n_vecs"
        " FROM lab GROUP BY cid)"
    )
    ctes.append(
        "best AS (SELECT cid, label, c FROM ("
        "SELECT cid, label, c, row_number() OVER (PARTITION BY cid"
        " ORDER BY c DESC, label) AS rn FROM lab) WHERE rn = 1)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\nSELECT b.cid AS cluster,"
        " t.n_vecs, b.label AS top_label, b.c AS top_count,"
        " (1000000 * b.c) // t.n_vecs AS purity_micro"
        " FROM best b JOIN tot t USING (cid) ORDER BY cluster"
    )


def _kmeans_par_sql(k: int = 8, iters: int = 2, oversample: int = 8) -> str:
    """Unrolled-CTE DuckDB twin of ext_kmeans_par_seeded: replays the
    ENTIRE deterministic k-means‖ pipeline — candidate ranks (smallest
    phash60, ties by vid), nearest-candidate weights (the same
    (dist, cid) argmin rule as Lloyd assignment), all k greedy weighted
    farthest-point picks (first = heaviest candidate ties-lowest-vid;
    then argmax w·min-dist²-to-chosen ties-lowest-vid, scored in
    HUGEINT because w·dist² can exceed BIGINT at corpus scale), then
    every Lloyd iteration from the picked seeds (cid = pick order).
    Pure integer arithmetic end-to-end → exact value-hash match.

    The greedy CTEs are MATERIALIZED: DuckDB inlines plain CTEs, and
    ``ch(t)`` references ``ch(t-1)`` three times — un-materialized
    that's a 3^k-fold expansion of the whole candidate pipeline (the
    observed failure mode is thousands of parquet re-opens: 'Too many
    open files')."""
    ell = max(k, oversample * k)
    ctes = [
        "flat AS MATERIALIZED (SELECT vec_id AS vid,"
        " unnest(generate_series(1, len(embedding))) - 1 AS d,"
        " CAST(floor((CAST(unnest(embedding) AS DOUBLE) + 1.0) * 1000000)"
        " AS BIGINT) AS q FROM embeddings)",
        "cand AS MATERIALIZED (SELECT vid, rn - 1 AS cid FROM ("
        "SELECT vec_id AS vid, row_number() OVER (ORDER BY "
        + PHASH60_SQL.format(c="CAST(vec_id AS VARCHAR)")
        + f", vec_id) AS rn FROM embeddings) WHERE rn <= {ell})",
        "cc AS MATERIALIZED (SELECT c.cid, f.d, f.q AS c FROM flat f"
        " JOIN cand c USING (vid))",
        _km_dist_cte("aw", "cc"),
        "wts AS MATERIALIZED (SELECT c.cid, c.vid, COALESCE(x.w, 0) AS w"
        " FROM cand c"
        " LEFT JOIN (SELECT cid, COUNT(*) AS w FROM aw GROUP BY cid) x"
        " USING (cid))",
        "cd AS MATERIALIZED (SELECT a.cid AS ca, b.cid AS cb,"
        " SUM((a.c - b.c) * (a.c - b.c)) AS dd FROM cc a"
        " JOIN cc b USING (d) GROUP BY a.cid, b.cid)",
        "p0 AS (SELECT cid, vid FROM wts ORDER BY w DESC, vid LIMIT 1)",
        "ch0 AS (SELECT cid FROM p0)",
    ]
    for t in range(1, k):
        ctes.append(
            f"p{t} AS MATERIALIZED (SELECT wts.cid, wts.vid FROM wts"
            " JOIN (SELECT ca AS cid, MIN(dd) AS md FROM cd"
            f" WHERE cb IN (SELECT cid FROM ch{t - 1}) GROUP BY ca) m"
            " USING (cid)"
            f" WHERE wts.cid NOT IN (SELECT cid FROM ch{t - 1})"
            " ORDER BY CAST(wts.w AS HUGEINT) * m.md DESC, wts.vid"
            " LIMIT 1)"
        )
        ctes.append(
            f"ch{t} AS MATERIALIZED (SELECT cid FROM ch{t - 1}"
            f" UNION ALL SELECT cid FROM p{t})"
        )
    seed_union = " UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS cid, cc.d, cc.c FROM cc"
        f" JOIN p{t} ON cc.cid = p{t}.cid"
        for t in range(k)
    )
    ctes.append(f"c0p AS ({seed_union})")
    prev = "c0p"
    for t in range(1, iters + 1):
        ctes.append(_km_dist_cte(f"la{t}", prev))
        ctes.append(_km_upd_cte(f"lu{t}", f"la{t}"))
        prev = f"lu{t}"
    ctes.append(_km_dist_cte(f"la{iters + 1}", prev))
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT a.cid AS cluster,"
        " COUNT(*) AS n_vecs, CAST(SUM(a.dist) AS BIGINT) AS inertia,"
        " MAX(cs.s) AS centroid_l1"
        f" FROM la{iters + 1} a JOIN (SELECT cid,"
        f" CAST(SUM(c) AS BIGINT) AS s FROM lu{iters} GROUP BY cid) cs"
        " USING (cid) GROUP BY a.cid ORDER BY cluster"
    )


def _ewma_sql() -> str:
    """Twin of relational.ewma_revenue_smoothing — same rational
    trailing-8 weights 3^(j-1)·4^(8-j) over integer cents, same
    division-free 2× spike test (rev·(4^8−3^8) > 2·num)."""
    terms = " + ".join(
        f"{3 ** (j - 1) * 4 ** (8 - j)}"
        f" * COALESCE(lag(rev_cents, {j}) OVER (ORDER BY day), 0)"
        for j in range(1, 9)
    )
    return f"""
        WITH daily AS (
            SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                   CAST(SUM(floor(o_totalprice * 100)) AS BIGINT)
                       AS rev_cents
            FROM orders GROUP BY 1
        ),
        lagd AS (
            SELECT day, rev_cents, {terms} AS ewma_num,
                   lag(rev_cents, 8) OVER (ORDER BY day) AS l8
            FROM daily
        )
        SELECT day, rev_cents, CAST(ewma_num AS BIGINT) AS ewma_num,
               CAST(CASE WHEN rev_cents * {4 ** 8 - 3 ** 8} > 2 * ewma_num
                         THEN 1 ELSE 0 END AS BIGINT) AS spike
        FROM lagd WHERE l8 IS NOT NULL ORDER BY day
    """


#: the E15 audio pipeline CTE chain (md5 samples -> |energy| segment
#: sums -> dHash bits -> band keys -> candidate join -> Hamming
#: verify), shared by the ext_audio_near_dups and
#: ext_audio_dedup_clusters twins
_AUDIO_PIPELINE_SQL = """auds AS (
                SELECT doc_id AS mid, doc_id AS src, FALSE AS noisy
                FROM documents
                UNION ALL
                SELECT doc_id + 1000000000, doc_id, (doc_id % 10 = 5)
                FROM documents WHERE doc_id % 5 = 0
            ),
            byt AS (
                SELECT mid, t, noisy,
                       (mid >= 1000000000) AS twin,
                       CAST('0x' || substr(
                           md5(src::VARCHAR || ':' || (t // 16)::VARCHAR),
                           (t % 16) * 2 + 1, 2) AS BIGINT) AS v0
                FROM auds, generate_series(0, 487) g(t)
            ),
            smp AS (
                SELECT mid, t,
                       CASE WHEN twin AND noisy AND t = 255
                                THEN ((v0 + 96) % 256) - 128
                            WHEN twin AND NOT noisy THEN 2 * (v0 - 128)
                            ELSE v0 - 128 END AS s
                FROM byt
            ),
            segs AS MATERIALIZED (
                SELECT mid, t // 8 AS g, CAST(SUM(abs(s)) AS BIGINT) AS e
                FROM smp GROUP BY 1, 2
            ),
            bits AS (
                SELECT l.mid, l.g AS k,
                       CASE WHEN l.e > r.e THEN 1::BIGINT
                            ELSE 0::BIGINT END AS bit
                FROM segs l JOIN segs r
                  ON l.mid = r.mid AND r.g = l.g + 1
                WHERE l.g < 60
            ),
            hashes AS MATERIALIZED (
                SELECT mid, CAST(SUM(bit << k) AS BIGINT) AS h
                FROM bits GROUP BY mid
            ),
            banded AS MATERIALIZED (
                SELECT mid, bn, (h >> (15 * bn)) & 32767 AS band_key
                FROM hashes, generate_series(0, 3) g(bn)
            ),
            cand AS (
                SELECT DISTINCT a.mid AS id_a, b.mid AS id_b
                FROM banded a JOIN banded b
                  ON a.bn = b.bn AND a.band_key = b.band_key
                 AND a.mid < b.mid
            ),
            pairs AS (
                SELECT id_a, id_b,
                       CAST(bit_count(xor(ha.h, hb.h)) AS INT) AS hamming
                FROM cand
                JOIN hashes ha ON ha.mid = cand.id_a
                JOIN hashes hb ON hb.mid = cand.id_b
            )"""


#: the E16 video pipeline CTE chain (per-frame md5 payload -> cells ->
#: dHash bits -> distinct frame fingerprints -> shared-count pair join),
#: shared by the ext_video_near_dups and ext_video_dedup_clusters twins
_VIDEO_PIPELINE_SQL = """vids AS (
                SELECT doc_id AS mid, doc_id AS src, -1 AS kind
                FROM documents
                UNION ALL
                SELECT doc_id + 1000000000, doc_id,
                       CASE WHEN doc_id % 12 = 6 THEN 1 ELSE 0 END
                FROM documents WHERE doc_id % 6 = 0
            ),
            vframes AS (
                -- kind 1 (truncated twin) keeps frames 0..2; others 0..3
                SELECT mid, src, f FROM vids, generate_series(0, 3) g(f)
                WHERE kind < 1 OR f < 3
            ),
            byt AS (
                SELECT mid, f, t,
                       CAST('0x' || substr(
                           md5(src::VARCHAR || ':f' || f::VARCHAR || ':'
                               || (t // 16)::VARCHAR),
                           (t % 16) * 2 + 1, 2) AS BIGINT) AS v
                FROM vframes, generate_series(0, 863) g(t)
            ),
            cells AS MATERIALIZED (
                SELECT mid, f, ((t // 3) // 18) // 2 AS i,
                       ((t // 3) % 18) // 2 AS j,
                       CAST(SUM(v) AS BIGINT) AS s
                FROM byt GROUP BY 1, 2, 3, 4
            ),
            bits AS (
                SELECT l.mid, l.f, (l.i * 8 + l.j) AS k,
                       CASE WHEN l.s > r.s THEN 1::BIGINT
                            ELSE 0::BIGINT END AS bit
                FROM cells l JOIN cells r
                  ON l.mid = r.mid AND l.f = r.f AND l.i = r.i
                 AND r.j = l.j + 1
                WHERE l.j < 8
            ),
            fps AS MATERIALIZED (
                SELECT DISTINCT mid,
                       CAST(SUM(CASE WHEN k < 60 THEN bit << k
                                     ELSE 0 END) AS BIGINT) AS h
                FROM (SELECT mid, f, k, bit FROM bits) GROUP BY mid, f
            ),
            vpairs AS MATERIALIZED (
                SELECT a.mid AS id_a, b.mid AS id_b,
                       CAST(COUNT(*) AS BIGINT) AS n_shared
                FROM fps a JOIN fps b
                  ON a.h = b.h AND a.mid < b.mid
                GROUP BY a.mid, b.mid
                HAVING COUNT(*) >= 2
            )"""


#: the E12 image pipeline CTE chain (payload bytes -> grayscale cells
#: -> dHash bits -> band keys -> candidate join -> Hamming verify),
#: shared by the ext_image_near_dups and ext_image_dedup_clusters twins
_IMAGE_PIPELINE_SQL = """imgs AS (
                SELECT doc_id AS mid, doc_id AS src, FALSE AS noisy
                FROM documents
                UNION ALL
                SELECT doc_id + 1000000000, doc_id, (doc_id % 14 = 7)
                FROM documents WHERE doc_id % 7 = 0
            ),
            byt AS (
                SELECT mid, t, noisy,
                       CAST('0x' || substr(
                           md5(src::VARCHAR || ':' || (t // 16)::VARCHAR),
                           (t % 16) * 2 + 1, 2) AS BIGINT) AS v0
                FROM imgs, generate_series(0, 863) g(t)
            ),
            pix AS (
                SELECT mid, t,
                       CASE WHEN noisy AND t = 5 THEN (v0 + 128) % 256
                            WHEN noisy AND t = 200 THEN (v0 + 64) % 256
                            WHEN noisy AND t = 431 THEN (v0 + 200) % 256
                            ELSE v0 END AS v
                FROM byt
            ),
            cells AS MATERIALIZED (
                SELECT mid, ((t // 3) // 18) // 2 AS i,
                       ((t // 3) % 18) // 2 AS j,
                       CAST(SUM(v) AS BIGINT) AS s
                FROM pix GROUP BY 1, 2, 3
            ),
            bits AS (
                SELECT l.mid, (l.i * 8 + l.j) AS k,
                       CASE WHEN l.s > r.s THEN 1::BIGINT
                            ELSE 0::BIGINT END AS bit
                FROM cells l JOIN cells r
                  ON l.mid = r.mid AND l.i = r.i AND r.j = l.j + 1
                WHERE l.j < 8
            ),
            hashes AS MATERIALIZED (
                SELECT mid,
                       CAST(SUM(CASE WHEN k < 60 THEN bit << k
                                     ELSE 0 END) AS BIGINT) AS h
                FROM bits GROUP BY mid
            ),
            banded AS MATERIALIZED (
                SELECT mid, bn, (h >> (15 * bn)) & 32767 AS band_key
                FROM hashes, generate_series(0, 3) g(bn)
            ),
            cand AS (
                SELECT DISTINCT a.mid AS id_a, b.mid AS id_b
                FROM banded a JOIN banded b
                  ON a.bn = b.bn AND a.band_key = b.band_key
                 AND a.mid < b.mid
            ),
            pairs AS (
                SELECT id_a, id_b,
                       CAST(bit_count(xor(ha.h, hb.h)) AS INT) AS hamming
                FROM cand
                JOIN hashes ha ON ha.mid = cand.id_a
                JOIN hashes hb ON hb.mid = cand.id_b
            )"""


def oracle_sql() -> dict[str, str]:
    cms_salts = ", ".join(
        f"({s}, {a}, {b})" for s, a, b in universal_salt_constants(4)
    )
    return {
        # -- round-10 additions -----------------------------------------
        # image near-dups: the twin replays the ENTIRE pipeline from
        # md5(doc_id:block) payload bytes -- grayscale sums, 2x2 grid
        # cells, 60 dHash bits, 4x15-bit band keys, candidate join,
        # XOR-popcount verify -- so a value-hash match also proves the
        # PNG/BMP/PPM encode->decode round trips are bit-faithful.
        "ext_image_near_dups": f"""
            WITH {_IMAGE_PIPELINE_SQL}
            SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 6
            ORDER BY id_a, id_b
        """,
        "ext_image_dedup_clusters": f"""
            WITH RECURSIVE {_IMAGE_PIPELINE_SQL},
            vp AS (
                SELECT id_a, id_b FROM pairs WHERE hamming <= 6
            ),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM vp
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM vp
            ),
            reach(id, root) AS (
                SELECT mid, mid FROM imgs
                UNION
                SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
            ),
            comp AS (
                SELECT id AS media_id, MIN(root) AS cluster_id
                FROM reach GROUP BY id
            ),
            sized AS (
                SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM comp GROUP BY cluster_id
            )
            SELECT cluster_id, cluster_size, cluster_size AS n_members
            FROM sized WHERE cluster_size > 1
            ORDER BY cluster_id
        """,
        # audio near-dups: same full-replay discipline as the image twin
        # -- samples -> |energy| segment sums -> bits -> bands -> verify
        # from md5 arithmetic alone (488 frames = 61 segments x 8, so
        # the cross-multiplied mean comparisons are plain sum compares)
        "ext_audio_near_dups": f"""
            WITH {_AUDIO_PIPELINE_SQL}
            SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 6
            ORDER BY id_a, id_b
        """,
        # audio dedup clusters (r11): recursive-CTE closure over the
        # shared audio pair chain -- node set is every audio id
        # (originals + %5 twins)
        "ext_audio_dedup_clusters": f"""
            WITH RECURSIVE {_AUDIO_PIPELINE_SQL},
            vp AS (
                SELECT id_a, id_b FROM pairs WHERE hamming <= 6
            ),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM vp
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM vp
            ),
            reach(id, root) AS (
                SELECT mid, mid FROM auds
                UNION
                SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
            ),
            comp AS (
                SELECT id AS media_id, MIN(root) AS cluster_id
                FROM reach GROUP BY id
            ),
            sized AS (
                SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM comp GROUP BY cluster_id
            )
            SELECT cluster_id, cluster_size, cluster_size AS n_members
            FROM sized WHERE cluster_size > 1
            ORDER BY cluster_id
        """,
        # WebDataset round trip (r11): the twin hashes documents
        # directly -- a value-hash match certifies the tar pack->read
        # path byte-faithful without the oracle opening a tar
        "ext_webdataset_roundtrip": """
            SELECT doc_id, md5(text) AS text_md5,
                   CAST(strlen(text) AS BIGINT) AS n_bytes
            FROM documents ORDER BY doc_id
        """,
        # hard-negative mining (r11): bounded anchors x nonzero
        # candidates, bit-portable fold-cosine (ROUND 6), argmax by
        # row_number over (cos DESC, vec_id) -- the cosine_topk
        # stable-ranking rule
        "ext_hard_negative_mining": """
            WITH e AS (
                SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings
            ),
            nz AS (
                SELECT vec_id, label, v FROM e
                WHERE list_reduce(list_transform(v, x -> abs(x)),
                                  (a, b) -> a + b) <> 0
            ),
            anc AS (
                SELECT vec_id AS anchor_id, label AS a_label, v AS av
                FROM nz WHERE vec_id % 10 = 1
            ),
            p AS (
                SELECT anc.anchor_id, anc.a_label,
                       c.vec_id AS cand_id,
                       c.label AS negative_label,
                       ROUND(
                           list_reduce(list_transform(
                               range(1, len(anc.av) + 1),
                               i -> anc.av[i] * c.v[i]), (x, y) -> x + y)
                           / (sqrt(list_reduce(list_transform(anc.av,
                                   x -> x * x), (x, y) -> x + y))
                              * sqrt(list_reduce(list_transform(c.v,
                                   x -> x * x), (x, y) -> x + y))),
                           6) AS neg_cos
                FROM anc, nz c
                WHERE anc.a_label <> c.label
            ),
            r AS (
                SELECT *,
                       ROW_NUMBER() OVER (
                           PARTITION BY anchor_id
                           ORDER BY neg_cos DESC, cand_id ASC) AS rn,
                       COUNT(*) OVER (PARTITION BY anchor_id)
                           AS n_candidates
                FROM p
            )
            SELECT anchor_id, a_label, cand_id AS negative_id,
                   negative_label, neg_cos,
                   CAST(n_candidates AS BIGINT) AS n_candidates
            FROM r WHERE rn = 1 ORDER BY anchor_id
        """,
        # classifier calibration (r11): replay the NB chain to the
        # per-doc scores, then sweep 6 integer cross-multiplied
        # thresholds over the full census
        "ext_classifier_calibration": """
            WITH wt AS (
                SELECT doc_id,
                       string_split_regex(regexp_replace(lower(text), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+') AS w
                FROM documents
            ),
            pos AS (
                SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM wt
            ),
            bg AS (
                SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM pos
            ),
            feats AS MATERIALIZED (
                SELECT doc_id,
                       CAST('0x' || substr(md5(w1 || ' ' || w2), 1, 15) AS BIGINT) % 1024 AS bucket
                FROM bg
            ),
            doc_counts AS (
                SELECT doc_id, bucket, COUNT(*) AS cnt
                FROM feats GROUP BY doc_id, bucket
            ),
            pos_b AS (
                SELECT bucket, COUNT(*) AS cp FROM feats
                WHERE doc_id IN (SELECT doc_id FROM documents
                                 WHERE lang = 'en')
                GROUP BY bucket
            ),
            raw_b AS (
                SELECT bucket, COUNT(*) AS cr FROM feats GROUP BY bucket
            ),
            buckets AS (
                SELECT r.bucket, COALESCE(p.cp, 0) AS cp,
                       r.cr - COALESCE(p.cp, 0) AS cn,
                       SUM(COALESCE(p.cp, 0)) OVER () AS np,
                       SUM(r.cr - COALESCE(p.cp, 0)) OVER () AS nn
                FROM raw_b r LEFT JOIN pos_b p ON r.bucket = p.bucket
            ),
            wts AS (
                SELECT bucket,
                       LEAST(GREATEST(
                           CAST((CAST(1000000 AS HUGEINT) * (cp + 1) * (nn + 1024))
                                // (CAST(cn + 1 AS HUGEINT) * (np + 1024)) AS BIGINT),
                           1), 1000000000000) AS w
                FROM buckets
            ),
            scored AS (
                SELECT d.doc_id,
                       CAST(SUM(d.cnt) AS BIGINT) AS n_feat,
                       CAST(SUM(d.cnt * wts.w) AS BIGINT) AS score_micro
                FROM doc_counts d JOIN wts ON d.bucket = wts.bucket
                GROUP BY d.doc_id
            ),
            census AS (
                SELECT doc.lang = 'en' AS is_en,
                       COALESCE(s.n_feat, 0) AS n_feat,
                       COALESCE(s.score_micro, 0) AS score_micro
                FROM documents doc
                LEFT JOIN scored s ON doc.doc_id = s.doc_id
            ),
            sweep AS (
                SELECT c.*, t.thr_micro
                FROM census c
                CROSS JOIN (SELECT unnest([500000, 750000, 1000000,
                                           1250000, 1500000, 2000000])
                                AS thr_micro) t
            )
            SELECT thr_micro,
                   CAST(SUM(CASE WHEN score_micro > n_feat * thr_micro
                                  AND is_en THEN 1 ELSE 0 END) AS BIGINT)
                       AS tp,
                   CAST(SUM(CASE WHEN score_micro > n_feat * thr_micro
                                  AND NOT is_en THEN 1 ELSE 0 END) AS BIGINT)
                       AS fp,
                   CAST(SUM(CASE WHEN score_micro <= n_feat * thr_micro
                                  AND is_en THEN 1 ELSE 0 END) AS BIGINT)
                       AS fn,
                   CAST(SUM(CASE WHEN score_micro <= n_feat * thr_micro
                                  AND NOT is_en THEN 1 ELSE 0 END) AS BIGINT)
                       AS tn
            FROM sweep GROUP BY thr_micro ORDER BY thr_micro
        """,
        # corpus snapshot diff (r11): both engines derive the same two
        # snapshots from the one corpus, then full-outer-join on doc_id
        # comparing md5(text)
        "ext_corpus_snapshot_diff": """
            WITH prev AS (
                SELECT doc_id,
                       md5(CASE WHEN doc_id % 7 = 0
                                THEN text || ' legacy' ELSE text END)
                           AS h_prev
                FROM documents WHERE doc_id % 5 <> 0
                UNION ALL
                SELECT doc_id + 1000000000 AS doc_id, md5(text) AS h_prev
                FROM documents WHERE doc_id % 11 = 3
            ),
            cur AS (
                SELECT doc_id, md5(text) AS h_cur, n_chars
                FROM documents
            ),
            j AS (
                SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
                       p.h_prev, c.h_cur, c.n_chars
                FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id
            )
            SELECT CASE WHEN h_prev IS NULL THEN 'added'
                        WHEN h_cur IS NULL THEN 'removed'
                        WHEN h_prev = h_cur THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
                   CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT)
                       AS sum_n_chars
            FROM j GROUP BY 1 ORDER BY status
        """,
        # ORC round trip (r11): the twin hashes every column straight
        # off the parquet table -- a value-hash match certifies the
        # ORC write->read path without the oracle reading ORC
        "ext_orc_roundtrip": """
            SELECT doc_id,
                   md5(text || chr(31) || lang || chr(31) || source ||
                       chr(31) || CAST(n_chars AS VARCHAR)) AS row_md5,
                   CAST(n_chars AS BIGINT) AS n_chars
            FROM documents ORDER BY doc_id
        """,
        # CCNet head/middle/tail buckets (r11): replay the 5-gram LM
        # score chain, rank per language on the exact total order
        # (mean_p DESC, doc_id ASC), tercile by integer division --
        # integer-only output, no NTILE engine semantics
        "ext_ccnet_quality_buckets": """
            WITH wt AS (
                SELECT doc_id,
                       string_split_regex(regexp_replace(lower(text), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+') AS w
                FROM documents
            ),
            pos AS (
                SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM wt
            ),
            fg AS (
                SELECT doc_id, w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3,
                       w[i + 3] AS w4, w[i + 4] AS w5
                FROM pos
            ),
            ct AS MATERIALIZED (
                SELECT w1, w2, w3, w4, w5, COUNT(*) AS cn FROM fg
                GROUP BY w1, w2, w3, w4, w5
            ),
            cc AS (
                SELECT w1, w2, w3, w4, CAST(SUM(cn) AS BIGINT) AS cctx
                FROM ct GROUP BY w1, w2, w3, w4
            ),
            vocab AS (
                SELECT COUNT(DISTINCT w5) AS v FROM ct
            ),
            scored AS (
                SELECT f.doc_id,
                       (1000000 * (ct.cn + 1)) // (cc.cctx + vocab.v)
                           AS p_micro
                FROM fg f
                JOIN ct ON f.w1 = ct.w1 AND f.w2 = ct.w2 AND f.w3 = ct.w3
                       AND f.w4 = ct.w4 AND f.w5 = ct.w5
                JOIN cc ON f.w1 = cc.w1 AND f.w2 = cc.w2 AND f.w3 = cc.w3
                       AND f.w4 = cc.w4
                CROSS JOIN vocab
            ),
            agg AS (
                SELECT doc_id, COUNT(*) AS n_ngrams,
                       CAST(SUM(p_micro) AS BIGINT) AS sum_p_micro
                FROM scored GROUP BY doc_id
            ),
            perdoc AS (
                SELECT a.doc_id, d.lang, a.n_ngrams, a.sum_p_micro,
                       ((2 * a.sum_p_micro + a.n_ngrams)
                           // (2 * a.n_ngrams)) / 1000000.0 AS mean_p
                FROM agg a JOIN documents d ON a.doc_id = d.doc_id
            ),
            ranked AS (
                SELECT lang, doc_id, n_ngrams, sum_p_micro,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang
                           ORDER BY mean_p DESC, doc_id ASC) AS rn,
                       COUNT(*) OVER (PARTITION BY lang) AS n
                FROM perdoc
            )
            SELECT lang,
                   (['head', 'middle', 'tail'])[
                       CAST(((rn - 1) * 3) // n AS INT) + 1] AS bucket,
                   COUNT(*) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
                   CAST(SUM(n_ngrams) AS BIGINT) AS sum_n_ngrams,
                   CAST(SUM(sum_p_micro) AS BIGINT) AS sum_p_total
            FROM ranked
            GROUP BY lang, bucket
            ORDER BY lang, bucket
        """,
        # passage-level exact dedup (r11): fixed 20-word passages,
        # first-writer-wins on min(doc_id*2^20+pos), survivors
        # reassembled in position order -- kept_md5 certifies the
        # reassembled text itself
        "ext_passage_dedup": f"""
            WITH wt AS (
                SELECT doc_id, {_WORDS.format(c='text')} AS w
                FROM documents
                WHERE length({_WS_STRIP.format(c='text')}) > 0
            ),
            ch AS (
                SELECT doc_id,
                       unnest(range(0, CAST(ceil(len(w) / 20.0) AS BIGINT)))
                           AS pos,
                       w
                FROM wt
            ),
            chunks AS (
                SELECT doc_id, pos,
                       array_to_string(w[pos*20 + 1 : pos*20 + 20], ' ')
                           AS chunk
                FROM ch
            ),
            own AS (
                SELECT chunk, MIN(doc_id * 1048576 + pos) AS first_enc
                FROM chunks GROUP BY chunk
            ),
            tagged AS (
                SELECT c.doc_id, c.pos, c.chunk,
                       (c.doc_id * 1048576 + c.pos) = o.first_enc
                           AS is_first
                FROM chunks c JOIN own o USING (chunk)
            )
            SELECT doc_id,
                   COUNT(*) AS n_chunks,
                   CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept,
                   md5(COALESCE(
                       string_agg(chunk, ' ' ORDER BY pos)
                           FILTER (WHERE is_first),
                       '')) AS kept_md5
            FROM tagged GROUP BY doc_id ORDER BY doc_id
        """,
        # cross-modal consistency (r11): exact fold-cosine over paired
        # caption/image embeddings -- matched pairs are the 2*v scalar
        # twins (score exactly 1.0 by IEEE scale invariance), mismatched
        # pairs are reverse(v) (bit-replayable element re-ordering)
        "ext_crossmodal_consistency": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings
            ),
            nz AS (
                SELECT vec_id, v FROM e
                WHERE list_reduce(list_transform(v, x -> abs(x)),
                                  (a, b) -> a + b) <> 0
            ),
            p AS (
                SELECT vec_id, v AS cap,
                       CASE WHEN vec_id % 4 = 0
                            THEN list_transform(v, x -> x * 2.0)
                            ELSE list_reverse(v) END AS img
                FROM nz
            ),
            s AS (
                SELECT vec_id AS item_id,
                       ROUND(
                           list_reduce(list_transform(
                               range(1, len(cap) + 1),
                               i -> cap[i] * img[i]), (x, y) -> x + y)
                           / (sqrt(list_reduce(list_transform(cap,
                                   x -> x * x), (x, y) -> x + y))
                              * sqrt(list_reduce(list_transform(img,
                                   x -> x * x), (x, y) -> x + y))),
                           6) AS clip_score
                FROM p
            )
            SELECT item_id, clip_score, clip_score >= 0.35 AS kept
            FROM s ORDER BY item_id
        """,
        # noisy video near-dups (r11): the Hamming-banded variant's
        # full replay -- per-frame payload + _IMG_NOISE perturbation,
        # distinct fingerprints, 4x15-bit band join, XOR-popcount
        # verify, distinct matched-pair count
        "ext_video_noisy_near_dups": """
            WITH vids AS (
                SELECT doc_id AS mid, doc_id AS src, FALSE AS noisy
                FROM documents
                UNION ALL
                SELECT doc_id + 1000000000, doc_id, TRUE
                FROM documents WHERE doc_id % 6 = 0
            ),
            vframes AS (
                SELECT mid, src, noisy, f
                FROM vids, generate_series(0, 3) g(f)
            ),
            byt AS (
                SELECT mid, f, t,
                       CASE WHEN noisy AND t = 5 THEN (v0 + 128) % 256
                            WHEN noisy AND t = 200 THEN (v0 + 64) % 256
                            WHEN noisy AND t = 431 THEN (v0 + 200) % 256
                            ELSE v0 END AS v
                FROM (
                    SELECT mid, f, noisy, t,
                           CAST('0x' || substr(
                               md5(src::VARCHAR || ':f' || f::VARCHAR
                                   || ':' || (t // 16)::VARCHAR),
                               (t % 16) * 2 + 1, 2) AS BIGINT) AS v0
                    FROM vframes, generate_series(0, 863) g(t)
                )
            ),
            cells AS MATERIALIZED (
                SELECT mid, f, ((t // 3) // 18) // 2 AS i,
                       ((t // 3) % 18) // 2 AS j,
                       CAST(SUM(v) AS BIGINT) AS s
                FROM byt GROUP BY 1, 2, 3, 4
            ),
            bits AS (
                SELECT l.mid, l.f, (l.i * 8 + l.j) AS k,
                       CASE WHEN l.s > r.s THEN 1::BIGINT
                            ELSE 0::BIGINT END AS bit
                FROM cells l JOIN cells r
                  ON l.mid = r.mid AND l.f = r.f AND l.i = r.i
                 AND r.j = l.j + 1
                WHERE l.j < 8
            ),
            fps AS MATERIALIZED (
                SELECT DISTINCT mid,
                       CAST(SUM(CASE WHEN k < 60 THEN bit << k
                                     ELSE 0 END) AS BIGINT) AS h
                FROM (SELECT mid, f, k, bit FROM bits) GROUP BY mid, f
            ),
            banded AS MATERIALIZED (
                SELECT mid, h, bn, (h >> (15 * bn)) & 32767 AS band_key
                FROM fps, generate_series(0, 3) g(bn)
            ),
            matched AS (
                SELECT DISTINCT a.mid AS id_a, b.mid AS id_b,
                                a.h AS ha, b.h AS hb
                FROM banded a JOIN banded b
                  ON a.bn = b.bn AND a.band_key = b.band_key
                 AND a.mid < b.mid
                WHERE bit_count(xor(a.h, b.h)) <= 6
            )
            SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM matched GROUP BY id_a, id_b
            HAVING COUNT(*) >= 2
            ORDER BY id_a, id_b
        """,
        # video near-dups: frame fingerprints from md5 arithmetic (the
        # image cell/bit replay with a per-frame namespace), distinct
        # fingerprint sets, shared-count pair join
        "ext_video_near_dups": f"""
            WITH {_VIDEO_PIPELINE_SQL}
            SELECT id_a, id_b, n_shared FROM vpairs
            ORDER BY id_a, id_b
        """,
        # video dedup clusters (r11): the image-clusters recursive-CTE
        # closure over the shared video pair chain -- node set is every
        # video id (originals + %6 twins)
        "ext_video_dedup_clusters": f"""
            WITH RECURSIVE {_VIDEO_PIPELINE_SQL},
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM vpairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM vpairs
            ),
            reach(id, root) AS (
                SELECT mid, mid FROM vids
                UNION
                SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
            ),
            comp AS (
                SELECT id AS media_id, MIN(root) AS cluster_id
                FROM reach GROUP BY id
            ),
            sized AS (
                SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM comp GROUP BY cluster_id
            )
            SELECT cluster_id, cluster_size, cluster_size AS n_members
            FROM sized WHERE cluster_size > 1
            ORDER BY cluster_id
        """,
        # 5-gram LM scoring (r11): the trigram twin with two more join
        # columns -- same Laplace micro-unit and integer-mean discipline
        "ext_fivegram_lm_score": """
            WITH wt AS (
                SELECT doc_id,
                       string_split_regex(regexp_replace(lower(text), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+') AS w
                FROM documents
            ),
            pos AS (
                SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i FROM wt
            ),
            fg AS (
                SELECT doc_id, w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3,
                       w[i + 3] AS w4, w[i + 4] AS w5
                FROM pos
            ),
            ct AS MATERIALIZED (
                SELECT w1, w2, w3, w4, w5, COUNT(*) AS cn FROM fg
                GROUP BY w1, w2, w3, w4, w5
            ),
            cc AS (
                SELECT w1, w2, w3, w4, CAST(SUM(cn) AS BIGINT) AS cctx
                FROM ct GROUP BY w1, w2, w3, w4
            ),
            vocab AS (
                SELECT COUNT(DISTINCT w5) AS v FROM ct
            ),
            scored AS (
                SELECT f.doc_id,
                       (1000000 * (ct.cn + 1)) // (cc.cctx + vocab.v)
                           AS p_micro
                FROM fg f
                JOIN ct ON f.w1 = ct.w1 AND f.w2 = ct.w2 AND f.w3 = ct.w3
                       AND f.w4 = ct.w4 AND f.w5 = ct.w5
                JOIN cc ON f.w1 = cc.w1 AND f.w2 = cc.w2 AND f.w3 = cc.w3
                       AND f.w4 = cc.w4
                CROSS JOIN vocab
            ),
            agg AS (
                SELECT doc_id, COUNT(*) AS n_ngrams,
                       CAST(SUM(p_micro) AS BIGINT) AS sum_p_micro
                FROM scored GROUP BY doc_id
            )
            SELECT doc_id, n_ngrams, sum_p_micro,
                   ((2 * sum_p_micro + n_ngrams) // (2 * n_ngrams))
                       / 1000000.0 AS mean_p
            FROM agg
            ORDER BY doc_id
        """,
        "ext_trigram_lm_score": """
            WITH wt AS (
                SELECT doc_id,
                       string_split_regex(regexp_replace(lower(text), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+') AS w
                FROM documents
            ),
            pos AS (
                SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM wt
            ),
            tg AS (
                SELECT doc_id, w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3
                FROM pos
            ),
            ct AS (
                SELECT w1, w2, w3, COUNT(*) AS cnt3 FROM tg
                GROUP BY w1, w2, w3
            ),
            cc AS (
                SELECT w1, w2, CAST(SUM(cnt3) AS BIGINT) AS cnt12 FROM ct
                GROUP BY w1, w2
            ),
            vocab AS (
                SELECT COUNT(DISTINCT w3) AS v FROM ct
            ),
            scored AS (
                SELECT t.doc_id,
                       (1000000 * (ct.cnt3 + 1)) // (cc.cnt12 + vocab.v)
                           AS p_micro
                FROM tg t
                JOIN ct ON t.w1 = ct.w1 AND t.w2 = ct.w2 AND t.w3 = ct.w3
                JOIN cc ON t.w1 = cc.w1 AND t.w2 = cc.w2
                CROSS JOIN vocab
            ),
            agg AS (
                SELECT doc_id, COUNT(*) AS n_trigrams,
                       CAST(SUM(p_micro) AS BIGINT) AS sum_p_micro
                FROM scored GROUP BY doc_id
            )
            SELECT doc_id, n_trigrams, sum_p_micro,
                   ((2 * sum_p_micro + n_trigrams) // (2 * n_trigrams))
                       / 1000000.0 AS mean_p
            FROM agg
            ORDER BY doc_id
        """,
        # semantic contamination: counts + the cross-side fold-cosine
        # sample are SQL-exact; the booleans replay deterministic
        # arithmetic (cosine scale-invariance) or pin Spark against its
        # own exact ground truth -- see the query docstring.
        "ext_semantic_contamination": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings
            ),
            bench AS (SELECT * FROM e WHERE vec_id % 40 = 7),
            nat AS (SELECT * FROM e WHERE vec_id % 40 <> 7),
            planted AS (
                SELECT vec_id FROM bench
                WHERE vec_id % 80 = 7
                  AND list_reduce(list_transform(v, x -> abs(x)),
                                  (a, b) -> a + b) <> 0
            ),
            sp AS (
                SELECT a.vec_id AS corpus_id, b.vec_id AS bench_id,
                       ROUND(
                           list_reduce(list_transform(range(1, len(a.v)+1),
                                                      i -> a.v[i] * b.v[i]),
                                       (x, y) -> x + y)
                           / (sqrt(list_reduce(list_transform(range(1, len(a.v)+1),
                                                              i -> a.v[i] * a.v[i]),
                                               (x, y) -> x + y))
                              * sqrt(list_reduce(list_transform(range(1, len(b.v)+1),
                                                                i -> b.v[i] * b.v[i]),
                                                 (x, y) -> x + y))), 6) AS c
                FROM nat a JOIN bench b
                  ON a.vec_id < 150 AND b.vec_id < 150
                WHERE list_reduce(list_transform(a.v, x -> abs(x)),
                                  (x, y) -> x + y) <> 0
                  AND list_reduce(list_transform(b.v, x -> abs(x)),
                                  (x, y) -> x + y) <> 0
            )
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bench)
                       AS n_benchmark,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM nat)
                       + (SELECT CAST(COUNT(*) AS BIGINT) FROM planted)
                       AS n_corpus,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM planted)
                       AS n_planted,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM sp WHERE c >= 0.9)
                       AS n_sample_pairs,
                   true AS planted_recovered_ok,
                   true AS containment_ok,
                   true AS cocluster_exhaustive_ok
        """,
        # -- round-8 additions ------------------------------------------
        # k-means: the twin replays the full Lloyd loop (see _kmeans_sql)
        # — any divergence in seeding, assignment, tie break or centroid
        # rounding flips every downstream integer.
        "ext_kmeans_clusters": _kmeans_sql(k=8, iters=2),
        "ext_kmeans_label_purity": _kmeans_purity_sql(k=8, iters=2),
        "ext_kmeans_par_seeded": _kmeans_par_sql(k=8, iters=2),
        "ewma_revenue_smoothing": _ewma_sql(),
        # containment: brute-force all ORDERED pairs (a ≠ b) of distinct
        # 3-word SHINGLE sets (Broder containment — same shingle
        # construction as the minhash twin) over the same bounded sample
        # — the prefix/length filters are exact, so Spark must reproduce
        # this set bit-for-bit
        "ext_containment_join": f"""
            WITH base AS (
                SELECT doc_id, {_WORDS.format(c='text')} AS w
                FROM documents WHERE doc_id < 400
            ),
            toks AS (
                SELECT DISTINCT doc_id, tok
                FROM (SELECT doc_id, unnest({_SHINGLES_SQL}) AS tok
                      FROM base)
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
            ipairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(COUNT(*) AS BIGINT) AS inter
                FROM toks a JOIN toks b ON a.tok = b.tok
                     AND a.doc_id <> b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT i.id_a, i.id_b,
                   (1000000 * i.inter) // sa.sz AS containment_micro
            FROM ipairs i JOIN sizes sa ON sa.doc_id = i.id_a
            WHERE (1000000 * i.inter) // sa.sz >= 800000
            ORDER BY id_a, id_b
        """,
        # -- round-7 additions ------------------------------------------
        # ExactSubstr repeated-substring mining: the twin brute-forces
        # EVERY 40-gram (no anchor sieve), so an exact hash match proves
        # the Spark pipeline's completeness — one missed duplicated
        # position and the per-doc integers diverge. Island rule (gap
        # > 40 breaks) and 1-based positions replayed verbatim.
        "ext_repeated_substring_mine": """
            WITH pos AS (
                SELECT doc_id, text,
                       unnest(generate_series(1,
                           greatest(length(text) - 39, 0)))::BIGINT AS i
                FROM documents
            ),
            g AS (SELECT doc_id, i, substr(text, i::INT, 40) AS gram
                  FROM pos),
            dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
            dp AS (SELECT g.doc_id, g.i FROM g JOIN dup USING (gram)),
            isl AS (
                SELECT doc_id, i,
                       SUM(CASE WHEN prev_i IS NULL OR i - prev_i > 40
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY doc_id ORDER BY i) AS grp
                FROM (SELECT doc_id, i,
                             lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                                 AS prev_i
                      FROM dp)
            ),
            spans AS (
                SELECT doc_id, grp, MIN(i) AS s, MAX(i) + 40 AS e,
                       COUNT(*) AS npos
                FROM isl GROUP BY doc_id, grp
            )
            SELECT doc_id,
                   CAST(SUM(npos) AS BIGINT) AS n_dup_positions,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(e - s) AS BIGINT) AS covered_chars,
                   CAST(MAX(e - s) AS BIGINT) AS max_span_len
            FROM spans GROUP BY doc_id ORDER BY doc_id
        """,
        # The APPLY half: excise every mined span and hash the CLEANED
        # text — string surgery replayed segment-by-segment (lag for the
        # predecessor end, ordered string_agg of the between-span
        # segments, the tail past the last span; md5 of UTF-8 bytes is
        # identical lowercase hex on both engines)
        "ext_repeated_span_cut": """
            WITH pos AS (
                SELECT doc_id, text,
                       unnest(generate_series(1,
                           greatest(length(text) - 39, 0)))::BIGINT AS i
                FROM documents
            ),
            g AS (SELECT doc_id, i, substr(text, i::INT, 40) AS gram
                  FROM pos),
            dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
            dp AS (SELECT g.doc_id, g.i FROM g JOIN dup USING (gram)),
            isl AS (
                SELECT doc_id, i,
                       SUM(CASE WHEN prev_i IS NULL OR i - prev_i > 40
                                THEN 1 ELSE 0 END)
                           OVER (PARTITION BY doc_id ORDER BY i) AS grp
                FROM (SELECT doc_id, i,
                             lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                                 AS prev_i
                      FROM dp)
            ),
            spans AS (
                SELECT doc_id, grp, MIN(i) AS s, MAX(i) + 40 AS e
                FROM isl GROUP BY doc_id, grp
            ),
            marks AS (
                SELECT doc_id, s, e,
                       lag(e, 1, 1) OVER (PARTITION BY doc_id ORDER BY s)
                           AS prev_e
                FROM spans
            ),
            heads AS (
                SELECT m.doc_id,
                       string_agg(substr(d.text, m.prev_e::INT,
                                         (m.s - m.prev_e)::INT),
                                  '' ORDER BY m.s) AS head,
                       MAX(m.e) AS last_e,
                       COUNT(*) AS n_cuts,
                       SUM(m.e - m.s) AS cut_chars
                FROM marks m JOIN documents d USING (doc_id)
                GROUP BY m.doc_id
            ),
            cleaned AS (
                SELECT d.doc_id,
                       CASE WHEN h.doc_id IS NULL THEN d.text
                            ELSE h.head || substr(d.text, h.last_e::INT)
                       END AS ct,
                       COALESCE(h.n_cuts, 0) AS n_cuts,
                       COALESCE(h.cut_chars, 0) AS cut_chars
                FROM documents d LEFT JOIN heads h USING (doc_id)
            )
            SELECT doc_id,
                   CAST(length(ct) AS BIGINT) AS cleaned_len,
                   md5(ct) AS cleaned_md5,
                   CAST(n_cuts AS BIGINT) AS n_cuts,
                   CAST(cut_chars AS BIGINT) AS cut_chars
            FROM cleaned ORDER BY doc_id
        """,
        # -- round-5 additions ------------------------------------------
        # Degree-ordered triangle counting (Schank–Wagner forward
        # algorithm): the oriented edge set, wedge generation and
        # closure join are replayed exactly — the comparator is pure
        # integer (degree, id) lexicographic on both engines
        "part_triangle_stats": """
            WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
                        FROM lineitem),
            e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
                  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk),
            deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
                    FROM (SELECT u AS node FROM e
                          UNION ALL SELECT v AS node FROM e)
                    GROUP BY node),
            eor AS (SELECT CASE WHEN du.d < dv.d
                                  OR (du.d = dv.d AND e.u < e.v)
                                THEN e.u ELSE e.v END AS a,
                           CASE WHEN du.d < dv.d
                                  OR (du.d = dv.d AND e.u < e.v)
                                THEN e.v ELSE e.u END AS b,
                           CASE WHEN du.d < dv.d
                                  OR (du.d = dv.d AND e.u < e.v)
                                THEN dv.d ELSE du.d END AS db
                    FROM e JOIN deg du ON e.u = du.node
                           JOIN deg dv ON e.v = dv.node),
            wed AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
                    FROM eor e1 JOIN eor e2 ON e1.a = e2.a
                    WHERE e1.db < e2.db
                       OR (e1.db = e2.db AND e1.b < e2.b)),
            tri AS (SELECT w.a, w.b, w.c
                    FROM wed w JOIN eor t ON w.b = t.a AND w.c = t.b),
            pern AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS tri_cnt
                     FROM (SELECT a AS node FROM tri
                           UNION ALL SELECT b FROM tri
                           UNION ALL SELECT c FROM tri)
                     GROUP BY node)
            SELECT p.node AS part, p.tri_cnt AS tri_cnt, d.d AS degree,
                   CAST((2000000 * p.tri_cnt) // (d.d * (d.d - 1))
                        AS BIGINT) AS cc_micro
            FROM pern p JOIN deg d ON p.node = d.node
            ORDER BY p.tri_cnt DESC, part LIMIT 25
        """,
        # Count-Min sketch replayed IN FULL: every (j, bucket) cell is
        # the same portable-hash integer arithmetic on both engines, so
        # the sketch state itself (not just an invariant) is checked
        "ext_cms_word_counts": f"""
            WITH counts AS (
                SELECT term, CAST(COUNT(*) AS BIGINT) AS true_cnt
                FROM (SELECT unnest({_WORDS.format(c='lower(text)')}) AS term
                      FROM documents)
                GROUP BY term
            ),
            salts AS (SELECT * FROM (VALUES {cms_salts}) AS v(s, a, b)),
            hashed AS (
                SELECT term, true_cnt, {PHASH60_SQL.format(c='term')} AS h
                FROM counts
            ),
            cells AS (
                SELECT s AS j,
                       ({UNIVERSAL_HASH_SQL.format(h='h', a='a', b='b')}) % 512
                           AS bucket,
                       true_cnt
                FROM hashed CROSS JOIN salts
            ),
            sketch AS (
                SELECT j, bucket, CAST(SUM(true_cnt) AS BIGINT) AS cnt
                FROM cells GROUP BY j, bucket
            ),
            probes AS (
                SELECT term, true_cnt, h FROM hashed
                ORDER BY true_cnt DESC, term LIMIT 15
            ),
            pcells AS (
                SELECT term, true_cnt, s AS j,
                       ({UNIVERSAL_HASH_SQL.format(h='h', a='a', b='b')}) % 512
                           AS bucket
                FROM probes CROSS JOIN salts
            ),
            est AS (
                SELECT term, true_cnt,
                       CAST(MIN(COALESCE(sk.cnt, 0)) AS BIGINT) AS cms_est
                FROM pcells LEFT JOIN sketch sk USING (j, bucket)
                GROUP BY term, true_cnt
            )
            SELECT CAST(row_number() OVER (ORDER BY true_cnt DESC, term) AS INT)
                       AS rank,
                   term, true_cnt, cms_est,
                   cms_est >= true_cnt AS overestimate_ok
            FROM est
            ORDER BY rank
        """,
        # PassJoin k=1 pigeonhole replayed: identical blocking (anchored
        # half-keys at partner lengths) + levenshtein verify
        "ext_vocab_edit_pairs": f"""
            WITH vocab AS (
                SELECT w, CAST(COUNT(*) AS BIGINT) AS df
                FROM (
                    SELECT unnest({_WORDS.format(c='lower(text)')}) AS w
                    FROM documents
                    UNION ALL
                    SELECT unnest({_WORDS.format(c='lower(p_name)')}) AS w
                    FROM part
                )
                GROUP BY w
                HAVING length(w) >= 3
            ),
            ikeys AS (
                SELECT w, df, 'P' AS role, length(w) AS lk,
                       substr(w, 1, length(w) // 2) AS part
                FROM vocab
                UNION ALL
                SELECT w, df, 'S', length(w), substr(w, length(w) // 2 + 1)
                FROM vocab
            ),
            pkeys AS (
                SELECT w AS w2, df AS df2, 'P' AS role, length(w) + d AS lk,
                       substr(w, 1, (length(w) + d) // 2) AS part
                FROM vocab CROSS JOIN (VALUES (-1), (0), (1)) AS dd(d)
                WHERE length(w) + d >= 3
                UNION ALL
                SELECT w, df, 'S', length(w) + d,
                       substr(w, length(w)
                                 - ((length(w) + d) - (length(w) + d) // 2)
                                 + 1)
                FROM vocab CROSS JOIN (VALUES (-1), (0), (1)) AS dd(d)
                WHERE length(w) + d >= 3
            ),
            cands AS (
                SELECT DISTINCT i.w, i.df, p.w2, p.df2
                FROM ikeys i
                JOIN pkeys p
                  ON i.role = p.role AND i.lk = p.lk AND i.part = p.part
                WHERE i.w < p.w2
            )
            SELECT w AS w_a, w2 AS w_b, df AS df_a, df2 AS df_b,
                   CAST(1 AS INT) AS dist
            FROM cands
            WHERE levenshtein(w, w2) = 1
            ORDER BY w_a, w_b
        """,
        # Unicode NFC: CPython UCD (pandas_udf) vs DuckDB utf8proc —
        # bit-identical on assigned text by the normalization
        # STABILITY policy; suffixes built with chr() so both engines
        # see the exact same decomposed sequences.
        "ext_unicode_normalize": """
            WITH s AS (
                SELECT doc_id,
                       text || ' ' || CASE CAST(doc_id % 4 AS INTEGER)
                           WHEN 0 THEN 'e' || chr(769)
                           WHEN 1 THEN chr(4352) || chr(4449)
                           WHEN 2 THEN 'A' || chr(778)
                           WHEN 3 THEN chr(233)
                       END AS raw
                FROM documents
            )
            SELECT doc_id,
                   CAST(length(raw) AS BIGINT) AS len_raw,
                   CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
                   CAST(CASE WHEN raw <> nfc_normalize(raw) THEN 1 ELSE 0 END
                        AS INTEGER) AS changed,
                   md5(nfc_normalize(raw)) AS nfc_md5
            FROM s
            ORDER BY doc_id
        """,
        # out-of-order merge: history from event_id % 7 != 3, the rest
        # arrives late; affected keys rebuild from retained change
        # points ∪ batch (scd2_rebuild_keys). The twin replays the same
        # window algebra: boundary events (src 0, NULL event_id, state
        # tiebreak) union late events, change-flag + lead() close.
        "scd2_rebuild_late_events": """
            WITH inorder AS (
                SELECT * FROM events WHERE event_id % 7 <> 3
            ),
            late AS (
                SELECT user_id, event_type, ts, event_id
                FROM events WHERE event_id % 7 = 3
            ),
            flag AS (
                SELECT user_id, event_type, ts, event_id,
                       CASE WHEN lag(event_type) OVER w IS NULL
                                 OR lag(event_type) OVER w <> event_type
                            THEN 1 ELSE 0 END AS chg
                FROM inorder
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            affected AS (SELECT DISTINCT user_id FROM late),
            uni AS (
                SELECT user_id, event_type, ts, 0 AS src,
                       CAST(NULL AS BIGINT) AS event_id,
                       event_type AS st
                FROM flag
                WHERE chg = 1
                  AND user_id IN (SELECT user_id FROM affected)
                UNION ALL
                SELECT user_id, event_type, ts, 1 AS src, event_id,
                       event_type AS st
                FROM late
            ),
            flag2 AS (
                SELECT user_id, event_type, ts, src, event_id, st,
                       CASE WHEN lag(event_type) OVER w2 IS NULL
                                 OR lag(event_type) OVER w2 <> event_type
                            THEN 1 ELSE 0 END AS chg
                FROM uni
                WINDOW w2 AS (PARTITION BY user_id
                              ORDER BY ts, src, event_id NULLS FIRST, st)
            ),
            iv AS (
                SELECT user_id, event_type, ts AS valid_from,
                       lead(ts) OVER w3 AS valid_to
                FROM flag2 WHERE chg = 1
                WINDOW w3 AS (PARTITION BY user_id
                              ORDER BY ts, src, event_id NULLS FIRST, st)
            ),
            untouched AS (
                SELECT user_id, event_type, ts AS valid_from,
                       lead(ts) OVER w4 AS valid_to
                FROM flag
                WHERE chg = 1
                  AND user_id NOT IN (SELECT user_id FROM affected)
                WINDOW w4 AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            allv AS (
                SELECT * FROM iv UNION ALL SELECT * FROM untouched
            )
            SELECT user_id, event_type,
                   strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f')
                       AS valid_from,
                   COALESCE(strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f'), '')
                       AS valid_to,
                   CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END
                        AS INTEGER) AS is_current
            FROM allv
            ORDER BY user_id, valid_from
        """,
        # merge ≡ rebuild: the oracle is the FULL-history SCD2 twin;
        # Spark builds history below the temporal midpoint and merges
        # the rest as a change batch (scd2_apply_changes)
        "scd2_apply_changes_events": """
            WITH flagged AS (
                SELECT user_id, event_type, ts AS valid_from, event_id,
                       CASE WHEN lag(event_type) OVER w IS NULL
                                 OR lag(event_type) OVER w <> event_type
                            THEN 1 ELSE 0 END AS chg
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            changes AS (
                SELECT user_id, event_type, valid_from, event_id
                FROM flagged WHERE chg = 1
            ),
            iv AS (
                SELECT user_id, event_type, valid_from,
                       lead(valid_from) OVER w2 AS valid_to
                FROM changes
                WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
            )
            SELECT user_id, event_type,
                   strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
                   COALESCE(strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f'), '')
                       AS valid_to,
                   CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INTEGER)
                       AS is_current
            FROM iv
            ORDER BY user_id, valid_from
        """,
        "ext_embedding_dim_stats": """
            WITH ex AS (
                SELECT CAST(unnest(range(0, len(v))) AS INT) AS dim,
                       unnest(v) AS x
                FROM (SELECT CAST(embedding AS DOUBLE[]) AS v
                      FROM embeddings)
            )
            SELECT dim,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT)
                       AS sum_x_micro,
                   CAST(SUM(CAST(floor(x * x * 1000000000) AS BIGINT)) AS BIGINT)
                       AS sum_x2_nano,
                   CAST(MIN(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT)
                       AS min_x_micro,
                   CAST(MAX(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT)
                       AS max_x_micro
            FROM ex
            GROUP BY dim
            ORDER BY dim
        """,
        "ext_dedup_survivor_quality": f"""
            WITH scored AS (
                SELECT doc_id, source,
                       md5(array_to_string(
                           list_sort(list_distinct({_WORDS.format(c='lower(text)')})),
                           chr(31))) AS grp,
                       CAST(floor((
                           0.4e0 * least(CAST(n_words AS DOUBLE) / 100.0e0, 1.0e0)
                           + 0.4e0 * least(sw_ratio * 5.0e0, 1.0e0)
                           + 0.2e0 * (1.0e0 - least(p_ratio * 10.0e0, 1.0e0))
                       ) * 1000000) AS BIGINT) AS q_micro
                FROM (
                    SELECT doc_id, source, text,
                           {_N_WORDS.format(c='text')} AS n_words,
                           CASE WHEN {_N_WORDS.format(c='text')} > 0 THEN
                               CAST(len(list_filter(string_split_regex(regexp_replace(lower(text), '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+'),
                                        w -> w IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
                               / {_N_WORDS.format(c='text')}
                           ELSE 0.0e0 END AS sw_ratio,
                           CASE WHEN length(text) > 0 THEN
                               CAST(length(text) - length(regexp_replace(text, '[^\\w \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
                               / length(text)
                           ELSE 0.0e0 END AS p_ratio
                    FROM documents
                )
            ),
            ranked AS (
                SELECT grp, doc_id, source, q_micro,
                       COUNT(*) OVER (PARTITION BY grp) AS n_dups,
                       ROW_NUMBER() OVER (
                           PARTITION BY grp ORDER BY q_micro DESC, doc_id
                       ) AS rk
                FROM scored
            )
            SELECT grp,
                   doc_id AS survivor_doc_id,
                   source AS survivor_source,
                   q_micro AS survivor_q_micro,
                   CAST(n_dups AS BIGINT) AS n_dups
            FROM ranked
            WHERE n_dups >= 2 AND rk = 1
            ORDER BY grp
        """,
        "ext_source_ngram_novelty": f"""
            WITH base AS (
                SELECT source, {_WORDS.format(c='text')} AS w FROM documents
            ),
            sh AS (
                SELECT DISTINCT source, sh
                FROM (SELECT source, unnest({_SHINGLES_SQL}) AS sh FROM base)
            ),
            counted AS (
                SELECT source, sh,
                       COUNT(*) OVER (PARTITION BY sh) AS n_src
                FROM sh
            )
            SELECT source,
                   COUNT(*) AS n_shingles,
                   CAST(SUM(CASE WHEN n_src = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_exclusive,
                   (1000000 * CAST(SUM(CASE WHEN n_src = 1 THEN 1 ELSE 0 END) AS BIGINT))
                       // COUNT(*) AS exclusivity_micro
            FROM counted
            GROUP BY source
            ORDER BY source
        """,
        "fact_dim_join": """
            SELECT c_custkey, c_name, n_name AS nation, r_name AS region, c_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            ORDER BY c_custkey
        """,
        "join_filter_by_key": """
            SELECT c_custkey, c_name, n_name AS nation, c_mktsegment
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            ORDER BY c_custkey
        """,
        "groupby_count_avg": """
            SELECT nation, total_personas,
                   ((2 * p * 1 + cnt) // (2 * cnt)) / 100.0 AS acctbal_promedio
            FROM (
                SELECT n_name AS nation,
                       COUNT(*) AS total_personas,
                       CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(28,2)) * 100 AS BIGINT)) AS BIGINT) AS p,
                       COUNT(c_acctbal) AS cnt
                FROM customer JOIN nation ON c_nationkey = n_nationkey
                GROUP BY n_name
            )
            ORDER BY total_personas DESC, nation
        """,
        "filter_projection": """
            SELECT l_orderkey, l_linenumber, l_quantity, l_discount
            FROM lineitem
            WHERE l_quantity >= 25 AND l_discount > 0.02
            ORDER BY l_orderkey, l_linenumber
        """,
        "distinct_dim": """
            SELECT DISTINCT c_nationkey, c_mktsegment
            FROM customer
            ORDER BY c_nationkey, c_mktsegment
        """,
        "anti_join_new_rows": """
            SELECT c_custkey, c_name, c_mktsegment
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey
        """,
        "semi_join_existing": """
            SELECT c_custkey, c_name
            FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey
        """,
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   sum_qty, sum_base_price, sum_disc_price, sum_charge,
                   ((2 * pq * 100 + cnt) // (2 * cnt)) / 10000.0 AS avg_qty,
                   ((2 * pe * 100 + cnt) // (2 * cnt)) / 10000.0 AS avg_price,
                   ((2 * pd * 1 + cnt) // (2 * cnt)) / 10000.0 AS avg_disc,
                   count_order
            FROM (
                -- 10^-k-unit BIGINT per-row money math (the Spark side's
                -- _units quantization); charge summed as an exact hi/lo
                -- BIGINT pair and recombined losslessly in DECIMAL(38)
                SELECT l_returnflag, l_linestatus,
                       CAST(SUM(q2) AS DOUBLE) / 100.0 AS sum_qty,
                       CAST(SUM(e2) AS DOUBLE) / 100.0 AS sum_base_price,
                       CAST(SUM(r4) AS DOUBLE) / 10000.0 AS sum_disc_price,
                       CAST(CAST(CAST(SUM(c6 // 1000000) AS BIGINT) AS DECIMAL(30,0))
                            * CAST(1000000 AS DECIMAL(7,0))
                            + CAST(SUM(c6 % 1000000) AS BIGINT) AS DOUBLE) / 1000000.0
                           AS sum_charge,
                       SUM(q2) AS pq,
                       SUM(e2) AS pe,
                       SUM(CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)) AS pd,
                       COUNT(l_quantity) AS cnt,
                       COUNT(*) AS count_order
                FROM (
                    SELECT l_returnflag, l_linestatus, l_quantity,
                           CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q2,
                           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS e2,
                           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS r4,
                           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                           * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)) AS c6,
                           l_discount
                    FROM lineitem
                    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
                )
                GROUP BY l_returnflag, l_linestatus
            )
            ORDER BY l_returnflag, l_linestatus
        """,
        "agg_minmax_distinct": """
            SELECT o_orderpriority,
                   MIN(o_totalprice) AS min_price,
                   MAX(o_totalprice) AS max_price,
                   COUNT(DISTINCT o_custkey) AS n_customers,
                   COUNT(*) AS n_orders
            FROM orders
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "topk_per_group": """
            SELECT c_nationkey, c_custkey, c_acctbal, rk
            FROM (
                SELECT c_nationkey, c_custkey, c_acctbal,
                       ROW_NUMBER() OVER (
                           PARTITION BY c_nationkey
                           ORDER BY c_acctbal DESC, c_custkey ASC
                       ) AS rk
                FROM customer
            )
            WHERE rk <= 3
            ORDER BY c_nationkey, rk
        """,
        "case_cascade_classify": """
            SELECT motivo, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
            FROM (
                SELECT CASE
                         WHEN value IS NULL THEN 'Valor None en campo requerido'
                         WHEN value < 10.0 THEN 'value < 10'
                         WHEN event_type = 'error' THEN 'tipo error'
                         ELSE 'ok'
                       END AS motivo,
                       value
                FROM events
            )
            GROUP BY motivo
            ORDER BY motivo
        """,
        "strict_cast_json": """
            SELECT event_type,
                   COUNT(k) AS n_castable,
                   COUNT(*) - COUNT(k) AS n_reject,
                   CAST(SUM(k) AS BIGINT) AS sum_k
            FROM (
                SELECT event_type,
                       CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$')
                            THEN CAST(trim(json_extract_string(props, '$.k')) AS BIGINT)
                       END AS k
                FROM events
            )
            GROUP BY event_type
            ORDER BY event_type
        """,
        "normalize_names": """
            SELECT p_partkey,
                   upper(t[1]) || t[2:] AS name_capitalize,
                   array_to_string(
                       list_transform(string_split(t, ' '),
                                      w -> upper(w[1]) || w[2:]),
                       ' ') AS name_title
            FROM (SELECT p_partkey, lower(trim(p_name)) AS t FROM part)
            ORDER BY p_partkey
        """,
        "hourly_event_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
            FROM events
            GROUP BY 1, 2
            ORDER BY hour, event_type
        """,
        "set_except_users": """
            SELECT user_id FROM events WHERE event_type = 'view'
            EXCEPT
            SELECT user_id FROM events WHERE event_type = 'purchase'
            ORDER BY user_id
        """,
        "rollup_region_nation": """
            SELECT r_name AS region, n_name AS nation, COUNT(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
            ORDER BY region NULLS FIRST, nation NULLS FIRST
        """,
        "inline_cascade_annotated": """
            WITH raw(nombre, edad, ciudad) AS (
                VALUES ('  guillermo ', '26', 'san luis'),
                       ('NOEMI', '52', 'SAN LUIS'),
                       ('Naomi ', '23', ' san juan'),
                       ('Pedro', 'error', 'Querétaro'),
                       ('ana maría', '31', 'san luis potosí'),
                       (NULL, '40', 'Lima'),
                       ('Luis', '26 ', 'Bogotá'),
                       ('Eva', '26.5', 'Quito')
            ),
            norm AS (
                SELECT nombre, edad, ciudad,
                       lower(trim(nombre)) AS tn,
                       lower(trim(ciudad)) AS tc,
                       CASE WHEN regexp_matches(trim(edad), '^[+-]?[0-9]+$')
                            THEN CAST(trim(edad) AS INTEGER) END AS edad_i
                FROM raw
            )
            SELECT COALESCE(nombre, '') AS nombre,
                   COALESCE(edad, '') AS edad,
                   COALESCE(ciudad, '') AS ciudad,
                   CASE
                     WHEN nombre IS NULL OR edad IS NULL OR ciudad IS NULL
                       THEN 'Valor None en campo requerido'
                     WHEN edad_i IS NULL THEN 'Edad no convertible a int'
                     WHEN edad_i < 25 THEN 'Edad < 25'
                     ELSE 'OK'
                   END AS motivo,
                   COALESCE(upper(tn[1]) || tn[2:], '') AS nombre_norm,
                   COALESCE(array_to_string(
                       list_transform(string_split(tc, ' '),
                                      w -> upper(w[1]) || w[2:]), ' '), '')
                       AS ciudad_norm,
                   COALESCE(CAST(edad_i AS VARCHAR), '') AS edad_int
            FROM norm
        """,
        "cube_status_priority": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS value
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        # ------------------------------------------------------------------
        # extended SQL surface oracles
        # ------------------------------------------------------------------
        "string_funcs": """
            SELECT p_partkey,
                   concat_ws('-', p_brand, upper(p_type)) AS brand_type,
                   substring(p_name, 1, 5) AS name5,
                   regexp_replace(p_name, 'gear', 'cog', 'g') AS renamed,
                   lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
                   length(p_name) AS name_len
            FROM part
            WHERE p_name LIKE '%gear%'
            ORDER BY p_partkey
        """,
        "date_parts_agg": """
            SELECT EXTRACT(year FROM o_orderdate) AS yr,
                   EXTRACT(month FROM o_orderdate) AS mo,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_value
            FROM orders
            GROUP BY 1, 2
            ORDER BY yr, mo
        """,
        "sql_exists_subquery": """
            SELECT c.c_custkey, c.c_name,
                   (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
                       AS n_orders
            FROM customer c
            WHERE EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
            )
            ORDER BY c.c_custkey
        """,
        "percentiles_by_group": """
            SELECT o_orderpriority,
                   ROUND(q[1], 4) AS p25,
                   ROUND(q[2], 4) AS p50,
                   ROUND(q[3], 4) AS p75
            FROM (
                SELECT o_orderpriority,
                       quantile_cont(CAST(o_totalprice AS DOUBLE),
                                     [0.25, 0.5, 0.75]) AS q
                FROM orders
                GROUP BY o_orderpriority
            )
            ORDER BY o_orderpriority
        """,
        "pivot_event_types": """
            SELECT dayofweek(ts) + 1 AS dow,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
            FROM events
            GROUP BY 1
            ORDER BY dow
        """,
        "union_all_tagged": """
            SELECT c_custkey, 'high' AS tier FROM customer WHERE c_acctbal >= 9000
            UNION ALL
            SELECT c_custkey, 'low' AS tier FROM customer WHERE c_acctbal < 1000
            ORDER BY c_custkey, tier
        """,
        "having_filter": """
            SELECT l_suppkey, COUNT(*) AS n_items,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS qty
            FROM lineitem
            GROUP BY l_suppkey
            HAVING COUNT(*) > 100
            ORDER BY l_suppkey
        """,
        "sessionize_events": """
            WITH gapped AS (
                SELECT user_id, ts, event_id,
                       CAST(floor(epoch(ts)) AS BIGINT)
                       - lag(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER w AS gap_s
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END
                           AS new_session
                FROM gapped
            ),
            sessioned AS (
                SELECT user_id,
                       SUM(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS session_id
                FROM flagged
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   COUNT(*) AS n_events
            FROM sessioned
            GROUP BY user_id, session_id
            ORDER BY user_id, session_id
        """,
        "top_orders_limit": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 25
        """,
        "null_handling_outer_join": """
            SELECT c_custkey,
                   COALESCE(n, 0) AS n_orders,
                   CAST(n IS NULL AS INT) AS has_no_orders
            FROM customer
            LEFT JOIN (
                SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
            ) ON c_custkey = o_custkey
            ORDER BY c_custkey
        """,
        "skew_salted_agg": """
            SELECT l_returnflag,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
                   COUNT(l_quantity) AS count_qty
            FROM lineitem
            GROUP BY l_returnflag
        """,
        "asof_purchase_click": """
            WITH purchases AS (
                SELECT user_id, event_id AS purchase_id,
                       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
                FROM events WHERE event_type = 'purchase'
            ),
            clicks AS (
                SELECT user_id, MAX(event_id) AS click_id, epoch_s
                FROM (SELECT user_id, event_id,
                             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
                      FROM events WHERE event_type = 'click')
                GROUP BY user_id, epoch_s
            )
            SELECT p.user_id, p.purchase_id, c.click_id,
                   p.epoch_s - c.epoch_s AS gap_s
            FROM purchases p
            ASOF LEFT JOIN clicks c
              ON p.user_id = c.user_id AND p.epoch_s >= c.epoch_s
        """,
        "range_join_errors": """
            SELECT a.user_id AS user_id, a.event_id AS id_a, b.event_id AS id_b,
                   CAST(floor(epoch(b.ts)) AS BIGINT)
                   - CAST(floor(epoch(a.ts)) AS BIGINT) AS gap_s
            FROM (SELECT * FROM events WHERE event_type = 'error') a
            JOIN (SELECT * FROM events WHERE event_type = 'error') b
              ON a.user_id = b.user_id
             AND floor(epoch(b.ts)) > floor(epoch(a.ts))
             AND floor(epoch(b.ts)) - floor(epoch(a.ts)) <= 1800
        """,
        "multires_rollup": """
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
                   COUNT(*) AS n_events,
                   CAST(SUM(CAST(CAST(value AS DECIMAL(28,2)) * 100 AS BIGINT)) AS DOUBLE)
                       / 100.0 AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "ext_langid_char_ngrams": f"""
            SELECT lang_detected,
                   COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN lang = lang_detected THEN 1 ELSE 0 END) AS BIGINT) AS n_label_agree
            FROM (
                SELECT doc_id, lang, {_langid_char_sql('text')} AS lang_detected
                FROM documents
            )
            GROUP BY lang_detected
        """,
        "ext_pii_scan": """
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_emails) AS BIGINT) AS total_emails,
                   CAST(SUM(n_urls) AS BIGINT) AS total_urls,
                   CAST(SUM(n_digit_runs) AS BIGINT) AS total_digit_runs,
                   CAST(SUM(CASE WHEN n_emails + n_urls + n_digit_runs > 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged_docs
            FROM (
                SELECT doc_id, source,
                       len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS n_emails,
                       len(regexp_extract_all(text, 'https?://[^ \\t\\n\\x0B\\f\\r]+')) AS n_urls,
                       len(regexp_extract_all(text, '[0-9]{6,}')) AS n_digit_runs
                FROM documents
            )
            GROUP BY source
        """,
        "ext_stratified_split": """
            SELECT lang,
                   CASE WHEN h < 80 THEN 'train'
                        WHEN h < 90 THEN 'val'
                        ELSE 'test' END AS split,
                   COUNT(*) AS n_docs
            FROM (
                SELECT lang, (doc_id * 2654435761) % 4294967296 % 100 AS h
                FROM documents
            )
            GROUP BY 1, 2
        """,
        # the Spark side builds BMP/PPM/WAV bytes from text and parses them
        # back with the real stdlib decoders; the oracle predicts the decoded
        # metadata from octet_length(text) alone — a hash match proves the
        # binary round trip (plans/ext.py:ext_multimodal_decode)
        "ext_multimodal_decode": """
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
                   CASE WHEN doc_id % 5 = 3 THEN NULL
                        WHEN doc_id % 4 = 0 THEN 'bmp'
                        WHEN doc_id % 8 = 2 THEN 'png'
                        WHEN doc_id % 16 = 6 THEN 'jpeg'
                        WHEN doc_id % 2 = 0 THEN 'ppm'
                        ELSE 'wav' END AS format,
                   CASE WHEN doc_id % 5 <> 3 AND doc_id % 2 = 0
                        THEN CAST(16 AS INTEGER) END AS width,
                   CASE WHEN doc_id % 5 <> 3 AND doc_id % 2 = 0
                        THEN CAST(GREATEST(1, LEAST(nb, 768) // 48) AS INTEGER)
                        END AS height,
                   CASE WHEN doc_id % 5 <> 3 AND doc_id % 2 = 1
                        THEN CAST(8000 AS INTEGER) END AS sample_rate,
                   CASE WHEN doc_id % 5 <> 3 AND doc_id % 2 = 1
                        THEN CAST(1 AS INTEGER) END AS channels,
                   CASE WHEN doc_id % 5 <> 3 AND doc_id % 2 = 1
                        THEN CAST(LEAST(nb, 4000) // 8 AS BIGINT) END AS duration_ms,
                   doc_id % 5 <> 3 AS decode_ok
            FROM (SELECT doc_id, octet_length(encode(text)) AS nb FROM documents)
        """,
        # the full curation cascade replayed in SQL: langid CASE, quality
        # formula, sha256 keeper window, multiplicative-hash split — all
        # shared fragments with their standalone oracles above
        "ext_curation_funnel": f"""
            SELECT stage, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
            FROM (
                SELECT CASE
                           WHEN lang_detected = 'und' THEN 'reject_lang'
                           WHEN quality < 0.5e0 THEN 'reject_quality'
                           WHEN doc_id <> keeper_id THEN 'reject_duplicate'
                           ELSE 'kept_' || split END AS stage,
                       n_chars
                FROM (
                    SELECT doc_id, n_chars,
                           {_langid_sql('text')} AS lang_detected,
                           ROUND(
                               0.4e0 * least(CAST(n_words AS DOUBLE) / 100.0e0, 1.0e0)
                               + 0.4e0 * least(sw_ratio * 5.0e0, 1.0e0)
                               + 0.2e0 * (1.0e0 - least(p_ratio * 10.0e0, 1.0e0)), 6)
                               AS quality,
                           MIN(doc_id) OVER (PARTITION BY sha256(text)) AS keeper_id,
                           CASE WHEN h < 80 THEN 'train'
                                WHEN h < 90 THEN 'val'
                                ELSE 'test' END AS split
                    FROM (
                        SELECT doc_id, text, n_chars,
                               (doc_id * 2654435761) % 4294967296 % 100 AS h,
                               {_N_WORDS.format(c='text')} AS n_words,
                               CASE WHEN {_N_WORDS.format(c='text')} > 0 THEN
                                   CAST(len(list_filter(string_split_regex(regexp_replace(lower(text), '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+'),
                                            w -> w IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
                                   / {_N_WORDS.format(c='text')}
                               ELSE 0.0e0 END AS sw_ratio,
                               CASE WHEN length(text) > 0 THEN
                                   CAST(length(text) - length(regexp_replace(text, '[^\\w \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
                                   / length(text)
                               ELSE 0.0e0 END AS p_ratio
                        FROM documents
                    )
                )
            )
            GROUP BY stage
        """,
        "supplier_profit_by_nation": """
            SELECT n_name AS nation,
                   CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS ship_year,
                   CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                            * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                        AS DOUBLE) / 10000.0 AS revenue,
                   COUNT(*) AS n_items,
                   CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                        AS DOUBLE) / 100.0 AS sum_qty
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1, 2
        """,
        "window_moving_avg": """
            SELECT o_orderkey, o_custkey, o_totalprice,
                   ((2 * p * 1 + cnt) // (2 * cnt)) / 100.0 AS mov_avg_totalprice
            FROM (
                SELECT o_orderkey, o_custkey, o_totalprice,
                       SUM(CAST(CAST(o_totalprice AS DECIMAL(28,2)) * 100 AS BIGINT))
                           OVER w AS p,
                       COUNT(*) OVER w AS cnt
                FROM orders
                WINDOW w AS (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            )
        """,
        "lag_gap_analysis": """
            SELECT o_custkey, n_orders, sum_gap_days,
                   CASE WHEN n_gaps > 0
                        THEN ((2 * sum_gap_days * 100 + n_gaps) // (2 * n_gaps))
                             / 100.0 END AS avg_gap_days
            FROM (
                SELECT o_custkey, COUNT(*) AS n_orders,
                       CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS sum_gap_days,
                       COUNT(gap) AS n_gaps
                FROM (
                    SELECT o_custkey,
                           date_diff('day',
                               LAG(o_orderdate) OVER (
                                   PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
                               o_orderdate) AS gap
                    FROM orders
                )
                GROUP BY o_custkey
            )
        """,
        "string_agg_nations": """
            SELECT r_name AS region,
                   string_agg(n_name, ',' ORDER BY n_name) AS nations,
                   COUNT(*) AS n_nations
            FROM nation JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1
        """,
        "grouping_sets_status_year": """
            SELECT o_orderstatus, order_year,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
                       AS total_value
            FROM (
                SELECT o_orderstatus,
                       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
                       o_totalprice
                FROM orders
            )
            GROUP BY GROUPING SETS ((o_orderstatus, order_year), (order_year), ())
        """,
        # ------------------------------------------------------------------
        # EXT oracles
        # ------------------------------------------------------------------
        "ext_exact_dedup": """
            SELECT sha256(text) AS content_hash,
                   MIN(doc_id) AS keeper_id,
                   COUNT(*) AS n_copies
            FROM documents
            GROUP BY sha256(text)
            ORDER BY keeper_id
        """,
        "ext_normalized_dedup": f"""
            SELECT MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
            FROM (
                SELECT doc_id,
                       array_to_string({_WORDS.format(c='text')}, ' ') AS norm
                FROM documents
            )
            GROUP BY norm
            ORDER BY keeper_id
        """,
        "ext_ngram_jaccard_pairs": f"""
            WITH sh AS (
                SELECT doc_id,
                       list_distinct(
                           list_transform(
                               range(1, greatest(len(w) - 2, 1) + 1),
                               i -> array_to_string(w[i:i+2], ' ')
                           )
                       ) AS shingles
                FROM (
                    SELECT doc_id, {_WORDS.format(c='text')} AS w
                    FROM documents WHERE doc_id < 150
                )
            ),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                       / (len(a.shingles) + len(b.shingles)
                          - len(list_intersect(a.shingles, b.shingles))) AS j
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            )
            SELECT id_a, id_b, ROUND(j, 6) AS jaccard
            FROM pairs
            WHERE j >= 0.05
            ORDER BY id_a, id_b
        """,
        "ext_setsim_prefix_join": f"""
            WITH toks AS (
                SELECT DISTINCT doc_id, tok
                FROM (SELECT doc_id, unnest({_WORDS.format(c='text')}) AS tok
                      FROM documents WHERE doc_id < 400)
                WHERE length(tok) > 0
            ),
            sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
            ipairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       CAST(COUNT(*) AS BIGINT) AS inter
                FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT i.id_a, i.id_b,
                   (1000000 * i.inter) // (sa.sz + sb.sz - i.inter)
                       AS jaccard_micro
            FROM ipairs i
            JOIN sizes sa ON sa.doc_id = i.id_a
            JOIN sizes sb ON sb.doc_id = i.id_b
            WHERE (1000000 * i.inter) // (sa.sz + sb.sz - i.inter) >= 500000
            ORDER BY id_a, id_b
        """,
        "ext_minhash_near_dups": f"""
            WITH {_MINHASH_PIPELINE_SQL.format(words=_WORDS.format(c='text'))}
            SELECT id_a, id_b, jaccard_micro
            FROM mh_verified
            WHERE jaccard_micro >= 300000
            ORDER BY id_a, id_b
        """,
        "ext_minhash_dedup_clusters": f"""
            WITH RECURSIVE {_MINHASH_PIPELINE_SQL.format(words=_WORDS.format(c='text'))},
            vpairs AS (
                SELECT id_a, id_b FROM mh_verified WHERE jaccard_micro >= 300000
            ),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM vpairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM vpairs
            ),
            reach(id, root) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
            ),
            comp AS (
                SELECT id AS doc_id, MIN(root) AS cluster_id
                FROM reach GROUP BY id
            ),
            sized AS (
                SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM comp GROUP BY cluster_id
            )
            SELECT cluster_id, cluster_size, cluster_size AS n_members
            FROM sized WHERE cluster_size > 1
            ORDER BY cluster_id
        """,
        "ext_simhash_fingerprints": f"""
            WITH {_SIMHASH_PIPELINE_SQL.format(words=_WORDS.format(c='text'))}
            SELECT doc_id, simhash FROM sim ORDER BY doc_id
        """,
        "ext_simhash_near_dups": f"""
            WITH {_SIMHASH_PIPELINE_SQL.format(words=_WORDS.format(c='text'))},
            keyed AS (
                SELECT doc_id, simhash, blk,
                       (simhash >> CAST(blk * 15 AS INT)) & 32767 AS key
                FROM (SELECT doc_id, simhash, unnest(range(4)) AS blk FROM sim)
            )
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            FROM keyed a JOIN keyed b
              ON a.blk = b.blk AND a.key = b.key AND a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
            ORDER BY id_a, id_b
        """,
        "ext_winnowing_pairs": f"""
            WITH base AS (
                SELECT doc_id, {_WORDS.format(c='text')} AS w FROM documents
            ),
            grams AS (
                SELECT doc_id, unnest(range(greatest(len(w) - 2, 1))) AS pos, w
                FROM base
            ),
            hashed AS (
                SELECT doc_id, pos,
                       {PHASH60_SQL.format(
                           c="array_to_string(w[CAST(pos + 1 AS INT):CAST(pos + 3 AS INT)], ' ')"
                       )} AS h
                FROM grams
            ),
            fps AS (
                SELECT DISTINCT doc_id,
                       MIN(h) OVER (
                           PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
                       ) AS fingerprint
                FROM hashed
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM fps a JOIN fps b
              ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
            HAVING COUNT(*) >= 3
            ORDER BY id_a, id_b
        """,
        "ext_sketch_distinct_rollup": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_exact,
                   CAST(COUNT(DISTINCT date_trunc('day', ts)) AS BIGINT)
                       AS n_sketches_merged,
                   true AS within_5pct
            FROM events
            GROUP BY event_type
            ORDER BY event_type
        """,
        "ext_dedup_clusters": f"""
            WITH RECURSIVE sh AS (
                SELECT doc_id,
                       list_distinct(
                           list_transform(
                               range(1, greatest(len(w) - 2, 1) + 1),
                               i -> array_to_string(w[i:i+2], ' ')
                           )
                       ) AS shingles
                FROM (
                    SELECT doc_id, {_WORDS.format(c='text')} AS w
                    FROM documents WHERE doc_id < 500
                )
            ),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
                WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                      / (len(a.shingles) + len(b.shingles)
                         - len(list_intersect(a.shingles, b.shingles))) >= 0.25
            ),
            edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL
                SELECT id_b AS src, id_a AS dst FROM pairs
            ),
            reach(id, root) AS (
                SELECT doc_id, doc_id FROM documents WHERE doc_id < 500
                UNION
                SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
            ),
            comp AS (
                SELECT id AS doc_id, MIN(root) AS cluster_id
                FROM reach GROUP BY id
            )
            SELECT doc_id, cluster_id,
                   COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
            FROM comp
            ORDER BY doc_id
        """,
        "ext_repetition_filter": f"""
            WITH base AS (
                SELECT doc_id,
                       {_N_WORDS.format(c='text')} AS n_words,
                       {_WORDS.format(c='text')} AS w
                FROM documents
            ),
            metrics AS (
                SELECT doc_id, n_words,
                       CASE WHEN n_words > 0
                            THEN 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w)
                            ELSE 0.0 END AS dup_word_frac,
                       1.0 - CAST(len(list_distinct(
                               list_transform(
                                   range(1, greatest(len(w) - 2, 1) + 1),
                                   i -> array_to_string(w[i:i+2], ' ')
                               ))) AS DOUBLE)
                           / len(list_transform(
                                   range(1, greatest(len(w) - 2, 1) + 1),
                                   i -> array_to_string(w[i:i+2], ' ')
                             )) AS dup_3gram_frac
                FROM base
            ),
            top AS (
                SELECT doc_id, MAX(cnt) AS top_word_cnt
                FROM (
                    SELECT doc_id, wrd, COUNT(*) AS cnt
                    FROM (SELECT doc_id, unnest(w) AS wrd FROM base)
                    GROUP BY doc_id, wrd
                )
                GROUP BY doc_id
            )
            SELECT m.doc_id, m.n_words, m.dup_word_frac, m.dup_3gram_frac,
                   CASE WHEN m.n_words > 0
                        THEN CAST(COALESCE(t.top_word_cnt, 0) AS DOUBLE) / m.n_words
                        ELSE 0.0 END AS top_word_frac,
                   (m.dup_3gram_frac <= 0.9 AND
                    CASE WHEN m.n_words > 0
                         THEN CAST(COALESCE(t.top_word_cnt, 0) AS DOUBLE) / m.n_words
                         ELSE 0.0 END <= 0.2) AS keep
            FROM metrics m LEFT JOIN top t ON m.doc_id = t.doc_id
            ORDER BY m.doc_id
        """,
        "ext_contamination_scan": f"""
            WITH sh AS (
                SELECT doc_id,
                       list_distinct(
                           list_transform(
                               range(1, greatest(len(w) - 4, 1) + 1),
                               i -> array_to_string(w[i:i+4], ' ')
                           )
                       ) AS shingles
                FROM (SELECT doc_id, {_WORDS.format(c='text')} AS w FROM documents)
            ),
            bench AS (
                SELECT DISTINCT unnest(shingles) AS shingle
                FROM sh WHERE doc_id % 50 = 0
            ),
            hits AS (
                SELECT e.doc_id, COUNT(*) AS n_contaminated
                FROM (SELECT doc_id, unnest(shingles) AS shingle
                      FROM sh WHERE doc_id % 50 <> 0) e
                JOIN bench b ON e.shingle = b.shingle
                GROUP BY e.doc_id
            )
            SELECT s.doc_id,
                   len(s.shingles) AS n_shingles,
                   COALESCE(h.n_contaminated, 0) AS n_contaminated,
                   CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE)
                       / len(s.shingles) AS contaminated_frac
            FROM sh s LEFT JOIN hits h ON s.doc_id = h.doc_id
            WHERE s.doc_id % 50 <> 0 AND COALESCE(h.n_contaminated, 0) > 0
            ORDER BY s.doc_id
        """,
        "ext_tfidf_top_terms": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_WORDS.format(c='lower(text)')}) AS term
                FROM documents
            ),
            tf AS (
                SELECT doc_id, term, COUNT(*) AS tf
                FROM toks GROUP BY doc_id, term
            ),
            df AS (
                SELECT term, COUNT(*) AS df FROM tf GROUP BY term
            ),
            scored AS (
                SELECT tf.doc_id, tf.term, tf.tf, df.df,
                       CAST(tf.tf AS DOUBLE) / df.df AS score,
                       ROW_NUMBER() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term
                       ) AS rank
                FROM tf JOIN df ON tf.term = df.term
            )
            SELECT doc_id, rank, term, tf, df, score
            FROM scored WHERE rank <= 3
            ORDER BY doc_id, rank
        """,
        "ext_cosine_topk": """
            WITH q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id = 0
            ),
            scored AS (
                SELECT vec_id,
                       ROUND(
                           list_reduce(list_transform(range(1, len(v)+1),
                                                      i -> v[i] * qv[i]),
                                       (x, y) -> x + y)
                           / (sqrt(list_reduce(list_transform(range(1, len(v)+1),
                                                              i -> v[i] * v[i]),
                                               (x, y) -> x + y))
                              * sqrt(list_reduce(list_transform(range(1, len(qv)+1),
                                                                i -> qv[i] * qv[i]),
                                                 (x, y) -> x + y))), 6) AS cos_sim
                FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                      FROM embeddings WHERE vec_id != 0), q
            )
            SELECT vec_id, cos_sim FROM scored
            ORDER BY cos_sim DESC, vec_id
            LIMIT 20
        """,
        "ext_cosine_pairs_sample": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 100
            ),
            pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       ROUND(
                           list_reduce(list_transform(range(1, len(a.v)+1),
                                                      i -> a.v[i] * b.v[i]),
                                       (x, y) -> x + y)
                           / (sqrt(list_reduce(list_transform(range(1, len(a.v)+1),
                                                              i -> a.v[i] * a.v[i]),
                                               (x, y) -> x + y))
                              * sqrt(list_reduce(list_transform(range(1, len(b.v)+1),
                                                                i -> b.v[i] * b.v[i]),
                                                 (x, y) -> x + y))), 6) AS cos_sim
                FROM e a JOIN e b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, cos_sim FROM pairs
            WHERE cos_sim >= 0.5
            ORDER BY id_a, id_b
        """,
        "ext_embedding_pooling": """
            WITH comp AS (
                SELECT label,
                       unnest(range(1, len(v)+1)) AS pos,
                       unnest(v) AS x
                FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v
                      FROM embeddings)
            )
            SELECT label,
                   CAST(pos - 1 AS INT) AS dim,
                   CAST(SUM(floor(x * 1000000)) AS BIGINT) AS sum_micro,
                   CAST(COUNT(*) AS BIGINT) AS n_vectors
            FROM comp
            GROUP BY label, pos
            ORDER BY label, dim
        """,
        "mad_outlier_scan": """
            WITH hist AS (
                SELECT l_returnflag,
                       CAST(floor(l_extendedprice * 100) AS BIGINT) AS c,
                       COUNT(*) AS cnt
                FROM lineitem GROUP BY l_returnflag, c
            ),
            cum AS (
                SELECT l_returnflag, c, cnt,
                       SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY c)
                           AS cum,
                       SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
                FROM hist
            ),
            med AS (
                SELECT l_returnflag,
                       MIN(CASE WHEN cum >= (n + 1) // 2
                                 AND cum - cnt < (n + 1) // 2
                                THEN c END) AS med_c
                FROM cum GROUP BY l_returnflag
            ),
            dhist AS (
                SELECT h.l_returnflag, abs(h.c - m.med_c) AS d,
                       CAST(SUM(h.cnt) AS BIGINT) AS cnt
                FROM hist h JOIN med m ON h.l_returnflag = m.l_returnflag
                GROUP BY h.l_returnflag, abs(h.c - m.med_c)
            ),
            dcum AS (
                SELECT l_returnflag, d, cnt,
                       SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY d)
                           AS cum,
                       SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
                FROM dhist
            ),
            mad AS (
                SELECT l_returnflag,
                       MIN(CASE WHEN cum >= (n + 1) // 2
                                 AND cum - cnt < (n + 1) // 2
                                THEN d END) AS mad_c
                FROM dcum GROUP BY l_returnflag
            )
            SELECT dh.l_returnflag,
                   CAST(SUM(dh.cnt) AS BIGINT) AS n_rows,
                   MAX(m.med_c) / 100.0 AS median_price,
                   MAX(md.mad_c) / 100.0 AS mad,
                   CAST(SUM(CASE WHEN 2 * dh.d > 3 * md.mad_c
                                 THEN dh.cnt ELSE 0 END) AS BIGINT)
                       AS n_outliers
            FROM dhist dh
            JOIN mad md ON dh.l_returnflag = md.l_returnflag
            JOIN med m ON dh.l_returnflag = m.l_returnflag
            GROUP BY dh.l_returnflag
            ORDER BY dh.l_returnflag
        """,
        "impute_group_median": """
            WITH base AS (
                SELECT c_custkey, c_nationkey,
                       CASE WHEN c_custkey % 7 = 0 THEN NULL
                            ELSE c_acctbal END AS bal
                FROM customer
            ),
            ranked AS (
                SELECT c_nationkey, bal,
                       ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                          ORDER BY bal, c_custkey) AS rn,
                       COUNT(*) OVER (PARTITION BY c_nationkey) AS n
                FROM (SELECT c_custkey, c_nationkey, bal
                      FROM base WHERE bal IS NOT NULL)
            ),
            medians AS (
                SELECT c_nationkey, bal AS median_bal
                FROM ranked WHERE rn = (n + 1) // 2
            )
            SELECT b.c_custkey, b.c_nationkey,
                   COALESCE(b.bal, m.median_bal) AS bal_imputed,
                   b.bal IS NULL AS was_imputed
            FROM base b JOIN medians m ON b.c_nationkey = m.c_nationkey
            ORDER BY b.c_custkey
        """,
        "ext_bpe_tokenizer": f"""
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM({_N_WORDS.format(c='text')}) AS BIGINT)
                       AS total_words,
                   true AS merges_complete_ok,
                   true AS bounds_ok,
                   true AS compression_ok
            FROM documents
        """,
        "ext_unigram_tokenizer": f"""
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM({_N_WORDS.format(c='text')}) AS BIGINT)
                       AS total_words,
                   CAST(SUM(length(regexp_replace(text,
                       '[ \\t\\n\\x0B\\f\\r]', '', 'g'))) AS BIGINT)
                       AS total_word_chars,
                   true AS vocab_ok,
                   true AS bounds_ok,
                   true AS compression_ok
            FROM documents
        """,
        "zorder_orders_layout": f"""
            WITH ranked AS (
                SELECT o_orderkey,
                       ROW_NUMBER() OVER (ORDER BY o_custkey, o_orderkey)
                           AS rn_c,
                       ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
                           AS rn_p,
                       COUNT(*) OVER () AS n
                FROM orders
            ),
            scaled AS (
                SELECT o_orderkey,
                       CAST(((rn_c - 1) * 256) // n AS BIGINT) AS r_cust,
                       CAST(((rn_p - 1) * 256) // n AS BIGINT) AS r_price
                FROM ranked
            )
            SELECT o_orderkey, r_cust, r_price,
                   CAST({zvalue_expr(['r_cust', 'r_price'], 8)} AS BIGINT)
                       AS zvalue
            FROM scaled
            ORDER BY o_orderkey
        """,
        "json_props_rollup": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(k) AS BIGINT) AS sum_k,
                   CAST(MIN(k) AS BIGINT) AS min_k,
                   CAST(MAX(k) AS BIGINT) AS max_k,
                   CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
            FROM (SELECT event_type,
                         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                  FROM events)
            GROUP BY event_type
            ORDER BY event_type
        """,
        "forecast_revenue_change": """
            SELECT CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                            * CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                        AS DOUBLE) / 10000.0 AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem
            WHERE year(l_shipdate) = 1996
              AND l_discount >= 0.03 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "volume_shipping_bilateral": """
            SELECT sn.n_name AS supp_nation,
                   cn.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS INT) AS l_year,
                   CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                            * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                        AS DOUBLE) / 10000.0 AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            WHERE sn.n_name IN ('NATION_1', 'NATION_2')
              AND cn.n_name IN ('NATION_1', 'NATION_2')
              AND sn.n_name <> cn.n_name
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3
        """,
        "important_stock_parts": """
            WITH per_part AS (
                SELECT l_partkey,
                       SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                           * CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS v4
                FROM lineitem GROUP BY l_partkey
            ),
            scaled AS (
                SELECT l_partkey, CAST(v4 AS DOUBLE) / 10000.0 AS part_value,
                       v4 AS vi
                FROM per_part
            )
            SELECT l_partkey, part_value
            FROM scaled, (SELECT SUM(vi) AS ti FROM scaled)
            WHERE vi * 2000 > ti
            ORDER BY part_value DESC, l_partkey
        """,
        "customer_order_distribution": """
            WITH per_cust AS (
                SELECT c_custkey,
                       CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
                FROM customer
                LEFT JOIN (SELECT * FROM orders
                           WHERE o_orderpriority <> '4-NOT SPECIFIED') o
                  ON c_custkey = o.o_custkey
                GROUP BY c_custkey
            )
            SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
            FROM per_cust
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "small_quantity_order_revenue": """
            WITH lines AS (
                SELECT l_partkey, l_extendedprice,
                       CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                WHERE p_brand = 'Brand#1'
            ),
            per_part AS (
                SELECT l_partkey AS pk, SUM(qc) AS sq,
                       CAST(COUNT(*) AS BIGINT) AS n
                FROM lines GROUP BY l_partkey
            ),
            qual AS (
                SELECT l_extendedprice
                FROM lines JOIN per_part ON l_partkey = pk
                WHERE 5 * qc * n < sq
            ),
            agg AS (
                SELECT CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS rc,
                       CAST(COUNT(*) AS BIGINT) AS n_lines
                FROM qual
            )
            SELECT CAST(rc AS DOUBLE) / 100.0 AS total_revenue,
                   ((2 * rc * 1000000 + 700) // (2 * 700)) / 1000000.0
                       AS avg_yearly,
                   n_lines
            FROM agg
        """,
        "supplier_part_promotion": """
            WITH heavy AS (
                SELECT DISTINCT l_suppkey
                FROM (
                    SELECT l_suppkey, l_partkey,
                           SUM(CAST(CAST(l_quantity AS DECIMAL(7,2)) * 100
                                    AS BIGINT)) AS sq
                    FROM lineitem
                    JOIN part ON l_partkey = p_partkey
                    WHERE year(l_shipdate) = 1996 AND p_name LIKE 'red%'
                    GROUP BY l_suppkey, l_partkey
                )
                WHERE sq > 3000
            )
            SELECT s_suppkey, s_name
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = 'NATION_3'
              AND s_suppkey IN (SELECT l_suppkey FROM heavy)
            ORDER BY s_suppkey
        """,
        "sole_failing_supplier": """
            WITH per_order AS (
                SELECT l_orderkey,
                       COUNT(DISTINCT l_suppkey) AS ns,
                       COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                           THEN l_suppkey END) AS nf,
                       MAX(CASE WHEN l_returnflag = 'R'
                                THEN l_suppkey END) AS culprit
                FROM lineitem GROUP BY l_orderkey
            )
            SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
            FROM per_order JOIN supplier ON culprit = s_suppkey
            WHERE ns >= 2 AND nf = 1
            GROUP BY s_name
            ORDER BY numwait DESC, s_name
            LIMIT 100
        """,
        "snapshot_diff_orders": """
            WITH v1 AS (
                SELECT o_orderkey, o_totalprice, o_orderstatus
                FROM orders WHERE o_orderkey % 10 <> 3
            ),
            v2 AS (
                SELECT o_orderkey,
                       CASE WHEN o_orderkey % 13 = 0
                            THEN o_totalprice + 1.5
                            ELSE o_totalprice END AS o_totalprice,
                       o_orderstatus
                FROM orders WHERE o_orderkey % 10 <> 7
            ),
            d AS (
                SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
                       CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                            WHEN v2.o_orderkey IS NULL THEN 'removed'
                            WHEN v1.o_totalprice IS NOT DISTINCT FROM v2.o_totalprice
                             AND v1.o_orderstatus IS NOT DISTINCT FROM v2.o_orderstatus
                            THEN 'unchanged'
                            ELSE 'changed' END AS status
                FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
            )
            SELECT o_orderkey, status FROM d
            WHERE status <> 'unchanged'
            ORDER BY o_orderkey
        """,
        "robust_price_stats": """
            WITH hist AS (
                SELECT l_returnflag,
                       CAST(floor(l_extendedprice * 100) AS BIGINT) AS c,
                       COUNT(*) AS cnt
                FROM lineitem GROUP BY l_returnflag, c
            ),
            cum AS (
                SELECT l_returnflag, c, cnt,
                       SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY c)
                           AS cum,
                       SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
                FROM hist
            ),
            cuts AS (
                SELECT l_returnflag,
                       MIN(CASE WHEN cum >= (10000 * n + 999999) // 1000000
                                 AND cum - cnt < (10000 * n + 999999) // 1000000
                                THEN c END) AS p01_c,
                       MIN(CASE WHEN cum >= (990000 * n + 999999) // 1000000
                                 AND cum - cnt < (990000 * n + 999999) // 1000000
                                THEN c END) AS p99_c
                FROM cum GROUP BY l_returnflag
            )
            SELECT h.l_returnflag,
                   CAST(SUM(h.cnt) AS BIGINT) AS n_rows,
                   MAX(k.p01_c) / 100.0 AS p01,
                   MAX(k.p99_c) / 100.0 AS p99,
                   CAST(SUM(h.cnt * greatest(k.p01_c, least(k.p99_c, h.c)))
                        AS BIGINT) AS wsum_cents,
                   CAST(SUM(CASE WHEN h.c < k.p01_c OR h.c > k.p99_c
                                 THEN h.cnt ELSE 0 END) AS BIGINT) AS n_clamped
            FROM hist h JOIN cuts k ON h.l_returnflag = k.l_returnflag
            GROUP BY h.l_returnflag
            ORDER BY h.l_returnflag
        """,
        "ts_gap_fill_interpolate": """
            WITH obs AS (
                SELECT user_id,
                       CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr,
                       CAST(SUM(floor(value * 1000000)) AS BIGINT) AS v_micro
                FROM events WHERE user_id < 40
                GROUP BY 1, 2
            ),
            bounds AS (
                SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1
                FROM obs GROUP BY user_id
            ),
            spine AS (
                SELECT user_id, unnest(range(h0, h1 + 1)) AS hr FROM bounds
            ),
            j AS (
                SELECT s.user_id, s.hr, o.v_micro
                FROM spine s LEFT JOIN obs o USING (user_id, hr)
            ),
            w AS (
                SELECT user_id, hr, v_micro,
                       last_value(v_micro IGNORE NULLS) OVER
                           (PARTITION BY user_id ORDER BY hr
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS pv,
                       last_value(CASE WHEN v_micro IS NOT NULL THEN hr END
                                  IGNORE NULLS) OVER
                           (PARTITION BY user_id ORDER BY hr
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS ph,
                       first_value(v_micro IGNORE NULLS) OVER
                           (PARTITION BY user_id ORDER BY hr
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                           AS nv,
                       first_value(CASE WHEN v_micro IS NOT NULL THEN hr END
                                   IGNORE NULLS) OVER
                           (PARTITION BY user_id ORDER BY hr
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                           AS nh
                FROM j
            )
            SELECT user_id, hr,
                   CAST(COALESCE(
                       v_micro,
                       pv + ((nv - pv) * (hr - ph)) // (nh - ph)
                   ) AS BIGINT) AS v_micro,
                   v_micro IS NULL AS filled
            FROM w
            ORDER BY user_id, hr
        """,
        "ext_semantic_dedup": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 150
            ),
            pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       ROUND(
                           list_reduce(list_transform(range(1, len(a.v)+1),
                                                      i -> a.v[i] * b.v[i]),
                                       (x, y) -> x + y)
                           / (sqrt(list_reduce(list_transform(range(1, len(a.v)+1),
                                                              i -> a.v[i] * a.v[i]),
                                               (x, y) -> x + y))
                              * sqrt(list_reduce(list_transform(range(1, len(b.v)+1),
                                                                i -> b.v[i] * b.v[i]),
                                                 (x, y) -> x + y))), 6) AS cos_sim
                FROM e a JOIN e b ON a.vec_id < b.vec_id
            )
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings)
                       AS n_vectors,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs
                    WHERE cos_sim >= 0.9) AS n_sample_pairs,
                   true AS clusters_ok,
                   true AS containment_ok,
                   true AS cocluster_exhaustive_ok
        """,
        "ext_heavy_hitters": f"""
            WITH toks AS (
                SELECT unnest({_WORDS.format(c='lower(text)')}) AS term
                FROM documents
            ),
            counts AS (
                SELECT term, CAST(COUNT(*) AS BIGINT) AS n_occurrences
                FROM toks GROUP BY term
            ),
            ranked AS (
                SELECT CAST(ROW_NUMBER() OVER (
                           ORDER BY n_occurrences DESC, term
                       ) AS INT) AS rank,
                       term, n_occurrences
                FROM counts
            )
            SELECT rank, term, n_occurrences, true AS mg_guarantee_ok
            FROM ranked WHERE rank <= 20
            ORDER BY rank
        """,
        "ext_kll_quantiles": """
            SELECT event_type,
                   ROUND(q[1], 4) AS p25_exact,
                   ROUND(q[2], 4) AS p50_exact,
                   ROUND(q[3], 4) AS p75_exact,
                   true AS kll_within_rank_tol
            FROM (
                SELECT event_type,
                       quantile_cont(CAST(value AS DOUBLE),
                                     [0.25, 0.5, 0.75]) AS q
                FROM events GROUP BY event_type
            )
            ORDER BY event_type
        """,
        "ext_label_centroid_quality": """
            WITH e AS (
                SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            ),
            expl AS (
                SELECT label, unnest(range(1, len(v)+1)) AS pos, unnest(v) AS x
                FROM e
            ),
            cent AS (
                SELECT label, pos,
                       CAST(SUM(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT) AS c
                FROM expl GROUP BY label, pos
            ),
            cvec AS (
                SELECT label, list(CAST(c AS DOUBLE) ORDER BY pos) AS cv
                FROM cent GROUP BY label
            ),
            scored AS (
                SELECT e.label,
                       list_reduce(list_transform(range(1, len(v)+1),
                                                  i -> v[i] * cv[i]),
                                   (x, y) -> x + y)
                       / (sqrt(list_reduce(list_transform(range(1, len(v)+1),
                                                          i -> v[i] * v[i]),
                                           (x, y) -> x + y))
                          * sqrt(list_reduce(list_transform(range(1, len(cv)+1),
                                                            i -> cv[i] * cv[i]),
                                             (x, y) -> x + y))) AS cos
                FROM e JOIN cvec USING (label)
            )
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
                   CAST(SUM(CAST(floor(cos * 1000000) AS BIGINT)) AS BIGINT)
                       AS sum_cos_micro,
                   ROUND(MIN(cos), 6) AS min_cos
            FROM scored GROUP BY label ORDER BY label
        """,
        # -- ANN recall/containment invariants (VERDICT r2 next-item 7):
        # the LSH/IVF bucketing has no SQL twin, but every non-boolean
        # column below is SQL-exact and the boolean pins the measured
        # recall invariant the Spark side computes against its own
        # brute-force ground truth (see plans/ext.py docstrings).
        "ext_ann_topk_lsh": """
            WITH q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id = 0
            ),
            scored AS (
                SELECT vec_id,
                       ROUND(
                           list_reduce(list_transform(range(1, len(v)+1),
                                                      i -> v[i] * qv[i]),
                                       (x, y) -> x + y)
                           / (sqrt(list_reduce(list_transform(range(1, len(v)+1),
                                                              i -> v[i] * v[i]),
                                               (x, y) -> x + y))
                              * sqrt(list_reduce(list_transform(range(1, len(qv)+1),
                                                                i -> qv[i] * qv[i]),
                                                 (x, y) -> x + y))), 6) AS cos_sim
                FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                      FROM embeddings WHERE vec_id != 0), q
            )
            SELECT (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM embeddings WHERE vec_id != 0) AS n_vectors,
                   true AS recall_ok,
                   true AS quality_ok,
                   vec_id AS best_vec_id,
                   cos_sim AS best_cos_sim
            FROM scored
            ORDER BY cos_sim DESC, vec_id
            LIMIT 1
        """,
        "ext_ivf_topk": """
            WITH q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id = 0
            ),
            scored AS (
                SELECT vec_id,
                       ROUND(
                           list_reduce(list_transform(range(1, len(v)+1),
                                                      i -> v[i] * qv[i]),
                                       (x, y) -> x + y)
                           / (sqrt(list_reduce(list_transform(range(1, len(v)+1),
                                                              i -> v[i] * v[i]),
                                               (x, y) -> x + y))
                              * sqrt(list_reduce(list_transform(range(1, len(qv)+1),
                                                                i -> qv[i] * qv[i]),
                                                 (x, y) -> x + y))), 6) AS cos_sim
                FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                      FROM embeddings WHERE vec_id != 0), q
            )
            SELECT (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM embeddings WHERE vec_id != 0) AS n_vectors,
                   true AS recall_ok,
                   true AS quality_ok,
                   vec_id AS best_vec_id,
                   cos_sim AS best_cos_sim
            FROM scored
            ORDER BY cos_sim DESC, vec_id
            LIMIT 1
        """,
        "ext_ann_knn_join": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
                   CAST(3 AS BIGINT) AS k,
                   true AS recall_ok
            FROM embeddings WHERE vec_id < 100
        """,
        "ext_embedding_near_dups": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings WHERE vec_id < 200
            ),
            pairs AS (
                SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                       ROUND(
                           list_reduce(list_transform(range(1, len(a.v)+1),
                                                      i -> a.v[i] * b.v[i]),
                                       (x, y) -> x + y)
                           / (sqrt(list_reduce(list_transform(range(1, len(a.v)+1),
                                                              i -> a.v[i] * a.v[i]),
                                               (x, y) -> x + y))
                              * sqrt(list_reduce(list_transform(range(1, len(b.v)+1),
                                                                i -> b.v[i] * b.v[i]),
                                                 (x, y) -> x + y))), 6) AS cos_sim
                FROM e a JOIN e b ON a.vec_id < b.vec_id
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs_sample,
                   true AS recall_ok
            FROM pairs WHERE cos_sim >= 0.9
        """,
        "ext_text_stats": f"""
            SELECT doc_id,
                   {_N_WORDS.format(c='text')} AS n_words,
                   length(text) AS n_chars_actual,
                   len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n_tokens,
                   CASE WHEN {_N_WORDS.format(c='text')} > 0 THEN
                       ROUND(CAST(length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) AS DOUBLE)
                             / {_N_WORDS.format(c='text')}, 6)
                   END AS avg_word_len,
                   CASE WHEN length(text) > 0 THEN
                       ROUND(CAST(length(text) - length(regexp_replace(text, '[^\\w \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
                             / length(text), 6)
                   ELSE 0.0 END AS punct_ratio
            FROM documents
            ORDER BY doc_id
        """,
        "ext_langid": f"""
            SELECT lang_detected,
                   COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN lang = lang_detected THEN 1 ELSE 0 END) AS BIGINT) AS n_label_agree
            FROM (
                SELECT doc_id, lang, {_langid_sql('text')} AS lang_detected
                FROM documents
            )
            GROUP BY lang_detected
            ORDER BY lang_detected
        """,
        "ext_quality_scores": f"""
            SELECT doc_id,
                   ROUND(
                       0.4e0 * least(CAST(n_words AS DOUBLE) / 100.0e0, 1.0e0)
                       + 0.4e0 * least(sw_ratio * 5.0e0, 1.0e0)
                       + 0.2e0 * (1.0e0 - least(p_ratio * 10.0e0, 1.0e0)), 6) AS quality
            FROM (
                SELECT doc_id,
                       {_N_WORDS.format(c='text')} AS n_words,
                       CASE WHEN {_N_WORDS.format(c='text')} > 0 THEN
                           CAST(len(list_filter(string_split_regex(regexp_replace(lower(text), '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+'),
                                    w -> w IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
                           / {_N_WORDS.format(c='text')}
                       ELSE 0.0e0 END AS sw_ratio,
                       CASE WHEN length(text) > 0 THEN
                           CAST(length(text) - length(regexp_replace(text, '[^\\w \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
                           / length(text)
                       ELSE 0.0e0 END AS p_ratio
                FROM documents
            )
            ORDER BY doc_id
        """,
        "ext_token_count_by_source": f"""
            SELECT source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}'))) AS BIGINT) AS total_tokens,
                   CAST(SUM({_N_WORDS.format(c='text')}) AS BIGINT) AS total_words,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars
            FROM documents
            GROUP BY source
            ORDER BY source
        """,
        "ext_seq_packing": f"""
            WITH toks AS (
                SELECT source, doc_id,
                       CAST(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS BIGINT) AS n_tokens
                FROM documents
            ),
            cum AS (
                SELECT source, doc_id, n_tokens,
                       COALESCE(SUM(n_tokens) OVER (
                           PARTITION BY source ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS prev_tokens
                FROM toks
            )
            SELECT source,
                   CAST(prev_tokens // 512 AS BIGINT) AS seq_id,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
                   MIN(doc_id) AS first_doc,
                   MAX(doc_id) AS last_doc
            FROM cum
            GROUP BY 1, 2
            ORDER BY source, seq_id
        """,
        "ext_domain_mixture": f"""
            WITH per_src AS (
                SELECT source,
                       COUNT(*) AS n_docs,
                       CAST(SUM(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}'))) AS BIGINT) AS total_tokens
                FROM documents
                GROUP BY source
            ),
            shares AS (
                SELECT source, n_docs, total_tokens,
                       SUM(total_tokens) OVER () AS big,
                       CAST(FLOOR(sqrt(CAST(total_tokens AS DOUBLE)
                                       / SUM(total_tokens) OVER ()) * 1000000000.0) AS BIGINT) AS s9
                FROM per_src
            ),
            normed AS (
                SELECT source, n_docs, total_tokens,
                       ((2 * total_tokens * 1000000 + big) // (2 * big)) / 1000000.0 AS token_share,
                       ((2 * s9 * 1000000 + SUM(s9) OVER ()) // (2 * SUM(s9) OVER ())) / 1000000.0 AS mix_weight
                FROM shares
            )
            SELECT source, n_docs, total_tokens, token_share, mix_weight,
                   ROUND(mix_weight / token_share, 6) AS epochs_at_budget
            FROM normed
            ORDER BY source
        """,
        "recursive_month_spine": """
            WITH RECURSIVE spine(m) AS (
                SELECT min(year(ts) * 12 + month(ts) - 1) FROM events
                UNION ALL
                SELECT m + 1 FROM spine
                WHERE m < (SELECT max(year(ts) * 12 + month(ts) - 1) FROM events)
            ),
            monthly AS (
                SELECT year(ts) * 12 + month(ts) - 1 AS m,
                       COUNT(*) AS n_events
                FROM events GROUP BY 1
            )
            SELECT CAST(s.m AS BIGINT) AS month_index,
                   CAST(s.m // 12 AS BIGINT) AS year,
                   CAST(s.m % 12 + 1 AS BIGINT) AS month,
                   CAST(COALESCE(mo.n_events, 0) AS BIGINT) AS n_events
            FROM spine s LEFT JOIN monthly mo ON s.m = mo.m
            ORDER BY month_index
        """,
        "skew_salted_join": """
            WITH user_dim AS (
                SELECT user_id,
                       CASE WHEN COUNT(*) >= 100 THEN 'heavy' ELSE 'light' END AS user_tier
                FROM events GROUP BY user_id
            )
            SELECT e.event_type, d.user_tier,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(e.value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
            FROM events e JOIN user_dim d ON e.user_id = d.user_id
            GROUP BY 1, 2
            ORDER BY event_type, user_tier
        """,
        "event_funnel_conversion": """
            WITH per_user AS (
                SELECT user_id,
                       MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
                       MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                       MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
                FROM events GROUP BY user_id
            )
            SELECT COUNT(*) AS n_users,
                   CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_view,
                   CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
                                  AND t_purchase > t_view
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_view_purchase
            FROM per_user
        """,
        "cohort_weekly_retention": """
            WITH acts AS (
                SELECT user_id,
                       (epoch_us(ts) // 86400000000) // 7 AS week
                FROM events
            ),
            first AS (
                SELECT user_id, MIN(week) AS cohort_week FROM acts GROUP BY user_id
            )
            SELECT f.cohort_week,
                   a.week - f.cohort_week AS weeks_since,
                   COUNT(DISTINCT a.user_id) AS n_active_users
            FROM acts a JOIN first f ON a.user_id = f.user_id
            GROUP BY 1, 2
            ORDER BY cohort_week, weeks_since
        """,
        "set_intersect_users": """
            SELECT user_id FROM events WHERE event_type = 'view'
            INTERSECT
            SELECT user_id FROM events WHERE event_type = 'purchase'
        """,
        "window_value_zoo": """
            -- pct_rank/cume via the integer micro-unit half-up formula
            -- (total order: percent_rank = (rn-1)/(n-1), cume = rn/n) --
            -- ROUND(double) is not portable across engines
            SELECT event_type, event_id, value,
                   min_value, max_value, second_value,
                   CASE WHEN n > 1
                        THEN CAST(((rn - 1) * 2000000 + (n - 1))
                                  // (2 * (n - 1)) AS DOUBLE) / 1000000.0
                        ELSE 0.0 END AS pct_rank,
                   CAST((rn * 2000000 + n) // (2 * n) AS DOUBLE)
                       / 1000000.0 AS cume,
                   rn
            FROM (
                SELECT event_type, event_id, value,
                       FIRST_VALUE(value) OVER w_full AS min_value,
                       LAST_VALUE(value) OVER w_full AS max_value,
                       NTH_VALUE(value, 2) OVER w_full AS second_value,
                       ROW_NUMBER() OVER w_run AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM events
                WINDOW w_full AS (PARTITION BY event_type ORDER BY value, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
                       w_run AS (PARTITION BY event_type ORDER BY value, event_id)
            )
            WHERE rn <= 5
            ORDER BY event_type, rn
        """,
        "rank_tie_semantics": """
            SELECT o_orderstatus, o_orderpriority, rnk, drnk, COUNT(*) AS n
            FROM (
                SELECT o_orderstatus, o_orderpriority,
                       RANK() OVER (PARTITION BY o_orderstatus
                                    ORDER BY o_orderpriority) AS rnk,
                       DENSE_RANK() OVER (PARTITION BY o_orderstatus
                                          ORDER BY o_orderpriority) AS drnk
                FROM orders
            )
            GROUP BY 1, 2, 3, 4
            ORDER BY o_orderstatus, o_orderpriority
        """,
        "ext_word_rarity_score": f"""
            WITH ex AS (
                SELECT doc_id, word
                FROM (SELECT doc_id, unnest({_WORDS.format(c='lower(text)')}) AS word
                      FROM documents)
                WHERE word <> ''
            ),
            freq AS (
                SELECT word, COUNT(*) AS word_freq FROM ex GROUP BY word
            ),
            agg AS (
                SELECT e.doc_id,
                       COUNT(*) AS n_words,
                       CAST(SUM(f.word_freq) AS BIGINT) AS s
                FROM ex e JOIN freq f ON e.word = f.word
                GROUP BY e.doc_id
            )
            SELECT doc_id, n_words,
                   ((2 * s * 10000 + n_words) // (2 * n_words)) / 10000.0 AS mean_word_freq
            FROM agg
            ORDER BY doc_id
        """,
        "shipping_priority_topn": """
            SELECT l.l_orderkey AS o_orderkey,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
                   o.o_orderpriority,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                            * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND l.l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "local_supplier_volume": """
            SELECT n.n_name AS nation,
                   CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
                   CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                            * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
                        AS DOUBLE) / 10000.0 AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE s.s_nationkey = c.c_nationkey
            GROUP BY 1, 2
            ORDER BY nation, order_year
        """,
        "returned_items_by_customer": """
            SELECT c.c_custkey, c.c_name, n.n_name AS nation,
                   CAST(SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                            * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT)))
                        AS DOUBLE) / 10000.0 AS lost_revenue,
                   COUNT(*) AS n_returned_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
            GROUP BY 1, 2, 3
            ORDER BY lost_revenue DESC, c_custkey
            LIMIT 20
        """,
        "numeric_profile": """
            WITH prof AS (
                SELECT * FROM (
                    SELECT 'l_quantity' AS col_name, l_quantity AS v FROM lineitem
                    UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
                    UNION ALL SELECT 'l_discount', l_discount FROM lineitem
                    UNION ALL SELECT 'l_tax', l_tax FROM lineitem
                )
            ),
            agg AS (
                -- per-row BIGINT cents (the Spark side's _units); the
                -- x-squared sum is three exact BIGINT parts recombined
                -- in HUGEINT — same integers as Spark's DECIMAL(38)
                SELECT col_name,
                       COUNT(v) AS n_non_null,
                       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                       CAST(MIN(v) AS DOUBLE) AS min_value,
                       CAST(MAX(v) AS DOUBLE) AS max_value,
                       CAST(SUM(q) AS BIGINT) AS s,
                       CAST(SUM((q * q) // 100000000) AS HUGEINT) * 100000000
                         + CAST(SUM(((q * q) // 10000) % 10000) AS HUGEINT) * 10000
                         + CAST(SUM((q * q) % 10000) AS HUGEINT) AS s2
                FROM (SELECT col_name, v,
                             CAST(floor(v * 100 + 0.5) AS BIGINT) AS q
                      FROM prof)
                GROUP BY col_name
            )
            SELECT col_name, n_non_null, n_null, min_value, max_value,
                   ((2 * s * 10000 + n_non_null) // (2 * n_non_null)) / 1000000.0 AS mean_value,
                   ROUND(sqrt(CAST(n_non_null * s2 - CAST(s AS HUGEINT) * s AS DOUBLE)
                              / 10000.0
                              / CAST(n_non_null * (n_non_null - 1) AS DOUBLE)), 6) AS stddev_value
            FROM agg
            ORDER BY col_name
        """,
        "dq_referential_audit": """
            SELECT 'lineitem.quantity_out_of_range' AS rule,
                   CAST(COUNT(*) FILTER (WHERE l_quantity <= 0 OR l_quantity > 50) AS BIGINT) AS violations
            FROM lineitem
            UNION ALL
            SELECT 'lineitem.discount_out_of_range',
                   CAST(COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'lineitem.orphan_orderkey',
                   CAST(COUNT(*) AS BIGINT)
            FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
            UNION ALL
            SELECT 'orders.orphan_custkey',
                   CAST(COUNT(*) AS BIGINT)
            FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
            UNION ALL
            SELECT 'orders.null_orderdate',
                   CAST(COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT)
            FROM orders
            ORDER BY rule
        """,
        "ext_pii_redact": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}'))
                        + len(regexp_extract_all(text, 'https?://[^ \\t\\n\\x0B\\f\\r]+'))
                        + len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_redactions,
                   CAST(length(redacted) AS BIGINT) AS redacted_len,
                   md5(redacted) AS redacted_md5
            FROM (
                SELECT doc_id,
                       regexp_replace(
                           regexp_replace(
                               regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                               'https?://[^ \\t\\n\\x0B\\f\\r]+', '<URL>', 'g'),
                           '[0-9]{6,}', '<NUM>', 'g') AS redacted,
                       text
                FROM documents
            )
            ORDER BY doc_id
        """,
        "ship_delay_histogram": """
            SELECT strftime(o.o_orderdate, '%Y-%m') AS order_month,
                   COUNT(*) AS n_lines,
                   MIN(datediff('day', o.o_orderdate, l.l_shipdate)) AS min_delay,
                   MAX(datediff('day', o.o_orderdate, l.l_shipdate)) AS max_delay,
                   CAST(SUM(datediff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT) AS total_delay_days
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY 1
            ORDER BY order_month
        """,
        "orders_above_customer_avg": """
            SELECT o_custkey, COUNT(*) AS n_above_avg
            FROM orders o
            WHERE CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                  * (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
                  > (SELECT CAST(SUM(CAST(floor(i.o_totalprice * 100 + 0.5)
                                          AS BIGINT)) AS BIGINT)
                     FROM orders i WHERE i.o_custkey = o.o_custkey)
            GROUP BY o_custkey
            ORDER BY o_custkey
        """,
        "unpivot_nation_metrics": """
            WITH c AS (
                SELECT c_nationkey,
                       COUNT(*) AS n_customers,
                       CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_cust_balance
                FROM customer GROUP BY c_nationkey
            ),
            s AS (
                SELECT s_nationkey, COUNT(*) AS n_suppliers
                FROM supplier GROUP BY s_nationkey
            ),
            wide AS (
                SELECT n.n_name,
                       CAST(COALESCE(c.n_customers, 0) AS DOUBLE) AS n_customers,
                       CAST(COALESCE(s.n_suppliers, 0) AS DOUBLE) AS n_suppliers,
                       COALESCE(c.total_cust_balance, 0.0e0) AS total_cust_balance
                FROM nation n
                LEFT JOIN c ON n.n_nationkey = c.c_nationkey
                LEFT JOIN s ON n.n_nationkey = s.s_nationkey
            )
            SELECT n_name, measure, val
            FROM (UNPIVOT wide ON n_customers, n_suppliers, total_cust_balance
                  INTO NAME measure VALUE val)
        """,
        "ntile_value_quartiles": """
            SELECT event_type,
                   quartile,
                   COUNT(*) AS n,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value
            FROM (
                SELECT event_type, value,
                       NTILE(4) OVER (PARTITION BY event_type
                                      ORDER BY value, event_id) AS quartile
                FROM events
            )
            GROUP BY event_type, quartile
            ORDER BY event_type, quartile
        """,
        "range_interval_window": """
            SELECT event_id, user_id,
                   COUNT(*) OVER w AS n_10m,
                   CAST(SUM(CAST(value AS DECIMAL(28,2))) OVER w AS DOUBLE) AS sum_value_10m
            FROM events
            WINDOW w AS (
                PARTITION BY user_id ORDER BY epoch_us(ts)
                RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW
            )
        """,
        "ext_incremental_dedup": """
            WITH corpus AS (
                SELECT text FROM documents WHERE doc_id % 5 <= 2
            ),
            batch AS (
                SELECT doc_id, source, text FROM documents WHERE doc_id % 5 >= 2
            ),
            seen AS (
                SELECT b.source, COUNT(*) AS n_seen
                FROM batch b
                WHERE EXISTS (SELECT 1 FROM corpus c WHERE c.text = b.text)
                GROUP BY b.source
            )
            SELECT p.source,
                   p.n_batch,
                   CAST(COALESCE(s.n_seen, 0) AS BIGINT) AS n_seen,
                   CAST(p.n_batch - COALESCE(s.n_seen, 0) AS BIGINT) AS n_new
            FROM (SELECT source, COUNT(*) AS n_batch FROM batch GROUP BY source) p
            LEFT JOIN seen s ON p.source = s.source
            ORDER BY p.source
        """,
        "ext_quality_sample": f"""
            WITH scored AS (
                SELECT source,
                       CAST(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS BIGINT) AS n_tokens,
                       0.4e0 * least(CAST(n_words AS DOUBLE) / 100.0e0, 1.0e0)
                       + 0.4e0 * least(sw_ratio * 5.0e0, 1.0e0)
                       + 0.2e0 * (1.0e0 - least(p_ratio * 10.0e0, 1.0e0)) AS quality,
                       CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE)
                           / 4294967296.0e0 AS u
                FROM (
                    SELECT doc_id, source, text,
                           {_N_WORDS.format(c='text')} AS n_words,
                           CASE WHEN {_N_WORDS.format(c='text')} > 0 THEN
                               CAST(len(list_filter(string_split_regex(regexp_replace(lower(text), '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+'),
                                        w -> w IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
                               / {_N_WORDS.format(c='text')}
                           ELSE 0.0e0 END AS sw_ratio,
                           CASE WHEN length(text) > 0 THEN
                               CAST(length(text) - length(regexp_replace(text, '[^\\w \\t\\n\\x0B\\f\\r]', '', 'g')) AS DOUBLE)
                               / length(text)
                           ELSE 0.0e0 END AS p_ratio
                    FROM documents
                )
            )
            SELECT source,
                   n_docs,
                   n_kept,
                   kept_tokens,
                   CASE WHEN n_kept > 0
                        THEN ((2 * qsum + n_kept) // (2 * n_kept)) / 1000000.0
                   END AS mean_kept_quality
            FROM (
                SELECT source,
                       COUNT(*) AS n_docs,
                       CAST(SUM(CASE WHEN u < quality THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                       CAST(SUM(CASE WHEN u < quality THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens,
                       CAST(SUM(CASE WHEN u < quality
                                     THEN CAST(FLOOR(quality * 1000000.0) AS BIGINT)
                                     ELSE 0 END) AS BIGINT) AS qsum
                FROM scored
                GROUP BY source
            )
            ORDER BY source
        """,
        "ext_word_df_histogram": f"""
            WITH words AS (
                SELECT doc_id, unnest({_WORDS.format(c='lower(text)')}) AS word
                FROM documents
            ),
            per_word AS (
                SELECT word,
                       COUNT(DISTINCT doc_id) AS df,
                       COUNT(*) AS occurrences
                FROM words WHERE word <> ''
                GROUP BY word
            )
            SELECT CASE WHEN df = 1 THEN '1'
                        WHEN df <= 10 THEN '2-10'
                        WHEN df <= 100 THEN '11-100'
                        WHEN df <= 1000 THEN '101-1000'
                        ELSE '1000+' END AS df_bucket,
                   COUNT(*) AS n_words,
                   CAST(SUM(occurrences) AS BIGINT) AS total_occurrences
            FROM per_word
            GROUP BY 1
            ORDER BY df_bucket
        """,
        # -- round-3 TPC-H shapes + chunking/decontamination --------------
        "promo_revenue_ratio": """
            SELECT strftime(m, '%Y-%m') AS ship_month,
                   CAST(p4 AS DOUBLE) / 10000.0 AS promo_revenue,
                   CAST(t4 AS DOUBLE) / 10000.0 AS total_revenue,
                   ((2 * p4 * 1000000 + t4) // (2 * t4)) / 1000000.0
                       AS promo_frac
            FROM (
                -- per-row revenue in exact 1e-4-unit BIGINTs (the Spark
                -- side's _units quantization: floor(x*100 + 0.5) is
                -- bit-identical to the old DECIMAL(12,2) cast on this
                -- schema's 2-dp money doubles)
                SELECT date_trunc('month', l_shipdate) AS m,
                       SUM(CASE WHEN p_type = 'PROMO'
                                THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                                     * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
                                ELSE 0 END) AS p4,
                       SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS t4
                FROM lineitem JOIN part ON l_partkey = p_partkey
                GROUP BY 1
            )
            ORDER BY ship_month
        """,
        "nation_market_share": """
            SELECT order_year,
                   CAST(n4 AS DOUBLE) / 10000.0 AS nation_revenue,
                   CAST(t4 AS DOUBLE) / 10000.0 AS total_revenue,
                   ((2 * n4 * 1000000 + t4) // (2 * t4)) / 1000000.0
                       AS market_share
            FROM (
                SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
                       SUM(CASE WHEN sn.n_name = 'NATION_7'
                                THEN CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                                     * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
                                ELSE 0 END) AS n4,
                       SUM(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                           * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS t4
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN customer c ON o.o_custkey = c.c_custkey
                JOIN nation cn ON c.c_nationkey = cn.n_nationkey
                JOIN region r ON cn.n_regionkey = r.r_regionkey
                JOIN supplier s ON l.l_suppkey = s.s_suppkey
                JOIN nation sn ON s.s_nationkey = sn.n_nationkey
                WHERE r.r_name = 'AMERICA'
                GROUP BY 1
            )
            ORDER BY order_year
        """,
        "large_volume_customers": """
            SELECT c.c_custkey, c.c_name, o.o_orderkey,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
                   o.o_totalprice, q.sum_qty
            FROM (
                SELECT l_orderkey,
                       CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                            AS BIGINT) // 100 AS sum_qty
                FROM lineitem
                GROUP BY l_orderkey
                HAVING CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                            AS BIGINT) // 100 > 150
            ) q
            JOIN orders o ON q.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            ORDER BY q.sum_qty DESC, o.o_orderkey
            LIMIT 100
        """,
        "disjunctive_revenue": """
            SELECT p_brand,
                   CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                            * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                        AS DOUBLE) / 10000.0 AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 5
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 20 AND 30)
            GROUP BY p_brand
            ORDER BY p_brand
        """,
        "idle_customer_balance": """
            WITH stats AS (
                SELECT CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(28,2)) * 100
                                     AS BIGINT)) AS BIGINT) AS s,
                       COUNT(*) AS n
                FROM customer WHERE c_acctbal > 0
            )
            SELECT nn.n_name AS nation,
                   COUNT(*) AS n_customers,
                   CAST(SUM(CAST(CAST(c.c_acctbal AS DECIMAL(28,2)) * 100
                                 AS BIGINT)) AS BIGINT) / 100.0 AS total_acctbal
            FROM customer c
            CROSS JOIN stats
            JOIN nation nn ON c.c_nationkey = nn.n_nationkey
            WHERE NOT EXISTS (
                      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  )
              AND CAST(CAST(c.c_acctbal AS DECIMAL(28,2)) * 100 AS BIGINT)
                  * stats.n > stats.s
            GROUP BY nn.n_name
            ORDER BY nation
        """,
        "ext_doc_chunking": """
            SELECT doc_id,
                   CAST(gs AS BIGINT) AS chunk_idx,
                   CAST(gs * 90 + 1 AS BIGINT) AS chunk_start,
                   CAST(length(substr(text, CAST(gs * 90 + 1 AS INT), 120))
                        AS BIGINT) AS chunk_len,
                   CAST('0x' || substr(md5(
                        substr(text, CAST(gs * 90 + 1 AS INT), 120)
                   ), 1, 15) AS BIGINT) AS chunk_hash
            FROM (
                SELECT doc_id, text,
                       unnest(range(0, GREATEST(length(text) - 1, 0) // 90 + 1))
                           AS gs
                FROM documents
            )
            ORDER BY doc_id, chunk_idx
        """,
        "ext_substring_contamination": """
            WITH snippets AS (
                SELECT doc_id AS snippet_doc, substr(text, 40, 48) AS snippet
                FROM documents
                WHERE doc_id % 97 = 0 AND length(text) >= 114
            )
            SELECT d.doc_id,
                   COUNT(*) AS n_snippets_hit,
                   MIN(s.snippet_doc) AS first_snippet_doc
            FROM documents d, snippets s
            WHERE d.doc_id <> s.snippet_doc
              AND position(s.snippet IN d.text) > 0
            GROUP BY d.doc_id
            ORDER BY d.doc_id
        """,
        "cheapest_supplier_per_part": """
            WITH priced AS (
                SELECT l_partkey, l_suppkey,
                       (CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * 10000)
                       // (CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) // 100)
                           AS unit_microprice
                FROM lineitem
            ),
            best AS (
                SELECT l_partkey, l_suppkey, unit_microprice,
                       ROW_NUMBER() OVER (
                           PARTITION BY l_partkey
                           ORDER BY unit_microprice, l_suppkey
                       ) AS rn
                FROM priced
            )
            SELECT b.l_partkey, p.p_brand AS brand, s.s_name AS supplier,
                   b.unit_microprice
            FROM best b
            JOIN supplier s ON b.l_suppkey = s.s_suppkey
            JOIN part p ON b.l_partkey = p.p_partkey
            WHERE b.rn = 1
            ORDER BY b.l_partkey
        """,
        "supplier_variety_by_brand": """
            SELECT p.p_brand,
                   CAST((p.p_size - 1) // 10 AS BIGINT) AS size_bucket,
                   COUNT(DISTINCT l.l_suppkey) AS n_suppliers
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_suppkey NOT IN (
                SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
            )
            GROUP BY 1, 2
            ORDER BY p_brand, size_bucket
        """,
        "daily_volume_anomaly": """
            WITH daily AS (
                SELECT strftime(ts, '%Y-%m-%d') AS day,
                       COUNT(*) AS n_events
                FROM events
                GROUP BY 1
            ),
            trail AS (
                SELECT day, n_events,
                       SUM(n_events) OVER (
                           ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
                       ) AS trailing_sum,
                       COUNT(n_events) OVER (
                           ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING
                       ) AS trailing_days
                FROM daily
            )
            SELECT day, n_events, trailing_sum, trailing_days
            FROM trail
            WHERE trailing_days >= 7
              AND 2 * ABS(n_events * trailing_days - trailing_sum) > trailing_sum
            ORDER BY day
        """,
        "ext_cross_source_dedup": """
            WITH keyed AS (
                SELECT doc_id, source,
                       CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT)
                           AS pri,
                       CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h
                FROM documents
            ),
            ranked AS (
                SELECT doc_id, source, h,
                       ROW_NUMBER() OVER (
                           PARTITION BY h ORDER BY pri, doc_id
                       ) AS rn,
                       COUNT(*) OVER (PARTITION BY h) AS n_copies
                FROM keyed
            )
            SELECT doc_id AS kept_doc, source AS kept_source,
                   CAST(n_copies AS BIGINT) AS n_copies
            FROM ranked
            WHERE rn = 1 AND n_copies > 1
            ORDER BY kept_doc
        """,
        "priority_order_counts": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
              AND o.o_orderdate < TIMESTAMP '1996-10-01'
              AND EXISTS (
                  SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate
              )
            GROUP BY o_orderpriority
            ORDER BY o_orderpriority
        """,
        "shipmode_priority_split": """
            SELECT l_linestatus,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY l_linestatus
            ORDER BY l_linestatus
        """,
        "top_supplier_revenue": """
            WITH per_sup AS (
                SELECT l_suppkey,
                       CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                                * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
                            AS BIGINT) AS rev_micro
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name,
                   rev_micro / 10000.0 AS total_revenue
            FROM per_sup p
            JOIN supplier s ON p.l_suppkey = s.s_suppkey
            WHERE p.rev_micro = (SELECT MAX(rev_micro) FROM per_sup)
            ORDER BY s.s_suppkey
        """,
        "ext_chunk_dedup": """
            WITH chunks AS (
                SELECT doc_id,
                       CAST(gs AS BIGINT) AS chunk_idx,
                       CAST('0x' || substr(md5(
                            substr(text, CAST(gs * 90 + 1 AS INT), 120)
                       ), 1, 15) AS BIGINT) AS chunk_hash
                FROM (
                    SELECT doc_id, text,
                           unnest(range(0, GREATEST(length(text) - 1, 0) // 90
                                           + 1)) AS gs
                    FROM documents
                )
            )
            SELECT chunk_hash,
                   COUNT(*) AS n_occurrences,
                   COUNT(DISTINCT doc_id) AS n_docs,
                   MIN(doc_id * 1048576 + chunk_idx) // 1048576 AS keeper_doc,
                   MIN(doc_id * 1048576 + chunk_idx) % 1048576 AS keeper_idx
            FROM chunks
            GROUP BY chunk_hash
            HAVING COUNT(*) > 1
            ORDER BY chunk_hash
        """,
        "ext_dataset_card": f"""
            SELECT n_docs, n_sources, n_langs, total_chars, total_words,
                   n_docs - uniq AS n_dup_docs,
                   (1000000 * (n_docs - uniq)) // n_docs AS dup_rate_micro
            FROM (
                SELECT COUNT(*) AS n_docs,
                       COUNT(DISTINCT source) AS n_sources,
                       COUNT(DISTINCT lang) AS n_langs,
                       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
                       CAST(SUM({_N_WORDS.format(c='text')}) AS BIGINT)
                           AS total_words,
                       COUNT(DISTINCT {PHASH60_SQL.format(c='text')}) AS uniq
                FROM documents
            )
        """,
        "ext_embedding_quantization": """
            WITH staged AS (
                SELECT vec_id,
                       CAST(embedding AS DOUBLE[]) AS v,
                       list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                               x -> abs(x))) AS amax
                FROM embeddings
            ),
            quant AS (
                SELECT vec_id, v, amax,
                       CASE WHEN amax > 0 THEN
                           list_transform(v,
                               x -> CAST(floor(x / amax * 127) AS INT))
                       ELSE list_transform(v, x -> 0) END AS q
                FROM staged
            ),
            errs AS (
                SELECT vec_id, v, q,
                       list_reduce(
                           list_prepend(CAST(0 AS DOUBLE),
                               list_transform(range(1, len(v) + 1),
                                   i -> (v[i] - q[i] * amax / 127.0)
                                        * (v[i] - q[i] * amax / 127.0))),
                           (a, b) -> a + b) AS err2
                FROM quant
            )
            SELECT vec_id,
                   CAST(list_min(q) AS BIGINT) AS q_min,
                   CAST(list_max(q) AS BIGINT) AS q_max,
                   CAST(floor(sqrt(err2 / len(v)) * 1000000) AS BIGINT)
                       AS rms_err_micro
            FROM errs
            ORDER BY vec_id
        """,
        # -- round-4: curation scoring + SCD2 ------------------------------
        "ext_bigram_lm_score": """
            WITH wt AS (
                SELECT doc_id,
                       string_split_regex(regexp_replace(lower(text), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+') AS w
                FROM documents
            ),
            pos AS (
                SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM wt
            ),
            bg AS (
                SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM pos
            ),
            cb AS (
                SELECT w1, w2, COUNT(*) AS cnt2 FROM bg GROUP BY w1, w2
            ),
            cu AS (
                SELECT w1, CAST(SUM(cnt2) AS BIGINT) AS cnt1 FROM cb GROUP BY w1
            ),
            vocab AS (
                SELECT COUNT(DISTINCT w2) AS v FROM cb
            ),
            scored AS (
                SELECT b.doc_id,
                       (1000000 * (cb.cnt2 + 1)) // (cu.cnt1 + vocab.v)
                           AS p_micro
                FROM bg b
                JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
                JOIN cu ON b.w1 = cu.w1
                CROSS JOIN vocab
            ),
            agg AS (
                SELECT doc_id, COUNT(*) AS n_bigrams,
                       CAST(SUM(p_micro) AS BIGINT) AS sum_p_micro
                FROM scored GROUP BY doc_id
            )
            SELECT doc_id, n_bigrams, sum_p_micro,
                   ((2 * sum_p_micro + n_bigrams) // (2 * n_bigrams))
                       / 1000000.0 AS mean_p
            FROM agg
            ORDER BY doc_id
        """,
        "ext_dsir_importance": """
            WITH wt AS (
                SELECT doc_id,
                       string_split_regex(regexp_replace(lower(text), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+') AS w
                FROM documents
            ),
            pos AS (
                SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM wt
            ),
            bg AS (
                SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM pos
            ),
            feats AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5(w1 || ' ' || w2), 1, 15) AS BIGINT) % 1024 AS bucket
                FROM bg
            ),
            doc_counts AS (
                SELECT doc_id, bucket, COUNT(*) AS cnt
                FROM feats GROUP BY doc_id, bucket
            ),
            tgt_b AS (
                SELECT bucket, COUNT(*) AS ct FROM feats
                WHERE doc_id IN (SELECT doc_id FROM documents
                                 WHERE source = (SELECT min(source) FROM documents))
                GROUP BY bucket
            ),
            raw_b AS (
                SELECT bucket, COUNT(*) AS cr FROM feats GROUP BY bucket
            ),
            buckets AS (
                SELECT r.bucket, r.cr, COALESCE(t.ct, 0) AS ct,
                       SUM(r.cr) OVER () AS nr,
                       SUM(COALESCE(t.ct, 0)) OVER () AS nt
                FROM raw_b r LEFT JOIN tgt_b t ON r.bucket = t.bucket
            ),
            ratio AS (
                SELECT bucket,
                       CAST((CAST(1000000 AS HUGEINT) * (ct + 1) * (nr + 1024))
                            // (CAST(cr + 1 AS HUGEINT) * (nt + 1024)) AS BIGINT)
                           AS ratio_micro
                FROM buckets
            )
            SELECT d.doc_id,
                   CAST(SUM(d.cnt) AS BIGINT) AS n_feat,
                   CAST(SUM(d.cnt * r.ratio_micro) AS BIGINT) AS weight_micro
            FROM doc_counts d JOIN ratio r ON d.bucket = r.bucket
            GROUP BY d.doc_id
            ORDER BY d.doc_id
        """,
        "ext_quality_classifier": """
            WITH wt AS (
                SELECT doc_id,
                       string_split_regex(regexp_replace(lower(text), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+') AS w
                FROM documents
            ),
            pos AS (
                SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM wt
            ),
            bg AS (
                SELECT doc_id, w[i] AS w1, w[i + 1] AS w2 FROM pos
            ),
            feats AS (
                SELECT doc_id,
                       CAST('0x' || substr(md5(w1 || ' ' || w2), 1, 15) AS BIGINT) % 1024 AS bucket
                FROM bg
            ),
            doc_counts AS (
                SELECT doc_id, bucket, COUNT(*) AS cnt
                FROM feats GROUP BY doc_id, bucket
            ),
            pos_b AS (
                SELECT bucket, COUNT(*) AS cp FROM feats
                WHERE doc_id IN (SELECT doc_id FROM documents
                                 WHERE lang = 'en')
                GROUP BY bucket
            ),
            raw_b AS (
                SELECT bucket, COUNT(*) AS cr FROM feats GROUP BY bucket
            ),
            buckets AS (
                SELECT r.bucket, COALESCE(p.cp, 0) AS cp,
                       r.cr - COALESCE(p.cp, 0) AS cn,
                       SUM(COALESCE(p.cp, 0)) OVER () AS np,
                       SUM(r.cr - COALESCE(p.cp, 0)) OVER () AS nn
                FROM raw_b r LEFT JOIN pos_b p ON r.bucket = p.bucket
            ),
            wts AS (
                SELECT bucket,
                       LEAST(GREATEST(
                           CAST((CAST(1000000 AS HUGEINT) * (cp + 1) * (nn + 1024))
                                // (CAST(cn + 1 AS HUGEINT) * (np + 1024)) AS BIGINT),
                           1), 1000000000000) AS w
                FROM buckets
            ),
            scored AS (
                SELECT d.doc_id,
                       CAST(SUM(d.cnt) AS BIGINT) AS n_feat,
                       CAST(SUM(d.cnt * wts.w) AS BIGINT) AS score_micro
                FROM doc_counts d JOIN wts ON d.bucket = wts.bucket
                GROUP BY d.doc_id
            )
            SELECT doc.source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN COALESCE(s.score_micro, 0)
                                      > COALESCE(s.n_feat, 0) * 1000000
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_pred_pos,
                   CAST(SUM(COALESCE(s.n_feat, 0)) AS BIGINT) AS sum_feat,
                   CAST(SUM(COALESCE(s.score_micro, 0)) AS BIGINT)
                       AS sum_score_micro
            FROM documents doc LEFT JOIN scored s ON doc.doc_id = s.doc_id
            GROUP BY doc.source
            ORDER BY doc.source
        """,
        "ext_kmv_source_overlap": f"""
            WITH wt AS (
                SELECT source, string_split_regex(regexp_replace(lower(text), '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+') AS w
                FROM documents
            ),
            wrd AS (SELECT source, unnest(w) AS wd FROM wt),
            hs AS (
                SELECT DISTINCT source,
                       {PHASH60_SQL.format(c='wd')} AS h
                FROM wrd WHERE wd <> ''
            ),
            sk AS MATERIALIZED (
                SELECT source, h FROM (
                    SELECT source, h,
                           row_number() OVER (PARTITION BY source
                                              ORDER BY h) AS rn
                    FROM hs) WHERE rn <= 256
            ),
            gst AS (
                SELECT source AS g, COUNT(*) AS n, MAX(h) AS tf
                FROM sk GROUP BY source
            ),
            gs AS (
                SELECT g,
                       CASE WHEN n >= 256 THEN tf
                            ELSE {1 << 60} END AS theta,
                       CASE WHEN n >= 256 THEN CAST(
                           (255 * CAST({1 << 60} AS HUGEINT)) // tf
                           AS BIGINT)
                            ELSE n END AS dist_est
                FROM gst
            ),
            pairs AS MATERIALIZED (
                SELECT a.g AS ga, b.g AS gb, a.theta AS ta, b.theta AS tb,
                       a.dist_est AS da, b.dist_est AS db
                FROM gs a JOIN gs b ON a.g < b.g
            ),
            inter AS (
                SELECT sa.source AS ga, sb.source AS gb,
                       COUNT(*) AS kin
                FROM sk sa JOIN sk sb ON sa.h = sb.h
                     AND sa.source < sb.source
                JOIN pairs p ON p.ga = sa.source AND p.gb = sb.source
                WHERE sa.h < LEAST(p.ta, p.tb)
                GROUP BY 1, 2
            ),
            urows AS (
                SELECT p.ga, p.gb, s.h FROM pairs p
                JOIN sk s ON s.source = p.ga
                UNION
                SELECT p.ga, p.gb, s.h FROM pairs p
                JOIN sk s ON s.source = p.gb
            ),
            ust AS (
                SELECT ga, gb, COUNT(*) AS un,
                       MAX(h) AS utf
                FROM (SELECT ga, gb, h,
                             row_number() OVER (PARTITION BY ga, gb
                                                ORDER BY h) AS urn
                      FROM urows) WHERE urn <= 256
                GROUP BY ga, gb
            ),
            uest AS (
                SELECT ga, gb,
                       CASE WHEN un >= 256 THEN CAST(
                           (255 * CAST({1 << 60} AS HUGEINT)) // utf
                           AS BIGINT)
                            ELSE un END AS union_est
                FROM ust
            )
            SELECT p.ga AS group_a, p.gb AS group_b,
                   CAST(p.da AS BIGINT) AS distinct_a,
                   CAST(p.db AS BIGINT) AS distinct_b,
                   CAST(u.union_est AS BIGINT) AS union_est,
                   CAST((COALESCE(i.kin, 0) * CAST({1 << 60} AS HUGEINT))
                        // LEAST(p.ta, p.tb) AS BIGINT) AS inter_est
            FROM pairs p
            JOIN uest u ON u.ga = p.ga AND u.gb = p.gb
            LEFT JOIN inter i ON i.ga = p.ga AND i.gb = p.gb
            ORDER BY group_a, group_b
        """,
        "ext_leakage_free_split": """
            WITH grouped AS (
                SELECT doc_id,
                       MIN(doc_id) OVER (PARTITION BY lower(trim(text)))
                           AS group_id
                FROM documents
            ),
            banded AS (
                SELECT doc_id, group_id,
                       CAST('0x' || substr(md5(CAST(group_id AS VARCHAR)), 1, 15) AS BIGINT) % 10 AS band
                FROM grouped
            )
            SELECT doc_id, group_id,
                   CASE WHEN band < 8 THEN 'train'
                        WHEN band < 9 THEN 'val'
                        ELSE 'test' END AS split
            FROM banded
            ORDER BY doc_id
        """,
        "scd2_event_intervals": """
            WITH flagged AS (
                SELECT user_id, event_type, ts AS valid_from, event_id,
                       CASE WHEN lag(event_type) OVER w IS NULL
                                 OR lag(event_type) OVER w <> event_type
                            THEN 1 ELSE 0 END AS chg
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            changes AS (
                SELECT user_id, event_type, valid_from, event_id
                FROM flagged WHERE chg = 1
            ),
            iv AS (
                SELECT user_id, event_type, valid_from,
                       lead(valid_from) OVER w2 AS valid_to
                FROM changes
                WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
            )
            SELECT user_id, event_type,
                   strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
                   COALESCE(strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f'), '')
                       AS valid_to,
                   CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INTEGER)
                       AS is_current
            FROM iv
            ORDER BY user_id, valid_from
        """,
        # -- round-4 continuation: MV merge / basket pairs / SCD1 / BM25 --
        # merge ≡ recompute: the oracle aggregates the FULL orders table
        # in one pass; Spark merges two disjoint partial states.
        "incremental_rollup_merge": """
            WITH rows_q AS (
                SELECT o_orderstatus AS status,
                       strftime(o_orderdate, '%Y-%m') AS order_month,
                       CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT) AS cents
                FROM orders
            ),
            st AS (
                SELECT status, order_month,
                       COUNT(*) AS n, SUM(cents) AS s,
                       MIN(cents) AS mn, MAX(cents) AS mx
                FROM rows_q GROUP BY status, order_month
            )
            SELECT status, order_month,
                   CAST(n AS BIGINT) AS n_orders,
                   CAST(s AS BIGINT) AS total_cents,
                   CAST(mn AS BIGINT) AS min_cents,
                   CAST(mx AS BIGINT) AS max_cents,
                   CAST((s * 2000000 + n) // (2 * n) AS BIGINT)
                       AS avg_microcents
            FROM st
            ORDER BY status, order_month
        """,
        "part_basket_pairs": """
            WITH op AS (
                SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            )
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   COUNT(*) AS n_orders
            FROM op a JOIN op b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            ORDER BY n_orders DESC, part_a, part_b
            LIMIT 20
        """,
        "scd1_latest_state": """
            WITH ranked AS (
                SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
                       CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                            AS BIGINT) AS price_cents,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC
                       ) AS rn
                FROM orders
            )
            SELECT o_custkey,
                   o_orderkey AS latest_orderkey,
                   o_orderstatus AS latest_status,
                   strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate,
                   price_cents AS latest_price_cents
            FROM ranked WHERE rn = 1
            ORDER BY o_custkey
        """,
        # exact-integer BM25: rational saturation (k1=6/5, b=3/4 cleared
        # of fractions by 20·S) and the log-free rational idf surrogate —
        # operators/retrieval.py documents the algebra; every division is
        # integer (Spark div ≡ DuckDB // on positives).
        "ext_bm25_topk": f"""
            WITH w AS (
                SELECT doc_id, word
                FROM (SELECT doc_id,
                             unnest({_WORDS.format(c='lower(text)')}) AS word
                      FROM documents)
                WHERE word <> ''
            ),
            dl AS (SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY doc_id),
            tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS S,
                           CAST(COUNT(*) AS BIGINT) AS N FROM dl),
            probe AS (
                SELECT word FROM w GROUP BY word
                ORDER BY COUNT(*) DESC, word LIMIT 3
            ),
            mt AS (SELECT w.doc_id, w.word FROM w JOIN probe USING (word)),
            dft AS (
                SELECT word, COUNT(DISTINCT doc_id) AS df
                FROM mt GROUP BY word
            ),
            tf AS (
                SELECT doc_id, word, COUNT(*) AS tf
                FROM mt GROUP BY doc_id, word
            ),
            scored AS (
                SELECT tf.doc_id,
                       ((1000000 * (N - df + 1)) // (df + 1)) *
                       ((1000000 * 22 * tf * S)
                        // (10*tf*S + 3*S + 9*dl.dl*N)) AS ts
                FROM tf
                JOIN dft USING (word)
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN tot
            )
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_terms,
                   CAST(SUM(ts) AS BIGINT) AS score_units
            FROM scored
            GROUP BY doc_id
            ORDER BY score_units DESC, doc_id
            LIMIT 10
        """,
        # PQ ANN audit: booleans are measured invariants (recall floor /
        # half-quality bound, ≥2× regeneration margin at every SF); the
        # best-hit columns replay exactly via the portable sequential fold.
        "ext_pq_topk": """
            WITH q AS (
                SELECT CAST(embedding AS DOUBLE[]) AS qv
                FROM embeddings WHERE vec_id = 0
            ),
            scored AS (
                SELECT vec_id,
                       ROUND(
                           list_reduce(list_transform(range(1, len(v)+1),
                                                      i -> v[i] * qv[i]),
                                       (x, y) -> x + y)
                           / (sqrt(list_reduce(list_transform(range(1, len(v)+1),
                                                              i -> v[i] * v[i]),
                                               (x, y) -> x + y))
                              * sqrt(list_reduce(list_transform(range(1, len(qv)+1),
                                                                i -> qv[i] * qv[i]),
                                                 (x, y) -> x + y))), 6) AS cos_sim
                FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                      FROM embeddings WHERE vec_id != 0), q
            )
            SELECT (SELECT CAST(COUNT(*) AS BIGINT)
                    FROM embeddings WHERE vec_id != 0) AS n_vectors,
                   true AS recall_ok,
                   true AS quality_ok,
                   vec_id AS best_vec_id,
                   cos_sim AS best_cos_sim
            FROM scored
            ORDER BY cos_sim DESC, vec_id
            LIMIT 1
        """,
        # Deequ-shaped expectations audit: row rules in one aggregation
        # pass; unique / referential as one-row scalar subqueries.
        "dq_expectations_orders": """
            WITH rowagg AS (
                SELECT COUNT(*) AS n_rows,
                       CAST(SUM(CASE WHEN o_orderkey IS NULL
                                       OR o_custkey IS NULL
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS key_not_null_violations,
                       CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                                      AND o_orderstatus NOT IN ('O','F','P')
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS status_valid_violations,
                       CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                                      AND (o_totalprice < 2000.0
                                           OR o_totalprice > 400000.0)
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS price_band_violations,
                       CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                                      AND NOT regexp_matches(o_orderpriority,
                                                             '^[1-5]-')
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS priority_format_violations,
                       CAST(SUM(CASE WHEN NOT COALESCE(
                                        o_orderdate >= DATE '1993-01-01',
                                        FALSE)
                                     THEN 1 ELSE 0 END) AS BIGINT)
                           AS modern_dates_violations
                FROM orders
            ),
            uniq AS (
                SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT)
                           AS orderkey_unique_violations
                FROM (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey)
            ),
            refi AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS cust_exists_violations
                FROM orders
                WHERE o_custkey IS NOT NULL
                  AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                        WHERE c_custkey IS NOT NULL)
            )
            SELECT n_rows, key_not_null_violations,
                   orderkey_unique_violations, status_valid_violations,
                   price_band_violations, priority_format_violations,
                   cust_exists_violations, modern_dates_violations
            FROM rowagg, uniq, refi
        """,
        # exact integer OLS — operators/stats.py documents the algebra,
        # the floor-division identity, and the DECIMAL(38)/HUGEINT bounds
        "regression_price_trend": _OLS_SQL.format(
            groups="l_returnflag, l_linestatus",
            rows="""
                SELECT l_returnflag, l_linestatus,
                       CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
                FROM lineitem
            """,
        )
        + " ORDER BY l_returnflag, l_linestatus",
        # portable Bloom filter — operators/bloom.py documents the hash
        # family, word packing, and the zero-false-negative invariant
        "ext_bloom_prefilter": f"""
            WITH corpus AS (
                SELECT DISTINCT text FROM documents WHERE doc_id % 5 <= 2
            ),
            batch AS (
                SELECT DISTINCT text FROM documents WHERE doc_id % 5 >= 2
            ),
            cp AS ({_bloom_probes("text", "SELECT text FROM corpus", 4096, 3)}),
            bloom AS (
                SELECT word,
                       bit_or(CAST(1 AS BIGINT) << CAST(bit AS INT)) AS bits
                FROM cp GROUP BY word
            ),
            bp AS ({_bloom_probes("text", "SELECT text FROM batch", 4096, 3)}),
            flags AS (
                SELECT bp.key AS text,
                       bool_and(COALESCE(
                           ((b.bits >> CAST(bp.bit AS INT)) & 1) = 1,
                           FALSE)) AS maybe
                FROM bp LEFT JOIN bloom b USING (word)
                GROUP BY bp.key
            ),
            j AS (
                SELECT f.maybe, (c.text IS NOT NULL) AS in_corpus
                FROM flags f LEFT JOIN corpus c USING (text)
            )
            SELECT (SELECT COUNT(*) FROM corpus) AS n_corpus_keys,
                   COUNT(*) AS n_batch_keys,
                   CAST(SUM(CASE WHEN maybe THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_maybe,
                   CAST(SUM(CASE WHEN in_corpus THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_true_dup,
                   CAST(SUM(CASE WHEN maybe AND NOT in_corpus
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
                   (SUM(CASE WHEN in_corpus AND NOT maybe
                        THEN 1 ELSE 0 END) = 0) AS no_false_negatives
            FROM j
        """,
        "part_cooccurrence_pagerank": _pagerank_sql(),
    }
