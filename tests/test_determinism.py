"""Partition-count invariance: a distributed engine's results must not
depend on HOW the data was partitioned. Every query here is executed
under two different shuffle-partition settings and must produce
bit-identical row multisets — the test that catches order-dependent
float aggregation (the class of bug the decimal-exact/_avg_expr
discipline exists to prevent) at its root.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

#: queries whose aggregates would drift under partial-order changes if
#: the exactness discipline regressed — the float-heavy set, plus the
#: window/packing paths whose shuffles move with the partition count
QUERIES = [
    "agg_pricing_summary",
    "groupby_count_avg",
    "ext_domain_mixture",
    "ext_quality_sample",
    "numeric_profile",
    "percentiles_by_group",
    "window_moving_avg",
    "ext_seq_packing",
    "supplier_profit_by_nation",
    "ext_word_rarity_score",
    # round-3 ratio/argmin/audit queries: integer cross-multiplication
    # fractions, integer micro-unit argmin, quantized-dot kNN audit
    "promo_revenue_ratio",
    "nation_market_share",
    "idle_customer_balance",
    "cheapest_supplier_per_part",
    "ext_ann_knn_join",
]


def _rows(spark, qname):
    df = entrymod.queries()[qname](spark, SF_SMOKE)
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("qname", QUERIES)
def test_partition_count_invariance(spark, qname):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(spark, qname)
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = _rows(spark, qname)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b, f"{qname} results depend on partitioning"
