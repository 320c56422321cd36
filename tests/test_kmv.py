"""KMV / theta sketches (operators/sketch.kmv_*): bit-exact python
replay of the sketch and every pair estimator, the merge law, and the
exact-below-k degeneracy."""

from __future__ import annotations

import hashlib

from etl_python_sqlite_spark.operators.sketch import (
    _KMV_DOMAIN,
    kmv_pair_overlap,
    kmv_sketches,
)

K = 4


def _ph(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rows():
    # three groups with controlled overlap; values are strings
    ga = [f"v{i}" for i in range(12)]
    gb = [f"v{i}" for i in range(6, 16)]          # overlaps a on v6..v11
    gc = ["v100", "v101"]                          # tiny: below k distinct
    out = []
    for g, vals in (("a", ga), ("b", gb), ("c", gc)):
        for v in vals + vals[:2]:                  # duplicates too
            out.append((g, v))
    return out


def _py_sketch(vals, k=K):
    hs = sorted({_ph(v) for v in vals})
    return hs[:k], len(hs)


def _py_est(sk, n_distinct_in_sketch, k=K):
    if len(sk) >= k:
        return ((k - 1) * _KMV_DOMAIN) // sk[k - 1]
    return len(sk)


def test_sketch_matches_python_replay(spark):
    df = spark.createDataFrame(_rows(), "g string, v string")
    got = {}
    for r in kmv_sketches(df, "g", "v", k=K).collect():
        got.setdefault(r["g"], []).append((r["rn"], int(r["h"])))
    for g, vals in (
        ("a", [f"v{i}" for i in range(12)]),
        ("b", [f"v{i}" for i in range(6, 16)]),
        ("c", ["v100", "v101"]),
    ):
        sk, _ = _py_sketch(vals)
        assert sorted(got[g]) == [(i + 1, h) for i, h in enumerate(sk)]


def test_pair_overlap_matches_python_contract(spark):
    df = spark.createDataFrame(_rows(), "g string, v string")
    sk = kmv_sketches(df, "g", "v", k=K)
    got = {
        (r["group_a"], r["group_b"]): (
            int(r["distinct_a"]),
            int(r["distinct_b"]),
            int(r["union_est"]),
            int(r["inter_est"]),
        )
        for r in kmv_pair_overlap(sk, "g", k=K).collect()
    }
    groups = {
        "a": [f"v{i}" for i in range(12)],
        "b": [f"v{i}" for i in range(6, 16)],
        "c": ["v100", "v101"],
    }
    pys = {g: _py_sketch(v) for g, v in groups.items()}

    def theta(sk):
        return sk[K - 1] if len(sk) >= K else _KMV_DOMAIN

    for ga in groups:
        for gb in groups:
            if not ga < gb:
                continue
            ska, skb = pys[ga][0], pys[gb][0]
            th = min(theta(ska), theta(skb))
            k_inter = len({h for h in ska if h < th} & {h for h in skb if h < th})
            inter_est = (k_inter * _KMV_DOMAIN) // th
            u = sorted(set(ska) | set(skb))[:K]
            union_est = (
                ((K - 1) * _KMV_DOMAIN) // u[K - 1] if len(u) >= K else len(u)
            )
            assert got[(ga, gb)] == (
                _py_est(*pys[ga]),
                _py_est(*pys[gb]),
                union_est,
                inter_est,
            ), (ga, gb)


def test_below_k_groups_are_exact(spark):
    """Sketches smaller than k ARE the full distinct set: distinct_est
    is exact, and a pair of two below-k groups has θ = 2^60 so
    inter_est equals the exact common distinct count."""
    rows = [("x", v) for v in ("p", "q")] + [("y", v) for v in ("q", "r")]
    df = spark.createDataFrame(rows, "g string, v string")
    sk = kmv_sketches(df, "g", "v", k=K)
    r = kmv_pair_overlap(sk, "g", k=K).collect()[0]
    assert (r["distinct_a"], r["distinct_b"]) == (2, 2)
    assert r["inter_est"] == 1  # {q} — θ = 2^60, exact
    assert r["union_est"] == 3  # {p, q, r} strictly below k → exact


def test_merge_law(spark):
    """The k smallest of two sketches' union equals the sketch of the
    unioned raw data — KMV mergeability, the property the union
    estimator stands on."""
    rows = _rows()
    df = spark.createDataFrame(rows, "g string, v string")
    merged_raw = spark.createDataFrame(
        [("u", v) for g, v in rows if g in ("a", "b")], "g string, v string"
    )
    direct = [
        int(r["h"])
        for r in kmv_sketches(merged_raw, "g", "v", k=K)
        .orderBy("rn")
        .collect()
    ]
    sk = {
        g: sorted(
            int(r["h"])
            for r in kmv_sketches(df, "g", "v", k=K)
            .filter(f"g = '{g}'")
            .collect()
        )
        for g in ("a", "b")
    }
    assert sorted(set(sk["a"]) | set(sk["b"]))[:K] == direct
