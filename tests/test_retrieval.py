"""BM25-saturation retrieval (operators/retrieval.py) pinned against an
independent CPython re-derivation of the exact integer algebra, plus
ranking sanity on a constructed corpus."""

from __future__ import annotations

import re

import pytest

from etl_python_sqlite_spark.operators.retrieval import bm25_topk

DOCS = [
    (1, "spark spark spark table join"),
    (2, "spark table"),
    (3, "table scan scan merge merge merge"),
    (4, "join join spark"),
    (5, "window sort hash"),
    (6, "spark table spark table spark table spark table spark table"),
]


def _py_bm25(docs, n_probe=3, k=10):
    words = {
        d: [w for w in re.split(r"\s+", t.lower().strip()) if w]
        for d, t in docs
    }
    dl = {d: len(ws) for d, ws in words.items()}
    S, N = sum(dl.values()), len(dl)
    occ: dict[str, int] = {}
    for ws in words.values():
        for w in ws:
            occ[w] = occ.get(w, 0) + 1
    probe = [w for w in sorted(occ, key=lambda w: (-occ[w], w))[:n_probe]]
    out = {}
    for d, ws in words.items():
        score, nt = 0, 0
        for t in probe:
            tf = ws.count(t)
            if not tf:
                continue
            df = sum(1 for w2 in words.values() if t in w2)
            w_micro = (1_000_000 * (N - df + 1)) // (df + 1)
            sat = (1_000_000 * 22 * tf * S) // (
                10 * tf * S + 3 * S + 9 * dl[d] * N
            )
            score += w_micro * sat
            nt += 1
        if nt:
            out[d] = (nt, score)
    ranked = sorted(out.items(), key=lambda kv: (-kv[1][1], kv[0]))[:k]
    return [(d, nt, sc) for d, (nt, sc) in ranked]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_matches_python_rederivation(spark, docs_df):
    got = [
        (r["doc_id"], r["n_terms"], r["score_units"])
        for r in bm25_topk(docs_df, n_probe_terms=3, k=10).collect()
    ]
    assert got == _py_bm25(DOCS)


def test_bm25_saturation_beats_raw_tf(spark, docs_df):
    """Doc 6 repeats both top terms 5× but is twice the average length —
    it must outrank doc 2 (same terms, tf=1, but doc 2 is short) by
    only a SUBLINEAR factor: saturation + length normalization is what
    separates BM25 from raw term counts. And doc 1 (3 distinct probe
    terms incl. the rarer 'join') outranks both — idf weighting."""
    rows = {r["doc_id"]: r["score_units"] for r in bm25_topk(docs_df).collect()}
    assert rows[6] > rows[2] > 0
    assert rows[6] < 5 * rows[2]  # tf 5× ⇒ score far less than 5×
    assert rows[1] > rows[6]  # term diversity + idf beats repetition


def test_bm25_k_truncates(spark, docs_df):
    assert bm25_topk(docs_df, k=2).count() == 2


def test_bm25_words_arr_matches_selfbuilt(spark, docs_df):
    """The r12 words_arr= rider (shared lowercased word-array stage)
    must produce exactly the self-tokenized output."""
    from etl_python_sqlite_spark.operators.curation import doc_words

    wa = doc_words(docs_df)
    got = [
        tuple(r)
        for r in bm25_topk(docs_df, n_probe_terms=3, k=10,
                           words_arr=wa).collect()
    ]
    want = [
        tuple(r) for r in bm25_topk(docs_df, n_probe_terms=3, k=10).collect()
    ]
    assert got == want
