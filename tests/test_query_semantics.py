"""Frozen query semantics (SURVEY.md §7.5 / FIXTURES.md F3):
absent terms, duplicate cursors, tie-breaks, k edge cases."""

from __future__ import annotations

from ds2s import query as Q


def _topk(spark, idx, rows, k=10):
    qdf = Q.queries_df(spark, rows)
    return Q.ranked_or_topk(idx, qdf, k=k, rank_round=None).collect()


def test_absent_term_and_empty(spark, synth_idx):
    qdf = Q.queries_df(spark, [(0, 0, "def"), (0, 1, "zzznope")])
    assert Q.ranked_and_topk(synth_idx, qdf, 10).count() == 0
    assert Q.and_count(synth_idx, qdf).collect()[0]["matches"] == 0


def test_absent_term_or_ignored(spark, synth_idx):
    with_missing = _topk(spark, synth_idx, [(0, 0, "def"), (0, 1, "zzznope")])
    without = _topk(spark, synth_idx, [(0, 0, "def")])
    assert [(r["doc_id"], r["score"]) for r in with_missing] == [
        (r["doc_id"], r["score"]) for r in without
    ]


def test_duplicate_term_doubles_score(spark, synth_idx):
    single = _topk(spark, synth_idx, [(0, 0, "def")], k=5)
    double = _topk(spark, synth_idx, [(0, 0, "def"), (0, 1, "def")], k=5)
    s1 = {r["doc_id"]: r["score"] for r in single}
    s2 = {r["doc_id"]: r["score"] for r in double}
    assert set(s1) == set(s2)
    for d, s in s1.items():
        assert abs(s2[d] - 2 * s) < 1e-9


def test_k_larger_than_matches(spark, synth_idx):
    rows = _topk(spark, synth_idx, [(0, 0, "singleton")], k=100)
    assert len(rows) == 1  # fixture has exactly one doc containing 'singleton'


def test_k_one(spark, synth_idx):
    rows = _topk(spark, synth_idx, [(0, 0, "def"), (0, 1, "return")], k=1)
    assert len(rows) == 1 and rows[0]["rank"] == 1


def test_rank_ordering_and_tiebreak(spark, synth_idx):
    rows = _topk(spark, synth_idx, [(0, 0, "def"), (0, 1, "class")], k=20)
    for a, b in zip(rows, rows[1:]):
        assert a["score"] > b["score"] or (
            a["score"] == b["score"] and a["doc_id"] < b["doc_id"]
        )


def test_and_subset_of_or(spark, synth_idx):
    qdf = Q.queries_df(spark, [(0, 0, "def"), (0, 1, "return")])
    a = Q.and_count(synth_idx, qdf).collect()[0]["matches"]
    o = Q.or_count(synth_idx, qdf).collect()[0]["matches"]
    assert 0 < a <= o


def test_dedupe_query_terms_honored(spark, synth_idx):
    """cfg.dedupe_query_terms=True collapses a repeated query term to ONE
    cursor in BOTH the exact path and the serving path (the knob was
    previously declared in IndexConfig but read by nothing — a silent
    no-op, round-5 review finding)."""
    import dataclasses

    from ds2s.serve import ServingIndex

    dup_q = [(0, 0, "def"), (0, 1, "def"), (0, 2, "return")]
    single_q = [(0, 0, "def"), (0, 1, "return")]

    def ranked(idx, rows):
        qdf = Q.queries_df(spark, rows=rows)
        out = Q.ranked_or_topk(idx, qdf, k=5).orderBy("rank").collect()
        return [(r["doc_id"], r["score"]) for r in out]

    base = ranked(synth_idx, dup_q)

    cfg2 = dataclasses.replace(synth_idx.cfg, dedupe_query_terms=True)
    idx2 = dataclasses.replace(synth_idx, cfg=cfg2)
    dd = ranked(idx2, dup_q)

    # deduped duplicate query ≡ the same query written once per term
    assert dd == ranked(idx2, single_q)
    # and differs from the default multiplicity weighting
    assert base != dd

    # serving path honors the knob identically
    sidx = ServingIndex(idx2)
    got = (
        sidx.topk(Q.queries_df(spark, rows=dup_q), k=5, algo="bmw")
        .orderBy("rank")
        .collect()
    )
    assert [(r["doc_id"], r["score"]) for r in got] == dd
    sidx.unpersist()
