"""End-to-end golden test (SURVEY.md §5 item 3).

A COMMITTED fixture (tests/data/golden_topk_sf0001.json) freezes the
(qid, rank, doc_id, score) answer of the flagship BMW top-k over the
seeded sf0.001 corpus + the fixed query set.  The live DuckDB oracles
prove today's engine agrees with today's semantics; the golden file
additionally pins the semantics ACROSS sessions — a change to the
tokenizer, the scorer constants, tie-breaking, or rounding shows up
here as a diff even if engine and oracle drift together.

Regenerate ONLY deliberately (a frozen-semantics change), mirroring the
generation exactly: build sf0.001 → ServingIndex(codec="pef") →
topk(queries_df, k=10, algo="bmw") sorted by (qid, rank).
"""

import json
from pathlib import Path

import ds2s.query as Q
from ds2s.serve import ServingIndex

GOLDEN = Path(__file__).parent / "data" / "golden_topk_sf0001.json"


def test_bmw_topk_matches_committed_golden(spark, sidx_sf0001=None):
    from ds2s.corpus import load_documents
    from ds2s.invert import build_index

    idx = build_index(
        load_documents(spark, "/root/testdata/sf0.001"), build_arrays=False
    )
    sidx = ServingIndex(idx, codec="pef")
    got = [
        {
            "qid": int(r["qid"]),
            "rank": int(r["rank"]),
            "doc_id": int(r["doc_id"]),
            "score": float(r["score"]),
        }
        for r in sidx.topk(Q.queries_df(spark), k=10, algo="bmw")
        .orderBy("qid", "rank")
        .collect()
    ]
    exp = json.loads(GOLDEN.read_text())
    assert len(got) == len(exp), (len(got), len(exp))
    for g, e in zip(got, exp):
        assert g == e, (g, e)
