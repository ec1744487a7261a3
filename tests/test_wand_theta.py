"""Regression: _wand_topk must rank (sort+trim) the running candidate set
whenever it has REACHED k — including exactly k — before raising θ from
best_scores[-1].

Bug shape (round-3 advice, ds2s/serve.py _wand_topk): when the candidate
set hit exactly k without exceeding it, the sort branch was skipped, so
best_docs/best_scores stayed in docID order and best_scores[-1] was an
arbitrary candidate's score.  If the highest-scoring doc also had the
highest docID in the first chunk, θ was inflated to (max − quantum) and a
later interval holding a true top-k doc was pruned — 'wand' diverged from
the ranked-OR oracle.

This test builds that exact trap directly against the kernel (no Spark):
one term, one posting per block, 17 blocks at even docIDs 0..32 so the
interval grid has 34 points and the sweep needs two chunks (chunk size
starts at 32 intervals).  Chunk 1 holds exactly k=16 docs whose
max-scoring doc is the LAST in docID order; doc 32 arrives in chunk 2
with a score above the true 16th best but below the inflated θ.
"""

from __future__ import annotations

import numpy as np

from ds2s.codecs import encode_docs, encode_tfs
from ds2s.config import DEFAULT_SCORER
from ds2s.serve import _rank, _wand_topk


def _score(tf: float, k1: float, b: float, ln: float, avg: float) -> float:
    return tf / (tf + k1 * (1.0 - b + b * ln / avg))


def test_wand_theta_not_inflated_at_exact_k():
    scorer = DEFAULT_SCORER
    k1, b = scorer.k1, scorer.b
    avg = 10.0
    w, idf = 1.0, 1.0
    k = 16

    # docs 0,2,...,32: one per block. tf picks the score ordering:
    #   doc 0 lowest, docs 2..28 middle, doc 30 highest, doc 32 between.
    docs = np.arange(0, 34, 2, dtype=np.int64)
    tfs = np.full(len(docs), 5, dtype=np.int64)
    tfs[0] = 1        # lowest — the only doc outside the true top-16
    tfs[-2] = 1000    # doc 30: max score, last in chunk-1 docID order
    tfs[-1] = 10      # doc 32: in the true top-16, arrives in chunk 2
    lens = np.full(len(docs), int(avg), dtype=np.int64)

    payloads = []
    bmax = np.empty(len(docs), dtype=np.float64)
    for i, (d, tf, ln) in enumerate(zip(docs, tfs, lens)):
        payloads.append(
            (
                encode_docs(np.array([d], dtype=np.int64), int(d) + 1, "ef"),
                encode_tfs(np.array([tf], dtype=np.int64), "ef"),
                encode_tfs(np.array([ln], dtype=np.int64), "ef"),
            )
        )
        bmax[i] = idf * _score(float(tf), k1, b, float(ln), avg)

    per_term = [
        dict(
            firsts=docs, lasts=docs, ubs=bmax * w,
            block_first=docs, block_last=docs,
            payloads=payloads, w=w, idf=idf,
        )
    ]

    got_docs, got_scores = _wand_topk(
        per_term, k, theta0=0.0, avg=avg, scorer=scorer, rank_round=6
    )

    # oracle: exhaustive scoring of every posting, same tie discipline
    all_scores = w * bmax
    exp_docs, exp_scores = _rank(docs.copy(), all_scores.copy(), k, 6)

    assert 32 in exp_docs and 0 not in exp_docs  # the trap is armed
    np.testing.assert_array_equal(got_docs, exp_docs)
    np.testing.assert_allclose(got_scores, exp_scores, rtol=0, atol=1e-12)
