"""simhash_near_dup_pairs: banded pair generation over 64-bit SimHash.

Three properties pin the operator:

- RECALL 1 vs a quadratic scan for max_hamming ≤ n_bands − 1 (the Manku
  et al. 2007 pigeonhole: ≤ n_bands−1 differing bits leave ≥1 of the
  n_bands equal-width bands untouched, so every qualifying pair shares a
  band key and is generated as a candidate).  Verified against a plain
  python popcount over the collected signatures — an implementation-free
  oracle — on a seeded corpus with planted duplicate/near-dup groups.
- The ``max_band_df`` bucket cap bounds a degenerate boilerplate flood
  (same declared semantics as minhash_lsh_pairs' cap) while genuinely
  small buckets survive.
- The DuckDB oracle carries the SAME banded-candidate + cap semantics —
  parity must hold with a cap tight enough to fire on the real fixture.
"""

from __future__ import annotations

import numpy as np
import pytest

from compare_util import assert_match, duck_run

from ds2s import dedup
from ds2s import oracle_text as OT

SF = "/root/testdata/sf0.001"

BOILER = (
    "license header copyright notice all rights reserved permission is "
    "hereby granted free of charge to any person obtaining a copy"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def planted_docs(spark):
    """Seeded random-word corpus + planted exact-dup groups (hamming 0 —
    guaranteed qualifying pairs) + one-token variants (small but nonzero
    hamming, may or may not qualify — the quadratic scan decides)."""
    rng = np.random.default_rng(7)
    vocab = [f"tok{i}" for i in range(200)]
    rows = []
    for i in range(60):
        rows.append((i, " ".join(rng.choice(vocab, size=40))))
    # exact-dup groups: 100/101 and 110/111/112 share text
    base_a = " ".join(rng.choice(vocab, size=40))
    base_b = " ".join(rng.choice(vocab, size=40))
    rows += [(100, base_a), (101, base_a)]
    rows += [(110, base_b), (111, base_b), (112, base_b)]
    # near variants: one token appended
    rows += [(120, base_a + " extra"), (121, base_b + " other")]
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def _quadratic_pairs(sig_rows, max_hamming):
    """Implementation-free reference: popcount over all signature pairs."""
    sigs = {r["doc_id"]: int(r["simhash"], 16) for r in sig_rows}
    ids = sorted(sigs)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= max_hamming:
                out.add((a, b, h))
    return out


@pytest.mark.parametrize("n_bands,max_hamming", [(4, 3), (8, 7)])
def test_recall_one_vs_quadratic(planted_docs, n_bands, max_hamming):
    sig_rows = dedup.simhash64(planted_docs).collect()
    expected = _quadratic_pairs(sig_rows, max_hamming)
    # the planted exact dups guarantee the property isn't vacuous
    assert {(100, 101, 0), (110, 111, 0), (110, 112, 0), (111, 112, 0)} <= expected
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_near_dup_pairs(
            planted_docs, max_hamming=max_hamming, n_bands=n_bands,
            max_band_df=0,
        ).collect()
    }
    assert got == expected


def test_band_cap_bounds_degenerate_corpus(spark):
    """40-doc boilerplate flood (identical text ⇒ identical fingerprint ⇒
    one 40-member bucket in every band) must be dropped under the cap;
    the planted 2-doc group survives.  Uncapped, the flood is quadratic."""
    rows = [(i, BOILER) for i in range(40)]
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = dedup.simhash_near_dup_pairs(docs, max_band_df=0).collect()
    assert sum(1 for r in uncapped if r["doc_a"] < 100) == 40 * 39 // 2

    capped = dedup.simhash_near_dup_pairs(docs, max_band_df=10).collect()
    assert {(r["doc_a"], r["doc_b"], r["hamming"]) for r in capped} == {
        (100, 101, 0)
    }


def test_capped_oracle_parity(docs):
    """Engine ≡ DuckDB with a cap tight enough to actually drop fixture
    buckets — both sides must drop exactly the same ones."""
    assert_match(
        dedup.simhash_near_dup_pairs(docs, max_band_df=2),
        duck_run(OT.sql_simhash_near_dup_pairs(max_band_df=2), SF),
        "simhash_near_dup_pairs_cap2",
    )


def test_signatures_reuse_path(docs):
    """Passing a precomputed simhash64 table must not change the output
    (the pipeline-sharing path: tokenize once, consume twice)."""
    sig = dedup.simhash64(docs).persist()
    sig.count()
    direct = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_near_dup_pairs(docs).collect()
    }
    shared = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in dedup.simhash_near_dup_pairs(docs, signatures=sig).collect()
    }
    sig.unpersist()
    assert direct == shared


def test_invalid_n_bands_rejected(docs):
    with pytest.raises(ValueError, match="divide"):
        dedup.simhash_near_dup_pairs(docs, n_bands=3)
    # n_bands=1 would build a 64-bit band int that overflows the signed
    # long conv cast (null hamming → silently dropped rows) — rejected
    with pytest.raises(ValueError, match="≥ 2"):
        dedup.simhash_near_dup_pairs(docs, n_bands=1)


def test_dup_edges_union_simhash(docs, spark):
    """dup_edges(simhash_pairs=...) must be exactly the default edge set
    ∪ the supplied SimHash pairs (distinct) — opt-in union, default
    semantics (and the recursive-CTE oracle) untouched."""
    sp = dedup.simhash_near_dup_pairs(docs).persist()
    base = {
        (r["doc_a"], r["doc_b"]) for r in dedup.dup_edges(docs).collect()
    }
    merged = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dup_edges(docs, simhash_pairs=sp).collect()
    }
    sh = {(r["doc_a"], r["doc_b"]) for r in sp.collect()}
    sp.unpersist()
    assert merged == base | sh

    # the complementary-signal case: SimHash is token-ORDER-invariant
    # (tf-based) while MinHash shingles are order-sensitive — a permuted
    # doc is hamming-0 to the original but shares no shingle band, so
    # only the simhash_pairs union links it
    toks = [f"tok{i}" for i in range(40)]
    perm_docs = spark.createDataFrame(
        [(0, " ".join(toks)), (1, " ".join(reversed(toks)))],
        "doc_id long, text string",
    )
    assert dedup.dup_edges(perm_docs).count() == 0
    sh2 = dedup.simhash_near_dup_pairs(perm_docs)
    linked = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dup_edges(perm_docs, simhash_pairs=sh2).collect()
    }
    assert linked == {(0, 1)}
