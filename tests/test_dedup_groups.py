"""dup_groups (connected-component resolution) + embedding_near_dup_ann
(bucketed near-dup) — round-3 verdict items 2 and 3.

dup_groups is EXACT (the label propagation converges to the transitive
closure), so it gets both a DuckDB recursive-CTE oracle check and a
brute-force union-find property test on a seeded random graph.
embedding_near_dup_ann is approximate by design: its output must be a
SUBSET of the quadratic oracle's pairs with identical cosines, and recall
must clear a floor on a clustered fixture (the regime near-dup targets).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from compare_util import assert_match, duck_run

from ds2s import dedup, oracle_text as OT

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


def _union_find_groups(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Brute-force transitive closure: node -> min node of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_dup_groups_oracle_parity(docs):
    assert_match(
        dedup.dup_groups(docs), duck_run(OT.sql_dup_groups(), SF), "dup_groups"
    )


def test_dup_groups_equals_union_find_on_random_graph(spark):
    """Seeded random edge set with long chains (worst case for plain
    hash-min — exercises the pointer-jumping) → groups must equal the
    brute-force union-find closure."""
    rng = np.random.default_rng(13)
    edges: set[tuple[int, int]] = set()
    # 3 long chains (diameter ~60) + random clutter + self-contained pairs
    for c in range(3):
        base = c * 1000
        edges |= {(base + i, base + i + 1) for i in range(60)}
    for _ in range(150):
        a, b = map(int, rng.integers(0, 5000, 2))
        if a != b:
            edges.add((min(a, b), max(a, b)))
    pairs = sorted(edges)
    pdf = spark.createDataFrame(pairs, schema="doc_a long, doc_b long")
    exp = _union_find_groups(pairs)
    # both paths must agree with the brute-force closure: the driver
    # union-find fast path (cap default) AND the distributed label
    # propagation (collect_cap=0 forces it)
    for cap in (2_000_000, 0):
        got = {
            r["doc_id"]: (r["group_id"], r["is_keeper"])
            for r in dedup.dup_groups(edges=pdf, collect_cap=cap).collect()
        }
        assert set(got) == set(exp), f"cap={cap}"
        for node, root in exp.items():
            assert got[node] == (root, int(node == root)), (cap, node)


def test_near_dup_ann_subset_and_recall(spark):
    """Clustered fixture (planted near-dup pairs): the bucketed operator's
    pairs ⊆ quadratic oracle pairs with identical cosines, and recall on
    the planted structure clears 0.9 for IVF."""
    rng = np.random.default_rng(7)
    dim, n_base = 24, 400
    base = rng.normal(size=(n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [base[i] for i in range(n_base)]
    # plant 80 near-dups: tiny perturbations of existing vectors
    for i in range(80):
        vecs.append(base[i] + 0.03 * rng.normal(size=dim))
    embs = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).persist()

    oracle = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in dedup.embedding_near_dup(embs, threshold=0.98).collect()
    }
    assert len(oracle) >= 70  # the planted pairs are there
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in dedup.embedding_near_dup_ann(
            embs, threshold=0.98, method="ivf"
        ).collect()
    }
    assert set(got) <= set(oracle)
    for pair, cos in got.items():
        assert cos == oracle[pair], pair
    recall = len(got) / len(oracle)
    assert recall >= 0.9, f"ivf near-dup recall {recall:.3f}"

    got_lsh = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in dedup.embedding_near_dup_ann(
            embs, threshold=0.98, method="lsh"
        ).collect()
    }
    assert set(got_lsh) <= set(oracle)
    recall_lsh = len(got_lsh) / len(oracle)
    assert recall_lsh >= 0.9, f"lsh near-dup recall {recall_lsh:.3f}"


def test_near_dup_ann_full_probe_equals_quadratic(spark):
    """With nprobe = n_centroids every vector probes every cell, so the
    candidate rule (one side's primary cell ∈ the other side's probe
    list) admits ALL pairs — the bucket-join + exact-cosine machinery
    must then equal the quadratic oracle EXACTLY, pinning the whole ANN
    path (assignment, self-join, float64 verify) with recall forced to 1.
    This is the property behind the oracle-checked driver query
    embedding_near_dup_ann_full."""
    rng = np.random.default_rng(11)
    dim, n = 16, 150
    vecs = rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs[50] = vecs[20] + 0.01 * rng.normal(size=dim)  # a planted pair
    embs = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).persist()
    oracle = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in dedup.embedding_near_dup(embs, threshold=0.5).collect()
    }
    assert oracle  # non-vacuous
    full = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in dedup.embedding_near_dup_ann(
            embs, threshold=0.5, method="ivf", n_centroids=6, nprobe=6
        ).collect()
    }
    embs.unpersist()
    assert full == oracle


def test_dedup_filter_oracle_parity(docs):
    assert_match(
        dedup.dedup_filter(docs), duck_run(OT.sql_dedup_filter(), SF), "dedup_filter"
    )


def test_dedup_filter_keeps_keepers_and_singletons(docs):
    n = docs.count()
    groups = dedup.dup_groups(docs).collect()
    non_keepers = sum(1 for r in groups if r["is_keeper"] == 0)
    kept = dedup.dedup_filter(docs).count()
    assert kept == n - non_keepers


def test_ivf_arm_bucket_cap_bounds_duplicate_flood(spark):
    """A near-duplicate FLOOD collapses into one k-means cell that every
    member also probes — without a cap the cluster self-join is quadratic
    in the flood size (round-5 review finding).  With max_bucket_df below
    the flood, the hot cell drops out of candidate generation entirely
    (declared semantics, same as the LSH arm); with the cap disabled the
    flood's full pair set comes back."""
    rng = np.random.default_rng(11)
    dim = 16
    anchor = rng.normal(size=dim)
    anchor /= np.linalg.norm(anchor)
    flood = [anchor + 1e-4 * rng.normal(size=dim) for _ in range(60)]
    spread = rng.normal(size=(40, dim))
    vecs = flood + [v for v in spread]
    embs = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).persist()

    uncapped = dedup.embedding_near_dup_ann(
        embs, threshold=0.999, method="ivf", n_centroids=8, nprobe=2,
        max_bucket_df=0,
    ).count()
    assert uncapped >= 60 * 59 / 2 * 0.9  # the flood's pairs are found

    capped = dedup.embedding_near_dup_ann(
        embs, threshold=0.999, method="ivf", n_centroids=8, nprobe=2,
        max_bucket_df=32,
    ).count()
    # every cell the flood lands in exceeds the cap, so its quadratic
    # pair mass is gone; only (at most) spread-vector pairs remain
    assert capped < 40 * 39 / 2
    embs.unpersist()
