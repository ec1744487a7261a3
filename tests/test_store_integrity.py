"""Round-5 review findings: store fingerprint/rewrite crash safety,
from_store completeness gating, cache-handle release, u32 format guard.

The store protocol under test:
  * the unit-completeness fingerprint covers the WRITE ARGUMENTS that
    change bytes on disk (codec override, n_buckets, sb_size), not just
    IndexConfig — a codec-override rerun must rewrite, never no-op;
  * units about to be rewritten lose their manifest lines BEFORE their
    data dirs are overwritten — a crash mid-rewrite must read as
    "never completed" under every config;
  * from_store trusts only manifest-complete units: derivable tiers
    (wand_max, superblocks) fall back to recomputation, required tables
    (lexicon, blocks buckets) fail loudly.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest

from ds2s.manifest import IndexStore

N_BUCKETS = 2
TOTAL_UNITS = 3 + N_BUCKETS + 2 + 1


def _drop_unit_lines(store: IndexStore, unit: str) -> None:
    kept = [
        json.loads(l)
        for l in store.manifest_path.read_text().splitlines()
        if l.strip() and json.loads(l)["unit"] != unit
    ]
    store.manifest_path.write_text("".join(json.dumps(r) + "\n" for r in kept))


def test_codec_override_rerun_rewrites(tmp_path, spark, synth_idx):
    """write_checkpointed(codec='gvb') over a pef-written store must
    rewrite every unit (the override is part of the fingerprint), and the
    stored metadata must record the codec actually used — the old
    asdict(cfg)-only fingerprint made this a silent no-op that left
    _index.json claiming gvb over pef bytes."""
    store = IndexStore(str(tmp_path / "codecs"))
    store.write_checkpointed(
        synth_idx, source="synth", codec="pef", n_buckets=N_BUCKETS
    )
    assert store.load_meta()["codec"] == "pef"
    rewritten = store.write_checkpointed(
        synth_idx, source="synth", codec="gvb", n_buckets=N_BUCKETS
    )
    assert rewritten == TOTAL_UNITS
    assert store.load_meta()["codec"] == "gvb"
    # same args again → true no-op
    assert store.write_checkpointed(
        synth_idx, source="synth", codec="gvb", n_buckets=N_BUCKETS
    ) == 0


def test_crashed_rewrite_invalidates_stale_lines(tmp_path, spark, synth_idx):
    """Full store under config A; a rerun under config B crashes before
    the blocks overwrite completes.  A subsequent rerun under A must treat
    EVERY unit as incomplete (the stale A lines were invalidated before
    B touched the data) — the old protocol left A's bucket lines vouching
    for a dir B had already destroyed."""
    import dataclasses


    store = IndexStore(str(tmp_path / "crashb"))
    store.write_checkpointed(synth_idx, source="synth", n_buckets=N_BUCKETS)
    assert len(store.completed_units()) == TOTAL_UNITS

    cfg_b = dataclasses.replace(synth_idx.cfg, block_size=32)
    idx_b = dataclasses.replace(synth_idx, cfg=cfg_b)
    with pytest.raises(RuntimeError, match="injected failure"):
        store.write_checkpointed(
            idx_b, source="synth", n_buckets=N_BUCKETS, fail_after_units=3
        )
    # no unit may still claim config-A completeness
    rewritten = store.write_checkpointed(
        synth_idx, source="synth", n_buckets=N_BUCKETS
    )
    assert rewritten == TOTAL_UNITS
    # and the healed store serves correctly
    from ds2s import query as Q
    from ds2s.serve import ServingIndex

    sidx = ServingIndex.from_store(spark, store)
    qdf = Q.queries_df(spark, rows=[(0, 0, "def"), (0, 1, "return")])
    exact = (
        Q.ranked_or_topk(synth_idx, qdf, k=5)
        .orderBy("qid", "rank").toPandas().reset_index(drop=True)
    )
    got = (
        sidx.topk(qdf, k=5, algo="bmw")
        .orderBy("qid", "rank").toPandas().reset_index(drop=True)
    )
    sidx.unpersist()
    pd.testing.assert_frame_equal(
        got.astype({"qid": "int64", "rank": "int64"}),
        exact.astype({"qid": "int64", "rank": "int64"}),
        check_exact=False, atol=1e-8,
    )


def test_legacy_fingerprint_store_rewrites_cleanly(tmp_path, spark, synth_idx):
    """A store written BEFORE the fingerprint covered write arguments
    (its manifest lines hash only asdict(cfg)) must be treated as fully
    incomplete by the new code — one deterministic full rewrite, never a
    mixed-fingerprint manifest — and converge to a no-op afterwards."""
    import hashlib
    from dataclasses import asdict

    store = IndexStore(str(tmp_path / "legacy"))
    store.write_checkpointed(synth_idx, source="synth", n_buckets=N_BUCKETS)
    legacy_fp = hashlib.sha256(
        json.dumps(dict(asdict(synth_idx.cfg)), sort_keys=True).encode()
    ).hexdigest()[:16]
    rows = [
        {**json.loads(l), "config": legacy_fp}
        for l in store.manifest_path.read_text().splitlines()
        if l.strip()
    ]
    store.manifest_path.write_text("".join(json.dumps(r) + "\n" for r in rows))

    rewritten = store.write_checkpointed(
        synth_idx, source="synth", n_buckets=N_BUCKETS
    )
    assert rewritten == TOTAL_UNITS
    fps = {r["config"] for r in store.completed_units().values()}
    assert len(fps) == 1 and legacy_fp not in fps
    assert store.write_checkpointed(
        synth_idx, source="synth", n_buckets=N_BUCKETS
    ) == 0


def test_from_store_missing_required_unit_is_loud(tmp_path, spark, synth_idx):
    """A store whose lexicon (or any blocks bucket) has no manifest line
    must refuse to serve — there is no fallback for required tables, and
    silently reading a partially-committed dir corrupts top-k."""
    from ds2s.serve import ServingIndex

    store = IndexStore(str(tmp_path / "nolex"))
    store.write_checkpointed(synth_idx, source="synth", n_buckets=N_BUCKETS)
    _drop_unit_lines(store, "lexicon")
    with pytest.raises(RuntimeError, match="incomplete.*lexicon"):
        ServingIndex.from_store(spark, store)

    store2 = IndexStore(str(tmp_path / "nobucket"))
    store2.write_checkpointed(synth_idx, source="synth", n_buckets=N_BUCKETS)
    _drop_unit_lines(store2, "blocks_bucket_1")
    with pytest.raises(RuntimeError, match="incomplete.*blocks_bucket_1"):
        ServingIndex.from_store(spark, store2)


def test_partial_wand_max_table_ignored(tmp_path, spark, synth_idx):
    """A wand_max dir visible on disk but without a manifest line (crash
    mid-write) must be IGNORED and re-derived from blocks — loading the
    partial table drops per-term upper bounds and silently desyncs
    WAND/BMW pruning (round-5 review finding; twin of the superblocks
    gate test)."""
    import shutil

    from ds2s import query as Q
    from ds2s.serve import ServingIndex

    store = IndexStore(str(tmp_path / "wpart"))
    store.write_checkpointed(synth_idx, source="synth", n_buckets=N_BUCKETS)

    full = spark.read.parquet(str(store.root / "wand_max"))
    one = full.limit(1).toPandas()
    shutil.rmtree(store.root / "wand_max")
    spark.createDataFrame(one, schema=full.schema).write.parquet(
        str(store.root / "wand_max")
    )
    _drop_unit_lines(store, "wand_max")

    sidx = ServingIndex.from_store(spark, store)
    qdf = Q.queries_df(
        spark, rows=[(0, 0, "def"), (0, 1, "return"), (1, 0, "class")]
    )
    exact = (
        Q.ranked_or_topk(synth_idx, qdf, k=5)
        .orderBy("qid", "rank").toPandas().reset_index(drop=True)
    )
    got = (
        sidx.topk(qdf, k=5, algo="bmw")
        .orderBy("qid", "rank").toPandas().reset_index(drop=True)
    )
    sidx.unpersist()
    pd.testing.assert_frame_equal(
        got.astype({"qid": "int64", "rank": "int64"}),
        exact.astype({"qid": "int64", "rank": "int64"}),
        check_exact=False, atol=1e-8,
    )


def test_unpersist_releases_tf_terms_cache(spark):
    """build_index(persist_tf=False) keeps tf_terms cached as tf's lazy
    upstream; the handle must travel on the index so unpersist() releases
    it — the scaling/CLI loop shape (repeated builds in one JVM) otherwise
    pins a posting-table-sized cache per build forever."""
    from ds2s.corpus import synth_corpus
    from ds2s.invert import build_index

    idx = build_index(
        synth_corpus(spark), build_arrays=False, persist_tf=False
    )
    assert idx.extra_caches, "persist_tf=False must expose the tf_terms handle"
    assert all(df.storageLevel.useMemory for df in idx.extra_caches)
    idx.unpersist()
    assert all(not df.storageLevel.useMemory for df in idx.extra_caches)


def test_binfmt_rejects_out_of_range_u32(tmp_path):
    """The ds2i binary format is u32; values ≥ 2^32 (or negative) must
    raise, not wrap into a structurally-valid-but-corrupt file."""
    import numpy as np

    from ds2s.binfmt import _write_seq, read_sequences

    p = tmp_path / "seq.docs"
    with open(p, "wb") as fh:
        _write_seq(fh, np.asarray([1, 2, 3], dtype=np.int64))
        with pytest.raises(ValueError, match="u32"):
            _write_seq(fh, np.asarray([1, 2 ** 32], dtype=np.int64))
        with pytest.raises(ValueError, match="u32"):
            _write_seq(fh, np.asarray([-1, 5], dtype=np.int64))
    # the valid prefix stays readable
    seqs = list(read_sequences(str(p)))
    assert len(seqs) == 1 and seqs[0].tolist() == [1, 2, 3]


def test_salt_stride_shared_formula():
    """build_postings and blocks_from_tf must split hot-term runs with
    the SAME stride (round-5 review: the two sites had drifted to
    (max_doc+n)//n vs (n_docs+n)//n)."""
    from ds2s.blocks import range_salt_stride

    assert range_salt_stride(100, 4) == 26
    assert range_salt_stride(0, 4) == 1
    assert range_salt_stride(3, 16) == 1
    # every doc id in [0, universe) lands in a salt < n_salt
    for universe, n in [(100, 4), (1000, 16), (7, 3)]:
        s = range_salt_stride(universe, n)
        assert (universe - 1) // s < n


def test_uncached_store_serving_prunes_buckets(tmp_path, spark, synth_idx):
    """from_store(cache_blocks=False) — the 100 TB store-serving shape —
    must (a) leave the block table un-persisted, (b) push the per-batch
    term AND bucket predicates to the parquet scan (partition-directory
    pruning on bucket=term_id%n_buckets, PushedFilters on term_id), and
    (c) stay rank-identical to the exhaustive oracle."""
    from pyspark.storagelevel import StorageLevel

    from ds2s import query as Q
    from ds2s import serve
    from ds2s.serve import ServingIndex, _term_prefilter

    store = IndexStore(str(tmp_path / "uncached"))
    store.write_checkpointed(synth_idx, source="synth", n_buckets=N_BUCKETS)
    sidx = ServingIndex.from_store(spark, store, cache_blocks=False)
    try:
        assert sidx.blocks.storageLevel == StorageLevel.NONE
        assert sidx._n_buckets == N_BUCKETS

        # plan-level: both predicates reach the file scan
        tids = [int(r["term_id"]) for r in sidx.lexicon.limit(3).collect()]
        plan = (
            _term_prefilter(sidx.blocks, tids, sidx._n_buckets)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PushedFilters: [In(term_id" in plan, plan
        assert "PartitionFilters: [" in plan and "bucket" in plan, plan

        qdf = Q.queries_df(spark, rows=[(0, 0, "def"), (0, 1, "return")])
        exact = (
            Q.ranked_or_topk(synth_idx, qdf, k=5)
            .orderBy("qid", "rank").toPandas().reset_index(drop=True)
        )
        for algo in ("bmw", "maxscore", "wand"):
            got = (
                sidx.topk(qdf, k=5, algo=algo)
                .orderBy("qid", "rank").toPandas().reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                got.astype({"qid": "int64", "rank": "int64"}),
                exact.astype({"qid": "int64", "rank": "int64"}),
                check_exact=False, atol=1e-8,
            )
    finally:
        sidx.unpersist()
