"""Resume protocol (kill/rerun), lineage metrics, sha256 invariant
(SURVEY.md §7 Milestone 5; north-rule checkpoint requirement)."""

from __future__ import annotations

import pandas as pd
import pytest

from ds2s.blocks import decode_blocks_flat
from ds2s.manifest import IndexStore


N_BUCKETS = 4
TOTAL_UNITS = 3 + N_BUCKETS + 1  # corpus_manifest, sizes, lexicon, buckets, _index


def test_checkpoint_resume_roundtrip(tmp_path, spark, synth_idx):
    store = IndexStore(str(tmp_path / "idx"))

    # first run dies after 5 units (mid-bucket territory)
    with pytest.raises(RuntimeError, match="injected failure"):
        store.write_checkpointed(
            synth_idx, source="synth", codec="pef", n_buckets=N_BUCKETS,
            fail_after_units=5,
        )
    assert len(store.completed_units()) == 5

    # resume: only the remaining units are written
    written = store.write_checkpointed(
        synth_idx, source="synth", codec="pef", n_buckets=N_BUCKETS
    )
    assert written == TOTAL_UNITS - 5
    assert len(store.completed_units()) == TOTAL_UNITS

    # idempotent: a third run writes nothing
    assert (
        store.write_checkpointed(
            synth_idx, source="synth", codec="pef", n_buckets=N_BUCKETS
        )
        == 0
    )

    # loaded blocks decode to exactly the uncompressed postings
    got = (
        decode_blocks_flat(store.load_blocks(spark))
        .orderBy("term_id", "pos")
        .select("term_id", "doc_id", "tf")
        .toPandas()
        .reset_index(drop=True)
    )
    exp = (
        synth_idx.tf.select("term_id", "doc_id", "tf")
        .orderBy("term_id", "doc_id")
        .toPandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))

    # per-row sha256 invariant against the live source
    assert store.verify_sha256(synth_idx.corpus) == 0

    # lineage + metrics table
    m = store.metrics_df(spark).toPandas()
    assert len(m) == TOTAL_UNITS
    assert (m["wall_s"] >= 0).all()
    assert m["config"].nunique() == 1

    meta = store.load_meta()
    assert meta["n_docs"] == synth_idx.n_docs
    assert meta["codec"] == "pef"


def test_sha256_detects_tamper(tmp_path, spark, synth_idx):
    from pyspark.sql import functions as F

    store = IndexStore(str(tmp_path / "idx2"))
    store.write_checkpointed(synth_idx, source="synth", n_buckets=2)
    tampered = synth_idx.corpus.withColumn(
        "content",
        F.when(F.col("doc_id") == 3, F.lit("EVIL")).otherwise(F.col("content")),
    )
    assert store.verify_sha256(tampered) == 1
