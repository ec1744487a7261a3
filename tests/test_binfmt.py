"""ds2i binary-format interop: export → re-read equality, format
invariants, import → query path ([U] ds2i/binary_collection.hpp layout)."""

from __future__ import annotations

import numpy as np

from ds2s import binfmt


def test_export_roundtrip(tmp_path, synth_idx):
    base = str(tmp_path / "synth")
    n_terms = binfmt.export_index(synth_idx, base)
    n_docs, postings, sizes = binfmt.read_collection(base)

    assert n_docs == synth_idx.n_docs
    assert n_terms == len(postings) == synth_idx.lexicon.count()
    assert len(sizes) == synth_idx.n_docs

    # format invariants: strictly increasing docIDs, tfs >= 1, alignment
    for docs, tfs in postings:
        assert len(docs) == len(tfs)
        assert (np.diff(docs.astype(np.int64)) > 0).all()
        assert (tfs >= 1).all()

    # exact equality with the engine's flat postings
    exp = (
        synth_idx.tf.select("term_id", "doc_id", "tf")
        .orderBy("term_id", "doc_id")
        .collect()
    )
    got = [
        (t, int(d), int(f))
        for t, (docs, tfs) in enumerate(postings)
        for d, f in zip(docs, tfs)
    ]
    assert got == [(r["term_id"], r["doc_id"], r["tf"]) for r in exp]

    # sizes match
    exp_sizes = {r["doc_id"]: r["len"] for r in synth_idx.sizes.collect()}
    assert all(int(sizes[i]) == exp_sizes[i] for i in range(n_docs))


def test_import_and_stats(tmp_path, spark, synth_idx):
    """Imported collection reproduces collection stats (df, N, totals)."""
    import pyspark.sql.functions as F

    base = str(tmp_path / "synth2")
    binfmt.export_index(synth_idx, base)
    tf, sizes_df, n_docs = binfmt.import_collection(spark, base)

    assert n_docs == synth_idx.n_docs
    assert tf.count() == synth_idx.tf.count()
    # per-term document frequencies identical
    got_df = {
        r["term_id"]: r["df"]
        for r in tf.groupBy("term_id").agg(F.count("*").alias("df")).collect()
    }
    exp_df = {r["term_id"]: r["df"] for r in synth_idx.lexicon.collect()}
    assert got_df == exp_df
    assert (
        sizes_df.agg(F.sum("len")).collect()[0][0]
        == synth_idx.sizes.agg(F.sum("len")).collect()[0][0]
    )


def test_write_read_lowlevel(tmp_path):
    base = str(tmp_path / "tiny")
    docs0 = np.array([0, 3, 7], dtype="<u4")
    tfs0 = np.array([1, 2, 1], dtype="<u4")
    docs1 = np.array([2], dtype="<u4")
    tfs1 = np.array([5], dtype="<u4")
    sizes = np.array([4, 0, 9, 1, 1, 1, 1, 2], dtype="<u4")
    binfmt.write_collection(base, 8, iter([(docs0, tfs0), (docs1, tfs1)]), sizes)
    n_docs, postings, got_sizes = binfmt.read_collection(base)
    assert n_docs == 8 and len(postings) == 2
    assert postings[0][0].tolist() == [0, 3, 7]
    assert postings[0][1].tolist() == [1, 2, 1]
    assert postings[1][0].tolist() == [2]
    assert postings[1][1].tolist() == [5]
    assert got_sizes.tolist() == sizes.tolist()
    # byte-level: .docs begins with the singleton [N] sequence
    raw = np.fromfile(f"{base}.docs", dtype="<u4")
    assert raw[0] == 1 and raw[1] == 8 and raw[2] == 3
