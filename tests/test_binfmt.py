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


def test_write_seq_u32_guard_sees_true_values():
    """Out-of-range values must raise from the u32 guard, never pre-wrap:
    export pre-cast to '<u4' used to wrap doc_ids >= 2^32 BEFORE the
    guard could see them (round-5 review finding)."""
    import io

    import numpy as np
    import pytest

    from ds2s.binfmt import _write_seq

    with pytest.raises(ValueError, match="u32"):
        _write_seq(io.BytesIO(), np.array([2**32 + 5], dtype=np.int64))
    with pytest.raises(ValueError, match="u32"):
        _write_seq(io.BytesIO(), np.array([-1], dtype=np.int64))


def test_read_collection_rejects_corrupt_pairs(tmp_path):
    """A .docs/.freqs pair disagreeing on term count, or a mid-sequence
    truncation, must fail loudly instead of silently truncating the
    index (round-5 review finding)."""
    import numpy as np
    import pytest

    from ds2s.binfmt import read_collection, read_sequences, write_collection

    base = str(tmp_path / "col")
    docs = [
        (np.array([0, 3], dtype=np.int64), np.array([1, 2], dtype=np.int64)),
        (np.array([1], dtype=np.int64), np.array([4], dtype=np.int64)),
    ]
    write_collection(base, 5, iter(docs), np.array([2, 1, 1, 2, 0], dtype=np.int64))

    # drop the last .freqs sequence -> term counts disagree
    raw = np.fromfile(f"{base}.freqs", dtype="<u4")
    raw[: len(raw) - 2].tofile(f"{base}.freqs")
    with pytest.raises(ValueError):
        read_collection(base)

    # mid-sequence truncation of .docs -> loud error from read_sequences
    raw = np.fromfile(f"{base}.docs", dtype="<u4")
    raw[: len(raw) - 1].tofile(f"{base}.docs")
    with pytest.raises(ValueError, match="truncated"):
        list(read_sequences(f"{base}.docs"))
