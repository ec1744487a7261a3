"""ds2i binary collection format: pure-python/numpy reader + writer.

The reference consumes corpora as three flat little-endian uint32 files
([U] ds2i/binary_collection.hpp, binary_freq_collection.hpp — upstream
ot/ds2i layout, SURVEY.md §1.1):

- ``basename.docs``  — sequence ``(1, [N])`` then, per term in termID
  order, ``(len, sorted docIDs)``;
- ``basename.freqs`` — per term, ``(len, tfs)`` positionally aligned with
  ``.docs`` (no leading N);
- ``basename.sizes`` — one sequence ``(N, doc lengths)``.

Every sequence is ``(length: u32, values: u32[length])``.  This module
exists for INTEROP: export an index built by this engine into the exact
byte format ds2i's tools read, and import a ds2i-format corpus into the
engine's tables — the golden-file bridge for rank-identity fixtures
(SURVEY.md §2.1 scan row).  Export collects per-term arrays through
toLocalIterator in termID order — a driver-side serializer for
fixture-scale interop files, not a cluster write path (the cluster-scale
index format IS the partitioned tables, ds2s.manifest).
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import numpy as np


def _write_seq(fh, values: np.ndarray) -> None:
    arr = np.asarray(values)
    if arr.size:
        lo, hi = int(arr.min()), int(arr.max())
        if lo < 0 or hi > 0xFFFFFFFF:
            # astype('<u4') would WRAP silently — a structurally valid
            # file full of corrupt values that every downstream
            # rank-identity check then trusts (round-5 review finding);
            # the u32 format limit must be an error, not corruption
            raise ValueError(
                f"ds2i binary format is u32; sequence holds values "
                f"outside [0, 2^32): min={lo} max={hi}"
            )
    np.asarray([arr.size], dtype="<u4").tofile(fh)
    arr.astype("<u4").tofile(fh)


def read_sequences(path: str) -> Iterator[np.ndarray]:
    """Yield each ``(len, values)`` sequence as a numpy array."""
    buf = np.fromfile(path, dtype="<u4")
    off = 0
    while off < len(buf):
        n = int(buf[off])
        off += 1
        if off + n > len(buf):
            # a mid-sequence truncation must fail loudly, not yield a
            # short final array that downstream checks silently trust
            raise ValueError(
                f"{path}: truncated sequence at word {off - 1}: header "
                f"says {n} values, file holds {len(buf) - off}"
            )
        yield buf[off : off + n]
        off += n


def write_collection(
    basename: str,
    n_docs: int,
    term_postings: Iterator[tuple[np.ndarray, np.ndarray]],
    sizes: np.ndarray,
) -> None:
    """Write ``.docs``/``.freqs``/``.sizes`` from per-term (docs, tfs)
    arrays supplied in termID order."""
    base = Path(basename)
    with open(f"{base}.docs", "wb") as fd, open(f"{base}.freqs", "wb") as ff:
        _write_seq(fd, np.asarray([n_docs], dtype=np.int64))
        for docs, tfs in term_postings:
            _write_seq(fd, docs)
            _write_seq(ff, tfs)
    with open(f"{base}.sizes", "wb") as fs:
        _write_seq(fs, sizes)


def read_collection(basename: str):
    """→ (n_docs, [(docs, tfs) per term], sizes)."""
    base = Path(basename)
    docs_seqs = read_sequences(f"{base}.docs")
    n_docs = int(next(docs_seqs)[0])
    freqs_seqs = read_sequences(f"{base}.freqs")
    # strict: a .docs/.freqs pair disagreeing on term count is corruption
    # and must be rejected, not silently truncated to the shorter file
    postings = [(d, f) for d, f in zip(docs_seqs, freqs_seqs, strict=True)]
    sizes = next(read_sequences(f"{base}.sizes"))
    return n_docs, postings, sizes


def export_index(idx, basename: str) -> int:
    """InvertedIndex → ds2i binary collection; returns n_terms.

    Terms stream in termID order; each term's postings are fetched as
    sorted arrays (docID order is the format invariant)."""
    from pyspark.sql import functions as F

    flat = (
        idx.tf.select("term_id", "doc_id", "tf")
        .groupBy("term_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("doc_id").alias("doc"), F.col("tf")))
            ).alias("plist")
        )
        .select(
            "term_id",
            F.transform("plist", lambda p: p["doc"]).alias("docs"),
            F.transform("plist", lambda p: p["tf"]).alias("tfs"),
        )
        .orderBy("term_id")
    )
    sizes_rows = idx.sizes.orderBy("doc_id").collect()
    # int64, NOT '<u4': pre-casting would wrap out-of-range values before
    # _write_seq's u32 range guard could see them — the guard must always
    # observe the true values (round-5 review finding)
    sizes = np.array([r["len"] for r in sizes_rows], dtype=np.int64)

    def gen():
        for row in flat.toLocalIterator():
            yield (
                np.asarray(row["docs"], dtype=np.int64),
                np.asarray(row["tfs"], dtype=np.int64),
            )

    n_terms = 0

    def counting():
        nonlocal n_terms
        for item in gen():
            n_terms += 1
            yield item

    write_collection(basename, idx.n_docs, counting(), sizes)
    return n_terms


def import_collection(spark, basename: str):
    """ds2i binary collection → (tf_df, sizes_df, n_docs) with the
    engine's table schemas — queries run against imported reference-format
    corpora without retokenizing."""
    n_docs, postings, sizes = read_collection(basename)
    tf_rows = [
        (t, int(d), int(f))
        for t, (docs, tfs) in enumerate(postings)
        for d, f in zip(docs, tfs)
    ]
    tf = spark.createDataFrame(tf_rows, schema="term_id int, doc_id long, tf int")
    sizes_df = spark.createDataFrame(
        [(i, int(s)) for i, s in enumerate(sizes)], schema="doc_id long, len int"
    )
    return tf, sizes_df, n_docs
