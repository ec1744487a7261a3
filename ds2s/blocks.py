"""Compressed posting-block table — the block_freq_index analogue.

ds2i's block family splits each posting list into 128-posting blocks, each
encoded independently, with an embedded skip table of per-block last-docIDs
([U] ds2i/block_freq_index.hpp — upstream ot/ds2i layout, SURVEY.md §2.2).
Here the skip table is *relational*: one row per (term_id, block_id) with
``first_doc``/``last_doc`` columns, so block skipping becomes predicate
pushdown + partition pruning on plain columns instead of an embedded varint
list (SURVEY.md §4 "skip pointers" row).

Payloads are numpy-encoded inside Arrow-batched ``mapInPandas`` (no per-
posting Python; the only Python loop is per term-block over whole-array
kernels, which is the applyInPandas idiom).  Codecs (ds2s.codecs):

- ``ef`` / ``uniform_pef`` / ``pef``: absolute docIDs in [0, n_docs) —
  the freq_index/partitioned-sequence family;
- ``optpfd`` / ``gvb``: gap-1 deltas, ds2i's block-codec family;
- ``auto``: per-block cost-based choice (smallest encoding wins) — the
  block-granularity analogue of indexed_sequence::best_type
  ([U] ds2i/indexed_sequence.hpp).

Scale notes: encoding is embarrassingly parallel per term (narrow, after
the posting-array build); blocks of a hot term spread over the cluster by
(term_id, block_id); decode-all (the --check analogue of
[U] ds2i/create_freq_index.cpp) is a distributed mapInPandas, never a
driver collect.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .codecs import decode_docs, decode_tfs, encode_docs, encode_tfs
from .config import DEFAULT_CONFIG, IndexConfig

BLOCKS_SCHEMA = (
    "term_id int, block_id int, n int, first_doc long, last_doc long, "
    "doc_bytes binary, tf_bytes binary"
)

_AUTO_CANDIDATES = ("ef", "pef", "optpfd", "gvb")


def _encode_one(docs: np.ndarray, tfs: np.ndarray, universe: int, codec: str) -> tuple[bytes, bytes]:
    if codec == "auto":
        best_d = min(
            (encode_docs(docs, universe, c) for c in _AUTO_CANDIDATES), key=len
        )
        best_t = min((encode_tfs(tfs, c) for c in _AUTO_CANDIDATES), key=len)
        return best_d, best_t
    return encode_docs(docs, universe, codec), encode_tfs(tfs, codec)


def encode_blocks(
    postings: DataFrame,
    n_docs: int,
    cfg: IndexConfig = DEFAULT_CONFIG,
    codec: str | None = None,
    block_size: int | None = None,
) -> DataFrame:
    """postings(term_id, df, postings array<struct<doc,tf>>) → block rows.

    ``block_size`` postings per block (default cfg.block_size = 128, the
    ds2i block length); the last block of a list is short.  Serving joins
    these rows 1:1 with the block-max table (ds2s.wand.build_block_max)
    on (term_id, block_id).
    """
    codec = codec or cfg.doc_codec
    bs = int(block_size or cfg.block_size)
    universe = int(n_docs)

    flat = postings.select(
        "term_id",
        F.transform("postings", lambda p: p["doc"]).alias("docs"),
        F.transform("postings", lambda p: p["tf"]).alias("tfs"),
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out: dict[str, list] = {k: [] for k in (
                "term_id", "block_id", "n", "first_doc", "last_doc",
                "doc_bytes", "tf_bytes",
            )}
            for term_id, docs, tfs in zip(batch["term_id"], batch["docs"], batch["tfs"]):
                docs = np.asarray(docs, dtype=np.uint64)
                tfs = np.asarray(tfs, dtype=np.uint64)
                n = len(docs)
                for b in range(0, max(n, 1), bs):
                    d = docs[b : b + bs]
                    t = tfs[b : b + bs]
                    if len(d) == 0:
                        continue
                    db, tb = _encode_one(d, t, universe, codec)
                    out["term_id"].append(int(term_id))
                    out["block_id"].append(b // bs)
                    out["n"].append(len(d))
                    out["first_doc"].append(int(d[0]))
                    out["last_doc"].append(int(d[-1]))
                    out["doc_bytes"].append(db)
                    out["tf_bytes"].append(tb)
            yield pd.DataFrame(out)

    return flat.mapInPandas(enc, schema=BLOCKS_SCHEMA)


def decode_blocks_flat(blocks: DataFrame) -> DataFrame:
    """Block table → (term_id, pos, doc_id, tf): the decode-all `--check`
    analogue ([U] ds2i/create_freq_index.cpp --check).  ``pos`` is the
    in-list position across blocks — exact inverse of the encode, so this
    must equal the postings_arrays view bit-for-bit.
    """

    def dec(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("block_id")
        docs_all, tfs_all = [], []
        for db, tb in zip(pdf["doc_bytes"], pdf["tf_bytes"]):
            d, _ = decode_docs(bytes(db))
            t, _ = decode_tfs(bytes(tb))
            docs_all.append(d)
            tfs_all.append(t)
        docs = np.concatenate(docs_all) if docs_all else np.zeros(0, np.uint64)
        tfs = np.concatenate(tfs_all) if tfs_all else np.zeros(0, np.uint64)
        return pd.DataFrame(
            {
                "term_id": np.full(len(docs), key[0], dtype=np.int32),
                "pos": np.arange(len(docs), dtype=np.int32),
                "doc_id": docs.astype(np.int64),
                "tf": tfs.astype(np.int32),
            }
        )

    return blocks.groupBy("term_id").applyInPandas(
        dec, schema="term_id int, pos int, doc_id long, tf int"
    )


def index_size_report(blocks: DataFrame) -> DataFrame:
    """(n_terms, n_blocks, n_postings, doc_bytes, tf_bytes, bits_per_doc,
    bits_per_tf) — the compression-ratio scoreboard ds2i prints at build
    time ([U] ds2i/create_freq_index.cpp stats_line)."""
    return blocks.agg(
        F.countDistinct("term_id").cast("long").alias("n_terms"),
        F.count("*").cast("long").alias("n_blocks"),
        F.sum("n").cast("long").alias("n_postings"),
        F.sum(F.length("doc_bytes")).cast("long").alias("doc_bytes"),
        F.sum(F.length("tf_bytes")).cast("long").alias("tf_bytes"),
        F.round(F.sum(F.length("doc_bytes")) * 8.0 / F.sum("n"), 3).alias("bits_per_doc"),
        F.round(F.sum(F.length("tf_bytes")) * 8.0 / F.sum("n"), 3).alias("bits_per_tf"),
    )
