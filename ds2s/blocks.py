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

# v2 layout: per-block doc-length payload (kills the driver-side dense lens
# array — BM25 normalization data travels WITH the block, the way ds2i ships
# wand_data norm-lens next to the index) and the block-max score computed in
# the same kernel that encodes the block (no separate skewed window pass).
BLOCKS_SCHEMA_SCORED = BLOCKS_SCHEMA + ", len_bytes binary, block_max_score double"

_AUTO_CANDIDATES = ("ef", "pef", "optpfd", "gvb", "interp")


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
    codec = codec or cfg.block_codec
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


def blocks_from_tf(
    tf: DataFrame,
    n_docs: int,
    cfg: IndexConfig = DEFAULT_CONFIG,
    codec: str | None = None,
    block_size: int | None = None,
    n_salt: int | None = None,
    avg_len: float | None = None,
) -> DataFrame:
    """Flat postings (term_id, doc_id, tf) → encoded block rows WITHOUT the
    monolithic per-term array intermediate.

    The array route (build_postings → encode_blocks) materializes one row
    per term; a hot term's full posting list in a single row is exactly
    what breaks at scale (measured: 71 s vs 2 s for a 22 M-posting corpus
    whose vocabulary is 31 ultra-hot terms; GC-bound and worse with more
    threads).  This is the scale path:

    1. range-salt doc space into ``n_salt`` disjoint strides — positions
       are computable per (term, salt) locally;
    2. per-(term, salt) posting counts → prefix offsets via a windowed
       cumulative sum (≤ n_salt rows per term — skew-free) joined back on
       the same (term, salt) keys the big shuffle already uses, so the
       exchange is shared; nothing vocabulary-sized touches the driver;
    3. ONE shuffle of the posting table: groupBy (term, salt) →
       applyInPandas sorts the run in numpy and splits it into
       128-position-ALIGNED fragments (global pos = offset + local rank);
    4. fragments (≈ one per block; more only where a block straddles a
       salt boundary) repartition by (term, block) — bounded rows,
       skew-free — and stream through a partition-wise merge+encode
       kernel.

    When the input carries ``len`` (doc length) and ``df`` columns and
    ``avg_len`` is given, the kernel additionally emits a per-block
    encoded length payload (``len_bytes``) and the block-max BM25 score
    (``block_max_score``) — ds2i's wand_data/block-max metadata derived in
    the SAME pass that encodes the block ([U] ds2i/wand_data.hpp), so no
    second scan of the postings and no per-term window is ever needed.

    Exactly equal to encode_blocks(build_postings(tf)) (tested), row for
    row, block for block.
    """
    codec = codec or cfg.block_codec
    bs = int(block_size or cfg.block_size)
    ns = int(n_salt or max(cfg.n_salt, 1))
    universe = int(n_docs)
    stride = max(1, (universe + ns) // ns)
    spark = tf.sparkSession
    scored = avg_len is not None and "len" in tf.columns and "df" in tf.columns
    scorer = cfg.scorer

    cols = ["term_id", "doc_id", "tf"] + (["len", "df"] if scored else [])
    salted = tf.select(
        *cols, (F.col("doc_id") / stride).cast("int").alias("salt")
    )

    # per-(term, salt) prefix offsets: map-side-combined count agg (tiny
    # shuffle) → windowed cumsum over ≤ n_salt rows per term → joined back
    # on the shuffle keys.  No driver collect: at a billion-term vocabulary
    # the offsets table stays distributed and AQE picks broadcast vs
    # exchange-sharing sort-merge on its own.
    from pyspark.sql import Window

    counts = salted.groupBy("term_id", "salt").agg(F.count("*").alias("cnt"))
    w_off = Window.partitionBy("term_id").orderBy("salt")
    offsets = counts.select(
        "term_id", "salt",
        (F.sum("cnt").over(w_off) - F.col("cnt")).alias("offset"),
    )
    salted = salted.join(offsets, ["term_id", "salt"])

    # ONE shuffle of the posting table: group (term, salt) → columnar
    # pandas (no per-posting structs/dicts), sort in numpy, split into
    # 128-position-aligned fragments.  A block straddling salt boundaries
    # arrives as ≤n_salt fragments and is merged in the (tiny) second stage.
    frag_schema = (
        "term_id int, block_id int, first_doc long, docs array<long>, tfs array<long>"
    )
    if scored:
        frag_schema += ", lens array<long>, df long"

    def split_run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term_id = int(key[0])
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        docs = pdf["doc_id"].to_numpy()[order]
        tfs = pdf["tf"].to_numpy()[order]
        off = int(pdf["offset"].iloc[0])
        pos = off + np.arange(len(docs))
        bids = pos // bs
        cuts = np.flatnonzero(np.diff(bids)) + 1
        d_parts = np.split(docs, cuts)
        t_parts = np.split(tfs, cuts)
        b_parts = [int(b[0]) for b in np.split(bids, cuts)]
        out = {
            "term_id": np.full(len(d_parts), term_id, dtype=np.int32),
            "block_id": np.array(b_parts, dtype=np.int32),
            "first_doc": [int(d[0]) for d in d_parts],
            "docs": [d.astype(np.int64) for d in d_parts],
            "tfs": [t.astype(np.int64) for t in t_parts],
        }
        if scored:
            lens = pdf["len"].to_numpy()[order]
            out["lens"] = [x.astype(np.int64) for x in np.split(lens, cuts)]
            out["df"] = np.full(len(d_parts), int(pdf["df"].iloc[0]), dtype=np.int64)
        return pd.DataFrame(out)

    frags = salted.groupBy("term_id", "salt").applyInPandas(split_run, frag_schema)

    # merge + encode partition-wise (NOT one applyInPandas group per block:
    # per-group pandas overhead × n_blocks dwarfs the actual encode).  The
    # repartition co-locates a block's fragments; the sort puts them in
    # (term, block, doc) order so change-detection merging streams through
    # Arrow batches, carrying the open block across batch boundaries.
    par = spark.sparkContext.defaultParallelism
    sorted_frags = frags.repartition(par, "term_id", "block_id").sortWithinPartitions(
        "term_id", "block_id", "first_doc"
    )

    out_cols = ["term_id", "block_id", "n", "first_doc", "last_doc",
                "doc_bytes", "tf_bytes"]
    if scored:
        out_cols += ["len_bytes", "block_max_score"]
    k1, b_p = scorer.k1, scorer.b
    eps = scorer.idf_epsilon
    n_f = float(universe)
    avg = float(avg_len) if avg_len else 1.0

    def merge_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pend_key = None
        pend_df = 0
        pend_d: list[np.ndarray] = []
        pend_t: list[np.ndarray] = []
        pend_l: list[np.ndarray] = []
        out: dict[str, list] = {k: [] for k in out_cols}

        def flush():
            d = pend_d[0] if len(pend_d) == 1 else np.concatenate(pend_d)
            t = pend_t[0] if len(pend_t) == 1 else np.concatenate(pend_t)
            d = d.astype(np.uint64, copy=False)
            t = t.astype(np.uint64, copy=False)
            db, tb = _encode_one(d, t, universe, codec)
            out["term_id"].append(pend_key[0])
            out["block_id"].append(pend_key[1])
            out["n"].append(len(d))
            out["first_doc"].append(int(d[0]))
            out["last_doc"].append(int(d[-1]))
            out["doc_bytes"].append(db)
            out["tf_bytes"].append(tb)
            if scored:
                ln = pend_l[0] if len(pend_l) == 1 else np.concatenate(pend_l)
                ln = ln.astype(np.uint64, copy=False)
                out["len_bytes"].append(encode_tfs(ln, codec if codec != "auto" else "optpfd"))
                # same float64 expression shape as the serve kernel and the
                # DuckDB oracle (round-4 stable)
                dfv = float(pend_df)
                idf = max(eps, np.log((n_f - dfv + 0.5) / (dfv + 0.5))) * (1.0 + k1)
                tf_f = t.astype(np.float64)
                contrib = idf * tf_f / (
                    tf_f + k1 * (1.0 - b_p + b_p * ln.astype(np.float64) / avg)
                )
                out["block_max_score"].append(float(contrib.max()))

        for pdf in batches:
            lens_col = pdf["lens"] if scored else pdf["tfs"]
            df_col = pdf["df"] if scored else pdf["term_id"]
            for term_id, block_id, docs, tfs, lens, dfv in zip(
                pdf["term_id"], pdf["block_id"], pdf["docs"], pdf["tfs"],
                lens_col, df_col,
            ):
                key = (int(term_id), int(block_id))
                if key != pend_key:
                    if pend_key is not None:
                        flush()
                    pend_key, pend_d, pend_t, pend_l = key, [], [], []
                    pend_df = int(dfv)
                pend_d.append(np.asarray(docs))
                pend_t.append(np.asarray(tfs))
                if scored:
                    pend_l.append(np.asarray(lens))
            if out["term_id"]:
                yield pd.DataFrame(out)
                out = {k: [] for k in out}
        if pend_key is not None:
            flush()
        if out["term_id"]:
            yield pd.DataFrame(out)

    schema = BLOCKS_SCHEMA_SCORED if scored else BLOCKS_SCHEMA
    return sorted_frags.mapInPandas(merge_iter, schema=schema)


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
    if "len_bytes" in blocks.columns:
        blocks = blocks.drop("len_bytes")
    return blocks.agg(
        F.countDistinct("term_id").cast("long").alias("n_terms"),
        F.count("*").cast("long").alias("n_blocks"),
        F.sum("n").cast("long").alias("n_postings"),
        F.sum(F.length("doc_bytes")).cast("long").alias("doc_bytes"),
        F.sum(F.length("tf_bytes")).cast("long").alias("tf_bytes"),
        F.round(F.sum(F.length("doc_bytes")) * 8.0 / F.sum("n"), 3).alias("bits_per_doc"),
        F.round(F.sum(F.length("tf_bytes")) * 8.0 / F.sum("n"), 3).alias("bits_per_tf"),
    )
