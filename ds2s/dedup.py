"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Training-data pipeline operators over the ``documents`` corpus (not part of
ds2i — see ds2s.textops module docstring).  Determinism contract: every
hash is an ``md5`` hex string (identical builtin in Spark and DuckDB) and
MinHash minima are lexicographic string minima, so each operator has an
exact DuckDB oracle.

Scale shapes (the part that matters at 100 TB):
- ``exact_dup_groups``: one hash-shuffle on a 32-byte key — the canonical
  first dedup pass; skew-free (hash keys are uniform).
- ``jaccard_pairs``: shingle explode + self-join.  The join key is the
  shingle hash; frequent shingles (boilerplate) explode quadratically, so
  the operator drops shingles with document-frequency > ``max_shingle_df``
  — the standard suffix-filtering guard.  Exact w.r.t. its declared
  semantics (Jaccard over the *filtered* shingle sets).
- ``minhash_lsh_pairs``: signatures are a groupBy over (doc, perm) —
  linear; candidate generation joins on band keys only.  This is the
  sub-quadratic scale path; ``jaccard_pairs`` on candidates verifies.
- ``simhash64``: per-bit majority over token md5 bits — a join against a
  64-row bit-position table, linear in corpus size.
- ``embedding_near_dup``: brute-force pair cosine (quadratic — sandbox
  oracle baseline); the LSH-bucketed scale path lives in ds2s.ann.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import SHINGLE_K, shingles_col, _toks

N_PERM = 16  # minhash permutations
N_BANDS = 4  # LSH bands (rows per band = N_PERM / N_BANDS)


def exact_dup_groups(documents: DataFrame) -> DataFrame:
    """(content_md5, n_dups, first_doc) for every group of ≥2 identical
    documents; ``first_doc`` is the canonical keeper (min doc_id)."""
    return (
        documents.groupBy(F.md5("text").alias("content_md5"))
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def _doc_shingles(documents: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle) DISTINCT shingles per doc (set semantics).

    Tokens materialize as a column first — shingling over the inline
    regexp expression re-runs the regexp per shingle (see
    textops.fingerprint)."""
    toks = documents.select("doc_id", _toks().alias("toks"))
    return toks.select(
        "doc_id",
        F.explode(F.array_distinct(shingles_col(F.col("toks"), k))).alias("shingle"),
    )


def jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.7,
    k: int = SHINGLE_K,
    max_shingle_df: int = 100,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with n-gram Jaccard ≥ threshold.

    Exact set Jaccard over distinct k-shingles, computed relationally:
    |A∩B| via a self-join on shingle, |A| and |B| via per-doc counts.
    Shingles appearing in more than ``max_shingle_df`` docs are dropped
    from BOTH the intersection and the set sizes (declared semantics —
    keeps the self-join sub-quadratic on boilerplate).
    """
    sh = _doc_shingles(documents, k)
    df_f = sh.groupBy("shingle").agg(F.count("*").alias("sdf"))
    sh = sh.join(df_f.filter(F.col("sdf") <= max_shingle_df), "shingle").select(
        "doc_id", "shingle"
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def minhash_signatures(documents: DataFrame, n_perm: int = N_PERM,
                       k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, perm, minhash) — permutation j's hash of shingle s is
    ``md5(j || ':' || s)``; the signature entry is the lexicographic min."""
    spark = documents.sparkSession
    perms = spark.range(n_perm).select(F.col("id").cast("int").alias("perm"))
    sh = _doc_shingles(documents, k)
    return (
        sh.crossJoin(F.broadcast(perms))
        .groupBy("doc_id", "perm")
        .agg(
            F.min(
                F.md5(F.concat_ws(":", F.col("perm").cast("string"), F.col("shingle")))
            ).alias("minhash")
        )
    )


def minhash_band_keys(signatures: DataFrame, n_perm: int = N_PERM,
                      n_bands: int = N_BANDS) -> DataFrame:
    """(doc_id, band, band_key) — band_key concatenates the band's minima
    in perm order; equal keys ⇒ LSH candidate pair."""
    rows_per_band = n_perm // n_bands
    return (
        signatures.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                "|",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("perm", "minhash"))
                    ),
                    lambda s: s["minhash"],
                ),
            ).alias("band_key")
        )
    )


def minhash_lsh_pairs(documents: DataFrame, n_perm: int = N_PERM,
                      n_bands: int = N_BANDS, k: int = SHINGLE_K) -> DataFrame:
    """(doc_a, doc_b) DISTINCT candidate pairs sharing ≥1 LSH band."""
    bands = minhash_band_keys(minhash_signatures(documents, n_perm, k), n_perm, n_bands)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash64(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over token frequencies.

    ENGINE path: tokenize + md5 + per-(doc, term) tf stay JVM-side
    (identical semantics to the DuckDB oracle), then ONE shuffle
    co-locates each doc's term rows and an Arrow-batched numpy kernel
    packs the 64 majority bits — no 64-row explode, no second shuffle
    (the relational formulation, kept below as ``simhash64_relational``
    for the plan-equality test, amplifies rows 64× through two shuffles:
    measured 8.2 s vs <2 s at sf0.1).
    """
    import numpy as np
    import pandas as pd

    spark = documents.sparkSession
    tf = (
        documents.select("doc_id", F.explode(_toks()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .select("doc_id", F.substring(F.md5("term"), 1, 16).alias("h"), "tf")
    )
    par = spark.sparkContext.defaultParallelism

    def kernel(batches):
        shifts = np.arange(63, -1, -1, dtype=np.uint64)
        acc: dict = {}
        for pdf in batches:
            hv = np.array([int(x, 16) for x in pdf["h"]], dtype=np.uint64)
            bits = ((hv[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            contrib = (2 * bits - 1) * pdf["tf"].to_numpy(dtype=np.int64)[:, None]
            docs = pdf["doc_id"].to_numpy()
            # accumulate per doc (docs are co-located in this partition but
            # may span batches)
            ud, inv = np.unique(docs, return_inverse=True)
            sums = np.zeros((len(ud), 64), dtype=np.int64)
            np.add.at(sums, inv, contrib)
            for d, row in zip(ud, sums):
                prev = acc.get(int(d))
                acc[int(d)] = row if prev is None else prev + row
        if acc:
            doc_ids = np.fromiter(acc.keys(), dtype=np.int64, count=len(acc))
            mat = np.stack(list(acc.values()))
            bitsout = (mat > 0).astype(np.uint64)
            vals = bitsout @ (np.uint64(1) << shifts)
            yield pd.DataFrame(
                {"doc_id": doc_ids, "simhash": [format(int(v), "016x") for v in vals]}
            )

    return tf.repartition(par, "doc_id").mapInPandas(
        kernel, schema="doc_id long, simhash string"
    )


def simhash64_relational(documents: DataFrame) -> DataFrame:
    """The declarative formulation (explode × 64-row bit table) — kept as
    the cross-engine reference: its plan is the literal transliteration of
    the DuckDB oracle SQL, and the engine kernel above must equal it
    bit-for-bit (tested).  Not the serving path: 64× row amplification
    through two shuffles.
    """
    spark = documents.sparkSession
    bits = spark.range(64).select(F.col("id").cast("int").alias("bit"))
    tf = (
        documents.select("doc_id", F.explode(_toks()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", F.substring(F.md5("term"), 1, 16))
    )
    # hex nibble of bit p = h[p div 4]; bit value = (nibble >> (3 - p mod 4)) & 1
    # (shift via exact power-of-two division: Column-valued shift amounts)
    pw = F.pow(F.lit(2.0), (F.lit(3) - F.col("bit") % 4).cast("double"))
    nib = F.conv(
        F.substr(F.col("h"), (F.col("bit") / 4).cast("int") + 1, F.lit(1)), 16, 10
    ).cast("int")
    bitval = (F.floor(nib / pw).cast("int") % 2).cast("int")
    acc = (
        tf.crossJoin(F.broadcast(bits))
        .withColumn("w", F.when(bitval == 1, F.col("tf")).otherwise(-F.col("tf")))
        .groupBy("doc_id", "bit")
        .agg(F.sum("w").alias("s"))
        .withColumn("outbit", (F.col("s") > 0).cast("int"))
    )
    # assemble 16 hex chars: nibble n = bits 4n..4n+3 MSB-first
    return (
        acc.withColumn("nibble", (F.col("bit") / 4).cast("int"))
        .withColumn(
            "weight",
            (
                F.col("outbit")
                * F.pow(F.lit(2.0), (F.lit(3) - F.col("bit") % 4).cast("double"))
            ).cast("long"),
        )
        .groupBy("doc_id", "nibble")
        .agg(F.sum("weight").alias("nibval"))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("nibble", "nibval"))),
                    lambda s: F.lower(F.conv(s["nibval"].cast("string"), 10, 16)),
                ),
            ).alias("simhash")
        )
    )


def embedding_near_dup(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """(vec_a, vec_b, cosine) pairs with cosine ≥ threshold (float64 math).

    Brute-force O(n²) — the oracle baseline; ds2s.ann.lsh_topk is the
    bucketed scale path whose candidates this verifies."""
    v = embeddings.select(
        F.col("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)),
    )
    a = v.alias("a")
    b = v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cosine", F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cosine",
        )
    )
