"""Text-analysis operators for large-scale training-data pipelines.

Not part of ds2i (the reference consumes pre-parsed termID streams,
SURVEY.md §1.1) — these are the corpus-preparation operators a 100 TB
training-data pipeline runs in front of the index build: token counting,
quality scoring, language-ID, document fingerprinting.  Every operator is
pure Catalyst column math over the engine tokenizer (no Python in the hot
path) and has a byte-identical DuckDB oracle (ds2s.oracle_text).

Semantics are frozen and deliberately simple-deterministic:
- tokens: ``regexp_extract_all(lower(text), '[a-z0-9]+')`` (engine
  tokenizer, ds2s.invert.tokens_col);
- stopword/profile sets are literal frozen lists;
- hashes are ``md5`` hex strings (identical builtin in Spark and DuckDB),
  compared lexicographically where a min-hash is needed.

Scale: all operators are narrow per-row transforms (no shuffle) except
``langid``'s profile join (broadcast of a literal tiny table) — they
stream over any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .config import DEFAULT_CONFIG
from .invert import tokens_col

STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")

# language → frozen profile words (argmax hits wins; 'und' when zero hits)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "das", "nicht"),
    "en": ("the", "a", "and", "of", "is", "for"),
    "es": ("el", "los", "y", "que", "las", "por"),
    "fr": ("le", "la", "et", "les", "une", "dans"),
}

SHINGLE_K = 3


def _toks(text: str = "text") -> Column:
    return tokens_col(text, DEFAULT_CONFIG.token_pattern)


def shingles_col(tokens: Column, k: int = SHINGLE_K) -> Column:
    """w-shingles: space-joined k-grams of the token stream; a document
    shorter than k tokens contributes its whole token stream as the single
    shingle (so near-dup detection still covers tiny docs)."""
    kgrams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - F.lit(k - 1)),
        lambda i: F.array_join(F.slice(tokens, i, k), " "),
    )
    return F.when(F.size(tokens) >= k, kgrams).otherwise(
        F.when(F.size(tokens) > 0, F.array(F.array_join(tokens, " "))).otherwise(
            F.array().cast("array<string>")
        )
    )


# BPE-ish pretokenizer: letter runs / digit runs / punctuation runs (the
# GPT-2 pretokenizer family minus lookaheads, so the SAME pattern runs
# under Java regex (Spark) and RE2 (DuckDB)).  Subword estimate below uses
# the public ~4-chars-per-BPE-token rule of thumb: ceil(len(piece)/4).
# Whitespace is the EXPLICIT class [ \t\n\f\r], never \s: Java's \s
# includes vertical tab (\x0B) while RE2's does not, so a shorthand class
# would make the engine and the DuckDB oracle disagree on any document
# containing 0x0B (round-5 review finding).
WS_CLASS = " \\t\\n\\f\\r"
BPE_PRETOKEN_RE = f"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9{WS_CLASS}]+"


def token_count(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct, n_chars, n_ws_tokens, n_bpe_tokens)
    — token accounting over three frozen tokenizations: the engine regex
    tokenizer (the per-doc `.sizes` input, SURVEY.md §1.1), a plain
    whitespace split, and a BPE-ish estimate (pretokenizer pieces split
    at the ~4-chars-per-subword rule of thumb).  All narrow Catalyst
    column math — no shuffle, no Python."""
    t = _toks()
    pieces = F.regexp_extract_all(F.col("text"), F.lit(BPE_PRETOKEN_RE), 0)
    n_bpe = F.aggregate(
        pieces,
        F.lit(0),
        lambda acc, p: acc + F.ceil(F.length(p) / F.lit(4.0)).cast("int"),
    )
    # COUNT non-whitespace runs rather than splitting on whitespace:
    # Spark's trim strips only spaces and split keeps boundary empty
    # fragments, so a doc with a trailing newline/tab would count a
    # phantom token and diverge from the declared-exact oracle (round-5
    # review finding).  Explicit class, not \S — see WS_CLASS above.
    n_ws = F.regexp_count(F.col("text"), F.lit(f"[^{WS_CLASS}]+"))
    return documents.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        F.length("text").alias("n_chars"),
        n_ws.cast("int").alias("n_ws_tokens"),
        n_bpe.cast("int").alias("n_bpe_tokens"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, alpha_ratio, stop_ratio, avg_token_len, quality).

    Frozen heuristic: length, alphanumeric density, stopword density —
    the standard cheap pre-training quality gates.  quality ∈ [0, 1].
    """
    t = _toks()
    d = documents.select("doc_id", F.length("text").alias("n_chars"), t.alias("toks"))
    alnum = F.aggregate(
        F.transform("toks", F.length), F.lit(0), lambda acc, x: acc + x
    ).cast("double")
    n_tok = F.size("toks").cast("double")
    n_stop = F.size(
        F.filter("toks", lambda x: x.isin(*STOPWORDS_EN))
    ).cast("double")
    d = d.select(
        "doc_id",
        F.col("n_chars"),
        n_tok.cast("int").alias("n_tokens"),
        F.when(F.col("n_chars") > 0, F.round(alnum / F.col("n_chars"), 6))
        .otherwise(F.lit(0.0)).alias("alpha_ratio"),
        F.when(n_tok > 0, F.round(n_stop / n_tok, 6)).otherwise(F.lit(0.0)).alias(
            "stop_ratio"
        ),
        F.when(n_tok > 0, F.round(alnum / n_tok, 6)).otherwise(F.lit(0.0)).alias(
            "avg_token_len"
        ),
    )
    q = (
        F.lit(0.5) * F.least(F.lit(1.0), F.col("n_tokens") / F.lit(100.0))
        + F.lit(0.3) * F.col("stop_ratio")
        + F.lit(0.2) * F.least(F.lit(1.0), F.col("avg_token_len") / F.lit(8.0))
    )
    return d.select(
        "doc_id", "n_tokens", "alpha_ratio", "stop_ratio", "avg_token_len",
        F.round(q, 6).alias("quality"),
    )


def _kgrams(tokens: Column, k: int) -> Column:
    """Plain k-grams (no tiny-doc fallback — unlike shingles_col, a doc
    shorter than k tokens has NO k-grams; a fallback shingle would count
    as a spurious 'repeat' in the repetition metrics below)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tokens) - F.lit(k - 1)),
        lambda i: F.array_join(F.slice(tokens, i, k), " "),
    )
    return F.when(F.size(tokens) >= k, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_score(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, dup_2gram_frac, dup_3gram_frac, top_token_frac,
    repetition) — within-document repetition metrics, the standard
    pre-training repetition filter family (duplicate n-gram fraction and
    most-frequent-token share; cf. the published Gopher/MassiveText
    quality-filter recipe).

    Frozen semantics:
    - ``dup_kgram_frac`` = 1 − distinct/total over the doc's k-grams
      (0.0 when the doc has fewer than k tokens);
    - ``top_token_frac`` = multiplicity of the most frequent token / total
      tokens (0.0 for empty docs), computed as the longest equal run of
      the SORTED token array — one linear Catalyst ``aggregate`` pass, no
      explode/shuffle;
    - ``repetition`` = greatest of the three (rounded inputs), a single
      filterable severity column.

    Scale: narrow per-row column math only — no shuffle at any size.
    """
    t = _toks()
    d = documents.select("doc_id", t.alias("toks"))
    n_tok = F.size("toks").cast("double")

    def dup_frac(k: int) -> Column:
        g = _kgrams(F.col("toks"), k)
        n = F.size(g).cast("double")
        return F.when(
            n > 0,
            F.round(
                (n - F.size(F.array_distinct(g)).cast("double")) / n, 6
            ),
        ).otherwise(F.lit(0.0))

    # longest equal run of the sorted token array == max multiplicity;
    # tokens are non-empty by construction ([a-z0-9]+), so "" is a safe
    # initial sentinel for prev
    run0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("int").alias("run"),
        F.lit(0).cast("int").alias("best"),
    )
    top_cnt = F.aggregate(
        F.array_sort("toks"),
        run0,
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a.prev, a.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a.best, F.when(x == a.prev, a.run + 1).otherwise(F.lit(1))
            ).alias("best"),
        ),
        lambda a: a.best,
    ).cast("double")
    d = d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        dup_frac(2).alias("dup_2gram_frac"),
        dup_frac(3).alias("dup_3gram_frac"),
        F.when(n_tok > 0, F.round(top_cnt / n_tok, 6))
        .otherwise(F.lit(0.0))
        .alias("top_token_frac"),
    )
    return d.withColumn(
        "repetition",
        F.greatest("dup_2gram_frac", "dup_3gram_frac", "top_token_frac"),
    )


def langid(documents: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, hits) — stopword-profile n-gram heuristic.

    Relational argmax: explode tokens, broadcast-join the literal profile
    table, count hits per (doc, lang), keep the top row by
    (hits DESC, lang ASC); docs with zero hits predict 'und'.
    """
    spark = documents.sparkSession
    prof = spark.createDataFrame(
        [(lang, w) for lang, words in sorted(LANG_PROFILES.items()) for w in words],
        schema="plang string, word string",
    )
    toks = documents.select("doc_id", F.explode(_toks()).alias("word"))
    hits = (
        toks.join(F.broadcast(prof), "word")
        .groupBy("doc_id", "plang")
        .agg(F.count("*").alias("hits"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("plang").asc())
    best = hits.withColumn("rn", F.row_number().over(w)).filter("rn = 1")
    return (
        documents.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("plang", F.lit("und")).alias("pred_lang"),
            F.coalesce("hits", F.lit(0)).cast("long").alias("hits"),
        )
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, content_md5, shingle_min) — exact + fuzzy fingerprints.

    ``content_md5`` is the exact-dup key; ``shingle_min`` is a 1-permutation
    MinHash over 3-gram shingles (lexicographic min of md5 hex — the same
    construction, widened to k permutations, drives ds2s.dedup.minhash).

    The token array is materialized as a column BEFORE shingling: a lambda
    over an inline regexp expression re-evaluates the regexp per element
    (30× slowdown measured at sf0.1)."""
    base = documents.select(
        "doc_id", F.md5("text").alias("content_md5"), _toks().alias("toks")
    )
    sh = shingles_col(F.col("toks"))
    return base.select(
        "doc_id",
        "content_md5",
        F.array_min(F.transform(sh, F.md5)).alias("shingle_min"),
    )
