"""Training-data pipeline operators vs DuckDB oracles (sf0.001) +
property tests for the approximate/stubbed paths."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from compare_util import assert_match, duck_run

from ds2s import ann, dedup, multimodal, oracle_text as OT, textops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


# ---------------------------------------------------------------- textops
def test_token_count(docs):
    assert_match(textops.token_count(docs), duck_run(OT.sql_token_count(), SF), "token_count")


def test_quality_score(docs):
    assert_match(
        textops.quality_score(docs), duck_run(OT.sql_quality_score(), SF), "quality"
    )


def test_langid(docs):
    assert_match(textops.langid(docs), duck_run(OT.sql_langid(), SF), "langid")


def test_repetition_score(docs):
    assert_match(
        textops.repetition_score(docs),
        duck_run(OT.sql_repetition_score(), SF),
        "repetition_score",
    )


def test_repetition_score_extremes(spark):
    """Hand-built extremes: an all-same-token doc maxes every metric, a
    unique-token doc floors them, tiny docs have no k-grams."""
    rows = [
        (1, "spam spam spam spam"),
        (2, "one two three four five"),
        (3, "solo"),
        (4, ""),
        (5, "ab ab cd ab ab cd"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in textops.repetition_score(docs).collect()
    }
    # 3 bigrams all equal → 1 distinct → dup = 2/3; top token 4/4
    assert out[1]["dup_2gram_frac"] == pytest.approx(round(2 / 3, 6))
    assert out[1]["top_token_frac"] == 1.0
    assert out[1]["repetition"] == 1.0
    assert out[2]["repetition"] == pytest.approx(0.2)  # top token 1/5
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[3]["n_tokens"] == 1 and out[3]["dup_2gram_frac"] == 0.0
    assert out[3]["top_token_frac"] == 1.0
    assert out[4]["n_tokens"] == 0 and out[4]["repetition"] == 0.0
    # doc 5: 6 tokens, bigrams = [ab ab, ab cd, cd ab, ab ab, ab cd] →
    # 5 total, 3 distinct → dup 2/5; top token ab 4/6
    assert out[5]["dup_2gram_frac"] == pytest.approx(0.4)
    assert out[5]["top_token_frac"] == pytest.approx(round(4 / 6, 6))


def test_fingerprint(docs):
    assert_match(
        textops.fingerprint(docs), duck_run(OT.sql_fingerprint(), SF), "fingerprint"
    )


# ------------------------------------------------------------------ dedup
def test_exact_dup_groups(docs):
    assert_match(
        dedup.exact_dup_groups(docs),
        duck_run(OT.sql_exact_dup_groups(), SF),
        "exact_dups",
    )


def test_jaccard_pairs(docs):
    assert_match(
        dedup.jaccard_pairs(docs, threshold=0.2),
        duck_run(OT.sql_jaccard_pairs(threshold=0.2), SF),
        "jaccard",
    )


def test_minhash_lsh_pairs(docs):
    assert_match(
        dedup.minhash_lsh_pairs(docs),
        duck_run(OT.sql_minhash_lsh_pairs(), SF),
        "minhash_lsh",
    )


def test_minhash_candidates_cover_high_jaccard(spark):
    """LSH recall property: near-identical docs land in the same band."""
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 0
        (2, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),  # near-dup
        (3, "one two three four five six seven eight nine ten"),
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    assert (0, 1) in pairs  # exact dup always collides in every band
    assert (0, 3) not in pairs and (1, 3) not in pairs  # disjoint shingles


def test_simhash64(docs):
    assert_match(dedup.simhash64(docs), duck_run(OT.sql_simhash64(), SF), "simhash")


def test_simhash_engine_equals_relational(docs):
    """The packed-bit kernel (engine path, one shuffle) is bit-identical to
    the declarative 64-row-explode formulation (oracle plan)."""
    eng = dedup.simhash64(docs).orderBy("doc_id").toPandas()
    rel = dedup.simhash64_relational(docs).orderBy("doc_id").toPandas()
    assert eng.equals(rel.reset_index(drop=True).astype(eng.dtypes.to_dict()))


def test_simhash_pure_python_oracle(spark):
    """Relational SimHash ≡ straightforward per-doc python implementation."""
    import hashlib
    import re

    rows = [(0, "the quick brown fox the quick"), (1, "lorem ipsum dolor sit amet")]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash64(docs).collect()}
    for doc_id, text in rows:
        toks = re.findall("[a-z0-9]+", text.lower())
        acc = np.zeros(64)
        from collections import Counter

        for t, tf in Counter(toks).items():
            h = int(hashlib.md5(t.encode()).hexdigest()[:16], 16)
            for p in range(64):
                bit = (h >> (63 - p)) & 1
                acc[p] += tf if bit else -tf
        out = 0
        for p in range(64):
            out = (out << 1) | (1 if acc[p] > 0 else 0)
        assert got[doc_id] == format(out, "016x"), doc_id


def test_embedding_near_dup(embs):
    assert_match(
        dedup.embedding_near_dup(embs, threshold=0.5),
        duck_run(OT.sql_embedding_near_dup(threshold=0.5), SF),
        "near_dup",
    )


# -------------------------------------------------------------------- ann
def test_ann_bruteforce(embs):
    assert_match(
        ann.bruteforce_topk(embs),
        duck_run(OT.sql_ann_bruteforce_topk(), SF),
        "ann_bruteforce",
    )


def test_ann_lsh_recall(embs):
    """LSH top-k is a subset-ranking of brute force; recall@10 ≥ 0.3 with
    4 tables × 6 planes + Hamming-1 multi-probe on the (near-uniform)
    fixture embeddings, and every returned (qid, vec_id, cosine) agrees
    with the exact cosine."""
    exact = ann.bruteforce_topk(embs, k=10).collect()
    approx = ann.lsh_topk(embs, k=10).collect()
    exact_pairs = {(r["qid"], r["vec_id"]): r["cosine"] for r in exact}
    approx_pairs = {(r["qid"], r["vec_id"]): r["cosine"] for r in approx}
    hit = sum(1 for p in exact_pairs if p in approx_pairs)
    recall = hit / len(exact_pairs)
    assert recall >= 0.3, f"recall {recall}"
    # cosines must be the exact ones wherever both paths return the pair
    for p, c in approx_pairs.items():
        if p in exact_pairs:
            assert abs(c - exact_pairs[p]) < 1e-9


# ------------------------------------------------------------- multimodal
def test_byte_histogram(docs):
    media = multimodal.media_table(docs)
    assert_match(
        multimodal.byte_histogram(media),
        duck_run(OT.sql_byte_histogram(), SF),
        "byte_histogram",
    )


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="codec libraries"):
        multimodal.decode_media(b"\xff\xd8\xff", "jpeg")


def test_frame_sample(spark, docs):
    media = multimodal.media_table(docs.limit(20))
    frames = multimodal.frame_sample(media, n_frames=4).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {r["doc_id"]: r["text"] for r in docs.limit(20).collect()}
    for doc_id, rows in by_doc.items():
        assert [r["frame_id"] for r in sorted(rows, key=lambda r: r["frame_id"])] == list(
            range(len(rows))
        )
        raw = texts[doc_id].encode()
        step = max(1, len(raw) // 4)
        for r in rows:
            assert bytes(r["frame"]) == raw[r["frame_id"] * step : r["frame_id"] * step + step]


def test_resize_media(docs):
    media = multimodal.media_table(docs)
    assert_match(
        multimodal.resize_media(media),
        duck_run(OT.sql_resize_media(), SF),
        "resize_media",
    )


def test_resize_media_pooling_rule(spark):
    """Pin the frozen pooling rule on hand-built payloads:
    - n > target: sample j -> bucket j*target//n, value = mean
    - n < target: only the occupied buckets are emitted (long form)
    - n == 0: no rows"""
    rows = [(1, "abcd"), (2, "xy"), (3, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = multimodal.media_table(docs)
    out = {
        (r["doc_id"], r["pos"]): r["value"]
        for r in multimodal.resize_media(media, target_len=2).collect()
    }
    # doc 1: "abcd" (97,98,99,100) -> bucket0 = mean(97,98), bucket1 = mean(99,100)
    assert out[(1, 0)] == 97.5 and out[(1, 1)] == 99.5
    # doc 2: "xy" (120,121) n==target -> identity buckets
    assert out[(2, 0)] == 120.0 and out[(2, 1)] == 121.0
    # doc 3 empty: absent entirely
    assert not any(k[0] == 3 for k in out)
    # short payload: n=1 < target=4 -> only bucket 0
    one = spark.createDataFrame([(9, "Z")], "doc_id long, text string")
    rows4 = multimodal.resize_media(multimodal.media_table(one), target_len=4).collect()
    assert [(r["pos"], r["value"]) for r in rows4] == [(0, 90.0)]


def test_token_count_whitespace_edges(spark):
    """n_ws_tokens must count \\S+ runs (the oracle's semantics), not
    split fragments: Spark's trim strips only spaces and split keeps
    boundary empties, so a trailing newline/tab used to count a phantom
    token (round-5 review finding)."""
    rows = [
        (0, "hello\n", 1),
        (1, "\t", 0),
        (2, "", 0),
        (3, "a  b\nc", 3),
        (4, " x ", 1),
        (5, "plain words here", 3),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_ws_tokens"]
        for r in textops.token_count(df).collect()
    }
    assert got == {i: n for i, t, n in rows}


def test_byte_histogram_bucket_validation(docs):
    """n_buckets that does not divide 256 must raise loudly: a remainder
    emits bucket == n_buckets for high bytes, and n_buckets > 256
    floor-divides by zero and silently collapses everything into bucket 0
    (round-5 review finding)."""
    media = multimodal.media_table(docs)
    for bad in (10, 512, 0, 3):
        with pytest.raises(ValueError, match="divide 256"):
            multimodal.byte_histogram(media, n_buckets=bad)
    # all valid divisors still work
    assert multimodal.byte_histogram(media, n_buckets=256).count() > 0


def test_simhash_max_hamming_guard(docs):
    """max_hamming beyond the pigeonhole recall-1 bound (n_bands - 1)
    must raise, not silently drop pairs (round-5 review finding)."""
    with pytest.raises(ValueError, match="max_hamming"):
        dedup.simhash_near_dup_pairs(docs, max_hamming=3, n_bands=2)
    # the boundary case is allowed
    dedup.simhash_near_dup_pairs(docs, max_hamming=1, n_bands=2, eager=False)


def test_dup_edges_accepts_scored_pairs(docs):
    """dup_edges must normalize caller-supplied pairs frames by name:
    jaccard_pairs / simhash_near_dup_pairs naturally carry a third score
    column, and union is positional (round-5 review finding)."""
    scored = dedup.jaccard_pairs(docs)  # (doc_a, doc_b, jaccard)
    edges = dedup.dup_edges(docs, pairs=scored)
    assert edges.columns == ["doc_a", "doc_b"]
    edges.count()  # plan executes, no AnalysisException


def test_token_count_vertical_tab_oracle_parity(spark, tmp_path):
    """Java's \\s includes vertical tab (0x0B) but RE2's (DuckDB) does
    not; the token patterns therefore spell the whitespace class out
    explicitly, and engine and oracle must agree byte-for-byte on a
    0x0B-bearing document (round-5 review finding)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        (0, "a\x0bb"),          # the divergence byte itself
        (1, "a b\tc\nd\fe\rf"),  # every shared whitespace byte
        (2, "x\x0b\x0by \x0b"),
        (3, "plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # single parquet FILE (like the driver fixtures) — DuckDB's view in
    # duck_run opens '<dir>/documents.parquet' directly, not a Spark
    # part-file directory
    pq.write_table(
        pa.table(
            {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
        ),
        str(tmp_path / "documents.parquet"),
    )
    assert_match(
        textops.token_count(df),
        duck_run(OT.sql_token_count(), str(tmp_path)),
        "token_count_vtab",
    )
    # and the explicit-class semantics: 0x0B is a TOKEN byte on both sides
    got = {r["doc_id"]: r["n_ws_tokens"] for r in textops.token_count(df).collect()}
    assert got[0] == 1 and got[2] == 2
