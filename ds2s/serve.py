"""Dynamic-pruning top-k serving: MaxScore, WAND, and Block-Max WAND.

ds2i's ranked operators ([U] ds2i/queries.cpp wand_query / maxscore_query /
block_max_wand_query — upstream layout, SURVEY.md §2.6) are cursor-at-a-time
heap algorithms.  A per-posting Python loop cannot survive translation
(SURVEY.md §4 last row), so this module implements the same *pruning
semantics* vectorized, exact by construction, in TWO phases so that pruned
blocks are never shuffled, read, or decoded:

Phase 1 — seed θ₀ (tiny): the rarest query term's highest-block-max blocks
(capped at ``seed_max_blocks``) are decoded (tf+len payloads only) and
exact-scored; θ₀ = k-th best single-term lower bound (0 if fewer than k).
Any subset of true scores is a valid lower bound on the final k-th score,
so the cap is always safe — it only weakens θ₀.

Phase 2 — METADATA-ONLY block pruning + kernel: the exact upper-bound
interval grid (union of block boundaries; summed w·block_max per
interval) is evaluated per qid over the block-metadata projection —
first_doc/last_doc/block_max columns, payloads untouched — and only
blocks overlapping an interval with UB ≥ θ₀ ship their payloads to the
per-query kernel.  Safety: any doc d with full UB(d) ≥ θ₀ lies in a
surviving interval, and every block containing d overlaps that interval,
so a pruned block cannot hold a top-k doc and survivor scores stay
complete.  The kernel then applies the per-algorithm refinement (block
intervals for BMW, term intervals for MaxScore, adaptive-θ docID-ordered
pivoting for WAND) and returns the exact top-k — rank-identical to the
exhaustive ranked-OR oracle, with the same rounding and (score DESC,
doc ASC) tie discipline.

Doc lengths travel WITH each block (``len_bytes``, encoded at build time,
ds2s.blocks) — there is no driver-side dense lens array and no broadcast
proportional to corpus size; every per-doc datum the kernel needs arrives
in the block row itself, exactly as ds2i mmaps wand_data norm-lens next to
the postings ([U] ds2i/wand_data.hpp).

The lexicon lookup broadcasts the QUERY terms (bounded by the batch) and
scans the lexicon once; the resolved cursors (≤ one row per query term)
are collected — the dictionary-lookup step every ds2i query begins with —
and re-enter the plan as literal broadcast rows, so the vocabulary-sized
lexicon is never broadcast or re-scanned.

Upper bounds are inflated by 1+1e-9 before pruning: metadata sums are JVM
float math, the kernel scores with numpy; the margin keeps pruning safe
across last-ulp differences (both paths rank on values rounded to 6
decimals, so the margin cannot change results).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .blocks import blocks_from_tf
from .codecs import decode_docs, decode_tfs
from .config import DEFAULT_CONFIG, IndexConfig
from .invert import InvertedIndex
from .util import round_half_up

_UB_MARGIN = 1.0 + 1e-9
_OUT_SCHEMA = "qid int, rank int, doc_id long, score double"


def _decode_block_scores(db, tb, lb, w, idf, k1, b, avg):
    """One block → (docs int64, per-posting BM25 contribution float64)."""
    d, _ = decode_docs(bytes(db))
    tf, _ = decode_tfs(bytes(tb))
    ln, _ = decode_tfs(bytes(lb))
    tf = tf.astype(np.float64)
    ln = ln.astype(np.float64)
    c = w * idf * tf / (tf + k1 * (1.0 - b + b * ln / avg))
    return d.astype(np.int64), c


def _interval_grid(per_term):
    """Union of pruning-interval boundary points + per-point summed UB."""
    pts = [np.zeros(1, dtype=np.int64)]
    for t in per_term:
        pts.append(t["firsts"])
        pts.append(t["lasts"] + 1)
    points = np.unique(np.concatenate(pts))
    ub = np.zeros(len(points), dtype=np.float64)
    for t in per_term:
        j = np.searchsorted(t["lasts"], points, side="left")
        valid = j < len(t["lasts"])
        jj = np.where(valid, j, 0)
        inside = valid & (t["firsts"][jj] <= points)
        ub += np.where(inside, t["ubs"][jj] * _UB_MARGIN, 0.0)
    return points, ub


def _sweep_topk(per_term, k, theta0, avg, scorer, rank_round):
    """Static-θ upper-bound interval sweep (BMW / MaxScore kernels).

    per_term entries: {firsts, lasts, ubs (pruning intervals), block_first,
    block_last, payloads [(doc_bytes, tf_bytes, len_bytes)], idf, w}."""
    points, ub = _interval_grid(per_term)
    surv = ub >= theta0 if theta0 > 0.0 else np.ones(len(points), dtype=bool)
    psurv = np.concatenate(([0], np.cumsum(surv)))

    doc_parts: list[np.ndarray] = []
    contrib_parts: list[np.ndarray] = []
    k1, b = scorer.k1, scorer.b
    for t in per_term:
        bf, bl = t["block_first"], t["block_last"]
        lo = np.searchsorted(points, bf, side="right") - 1
        hi = np.searchsorted(points, bl, side="right") - 1
        take = (psurv[hi + 1] - psurv[lo]) > 0
        if not take.any():
            continue
        for i in np.flatnonzero(take):
            d, c = _decode_block_scores(
                *t["payloads"][i], t["w"], t["idf"], k1, b, avg
            )
            doc_parts.append(d)
            contrib_parts.append(c)

    if not doc_parts:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    all_docs = np.concatenate(doc_parts)
    all_contrib = np.concatenate(contrib_parts)
    ud, inv = np.unique(all_docs, return_inverse=True)
    scores = np.bincount(inv, weights=all_contrib)

    # keep only docs in survivor intervals (their scores are complete)
    ii = np.searchsorted(points, ud, side="right") - 1
    keep = surv[np.clip(ii, 0, len(surv) - 1)]
    ud, scores = ud[keep], scores[keep]
    return _rank(ud, scores, k, rank_round)


def _wand_topk(per_term, k, theta0, avg, scorer, rank_round):
    """Classic WAND ([U] ds2i/queries.cpp wand_query): docID-ordered
    cursor pivoting with an ADAPTIVE threshold, at block granularity.

    Intervals of the block grid are visited in docID order (the cursor
    sweep); the pivot test is UB(interval) ≥ θ with θ raised to the
    running k-th best true score as the heap fills — unlike the static-θ₀
    sweep, late intervals are pruned against the scores found in early
    ones, which is exactly the classic algorithm's advantage.  Exactness:
    every doc lies in one interval; a skipped interval's docs have
    UB < θ ≤ (k-th best − rounding quantum), so they cannot enter the
    rounded top-k; a visited interval decodes every block overlapping it,
    so its docs' scores are complete."""
    points, ub = _interval_grid(per_term)
    k1, b = scorer.k1, scorer.b
    quantum = 10.0 ** (-rank_round) if rank_round is not None else 0.0

    cand_docs: list[np.ndarray] = []
    cand_scores: list[np.ndarray] = []
    n_cand = 0
    theta = theta0
    decoded: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}

    # per-term block boundary arrays for overlap lookup
    for ival in range(len(points)):
        if ub[ival] < theta and theta > 0.0:
            continue
        lo_doc = points[ival]
        hi_doc = points[ival + 1] - 1 if ival + 1 < len(points) else np.iinfo(np.int64).max
        d_parts, c_parts = [], []
        for ti, t in enumerate(per_term):
            bf, bl = t["block_first"], t["block_last"]
            # blocks overlapping [lo_doc, hi_doc]
            first = np.searchsorted(bl, lo_doc, side="left")
            last = np.searchsorted(bf, hi_doc, side="right")
            for bi in range(first, last):
                key = (ti, bi)
                if key not in decoded:
                    decoded[key] = _decode_block_scores(
                        *t["payloads"][bi], t["w"], t["idf"], k1, b, avg
                    )
                d, c = decoded[key]
                sl = slice(
                    np.searchsorted(d, lo_doc, side="left"),
                    np.searchsorted(d, hi_doc, side="right"),
                )
                if sl.start < sl.stop:
                    d_parts.append(d[sl])
                    c_parts.append(c[sl])
        if not d_parts:
            continue
        docs = np.concatenate(d_parts)
        contribs = np.concatenate(c_parts)
        udd, inv = np.unique(docs, return_inverse=True)
        sc = np.bincount(inv, weights=contribs)
        cand_docs.append(udd)
        cand_scores.append(sc)
        n_cand += len(udd)
        # raise θ to the running k-th best (loosened by one rounding
        # quantum so rounded ties are never pruned)
        if n_cand >= k:
            allsc = np.concatenate(cand_scores)
            kth = np.partition(allsc, -k)[-k]
            theta = max(theta, kth - quantum)

    if not cand_docs:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    ud = np.concatenate(cand_docs)
    scores = np.concatenate(cand_scores)
    return _rank(ud, scores, k, rank_round)


def _rank(ud, scores, k, rank_round):
    """Frozen tie discipline: (round6(score) DESC, doc ASC), half-up."""
    rs = round_half_up(scores, rank_round) if rank_round is not None else scores
    order = np.lexsort((ud, -rs))[:k]
    return ud[order], scores[order]


def _make_kernel(k, algo, scorer, avg_len, rank_round):
    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(key[0])
        theta0 = float(pdf["theta0"].iloc[0])
        per_term: list[dict] = []
        for _, g in pdf.groupby("term_id", sort=True):
            g = g.sort_values("block_id")
            bf = g["first_doc"].to_numpy(dtype=np.int64)
            bl = g["last_doc"].to_numpy(dtype=np.int64)
            bmax = g["block_max_score"].to_numpy(dtype=np.float64)
            w = float(g["w"].iloc[0])
            idf = float(g["idf"].iloc[0])
            tmax = float(g["max_score"].iloc[0])
            payloads = list(zip(g["doc_bytes"], g["tf_bytes"], g["len_bytes"]))
            if algo == "maxscore":  # one pruning interval per term
                firsts, lasts = bf[:1], bl[-1:]
                ubs = np.array([tmax * w], dtype=np.float64)
            else:  # bmw / wand: block-granular intervals
                firsts, lasts, ubs = bf, bl, bmax * w
            per_term.append(
                dict(
                    firsts=firsts, lasts=lasts, ubs=ubs,
                    block_first=bf, block_last=bl, payloads=payloads,
                    idf=idf, w=w,
                )
            )
        if not per_term:
            return pd.DataFrame(
                {"qid": [], "rank": [], "doc_id": [], "score": []}
            ).astype({"qid": "int32", "rank": "int32", "doc_id": "int64", "score": "float64"})

        fn = _wand_topk if algo == "wand" else _sweep_topk
        docs, scores = fn(per_term, k, theta0, avg_len, scorer, rank_round)
        out_scores = round_half_up(scores, 4) if rank_round is not None else scores
        return pd.DataFrame(
            {
                "qid": np.full(len(docs), qid, dtype=np.int32),
                "rank": np.arange(1, len(docs) + 1, dtype=np.int32),
                "doc_id": docs,
                "score": out_scores,
            }
        )

    return kernel


def _make_plan_kernel(k, scorer, avg_len, rank_round, seed_max_blocks):
    """qid × block METADATA rows (+ rarest-term tf/len payloads) →
    surviving block keys.  ONE kernel does both phases:

    θ₀ seed: rows with non-null ``seed_tf`` are the rarest term's blocks;
    at most ``seed_max_blocks`` of them (highest block-max first) are
    decoded and exact-scored; θ₀ = k-th best single-term lower bound,
    loosened by one rounding quantum (any subset of true scores is a
    valid, merely weaker, bound — the cap is always safe).

    Exact interval pruning: the same upper-bound grid the scoring kernel
    uses, evaluated over the metadata BEFORE any doc payload is shuffled.
    A block survives iff it overlaps an interval whose summed block-max
    upper bound reaches θ₀; any doc with full UB ≥ θ₀ lies in a surviving
    interval and every block containing it overlaps that interval, so
    survivor scores stay complete.  Emits per-term max alongside so the
    scoring kernel needs no further metadata join.

    Scale note: per qid this task holds METADATA of the query's terms —
    n_postings/128 rows of a few scalars (a 10^9-posting term ≈ 8M rows ≈
    tens of MB), the same per-query working set a ds2i search node walks —
    plus the rarest term's tf/len payloads; doc payloads (the dominant
    bytes) stay distributed and pruned."""
    k1, b = scorer.k1, scorer.b
    quantum = 10.0 ** (-rank_round) if rank_round is not None else 0.0
    empty = {
        "qid": pd.Series([], dtype="int32"),
        "term_id": pd.Series([], dtype="int32"),
        "block_id": pd.Series([], dtype="int32"),
        "w": pd.Series([], dtype="float64"),
        "idf": pd.Series([], dtype="float64"),
        "max_score": pd.Series([], dtype="float64"),
        "theta0": pd.Series([], dtype="float64"),
    }

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # --- θ₀ from the seed (rarest-term) rows ---
        seed = pdf[pdf["seed_tf"].notna()]
        if seed_max_blocks > 0 and len(seed) > seed_max_blocks:
            seed = seed.nlargest(seed_max_blocks, "block_max_score")
        parts = []
        for tb, lb, w, idf in zip(
            seed["seed_tf"], seed["seed_len"], seed["w"], seed["idf"]
        ):
            tf, _ = decode_tfs(bytes(tb))
            ln, _ = decode_tfs(bytes(lb))
            tf = tf.astype(np.float64)
            ln = ln.astype(np.float64)
            parts.append(
                float(w) * float(idf) * tf
                / (tf + k1 * (1.0 - b + b * ln / avg_len))
            )
        lb_all = np.concatenate(parts) if parts else np.zeros(0)
        theta0 = float(np.partition(lb_all, -k)[-k]) if len(lb_all) >= k else 0.0
        # ranking compares scores ROUNDED to rank_round decimals, so a doc
        # with raw score up to one quantum below θ₀ can still tie and win
        # on (doc ASC) — loosen the threshold accordingly
        if theta0 > 0.0:
            theta0 = max(0.0, theta0 - quantum)

        # --- exact interval pruning over the metadata ---
        per_term = []
        groups = []
        for term_id, g in pdf.groupby("term_id", sort=True):
            g = g.sort_values("block_id")
            bf = g["first_doc"].to_numpy(dtype=np.int64)
            bl = g["last_doc"].to_numpy(dtype=np.int64)
            ub = g["block_max_score"].to_numpy(dtype=np.float64) * float(
                g["w"].iloc[0]
            )
            per_term.append(dict(firsts=bf, lasts=bl, ubs=ub))
            groups.append((int(term_id), g))
        points, ub_sum = _interval_grid(per_term)
        surv = ub_sum >= theta0 if theta0 > 0.0 else np.ones(
            len(points), dtype=bool
        )
        psurv = np.concatenate(([0], np.cumsum(surv)))
        out = []
        for (term_id, g), t in zip(groups, per_term):
            lo = np.searchsorted(points, t["firsts"], side="right") - 1
            hi = np.searchsorted(points, t["lasts"], side="right") - 1
            take = (psurv[hi + 1] - psurv[lo]) > 0
            if not take.any():
                continue
            gg = g.iloc[np.flatnonzero(take)]
            out.append(
                pd.DataFrame(
                    {
                        "qid": np.int32(key[0]),
                        "term_id": np.int32(term_id),
                        "block_id": gg["block_id"].to_numpy(dtype=np.int32),
                        "w": gg["w"].to_numpy(dtype=np.float64),
                        "idf": gg["idf"].to_numpy(dtype=np.float64),
                        "max_score": float(
                            g["block_max_score"].to_numpy(dtype=np.float64).max()
                        ),
                        "theta0": theta0,
                    }
                )
            )
        if not out:
            return pd.DataFrame(empty)
        return pd.concat(out, ignore_index=True)

    return kernel


class ServingIndex:
    """Encoded block table + metadata, ready for pruned top-k serving.

    Holds DataFrames only — no driver-side arrays of any corpus-
    proportional size.  The block table is self-contained (docIDs, tfs,
    doc lengths, block-max score per row); the only auxiliary table is the
    per-term max score (``wand``), derived from the block table by one
    aggregation.

    Two constructions:
    - ``ServingIndex(idx)`` — from a live build: ONE pass over the
      postings (blocks_from_tf with scoring) emits payloads + block-max
      together; no separate wand_data scan of the postings;
    - ``ServingIndex.from_store(spark, store)`` — from a persisted
      IndexStore alone (the mmap-load analogue: no corpus, no re-invert).
    """

    def __init__(self, idx: InvertedIndex, codec: str | None = None,
                 cfg: IndexConfig | None = None, blocks: DataFrame | None = None,
                 seed_max_blocks: int = 64):
        self.cfg = cfg or idx.cfg
        if blocks is None:
            # len rides inside tf (ds2s.invert.build_tf) — ONE cache scan,
            # no doc-keyed join of the posting table
            postings = idx.tf.select("term_id", "doc_id", "tf", "len", "df")
            blocks = blocks_from_tf(
                postings, idx.n_docs, self.cfg, codec=codec, avg_len=idx.avg_len
            )
        self._init_tables(
            lexicon=idx.lexicon,
            n_docs=idx.n_docs,
            avg_len=idx.avg_len,
            blocks=blocks,
            seed_max_blocks=seed_max_blocks,
        )

    def _init_tables(self, lexicon: DataFrame, n_docs: int, avg_len: float,
                     blocks: DataFrame, wand: DataFrame | None = None,
                     seed_max_blocks: int = 64) -> None:
        self.lexicon = lexicon
        self.n_docs = int(n_docs)
        self.avg_len = float(avg_len)
        self.seed_max_blocks = int(seed_max_blocks)
        self.blocks = blocks.persist()
        if wand is None:
            # term upper bound = max over its block maxes — one small agg
            # over the (persisted) block table, no postings scan
            wand = self.blocks.groupBy("term_id").agg(
                F.max("block_max_score").alias("max_score")
            )
        self.wand = wand.persist()

    @classmethod
    def from_store(cls, spark, store, cfg: IndexConfig | None = None,
                   seed_max_blocks: int = 64) -> "ServingIndex":
        """Serve from a persisted IndexStore (ds2s.manifest) — the
        ``succinct::mapper::map`` analogue ([U] succinct/mapper.hpp): the
        index IS the tables; no source corpus needed."""
        self = cls.__new__(cls)
        self.cfg = cfg or DEFAULT_CONFIG
        meta = store.load_meta()
        self._init_tables(
            lexicon=store.load_table(spark, "lexicon"),
            n_docs=meta["n_docs"],
            avg_len=meta["avg_len"],
            blocks=store.load_blocks(spark),
            wand=store.load_table(spark, "wand_max"),
            seed_max_blocks=seed_max_blocks,
        )
        return self

    # -- query-time plan ----------------------------------------------------
    def _resolve_cursors(self, qdf: DataFrame) -> list[tuple]:
        """Query terms → (qid, term_id, w, df, idf) — the dictionary
        lookup every ds2i query starts with.

        ONE predicate-pushed scan of the lexicon (``term IN (...)``, a
        bounded literal list — at scale this prunes to the dictionary
        partitions holding the query terms); everything else is driver
        arithmetic over ≤ batch-size rows.  idf is computed with np.log,
        the same libm the block-max encode kernel and the scoring kernels
        use, so every pruning comparison is float-consistent."""
        from collections import Counter

        scorer = self.cfg.scorer
        n = float(self.n_docs)
        wcount = Counter(
            (int(r["qid"]), r["term"])
            for r in qdf.select("qid", "term").collect()
        )
        terms = sorted({t for _, t in wcount})
        if not terms:
            return []
        lex = (
            self.lexicon.filter(F.col("term").isin(terms))
            .select("term", "term_id", "df")
            .collect()
        )
        tmap = {r["term"]: (int(r["term_id"]), int(r["df"])) for r in lex}
        cur = []
        for (qid, term), w in sorted(wcount.items()):
            if term not in tmap:
                continue  # OR semantics: unknown terms are ignored
            tid, df = tmap[term]
            idf = max(
                scorer.idf_epsilon,
                float(np.log((n - df + 0.5) / (df + 0.5))),
            ) * (1.0 + scorer.k1)
            cur.append((qid, tid, float(w), df, idf))
        return cur

    def survivor_blocks(self, qdf: DataFrame, k: int = 10,
                        rank_round: int | None = 6) -> DataFrame:
        """The pre-pruned (qid × block) rows — metadata + payloads — that
        the scoring kernel will actually receive.  Exposed for the
        decode-pruning metric: ``survivor_blocks(...).count()`` vs the
        unpruned qid × term-blocks join.

        The resolved cursors re-enter the plan as literal broadcast rows;
        every non-seed row carries NULL tf/len payloads (projected out
        BEFORE the shuffle); a single per-qid kernel seeds θ₀ from the
        rarest term's best blocks and runs the exact upper-bound interval
        grid over the metadata (see _make_plan_kernel for the safety
        argument); only surviving block keys come back, and only their
        payloads join into the scoring kernel.  Payloads of pruned blocks
        never shuffle."""
        spark = qdf.sparkSession
        cur = self._resolve_cursors(qdf)
        if not cur:
            empty = self.blocks.limit(0).withColumn("qid", F.lit(0))
            for c in ("w", "idf", "max_score", "theta0"):
                empty = empty.withColumn(c, F.lit(0.0))
            return empty
        # rarest term per qid (min df, term_id tiebreak) — seeds θ₀
        rarest: dict[int, tuple] = {}
        for qid, tid, w, df, idf in cur:
            best = rarest.get(qid)
            if best is None or (df, tid) < (best[1], best[0]):
                rarest[qid] = (tid, df)
        meta_rows = [
            (qid, tid, w, idf, rarest[qid][0] == tid)
            for qid, tid, w, df, idf in cur
        ]
        meta_df = spark.createDataFrame(
            meta_rows,
            schema="qid int, term_id int, w double, idf double, is_seed boolean",
        )
        bmeta = (
            self.blocks.select(
                "term_id", "block_id", "first_doc", "last_doc",
                "block_max_score", "tf_bytes", "len_bytes",
            )
            .join(F.broadcast(meta_df), "term_id")
            .select(
                "qid", "term_id", "block_id", "first_doc", "last_doc",
                "block_max_score", "w", "idf",
                F.when(F.col("is_seed"), F.col("tf_bytes")).alias("seed_tf"),
                F.when(F.col("is_seed"), F.col("len_bytes")).alias("seed_len"),
            )
        )
        plan_kernel = _make_plan_kernel(
            k, self.cfg.scorer, self.avg_len, rank_round, self.seed_max_blocks
        )
        surv_schema = (
            "qid int, term_id int, block_id int, w double, idf double, "
            "max_score double, theta0 double"
        )
        surv_keys = bmeta.groupBy("qid").applyInPandas(
            plan_kernel, schema=surv_schema
        )
        return self.blocks.select(
            "term_id", "block_id", "n", "first_doc", "last_doc",
            "doc_bytes", "tf_bytes", "len_bytes", "block_max_score",
        ).join(F.broadcast(surv_keys), ["term_id", "block_id"])

    def topk(self, qdf: DataFrame, k: int = 10, algo: str = "bmw",
             rank_round: int | None = 6) -> DataFrame:
        """(qid, rank, doc_id, score) — rank-identical to ranked_or_topk.

        ``algo``: "bmw" (block-max intervals, [U] ds2i
        block_max_wand_query), "maxscore" (term-bound intervals, [U] ds2i
        maxscore_query), or "wand" (adaptive-θ docID-ordered pivoting,
        [U] ds2i wand_query)."""
        surv = self.survivor_blocks(qdf, k=k, rank_round=rank_round)
        kernel = _make_kernel(k, algo, self.cfg.scorer, self.avg_len, rank_round)
        return surv.groupBy("qid").applyInPandas(kernel, schema=_OUT_SCHEMA)


def bmw_topk(sidx: ServingIndex, qdf: DataFrame, k: int = 10) -> DataFrame:
    """Block-Max WAND ([U] ds2i block_max_wand_query; Ding & Suel 2011)."""
    return sidx.topk(qdf, k=k, algo="bmw")


def maxscore_topk(sidx: ServingIndex, qdf: DataFrame, k: int = 10) -> DataFrame:
    """MaxScore term-bound pruning ([U] ds2i maxscore_query)."""
    return sidx.topk(qdf, k=k, algo="maxscore")


def wand_topk(sidx: ServingIndex, qdf: DataFrame, k: int = 10) -> DataFrame:
    """Classic WAND cursor-pivot pruning ([U] ds2i wand_query)."""
    return sidx.topk(qdf, k=k, algo="wand")
