"""Dynamic-pruning top-k serving kernels: MaxScore and Block-Max WAND.

ds2i's ranked operators ([U] ds2i/queries.cpp wand_query / maxscore_query /
block_max_wand_query — upstream layout, SURVEY.md §2.6) are cursor-at-a-time
heap algorithms.  A per-posting Python loop cannot survive translation
(SURVEY.md §4 last row), so this module implements the same *pruning
semantics* as a vectorized **upper-bound interval sweep**, exact by
construction:

1. seed θ₀: exact-score the rarest query term's postings; θ₀ = k-th best
   single-term lower bound (0 if fewer than k);
2. partition docID space by the block (BMW) or term (MaxScore) boundary
   points; on each interval the summed upper bound UB = Σ_t ub_t is
   constant — computed vectorized via searchsorted;
3. any doc with true score ≥ θ₀ has UB ≥ θ₀, so only blocks overlapping
   survivor intervals (UB ≥ θ₀) are decoded; every posting of a surviving
   doc lives in a decoded block, so survivor scores are complete;
4. exact top-k over survivor scores — rank-identical to the exhaustive
   ranked-OR oracle (the §5.2 property), with the same rounding and
   (score DESC, doc ASC) tie discipline.

The kernel runs inside ``groupBy(qid).applyInPandas`` over the *joined*
(query × block) rows: queries are batched through Arrow, inner loops are
numpy over whole blocks.  Block payloads reach the kernel via a semi-join
of the block table against the query's terms — at cluster scale that is a
partition-pruned scan of the term buckets, not a broadcast of the index.

Upper bounds are inflated by 1+1e-9 before pruning: the block-max table is
computed by JVM float math, the kernel scores with numpy; the margin keeps
pruning safe across last-ulp differences (both paths rank on values rounded
to 6 decimals, so the margin cannot change results).
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
from .wand import build_block_max, build_wand_max

_UB_MARGIN = 1.0 + 1e-9


def _sweep_topk(
    per_term: list[dict],
    k: int,
    theta0: float,
    seed_docs: np.ndarray,
    seed_contrib: np.ndarray,
    lens: np.ndarray,
    avg_len: float,
    scorer,
    rank_round: int | None,
) -> tuple[np.ndarray, np.ndarray]:
    """Shared exact sweep. per_term entries:
    {firsts, lasts, ubs (per interval), block_first, block_last, payloads
    (list of (doc_bytes, tf_bytes)), idf, w} — ``firsts/lasts/ubs`` are the
    PRUNING intervals (blocks for BMW, one per term for MaxScore);
    ``block_*``/payloads are the physical 128-blocks to decode."""
    # --- interval grid over docID space ---
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
    surv = ub >= theta0 if theta0 > 0.0 else np.ones(len(points), dtype=bool)
    psurv = np.concatenate(([0], np.cumsum(surv)))

    # --- decode blocks overlapping survivor intervals; exact-score ---
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
        d_parts, f_parts = [], []
        for i in np.flatnonzero(take):
            db, tb = t["payloads"][i]
            d, _ = decode_docs(bytes(db))
            tf, _ = decode_tfs(bytes(tb))
            d_parts.append(d.astype(np.int64))
            f_parts.append(tf.astype(np.float64))
        docs = np.concatenate(d_parts)
        tfs = np.concatenate(f_parts)
        tl = lens[docs]
        c = t["w"] * t["idf"] * tfs / (tfs + k1 * (1.0 - b + b * tl / avg_len))
        doc_parts.append(docs)
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

    # --- exact top-k, frozen tie discipline (half-up rounding = F.round) ---
    rs = round_half_up(scores, rank_round) if rank_round is not None else scores
    order = np.lexsort((ud, -rs))[:k]
    return ud[order], scores[order]


def _make_kernel(k, algo, scorer, avg_len, lens_bc, rank_round):
    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(key[0])
        lens = lens_bc.value
        per_term: list[dict] = []
        seed = None  # (df, docs, contrib)
        for term_id, g in pdf.groupby("term_id", sort=True):
            g = g.sort_values("block_id")
            bf = g["first_doc"].to_numpy(dtype=np.int64)
            bl = g["last_doc"].to_numpy(dtype=np.int64)
            bmax = g["block_max_score"].to_numpy(dtype=np.float64)
            w = float(g["w"].iloc[0])
            df_t = float(g["df"].iloc[0])
            idf = float(g["idf"].iloc[0])
            tmax = float(g["max_score"].iloc[0])
            payloads = list(zip(g["doc_bytes"], g["tf_bytes"]))
            if algo == "bmw":
                firsts, lasts, ubs = bf, bl, bmax * w
            else:  # maxscore: one pruning interval per term
                firsts = bf[:1]
                lasts = bl[-1:]
                ubs = np.array([tmax * w], dtype=np.float64)
            per_term.append(
                dict(
                    firsts=firsts, lasts=lasts, ubs=ubs,
                    block_first=bf, block_last=bl, payloads=payloads,
                    idf=idf, w=w,
                )
            )
            if seed is None or df_t < seed[0]:
                seed = (df_t, len(per_term) - 1)
        if not per_term:
            return pd.DataFrame(
                {"qid": [], "rank": [], "doc_id": [], "score": []}
            ).astype({"qid": "int32", "rank": "int32", "doc_id": "int64", "score": "float64"})

        # seed θ₀ from the rarest term's exact single-term contributions
        st = per_term[seed[1]]
        d_parts, f_parts = [], []
        for db, tb in st["payloads"]:
            d, _ = decode_docs(bytes(db))
            tf, _ = decode_tfs(bytes(tb))
            d_parts.append(d.astype(np.int64))
            f_parts.append(tf.astype(np.float64))
        sdocs = np.concatenate(d_parts) if d_parts else np.zeros(0, np.int64)
        stfs = np.concatenate(f_parts) if f_parts else np.zeros(0, np.float64)
        tl = lens[sdocs] if len(sdocs) else np.zeros(0, np.float64)
        k1, b = scorer.k1, scorer.b
        lb = st["w"] * st["idf"] * stfs / (stfs + k1 * (1.0 - b + b * tl / avg_len))
        theta0 = float(np.partition(lb, -k)[-k]) if len(lb) >= k else 0.0
        # ranking compares scores ROUNDED to rank_round decimals, so a doc
        # with raw score up to one rounding quantum below θ₀ can still tie
        # and win on (doc ASC) — loosen the pruning threshold accordingly
        if rank_round is not None and theta0 > 0.0:
            theta0 = max(0.0, theta0 - 10.0 ** (-rank_round))

        docs, scores = _sweep_topk(
            per_term, k, theta0, sdocs, lb, lens, avg_len, scorer, rank_round
        )
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


class ServingIndex:
    """Encoded block table + metadata, ready for pruned top-k serving.

    Holds DataFrames only (no driver-side postings); the doc-length array
    (BM25 normalization, ds2i's wand_data norm-lens — [U] ds2i/wand_data.hpp)
    is broadcast once, exactly as ds2i mmaps it on every search node.

    Two constructions:
    - ``ServingIndex(idx)`` — from a live build (computes block table +
      block-max/wand metadata);
    - ``ServingIndex.from_store(spark, store)`` — from a persisted
      IndexStore alone (the mmap-load analogue: no corpus, no re-invert).
    """

    def __init__(self, idx: InvertedIndex, codec: str | None = None,
                 cfg: IndexConfig | None = None, blocks: DataFrame | None = None):
        self.cfg = cfg or idx.cfg
        if blocks is None:
            # scale path: block table straight from flat postings — never
            # materializes a hot term's full list in one row
            blocks = blocks_from_tf(
                idx.tf.select("term_id", "doc_id", "tf"), idx.n_docs, self.cfg,
                codec=codec,
            )
        bm = build_block_max(idx, self.cfg, round_to=None).select(
            "term_id", "block_id", "block_max_score"
        )
        wm = build_wand_max(idx, round_to=None)
        self._init_tables(
            lexicon=idx.lexicon,
            sizes=idx.sizes,
            n_docs=idx.n_docs,
            avg_len=idx.avg_len,
            blocks=blocks.join(bm, ["term_id", "block_id"]).join(wm, "term_id"),
        )

    def _init_tables(self, lexicon: DataFrame, sizes: DataFrame, n_docs: int,
                     avg_len: float, blocks: DataFrame) -> None:
        self.lexicon = lexicon
        self.n_docs = int(n_docs)
        self.avg_len = float(avg_len)
        self.blocks = blocks.persist()
        sc = lexicon.sparkSession.sparkContext
        lens = np.zeros(self.n_docs, dtype=np.float64)
        for r in sizes.collect():
            lens[r["doc_id"]] = r["len"]
        self.lens_bc = sc.broadcast(lens)

    @classmethod
    def from_store(cls, spark, store, cfg: IndexConfig | None = None) -> "ServingIndex":
        """Serve from a persisted IndexStore (ds2s.manifest) — the
        ``succinct::mapper::map`` analogue ([U] succinct/mapper.hpp): the
        index IS the tables; no source corpus needed."""
        from .config import DEFAULT_CONFIG

        self = cls.__new__(cls)
        self.cfg = cfg or DEFAULT_CONFIG
        meta = store.load_meta()
        blocks = (
            store.load_blocks(spark)
            .join(store.load_table(spark, "block_max"), ["term_id", "block_id"])
            .join(store.load_table(spark, "wand_max"), "term_id")
        )
        self._init_tables(
            lexicon=store.load_table(spark, "lexicon"),
            sizes=store.load_table(spark, "sizes"),
            n_docs=meta["n_docs"],
            avg_len=meta["avg_len"],
            blocks=blocks,
        )
        return self

    def topk(self, qdf: DataFrame, k: int = 10, algo: str = "bmw",
             rank_round: int | None = 6) -> DataFrame:
        """(qid, rank, doc_id, score) — rank-identical to ranked_or_topk."""
        scorer = self.cfg.scorer
        n = float(self.n_docs)
        cursors = (
            qdf.groupBy("qid", "term").agg(F.count("*").cast("double").alias("w"))
            .join(F.broadcast(self.lexicon), "term")
            .withColumn(
                "idf",
                F.greatest(
                    F.lit(scorer.idf_epsilon),
                    F.log((F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5)),
                ) * F.lit(1.0 + scorer.k1),
            )
            .select("qid", "term_id", "w", "df", "idf")
        )
        qblocks = cursors.join(self.blocks, "term_id")
        kernel = _make_kernel(k, algo, scorer, self.avg_len, self.lens_bc, rank_round)
        return qblocks.groupBy("qid").applyInPandas(
            kernel, schema="qid int, rank int, doc_id long, score double"
        )


def bmw_topk(sidx: ServingIndex, qdf: DataFrame, k: int = 10) -> DataFrame:
    """Block-Max WAND ([U] ds2i block_max_wand_query; Ding & Suel 2011)."""
    return sidx.topk(qdf, k=k, algo="bmw")


def maxscore_topk(sidx: ServingIndex, qdf: DataFrame, k: int = 10) -> DataFrame:
    """MaxScore / WAND term-bound pruning ([U] ds2i maxscore_query)."""
    return sidx.topk(qdf, k=k, algo="maxscore")
