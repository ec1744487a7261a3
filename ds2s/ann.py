"""Similarity search over an embedding column (array<float>).

Training-data pipeline operator (see ds2s.textops docstring for scope).

- ``bruteforce_topk``: exact cosine top-k — flat scan, broadcast queries,
  JVM-side ``zip_with``/``aggregate`` dot products (no Python), per-query
  top-k via window.  The correctness oracle.
- ``lsh_topk``: random-hyperplane LSH — deterministic planes derived from
  md5 (no RNG state, reproducible across cluster sizes), bucket join with
  margin-ordered multiprobe on the query side (Lv et al. 2007), exact
  rerank within buckets.  Sub-linear candidate set; recall < 1 by design
  (property-tested against the brute-force oracle, rows-only driver
  check).  Plane count trades recall for candidate volume: the
  sign-collision probability per plane is 1 − θ/π.  The LSH exponent
  ρ = ln(1/p₁)/ln(1/p₂) bounds the frontier: on the near-uniform fixture
  (top-10 cosine ≈ 0.32 → p₁ ≈ 0.61 vs p₂ = 0.5 → ρ ≈ 0.73) candidates
  scale as n^0.73, so at fixture n=2000 a high-recall operating point
  inspects a large corpus fraction — the method pays exactly when n is
  large or the space is clustered (real embedding spaces are; see
  tests/test_ann_recall.py, recall ≥ 0.9 at ≤ 5% candidates).

- ``ivf_topk``: inverted-file ANN — deterministic spherical k-means
  coarse quantizer trained on a bounded md5-ordered sample, one narrow
  assignment pass over the collection, per-query probing of the
  ``nprobe`` nearest cells, exact rerank inside.  The candidate fraction
  is ``≈ nprobe/n_centroids`` regardless of data distribution — unlike
  hyperplane LSH its cost does not degrade on unstructured (uniform)
  spaces, which is why it is the scale path of record for the
  structureless fixture (measured in bench.py on both fixtures).

Scale: brute force shuffles nothing (queries broadcast, one pass over the
collection, TakeOrderedAndProject per query); LSH adds one narrow signature
projection and joins on (bucket) — at 10^9 vectors the bucket join replaces
the full scan per query, and multiple probe tables (``n_tables``) trade
recall for cost.  IVF adds one narrow assignment pass (centroids ride in
the closure) and a per-cell bucket join; quantizer training is a bounded
driver-side numpy job on a sample, never a distributed iteration.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.select(
        "vec_id", F.transform(col, lambda x: x.cast("double")).alias("v")
    ).withColumn(
        "norm",
        F.sqrt(
            F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
        ),
    )


def default_queries(embeddings: DataFrame, every: int = 97) -> DataFrame:
    """Deterministic query subset: vec_id % every == 0."""
    return embeddings.filter(F.col("vec_id") % every == 0)


def _queries_side(queries: DataFrame) -> DataFrame:
    return _as_double(queries).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )


def _cosine_rank_topk(joined: DataFrame, k: int) -> DataFrame:
    """Shared scoring tail for the brute-force oracle and the ANN rerank
    paths: the 6-dp cosine and the (cosine DESC, vec_id ASC) tie rule are
    FROZEN semantics encoded exactly once — a change here moves the oracle
    and every rerank path together, never one without the other."""
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = joined.withColumn(
        "cosine", F.round(dot / (F.col("norm") * F.col("qnorm")), 6)
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "vec_id", "cosine")
    )


def bruteforce_topk(
    embeddings: DataFrame, queries: DataFrame | None = None, k: int = 10
) -> DataFrame:
    """(qid, rank, vec_id, cosine) exact top-k by (cosine DESC, vec_id ASC),
    self-matches excluded; cosine ranked at 6 decimals, emitted at 6."""
    queries = queries if queries is not None else default_queries(embeddings)
    base = _as_double(embeddings)
    q = _queries_side(queries)
    return _cosine_rank_topk(
        base.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("qid")), k
    )


def _planes(dim: int, n_planes: int, table: int) -> np.ndarray:
    """Deterministic ±1 hyperplanes: sign of byte j of md5(table:plane:dim-
    block).  Pure function of (table, plane, dim) — identical on every
    executor and at any parallelism."""
    import hashlib

    out = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        raw = b""
        blk = 0
        while len(raw) < dim:
            raw += hashlib.md5(f"{table}:{p}:{blk}".encode()).digest()
            blk += 1
        bits = np.frombuffer(raw[:dim], dtype=np.uint8)
        out[p] = np.where(bits & 1 == 1, 1.0, -1.0)
    return out


def lsh_buckets(
    embeddings: DataFrame, n_planes: int = 6, n_tables: int = 4
) -> DataFrame:
    """(vec_id, table, bucket) — sign-pattern bucket per hash table,
    computed in one Arrow-batched matmul per partition.

    Planes are generated INSIDE the kernel from the batch's own
    dimensionality: ``_planes`` is a pure function of (dim, plane, table),
    so every executor derives identical planes and no driver job is spent
    probing dim (the round-3 ``.first()`` probe was one extra job per
    call)."""
    weights = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)

    def sig(batches):
        planes: list[np.ndarray] | None = None
        for pdf in batches:
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            if planes is None:
                planes = [_planes(M.shape[1], n_planes, t) for t in range(n_tables)]
            rows = []
            for t, P in enumerate(planes):
                bits = (M @ P.T) > 0
                buckets = (bits.astype(np.uint64) @ weights).astype(np.int64)
                rows.append(
                    pd.DataFrame(
                        {"vec_id": pdf["vec_id"], "table": t, "bucket": buckets}
                    )
                )
            yield pd.concat(rows)

    return embeddings.select("vec_id", "embedding").mapInPandas(
        sig, schema="vec_id long, table int, bucket long"
    )


def auto_lsh_params(n_vectors: int) -> tuple[int, int]:
    """(n_planes, n_tables) scaled to the collection size.

    Planes grow with log(n) to keep expected bucket occupancy ~constant
    (candidate volume sub-linear); tables grow alongside because per-table
    recall decays geometrically in plane count — the standard
    multi-table/multi-probe trade (Indyk-Motwani LSH).  Tuned so the
    clustered-fixture recall property (tests/test_ann_recall.py) holds
    with candidates ≤5% of the corpus."""
    import math

    n_planes = max(8, int(math.ceil(math.log2(max(n_vectors, 2)))) + 1)
    n_tables = max(4, n_planes - 5)
    return n_planes, n_tables


def _probe_masks(margins: np.ndarray, n_probes: int, max_flip: int = 12) -> list[int]:
    """Margin-ordered multiprobe (Lv et al., 'Multi-Probe LSH', VLDB 2007):
    the ``n_probes`` cheapest XOR masks, where a mask's cost is the summed
    |projection margin| of the flipped planes — a neighbor most likely
    differs on the planes the query itself barely cleared.

    Best-first perturbation-set expansion (the paper's own algorithm),
    NOT 2^max_flip enumeration: pop the cheapest frontier subset, push
    its two successors over the margin-sorted plane positions — extend
    (add the next position) and shift (replace the last position with
    the next).  Every successor costs ≥ its parent and every non-empty
    subset is generated exactly once, so the first ``n_probes`` pops are
    exactly the globally cheapest subsets in O(n_probes log n_probes)
    per (query, table) — the previous exhaustive version evaluated up to
    4096 subsets per (query, table) in the driver (round-5 review
    finding).  Deterministic; among exactly-equal costs ties break by
    mask value within the frontier."""
    import heapq

    order = np.argsort(margins, kind="stable")[: min(len(margins), max_flip)]
    m = len(order)
    out = [0]  # the unperturbed bucket is always the cheapest probe
    if m == 0 or n_probes <= 1:
        return out
    csort = [float(margins[p]) for p in order]
    bit = [1 << int(p) for p in order]
    heap = [(csort[0], bit[0], (0,))]
    while heap and len(out) < n_probes:
        cost, mask, pos = heapq.heappop(heap)
        out.append(mask)
        last = pos[-1]
        if last + 1 < m:
            heapq.heappush(
                heap,
                (cost + csort[last + 1], mask | bit[last + 1], pos + (last + 1,)),
            )
            heapq.heappush(
                heap,
                (
                    cost - csort[last] + csort[last + 1],
                    (mask ^ bit[last]) | bit[last + 1],
                    pos[:-1] + (last + 1,),
                ),
            )
    return out


def lsh_candidates(
    embeddings: DataFrame,
    queries: DataFrame,
    n_planes: int = 6,
    n_tables: int = 4,
    multiprobe: int = 1,
    n_probes: int | None = None,
) -> DataFrame:
    """(qid, vec_id) distinct candidate pairs: vectors sharing an LSH
    bucket with the query in ANY table, with margin-ordered multiprobe on
    the query side (``n_probes`` buckets per table; defaults to
    ``1 + n_planes`` — the Hamming-1 budget — when ``multiprobe`` ≥ 1).

    The query side is a bounded batch: its projections collect to the
    driver, probe masks are numpy per (query, table), and the probe rows
    re-enter the plan as a broadcast literal — the collection-side bucket
    table is never moved, only bucket-joined."""
    if n_probes is None:
        n_probes = 1 + n_planes if multiprobe >= 1 else 1
    buckets = lsh_buckets(embeddings, n_planes, n_tables)
    spark = embeddings.sparkSession

    qrows = queries.select("vec_id", "embedding").collect()
    if not qrows:
        return spark.createDataFrame([], schema="qid long, vec_id long")
    # dim from the already-collected query batch — no extra dim-probe job
    dim = len(qrows[0]["embedding"])
    planes = [_planes(dim, n_planes, t) for t in range(n_tables)]
    weights = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)
    probe_rows = []
    for r in qrows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        for t, P in enumerate(planes):
            proj = P @ v
            bucket = int((proj > 0).astype(np.uint64) @ weights)
            for m in _probe_masks(np.abs(proj), n_probes):
                probe_rows.append((int(r["vec_id"]), t, bucket ^ m))
    qb = spark.createDataFrame(
        probe_rows, schema="qid long, table int, bucket long"
    )
    return (
        buckets.join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    n_planes: int | None = 6,
    n_tables: int | None = None,
    multiprobe: int = 1,
    n_probes: int | None = None,
) -> DataFrame:
    """(qid, rank, vec_id, cosine) approximate top-k: LSH-bucketed
    candidates (``lsh_candidates``) exact-ranked.  Pass ``n_planes=None``
    to auto-scale both parameters from the collection size;
    ``n_tables=None`` pairs with whatever n_planes resolves to (auto_t
    under auto-scaling, the classic 4 otherwise) — the recall property
    (tests/test_ann_recall.py) holds only for PAIRED parameters, so a
    lone ``n_planes=None`` must never run auto planes with the small
    fixed table count (round-5 review finding)."""
    queries = queries if queries is not None else default_queries(embeddings)
    if n_planes is None:
        auto_p, auto_t = auto_lsh_params(embeddings.count())
        n_planes = auto_p
        n_tables = auto_t if n_tables is None else n_tables
    elif n_tables is None:
        n_tables = 4
    cand = lsh_candidates(
        embeddings, queries, n_planes, n_tables, multiprobe, n_probes
    )
    return _exact_rerank(embeddings, queries, cand, k)


def _exact_rerank(
    embeddings: DataFrame, queries: DataFrame, cand: DataFrame, k: int
) -> DataFrame:
    """(qid, vec_id) candidate pairs → exact cosine top-k per qid —
    _cosine_rank_topk is the ONE definition of the dot product, rounding
    and tie rule shared with the brute-force oracle."""
    base = _as_double(embeddings)
    q = _queries_side(queries)
    return _cosine_rank_topk(
        cand.join(base, "vec_id").join(F.broadcast(q), "qid"), k
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def _kmeans_fit(X: np.ndarray, k: int, iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means: farthest-point (maxmin) seeding —
    no RNG anywhere, so the quantizer is identical across runs and
    cluster sizes — then Lloyd iterations on the unit sphere.  Runs on a
    BOUNDED sample in the driver (the standard IVF recipe: train the
    coarse quantizer on a sample, assign the full collection in one
    distributed pass)."""
    norms = np.linalg.norm(X, axis=1)
    Xn = X / np.where(norms == 0.0, 1.0, norms)[:, None]
    k = min(k, len(Xn))
    # maxmin seeding: start from the lexicographically-first max-norm row
    first = int(np.argmax(norms))
    idxs = [first]
    best_sim = Xn @ Xn[first]
    for _ in range(1, k):
        nxt = int(np.argmin(best_sim))
        idxs.append(nxt)
        best_sim = np.maximum(best_sim, Xn @ Xn[nxt])
    C = Xn[idxs].copy()
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        empties = []
        for c in range(k):
            members = Xn[assign == c]
            if len(members) == 0:
                empties.append(c)
                continue
            m = members.sum(axis=0)
            n = np.linalg.norm(m)
            C[c] = m / (n if n > 0 else 1.0)
        if empties:
            # deterministic re-seed with DISTINCT points: farthest-from-
            # own-centroid order, one index per empty cluster.  Reseeding
            # each empty cluster independently against the stale assign
            # used to hand several empty clusters the SAME point —
            # duplicate centroid rows, shrunken effective cell count,
            # nprobe budget spent on identical cells (round-5 review
            # finding).
            sims = (Xn * C[assign]).sum(axis=1)
            order = np.argsort(sims, kind="stable")
            for c, p in zip(empties, order):
                C[c] = Xn[int(p)]
    return C


def ivf_fit_centroids(
    embeddings: DataFrame, n_centroids: int,
    sample_cap: int = 65536, iters: int = 8, n_hint: int | None = None,
) -> np.ndarray:
    """Train the coarse quantizer on a deterministic md5-ordered sample
    (bounded driver memory at any collection size).

    The sample is the ``sample_cap`` lexicographically-smallest
    ``md5(vec_id)`` rows.  When the collection size is known
    (``n_hint``) and large, a narrow md5-PREFIX filter (4× margin) cuts
    the TakeOrdered input first: the filter keeps exactly the global
    bottom segment of the md5 order, so the result is identical to the
    unfiltered TakeOrdered whenever it yields ≥ sample_cap rows — but the
    driver no longer merges partitions × sample_cap rows at 10⁹ vectors
    (round-3 advice)."""
    md5_key = F.md5(F.col("vec_id").cast("string"))
    sel = embeddings.select("vec_id", "embedding")
    rows = None
    if n_hint is not None and n_hint > 4 * sample_cap:
        frac = min(1.0, 4.0 * sample_cap / n_hint)
        bound = format(max(1, int(frac * 16 ** 8)), "08x")
        rows = (
            sel.filter(F.substring(md5_key, 1, 8) < F.lit(bound))
            .orderBy(md5_key, "vec_id")
            .limit(int(sample_cap))
            .collect()
        )
        if len(rows) < sample_cap:  # under-delivered — exact global fallback
            rows = None
    if rows is None:
        rows = sel.orderBy(md5_key, "vec_id").limit(int(sample_cap)).collect()
    if not rows:  # empty collection: no quantizer (callers return empty)
        return np.zeros((0, 0), dtype=np.float64)
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return _kmeans_fit(X, n_centroids, iters)


def ivf_assignments(embeddings: DataFrame, centroids: np.ndarray) -> DataFrame:
    """(vec_id, cluster): one narrow distributed pass — centroids ship in
    the UDF closure (k×d floats, small), assignment is a vectorized
    argmax per Arrow batch.  No shuffle."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)

    def assign(batches):
        for pdf in batches:
            V = np.array(list(pdf["embedding"]), dtype=np.float64)
            n = np.linalg.norm(V, axis=1)
            V = V / np.where(n == 0.0, 1.0, n)[:, None]
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "cluster": np.argmax(V @ C.T, axis=1).astype(np.int32),
            })

    return embeddings.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, cluster int"
    )


def ivf_multi_assignments(
    embeddings: DataFrame, centroids: np.ndarray, top: int
) -> DataFrame:
    """(vec_id, cluster, crank) — each vector's ``top`` nearest centroids
    (crank 1 = primary cell).  Same narrow one-pass shape as
    ``ivf_assignments``; used for all-pairs near-dup probing, where every
    vector is a query of its own neighborhood and a pair is a candidate
    when one side's primary cell is in the other side's probe list."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    top = max(1, min(int(top), len(C)))

    def assign(batches):
        for pdf in batches:
            V = np.array(list(pdf["embedding"]), dtype=np.float64)
            n = np.linalg.norm(V, axis=1)
            V = V / np.where(n == 0.0, 1.0, n)[:, None]
            order = np.argsort(-(V @ C.T), axis=1, kind="stable")[:, :top]
            m = order.shape[0]
            yield pd.DataFrame({
                "vec_id": np.repeat(pdf["vec_id"].to_numpy(), top),
                "cluster": order.reshape(-1).astype(np.int32),
                "crank": np.tile(np.arange(1, top + 1, dtype=np.int32), m),
            })

    return embeddings.select("vec_id", "embedding").mapInPandas(
        assign, schema="vec_id long, cluster int, crank int"
    )


def ivf_candidates(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    nprobe: int,
    assignments: DataFrame | None = None,
) -> DataFrame:
    """(qid, vec_id) candidates: vectors assigned to any of the query's
    ``nprobe`` nearest centroids.  The query side is a bounded batch —
    its probe list is computed in the driver and re-enters the plan as a
    broadcast literal; the collection-side assignment table is only
    joined, never moved."""
    spark = embeddings.sparkSession
    if assignments is None:
        assignments = ivf_assignments(embeddings, centroids)
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    probe_rows = []
    for r in queries.select("vec_id", "embedding").collect():
        v = np.asarray(r["embedding"], dtype=np.float64)
        nv = np.linalg.norm(v)
        v = v / (nv if nv > 0 else 1.0)
        order = np.argsort(-(C @ v), kind="stable")[: int(nprobe)]
        for c in order:
            probe_rows.append((int(r["vec_id"]), int(c)))
    probes = spark.createDataFrame(probe_rows, schema="qid long, cluster int")
    return (
        assignments.join(F.broadcast(probes), "cluster")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 10,
    n_centroids: int | None = None,
    nprobe: int | None = None,
    sample_cap: int = 65536,
    iters: int = 8,
) -> DataFrame:
    """(qid, rank, vec_id, cosine) approximate top-k via an IVF coarse
    quantizer (the classic inverted-file ANN layout): deterministic
    spherical k-means on a bounded sample, one narrow assignment pass,
    probe the ``nprobe`` nearest cells per query, exact rerank inside.

    Defaults: ``n_centroids = ⌈√n⌉`` (balanced cell size √n),
    ``nprobe = ⌈n_centroids/8⌉`` (≈12% of cells ≈12% of candidates on
    balanced data).  Candidate volume scales as ``nprobe/n_centroids``
    of the collection — tune the ratio, not the absolutes, as n grows."""
    queries = queries if queries is not None else default_queries(embeddings)
    n = None
    if n_centroids is None or nprobe is None:
        n = embeddings.count()
        n_centroids = n_centroids or max(4, int(np.ceil(np.sqrt(n))))
        nprobe = nprobe or max(1, -(-n_centroids // 8))
    centroids = ivf_fit_centroids(
        embeddings, n_centroids, sample_cap, iters, n_hint=n
    )
    if len(centroids) == 0:
        # empty collection — same graceful shape as the LSH path: run the
        # normal rerank over zero candidates so the output schema is the
        # usual one, not a hand-built empty frame that could drift
        cand = (
            queries.select(F.col("vec_id").alias("qid")).limit(0)
            .crossJoin(embeddings.select("vec_id").limit(0))
        )
        return _exact_rerank(embeddings, queries, cand, k)
    cand = ivf_candidates(embeddings, queries, centroids, nprobe)
    return _exact_rerank(embeddings, queries, cand, k)
