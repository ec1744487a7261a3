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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from ds2s.session import get_spark

    spark = get_spark(app=f"ds2s-bench-{sf}", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    idx = E._index(spark, sf_dir)
    # materialize every persisted table the queries rely on
    idx.sizes.count()
    idx.tf.count()
    idx.lexicon.count()
    idx.postings.count()
    timings["build"] = round(time.perf_counter() - t0, 3)

    # the compressed serving index (block encode + len payloads +
    # block-max) gets its own timing entry instead of hiding inside
    # whichever query touches it first
    t0 = time.perf_counter()
    sidx = E._sindex(spark, sf_dir)
    sidx.blocks.count()
    sidx.wand.count()
    timings["sidx_encode"] = round(time.perf_counter() - t0, 3)

    for name, fn in E.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

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
        truth = {
            (r["qid"], r["vec_id"]) for r in ann.bruteforce_topk(embs).collect()
        }
        got = {
            (r["qid"], r["vec_id"]) for r in ann.lsh_topk(embs, **kw).collect()
        }
        return round(len(truth & got) / max(len(truth), 1), 4)

    rng = np.random.default_rng(11)
    n_c, dim = 4000, 32
    centers = rng.normal(size=(50, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[rng.integers(0, 50, size=n_c)] + 0.1 * rng.normal(size=(n_c, dim))
    clustered = spark.createDataFrame(
        [(int(i), [float(x) for x in pts[i]]) for i in range(n_c)],
        "vec_id long, embedding array<double>",
    )
    ann_recall = recall(
        clustered, n_planes=None, n_tables=None, multiprobe=1
    )
    ann_recall_uniform = recall(E._embs(spark, sf_dir))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "ds2s_build_plus_queries",
                "value": total,
                "unit": "sec",
                "ann_recall_at10_clustered": ann_recall,
                "ann_recall_at10_uniform": ann_recall_uniform,
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": int(cpus) if str(cpus).isdigit() else cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
