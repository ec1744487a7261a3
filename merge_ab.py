"""Interleaved A/B of blocks_from_tf physical plans, same process, same
corpus, 32 cores: A = salted window/merge plan (three exchanges of the
posting bytes), B = single-exchange TERM plan (whole term per partition;
sort+cut+encode+block-max in one kernel).

The host's neighbor noise swings walls 2-5x between minutes; alternating
A,B,A,B in one session exposes both variants to the same windows, so the
RATIO is signable even when absolute walls are not (the round-4/5 A/B
convention, cf. MALLOC_AB.jsonl).  Result rows append to MERGE_AB.jsonl.
"""
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
from scaling import corpus_df, host_probe  # noqa: E402

ROUNDS = int(os.environ.get("DS2S_AB_ROUNDS", "4"))
REPLICATE = int(os.environ.get("DS2S_AB_REPLICATE", "768"))
CORES = int(os.environ.get("DS2S_AB_CORES", "32"))


def main() -> None:
    from ds2s.blocks import blocks_from_tf
    from ds2s.invert import build_index
    from ds2s.session import get_spark

    spark = get_spark(app="ds2s-plan-ab", cores=CORES,
                      shuffle_partitions=CORES * 4)
    spark.sparkContext.setLogLevel("ERROR")

    idx = build_index(corpus_df(spark, REPLICATE),
                      build_arrays=False, persist_tf=True)
    postings = idx.tf.select("term_id", "doc_id", "tf", "len", "df")
    n_post = postings.count()  # also warms the persisted tf

    def one(plan: str) -> float:
        os.environ["DS2S_BLOCKS_PLAN"] = plan
        t0 = time.perf_counter()
        n = blocks_from_tf(postings, idx.n_docs, avg_len=idx.avg_len).count()
        w = time.perf_counter() - t0
        assert n > 0
        return w

    rows = []
    for r in range(ROUNDS):
        probe = host_probe()
        wa = one("window")
        wb = one("term")
        row = {"round": r, "probe": probe, "window_s": round(wa, 3),
               "term_s": round(wb, 3), "speedup": round(wa / wb, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with (REPO / "MERGE_AB.jsonl").open("a") as f:
            f.write(json.dumps(row) + "\n")
    wins = sorted(x["window_s"] for x in rows)
    terms = sorted(x["term_s"] for x in rows)
    summary = {"summary": "window_vs_term", "rounds": ROUNDS,
               "replicate": REPLICATE, "cores": CORES, "n_postings": n_post,
               "window_best_s": wins[0], "term_best_s": terms[0],
               "window_median_s": wins[len(wins) // 2],
               "term_median_s": terms[len(terms) // 2],
               "best_speedup": round(wins[0] / terms[0], 3)}
    print(json.dumps(summary), flush=True)
    with (REPO / "MERGE_AB.jsonl").open("a") as f:
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
