"""Per-stage scaling diagnosis (round 3): run ONE instrumented build at a
given core count, sampling /proc/stat busy-cores and JVM GC time at 2 Hz,
then attribute samples to build stages via their wall-clock windows.

Usage: python diag_probe.py CORES [REPLICATE]   # prints one JSON line

Not part of the harness — a lab tool; scaling.py stays the evidence
producer.  A stage that shows low busy-cores at 32 is serialized; one that
shows full busy-cores but high GC share is collecting garbage; full busy +
low GC means it is genuinely CPU-bound and cannot speed up further.
"""

from __future__ import annotations

import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def cpu_busy() -> float:
    with open("/proc/stat") as f:
        p = f.readline().split()
    vals = list(map(int, p[1:]))
    idle = vals[3] + vals[4]
    return sum(vals) - idle, sum(vals)


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    import scaling
    from ds2s.blocks import blocks_from_tf
    from ds2s.invert import build_index
    from ds2s.session import get_spark

    spark = get_spark(app=f"diag-{cores}", cores=cores,
                      shuffle_partitions=max(cores * 4, 32))
    spark.sparkContext.setLogLevel("ERROR")

    jvm = spark.sparkContext._jvm
    mf = jvm.java.lang.management.ManagementFactory

    def gc_ms() -> int:
        return sum(b.getCollectionTime()
                   for b in mf.getGarbageCollectorMXBeans())

    samples: list[tuple[float, float, float]] = []  # (t, busy_jiffies, gc_ms)
    stop = threading.Event()

    def sampler() -> None:
        while not stop.is_set():
            b, _ = cpu_busy()
            samples.append((time.perf_counter(), b, gc_ms()))
            time.sleep(0.5)

    def scored_blocks(idx):
        postings = idx.tf.select("term_id", "doc_id", "tf", "len", "df")
        return blocks_from_tf(postings, idx.n_docs, avg_len=idx.avg_len)

    warm = build_index(scaling.corpus_df(spark, 16).persist(),
                       build_arrays=False)
    scored_blocks(warm).count()
    warm.unpersist()

    corpus = (
        scaling.corpus_df(spark, replicate)
        .repartition(cores * 4, "doc_id").persist()
    )
    corpus.count()

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    stages: dict[str, float] = {}
    t0 = time.perf_counter()
    idx = build_index(corpus, build_arrays=False, stage_times=stages)
    ts = time.perf_counter()
    n_post = idx.tf.count()
    stages["tf_count"] = round(time.perf_counter() - ts, 3)
    ts = time.perf_counter()
    scored_blocks(idx).write.format("noop").mode("overwrite").save()
    stages["blocks"] = round(time.perf_counter() - ts, 3)
    total = time.perf_counter() - t0
    stop.set()
    th.join()

    # attribute samples to stage windows (stages ran sequentially in
    # insertion order starting at t0)
    hz = 100.0  # jiffies per second per cpu (USER_HZ)
    windows, acc = {}, t0
    for name, dur in stages.items():
        windows[name] = (acc, acc + dur)
        acc += dur
    report = {}
    for name, (a, b) in windows.items():
        inside = [s for s in samples if a <= s[0] <= b]
        if len(inside) < 2:
            report[name] = {"wall": stages[name]}
            continue
        dt = inside[-1][0] - inside[0][0]
        busy = (inside[-1][1] - inside[0][1]) / hz / dt
        gcs = (inside[-1][2] - inside[0][2]) / 1000.0
        report[name] = {
            "wall": stages[name],
            "busy_cores": round(busy, 1),
            "gc_s": round(gcs, 1),
            "gc_frac_of_wall": round(gcs / max(dt, 1e-9), 3),
        }
    print(json.dumps({
        "cores": cores,
        "replicate": replicate,
        "n_postings": n_post,
        "total_s": round(total, 2),
        "stages": report,
    }))


if __name__ == "__main__":
    main()
