"""No-Spark weak-scaling probe of the ACTUAL build kernels (round 4 lab).

The one failed gate is 8->32-core build scaling (BENCH_SCALING.json).  The
open question in the round-3/4 verdicts: how much of the CPU-work
inflation at 32 cores (tree_cpu ratio 1.89x for identical work) is Spark
overhead vs the box's memory subsystem?  Round 3 measured GENERIC probes
(pure-CPU 0.87, numpy-streaming 0.82 weak-scaling at 8->32 procs).  This
tool runs the REAL per-partition kernel work — the same numpy lexsort +
fancy-index gather that split_iter does and the same codec encode loop
(ds2s.codecs optpfd/gvb on 128-posting blocks) that merge_iter does —
under plain ``multiprocessing``, no Spark, no JVM, no shuffle.

Each process performs IDENTICAL fixed work (weak scaling), so

    efficiency(P1->P2) = max_wall(P1) / max_wall(P2)
    cpu_inflation(P1->P2) = sum_cpu(P2) / (sum_cpu(P1) * P2/P1)

If the inflation measured HERE matches the Spark harness's tree-CPU
ratio, the lost cores are the memory bus servicing 32 concurrent
kernel streams — a single-box ceiling a real 4x-node cluster does not
have — and not framework overhead.

Usage: python kernel_probe.py [levels, default 1,8,32]  -> JSON line +
append to KERNEL_SCALING.jsonl.  Lab tool; scaling.py stays the gate
evidence producer.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import resource
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Workload shape mirrors one 32-core shuffle partition of the sf0.1
# replicate-768 scaling corpus: ~100.8M postings / 128 partitions ~= 790k
# postings, cut into 128-posting blocks and encoded with the default
# optpfd codec (+ gvb lens payload, + the block-max float math), after a
# lexsort+gather of the partition.
PART_ROWS = 790_000
UNIVERSE = 3_840_000
BLOCK = 128
ROUNDS = int(os.environ.get("DS2S_KPROBE_ROUNDS", "6"))


def one_round(rng: np.random.Generator) -> int:
    """One partition's worth of split+merge kernel work; returns a checksum."""
    from ds2s.codecs import encode_docs, encode_tfs

    # --- split_iter analogue: lexsort + gather of the partition ---
    t_arr = rng.integers(0, 52_000, PART_ROWS, dtype=np.int64)
    s_arr = rng.integers(0, 8, PART_ROWS, dtype=np.int64)
    d_arr = rng.integers(0, UNIVERSE, PART_ROWS, dtype=np.int64)
    f_arr = rng.integers(1, 20, PART_ROWS, dtype=np.int32)
    l_arr = rng.integers(10, 2000, PART_ROWS, dtype=np.int32)
    order = np.lexsort((d_arr, s_arr, t_arr))
    t_arr, s_arr, d_arr = t_arr[order], s_arr[order], d_arr[order]
    f_arr, l_arr = f_arr[order], l_arr[order]
    # flat-binary round trip (the fragment blobs)
    blob = d_arr.astype("<i8", copy=False).tobytes()
    d_arr = np.frombuffer(blob, dtype="<i8")

    # --- merge_iter analogue: per-block encode + block-max math ---
    # strictly-increasing docs per block: sort slices of the gathered ids
    checksum = 0
    k1, b_p, avg = 1.2, 0.5, 200.0
    n_f = float(UNIVERSE)
    for i in range(0, PART_ROWS - BLOCK, BLOCK):
        d = np.unique(d_arr[i:i + BLOCK].astype(np.uint64))
        t = f_arr[i:i + len(d)].astype(np.uint64)
        ln = l_arr[i:i + len(d)].astype(np.uint64)
        db = encode_docs(d, UNIVERSE, "optpfd")
        tb = encode_tfs(t, "optpfd")
        lb = encode_tfs(ln, "gvb")
        dfv = 1000.0
        idf = max(0.0, np.log((n_f - dfv + 0.5) / (dfv + 0.5))) * (1.0 + k1)
        tf_f = t.astype(np.float64)
        contrib = idf * tf_f / (
            tf_f + k1 * (1.0 - b_p + b_p * ln.astype(np.float64) / avg)
        )
        checksum += len(db) + len(tb) + len(lb) + int(contrib.max())
    return checksum


def worker(idx: int, start_evt, q) -> None:
    rng = np.random.default_rng(1000 + idx)
    start_evt.wait()
    t0 = time.perf_counter()
    c0 = time.process_time()
    cs = 0
    for _ in range(ROUNDS):
        cs ^= one_round(rng)
    wall = time.perf_counter() - t0
    cpu = time.process_time() - c0
    ru = resource.getrusage(resource.RUSAGE_SELF)
    q.put({"idx": idx, "wall_s": round(wall, 3), "cpu_s": round(cpu, 3),
           "usr_s": round(ru.ru_utime, 3), "sys_s": round(ru.ru_stime, 3),
           "checksum": cs})


def run_level(procs: int) -> dict:
    ctx = mp.get_context("spawn")
    start = ctx.Event()
    q = ctx.Queue()
    ps = [ctx.Process(target=worker, args=(i, start, q)) for i in range(procs)]
    for p in ps:
        p.start()
    time.sleep(2.0)  # let every child finish importing before the gun
    t0 = time.perf_counter()
    start.set()
    res = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.perf_counter() - t0
    walls = [r["wall_s"] for r in res]
    checks = {r["checksum"] for r in res}
    return {
        "procs": procs,
        "max_wall_s": round(max(walls), 3),
        "mean_wall_s": round(sum(walls) / len(walls), 3),
        "sum_cpu_s": round(sum(r["cpu_s"] for r in res), 3),
        "sum_sys_s": round(sum(r["sys_s"] for r in res), 3),
        "harness_wall_s": round(wall, 3),
        "distinct_checksums": len(checks),
    }


def main() -> None:
    from scaling import host_probe

    levels = [int(x) for x in
              (sys.argv[1] if len(sys.argv) > 1 else "1,8,32").split(",")]
    report = {"metric": "kernel_weak_scaling_no_spark",
              "part_rows": PART_ROWS, "rounds": ROUNDS,
              # glibc reads these at child start — stamp them so tuned vs
              # default allocator runs are distinguishable in the artifact
              "malloc_env": {k: v for k, v in os.environ.items()
                             if k.startswith("MALLOC_")} or None,
              "probe_before": host_probe(), "levels": {}}
    for p in levels:
        report["levels"][str(p)] = run_level(p)
    report["probe_after"] = host_probe()
    lv = report["levels"]
    if "8" in lv and "32" in lv:
        report["eff_8_to_32"] = round(lv["8"]["max_wall_s"] / lv["32"]["max_wall_s"], 3)
        report["cpu_inflation_8_to_32"] = round(
            lv["32"]["sum_cpu_s"] / (lv["8"]["sum_cpu_s"] * 4.0), 3)
    if "1" in lv and "8" in lv:
        report["eff_1_to_8"] = round(lv["1"]["max_wall_s"] / lv["8"]["max_wall_s"], 3)
    line = json.dumps(report)
    print(line, flush=True)
    with open(Path(__file__).resolve().parent / "KERNEL_SCALING.jsonl", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
