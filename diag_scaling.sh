#!/bin/bash
# One-shot scaling diagnosis matrix (round 3): localize the 8->32-core
# regression by A/B-ing shuffle dir (tmpfs vs disk), heap, and shuffle
# partition count, with per-stage wall times from the instrumented child.
cd /root/repo
OUT=DIAG_SCALING.jsonl
: > $OUT
run() {
  local tag="$1"; shift
  echo "--- $tag $(date +%H:%M:%S)" >&2
  line=$(env "$@" DS2S_SCALING_PROBES=0 python scaling.py --child "$CORES" 2>/dev/null | grep '^{' | tail -1)
  echo "{\"tag\": \"$tag\", \"run\": $line}" >> $OUT
}
CORES=32 run repro32_shm_16g_m4
CORES=32 run disk32_16g_m4 DS2S_LOCAL_DIR=/root/tmp-spark-local
CORES=32 run shm32_32g_m4 DS2S_DRIVER_MEM=32g
CORES=32 run shm32_16g_m1 DS2S_SHUFFLE_MULT=1
CORES=8  run ref8_shm_16g_m4
echo DONE >> $OUT
