"""SparkSession factory tuned for the sandbox (local[N], 32 host cores)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "ds2s",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or max(int(str(cores)) if str(cores).isdigit() else 32, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # NOT larger: a 48g heap sent G1 into multi-minute evacuation stalls
        # under the tokenizer's short-string churn (measured 20-290 s for an
        # identical 22 M-posting build; 16g is stable at 9-10 s, zero full GCs)
        .config("spark.driver.memory", os.environ.get("DS2S_DRIVER_MEM", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    # shuffle spill dir: the sandbox's /dev/vda is a slow virtual disk —
    # 32-core runs saturate it (load-avg 15 at 97% CPU-idle, pure iowait)
    # and identical builds swing 2-5×.  Real clusters put spark.local.dir
    # on local NVMe; /dev/shm is the sandbox analogue.  Only overridden
    # when DS2S_LOCAL_DIR is set or the sandbox fixture tree is present —
    # on a real deployment a RAM-backed shuffle dir could exhaust host
    # memory instead of spilling (round-2 advice).
    local_dir = os.environ.get("DS2S_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/root/testdata"):
        local_dir = "/dev/shm/ds2s-spark"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()
