"""SparkSession factory with scale-aware defaults.

Local-mode knobs mirror what a 1000-executor deployment would set cluster
side (AQE on, sane shuffle partitioning, Arrow transport for the few pandas
UDF stages). On a real cluster this module is unchanged — only master/memory
come from spark-submit.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

_DEF_SHUFFLE = "32"


def _default_local_dir() -> str:
    """Prefer tmpfs scratch, but only when it has real headroom: /dev/shm
    is capped (typically 50% of RAM) and a large shuffle there fails with
    ENOSPC instead of spilling to disk. Below 8 GiB free, fall back to
    /tmp. Override with SPARK_GRAFT_LOCAL_DIR."""
    if os.path.isdir("/dev/shm"):
        try:
            if shutil.disk_usage("/dev/shm").free >= 8 << 30:
                return "/dev/shm/spark-local"
        except OSError:
            pass
    return "/tmp"


def get_spark(
    master: str | None = None,
    app_name: str = "ba-gepris-crawler-spark",
    shuffle_partitions: int | str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # Under spark-submit the JVM gateway is already up (PYSPARK_GATEWAY_PORT
    # exported) and --master/--conf live in the submitted conf — don't
    # override them; the local[32] default is for plain `python ...` runs.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or (None if under_submit else "local[32]")
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", _DEF_SHUFFLE))
    b = (
        (SparkSession.builder.master(master) if master else SparkSession.builder)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # shuffle/spill scratch on tmpfs when available: keeps shuffle I/O off
        # the (slow, writeback-bursty) local disk; a real cluster would use
        # NVMe-backed local dirs. Override with SPARK_GRAFT_LOCAL_DIR.
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_GRAFT_LOCAL_DIR", _default_local_dir()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "32m")
        # parquet codec for every table write. snappy (Spark default) is the
        # balanced choice; at 100 TB, zstd buys ~30-40% smaller files (less
        # scan I/O) for more encode CPU, lz4/uncompressed cut encode cost
        # where the writer is CPU/memory-bus bound (the measured ceiling of
        # this sandbox's span-payload encode stage, BENCH/BASELINE.md).
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "snappy"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
