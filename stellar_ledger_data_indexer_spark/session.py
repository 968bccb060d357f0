"""SparkSession factory with scale-oriented defaults.

The reference is a single Go process; its tuning knobs are batch size and
retry policy (reference: internal/utils/postgres.go:9-38). Here the knobs
are Spark confs: AQE (runtime re-plan + skew-join splitting), Arrow
(vectorized Python exchange), UTC session time (the reference stores
TIMESTAMPTZ UTC, internal/contract/utils.go:28-34), and shuffle
parallelism sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # change-event payloads (token arrays) are wide: keep scan splits moderate
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.compression.codec": "snappy",
    # our tables carry explicit ordering columns; no need for costly sort before write
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.driver.memory": "8g",
}


def cores() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app: str = "sldi-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra: dict[str, str] | None = None) -> SparkSession:
    n = cores()
    master = master or f"local[{n}]"
    b = SparkSession.builder.appName(app).master(master)
    confs = dict(DEFAULT_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions or n)
    confs["spark.default.parallelism"] = str(n)
    if extra:
        confs.update(extra)
    for k, v in confs.items():
        b = b.config(k, v)
    return b.getOrCreate()
