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
}


def _default_driver_memory() -> str:
    """Heap sized to parallelism: local-mode tasks share one JVM, so the
    heap must scale with concurrent tasks or high core counts spill/GC
    themselves slower than fewer cores (measured: local[32]@8g ran 0.8×
    local[8]@8g; @32g it scales)."""
    try:
        import os
        total_gb = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") \
            / (1024 ** 3)
    except (ValueError, OSError):
        total_gb = 16
    return f"{max(4, min(int(total_gb * 0.4), 48))}g"


def cores() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app: str = "sldi-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra: dict[str, str] | None = None) -> SparkSession:
    n = cores()
    # Under spark-submit the driver JVM already exists (the Py4J gateway
    # is up) — master and driver memory were fixed by the submit command
    # (--master / --driver-memory); don't override them unless the caller
    # passed an explicit master. Standalone `python main.py` keeps the
    # local[n] default.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    b = SparkSession.builder.appName(app)
    if master or not under_submit:
        b = b.master(master or f"local[{n}]")
    confs = dict(DEFAULT_CONFS)
    if not under_submit:
        confs["spark.driver.memory"] = os.environ.get(
            "SLDI_DRIVER_MEM", _default_driver_memory())
    # shuffle/spill scratch: point at tmpfs for CPU-bound benchmarking
    # (this box's /tmp disk tops out ~500 MB/s — it saturates long before
    # 32 cores do)
    if os.environ.get("SLDI_LOCAL_DIR"):
        confs["spark.local.dir"] = os.environ["SLDI_LOCAL_DIR"]
    confs["spark.sql.shuffle.partitions"] = str(shuffle_partitions or n)
    confs["spark.default.parallelism"] = str(n)
    if extra:
        confs.update(extra)
    # operator escape hatch for conf experiments / cluster overrides:
    # SLDI_SPARK_CONF="key=value;key2=value2" (applied last)
    for kv in os.environ.get("SLDI_SPARK_CONF", "").split(";"):
        kv = kv.strip()
        if kv and "=" in kv:
            k, _, v = kv.partition("=")
            confs[k.strip()] = v.strip()
    for k, v in confs.items():
        b = b.config(k, v)
    return b.getOrCreate()
