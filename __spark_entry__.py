"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC-replay-state query on sf0.001;
``queries``/``oracle_sql`` expose the operator catalog from
stellar_ledger_data_indexer_spark.plans.queries (each entry is a
(Spark DataFrame, DuckDB ANSI-SQL) pair; approximate operators are
rows-only by design).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: last-writer-wins state per key with monotonic enrichment
    (the engine's merge semantics as a declarative query) on sf0.001."""
    from stellar_ledger_data_indexer_spark.plans.queries import QUERY_FNS
    return QUERY_FNS["enrich_monotonic"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from stellar_ledger_data_indexer_spark.plans.queries import QUERY_FNS
    return dict(QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    from stellar_ledger_data_indexer_spark.plans.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
