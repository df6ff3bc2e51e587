"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``rust_near_indexer_spark``; this module only
adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from rust_near_indexer_spark.queries import load_registry  # noqa: E402

_REGISTRY = load_registry()

FLAGSHIP = "gold_intents_metrics"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's gold_view_intents_metrics
    (clickhouse/init/03-gold-views.sql:4-31) over the full fixture
    pipeline (blocks → bronze → silver → gold).  Driver checks rows>0."""
    return _REGISTRY[FLAGSHIP].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted → rows-only check."""
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}
