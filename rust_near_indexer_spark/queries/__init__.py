"""Declared-query registry — the surface behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 (and the north-star
dedup / similarity / text operators) gets one entry: a Spark callable
``(spark, sf_dir) -> DataFrame`` plus, where SQL-expressible, the
equivalent DuckDB SQL for the driver's t2 correctness gate.

Determinism contract (see canonical.py): results must hash-match the
oracle exactly, so queries aggregate money in integer cents, derive
floats with a single division + round, and break top-N ties on unique
keys.  Column names are aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: Optional[str]  # DuckDB SQL, or None → driver runs rows-only check
    tags: tuple = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: Optional[str] = None, tags: tuple = (), doc: str = ""):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query {name}")
        REGISTRY[name] = Query(name, fn, oracle, tags, fn.__doc__ or doc)
        return fn

    return deco


def load_registry() -> dict[str, Query]:
    """Import all query modules (side-effect: fills REGISTRY)."""
    from . import core_sql  # noqa: F401
    from . import extended_sql  # noqa: F401
    from . import near_events  # noqa: F401
    from . import silver_gold  # noqa: F401
    from . import dedup  # noqa: F401
    from . import text  # noqa: F401
    from . import similarity  # noqa: F401
    from . import multimodal  # noqa: F401
    from . import temporal  # noqa: F401
    from . import sampling  # noqa: F401
    from . import clustering  # noqa: F401

    return REGISTRY
