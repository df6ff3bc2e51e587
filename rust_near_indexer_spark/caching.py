"""Session-scoped caches for persisted/checkpointed DataFrames.

Several query families (the MinHash-LSH dedup chain, the k-means
centroid fixpoint, the bronze pipeline) share an expensive intermediate
across multiple registered queries.  Those intermediates are persisted
once per (SparkSession, parameters) and reused.

Keying discipline: the cache key uses ``spark.sparkContext.applicationId``
— a string minted per SparkContext — NOT ``id(spark)``.  ``id()`` of a
stopped-and-garbage-collected session can be reused by a brand-new
session, which would silently hand the new session a stale persisted
plan bound to the dead context.  applicationId can't collide that way.

Lifecycle: every ``SessionCache`` registers itself in a module-level
list so :func:`clear_caches` can unpersist everything (e.g. between
scale factors in bench.py, or at library-user session teardown).
Unpersist errors are swallowed — the backing context may already be
stopped, in which case the executor memory is gone anyway.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

_REGISTRY: list["SessionCache"] = []


def _session_key(spark: SparkSession) -> str:
    return spark.sparkContext.applicationId


class SessionCache:
    """A dict of persisted DataFrames (or dicts of them) keyed by
    (applicationId, *params)."""

    def __init__(self, name: str) -> None:
        self.name = name
        self._store: dict[tuple, Any] = {}
        _REGISTRY.append(self)

    def get_or_build(
        self, spark: SparkSession, key: tuple, build: Callable[[], Any]
    ) -> Any:
        full = (_session_key(spark),) + tuple(key)
        if full not in self._store:
            self._store[full] = build()
        return self._store[full]

    def __len__(self) -> int:
        return len(self._store)

    def clear(self) -> None:
        for value in self._store.values():
            dfs = value.values() if isinstance(value, dict) else [value]
            for df in dfs:
                if isinstance(df, DataFrame):
                    try:
                        df.unpersist()
                    except Exception:
                        pass  # context already stopped
        self._store.clear()


def clear_caches() -> None:
    """Unpersist and drop every session-scoped cache entry."""
    for cache in _REGISTRY:
        cache.clear()
