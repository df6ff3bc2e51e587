"""Skew-resilient equi-join: salt the fact side, replicate the dim side.

AQE's skew-join split (enabled by ``session.tune``) repairs sort-merge
skew at runtime by splitting oversized partitions, but it cannot help
when a single hot key must meet a dim that is too large to broadcast —
every row of that key still lands on one task.  Salting fixes the plan
itself: each fact row gets a random salt in ``[0, n_salt)``, the dim is
replicated once per salt value, and the join key becomes
``(key, salt)`` — a hot key's rows spread over ``n_salt`` tasks at the
cost of a ``n_salt``× dim replication (choose ``n_salt`` ≈ the skew
factor, not the cluster size).

Only fact-preserving joins (inner / left) are supported: each fact row
carries exactly one salt and meets the full dim row set for its key, so
results are identical to the unsalted join.  Right/full joins would see
the dim side multiplied and are rejected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FACT_PRESERVING = {"inner", "left", "left_outer", "leftouter"}


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on equi-key(s) ``on``, salted ``n_salt`` ways.

    The salt is uniform random (seeded — any value is correct, it only
    steers placement) and never observable in the result."""
    if how not in _FACT_PRESERVING:
        raise ValueError(
            f"salted_join supports fact-preserving joins {sorted(_FACT_PRESERVING)}, got {how!r}"
        )
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    keys = [on] if isinstance(on, str) else list(on)
    f = fact.withColumn("_salt", (F.rand(seed=42) * n_salt).cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return f.join(d, keys + ["_salt"], how).drop("_salt")
