"""PySpark-native analytics engine with the query / data-processing
capabilities of ``defuse-protocol/rust-near-indexer`` (see SURVEY.md).

Layout
------
- ``session``    – SparkSession builder tuned for local[32] tests and
                   cluster deployment (AQE, UTC, Arrow).
- ``schemas``    – every fixed StructType (single source of truth;
                   the reference dual-declares Rust structs + ClickHouse
                   DDL, e.g. indexer-primitives/src/lib.rs:24-91 vs
                   clickhouse/init/01-core-tables.sql).
- ``canonical``  – cross-engine deterministic hashing / canonicalization
                   (the Spark analog of scripts/cross-validate.sh:103-153).
- ``plans``      – bronze / state / silver / gold batch pipelines.
- ``oracle_sim`` – pure-Python reference-semantics simulator (the
                   independent golden-output oracle for plans/).
- ``fixtures``   – deterministic block-stream generator feeding both.
- ``operators``  – scale operators beyond the reference: multimodal
                   binary-column plumbing and the skew-resilient salted
                   join (dedup / similarity / text analysis live in
                   queries/ as oracle-gated pipelines).
- ``queries``    – the declared-query registry behind __spark_entry__.
"""

__version__ = "0.1.0"

from .caching import clear_caches  # noqa: E402,F401  (session-cache teardown hook)
