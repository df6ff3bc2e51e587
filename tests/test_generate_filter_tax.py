"""InferFiltersFromGenerate regression: exploding a COMPUTED array must
not duplicate the generator-input expression into a pushed-down Filter.

The rule rewrites ``Generate(explode(f(x)))`` into
``Filter(size(f(x)) > 0 AND isnotnull(f(x))) + Generate`` — the whole
input expression is copied into the filter, and predicate pushdown then
moves that filter below any repartition onto the scan.  For the
higher-order shingle/n-gram expressions this package explodes, that
re-evaluates the expensive expression once more per row — serially when
the scan is a single split (measured 3.3 s vs 0.45 s on 5-gram
shingling at sf0.1).  session.tune() excludes the rule; these tests pin
both the conf plumbing and the resulting plan shape.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from rust_near_indexer_spark.session import RUNTIME_CONFS, tune

RULE = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"


def test_tune_excludes_infer_filters_from_generate(spark):
    assert RULE in RUNTIME_CONFS["spark.sql.optimizer.excludedRules"]
    tune(spark)
    assert RULE in spark.conf.get("spark.sql.optimizer.excludedRules")


def _filters(plan: str) -> list[str]:
    """Condition text of every Filter node in a formatted explain."""
    return re.findall(r"\nCondition : (.*)", plan)


def test_explode_of_computed_array_has_no_duplicated_filter(spark):
    """The optimized plan of explode(higher-order-fn(col)) must not
    contain a Filter that re-evaluates the lambda."""
    tune(spark)
    df = spark.range(100).select(
        F.col("id"),
        F.concat_ws(" ", F.array(*[F.lit(c) for c in "abcdefgh"])).alias("text"),
    )
    w = df.select("id", F.split("text", " ").alias("w"))
    sh = w.select(
        "id",
        F.when(
            F.size("w") >= 5,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("w") - 4),
                    lambda i: F.concat_ws(" ", F.slice("w", i, 5)),
                )
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("sh"),
    )
    ex = sh.select("id", F.explode("sh").alias("s"))
    plan = ex._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    for cond in _filters(plan):
        assert "lambdafunction" not in cond, cond


def test_containment_join_filters_stay_lambda_free(spark, sf_dir):
    """End-to-end: the containment join's executed plan carries no
    Filter that re-runs the shingle transform (the 3.3 s → 2.1 s
    regression this file exists to prevent)."""
    from rust_near_indexer_spark.queries import load_registry

    df = load_registry()["dedup_containment_join"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    for cond in _filters(plan):
        assert "lambdafunction" not in cond, cond
