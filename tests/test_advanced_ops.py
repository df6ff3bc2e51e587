"""Semantic (non-oracle) checks for the round-6 advanced operators:
independent pure-python recomputation and planted-structure recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_near_indexer_spark.queries import load_registry
from rust_near_indexer_spark.queries.advanced import CONT_TAU_MILLI, EWMA_SHIFT
from rust_near_indexer_spark.tables import load


def test_ewma_matches_pure_python(spark, sf_dir):
    reg = load_registry()
    got = {
        r["user_id"]: (r["n_events"], r["ewma_cents"])
        for r in reg["ewma_user_value"].spark(spark, sf_dir).collect()
    }
    ev = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("ts_ns div 1000").alias("ts_us"),
            "event_id",
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("x"),
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts_us"], r["event_id"], r["x"]))
    mul, den = (1 << EWMA_SHIFT) - 1, 1 << EWMA_SHIFT
    for uid, rows in by_user.items():
        rows.sort()
        e = rows[0][2]
        for _, _, x in rows[1:]:
            e = (x + mul * e) // den
        assert got[uid] == (len(rows), e), uid
    assert set(got) == set(by_user)


def test_pareto_frontier_is_exactly_the_undominated_set(spark, sf_dir):
    reg = load_registry()
    got = {
        r["o_orderkey"]
        for r in reg["pareto_frontier_orders"].spark(spark, sf_dir).collect()
    }
    pts = (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.expr(
                "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
            ).alias("day"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .collect()
    )
    # brute-force O(n^2) ground truth on the small test SF
    want = {
        p["o_orderkey"]
        for p in pts
        if not any(
            q["cents"] > p["cents"] and q["day"] < p["day"] for q in pts
        )
    }
    assert got == want and got  # non-empty and exact


def test_containment_finds_every_planted_excerpt(spark, sf_dir):
    """Every ≥10-word doc gets a planted first-half excerpt (+300000)
    whose shingles are a subset by construction — the join must recover
    each such (excerpt → source) pair at containment 1000."""
    reg = load_registry()
    rows = reg["dedup_containment_join"].spark(spark, sf_dir).collect()
    got = {(r["contained_id"], r["container_id"]): r["containment_milli"] for r in rows}
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    planted = 0
    for d in docs:
        w = d["text"].split(" ")
        if len(w) < 10:
            continue
        half = w[: max(len(w) // 2, 5)]
        n_sh = len({" ".join(half[i : i + 5]) for i in range(len(half) - 4)})
        if n_sh == 0:
            continue
        planted += 1
        key = (d["doc_id"] + 300000, d["doc_id"])
        assert got.get(key) == 1000, key
    assert planted > 0
    # and nothing below the declared threshold leaks through
    assert all(v >= CONT_TAU_MILLI for v in got.values())


def test_cooccurrence_support_is_consistent(spark, sf_dir):
    reg = load_registry()
    rows = reg["item_cooccurrence_pairs"].spark(spark, sf_dir).collect()
    assert rows
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict[int, set] = {}
    for r in items:
        baskets.setdefault(r["l_orderkey"], set()).add(r["l_partkey"])
    n_orders = len(baskets)
    for r in rows[:5]:  # spot-check the head against brute force
        n_co = sum(
            1
            for b in baskets.values()
            if r["part_a"] in b and r["part_b"] in b
        )
        assert r["n_co"] == n_co
        assert r["support_ppm"] == (1_000_000 * n_co) // n_orders
