"""Tie-collision red-team for the order-dependent event operators.

The driver's testdata happens to contain few (or no) same-microsecond
collisions per user, so a wrong tie-break could stay green by luck
(ADVICE r04 flagged exactly this class for SCD-2).  This suite builds a
synthetic events table where EVERY ordering hazard is planted —
same-(user, µs) pairs with different event_ids, equal modal counts,
single-event users, users below the z-score history floor, and
overlapping/adjacent error intervals — and runs the full cross-engine
hash compare on it, so both engines must agree under maximal ambiguity,
not just on friendly data.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rust_near_indexer_spark.queries import load_registry

from .oracle_harness import compare, duck_connect

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, us, uid, etype, value):
    return {
        "event_id": eid,
        "ts": BASE + dt.timedelta(microseconds=us),
        "user_id": uid,
        "event_type": etype,
        "value": float(value),
        "props": '{"k": %d}' % (eid % 10),
    }


@pytest.fixture(scope="module")
def tie_dir(tmp_path_factory):
    rows = []
    # user 1: three events in the SAME microsecond — only event_id breaks
    # ties (transition order, OHLC open/close, modal counts)
    rows += [
        _ev(103, 1_000_000, 1, "view", 3.0),
        _ev(101, 1_000_000, 1, "click", 1.0),
        _ev(102, 1_000_000, 1, "purchase", 2.0),
        _ev(104, 2_000_000, 1, "click", 4.0),
    ]
    # user 2: modal tie — 2 clicks vs 2 views (lexicographic winner),
    # plus a same-µs pair across an hour-bucket boundary
    rows += [
        _ev(201, 3_599_999_999, 2, "click", 10.0),
        _ev(202, 3_600_000_000, 2, "view", 11.0),
        _ev(203, 3_600_000_000, 2, "click", 12.0),
        _ev(204, 3_700_000_000, 2, "view", 13.0),
    ]
    # user 3: single event (no transitions, candle of one)
    rows += [_ev(301, 5_000_000, 3, "signup", 7.0)]
    # user 4: error islands — overlapping, exactly-adjacent (end == next
    # start, NOT a break since break needs start > prev end), and disjoint
    pad = 5 * 60 * 1_000_000
    rows += [
        _ev(401, 10_000_000, 4, "error", 1.0),
        _ev(402, 10_000_000 + pad, 4, "error", 1.0),  # overlaps 401
        _ev(403, 10_000_000 + 3 * pad, 4, "error", 1.0),  # touches 402's end
        _ev(404, 10_000_000 + 10 * pad, 4, "error", 1.0),  # new island
        _ev(405, 10_000_000 + 10 * pad, 4, "error", 1.0),  # same-µs dup
    ]
    # user 5: exactly at/below/above the z-score history floor, with a
    # constant series (variance 0 — strict > must not flag) then a spike
    for i in range(12):
        rows.append(_ev(500 + i, 20_000_000 + i * 1_000_000, 5, "view", 5.0))
    rows.append(_ev(520, 40_000_000, 5, "view", 500.0))  # spike, var>0? no — prior all equal → var 0, dev>0 → flagged
    rows.sort(key=lambda r: r["event_id"])
    d = tmp_path_factory.mktemp("tie_events")
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )
    pq.write_table(table, os.path.join(str(d), "events.parquet"))
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "event_transition_matrix",
        "ohlc_candles",
        "interval_merge_islands",
        "rolling_zscore_anomaly",
        "user_modal_event",
        "hourly_event_windows",
        "latest_event_per_user",
        "ewma_user_value",  # r6: same-us fold order only event_id breaks
        "feature_bin_liftstats",  # r6: order-free, but bin edges on ties
    ],
)
def test_tie_collisions_hash_match(spark, tie_dir, name):
    reg = load_registry()
    q = reg[name]
    con = duck_connect(tie_dir)
    try:
        r = compare(q.spark(spark, tie_dir), con, q.oracle)
    finally:
        con.close()
    assert r["hash_match"], f"{name}: {r}"


def test_planted_hazards_actually_fire(spark, tie_dir):
    """The fixture must really contain the hazards it claims: a
    same-µs transition, an adjacent-interval merge, a modal tie, and a
    zero-variance z-score flag."""
    reg = load_registry()
    islands = {
        (r["user_id"], r["island_id"]): r["n_errors"]
        for r in reg["interval_merge_islands"].spark(spark, tie_dir).collect()
    }
    # 401+402+403 merge (overlap + touch), 404+405 form the second island
    assert islands == {(4, 1): 3, (4, 2): 2}
    modal = {
        r["user_id"]: (r["modal_event"], r["modal_count"])
        for r in reg["user_modal_event"].spark(spark, tie_dir).collect()
    }
    assert modal[2] == ("click", 2)  # tie vs view broken lexicographically
    trans = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in reg["event_transition_matrix"].spark(spark, tie_dir).collect()
        if r["from_type"] != "error" and r["to_type"] != "error"
    }
    # user 1 same-µs order is event_id order: click->purchase->view->click
    assert trans[("click", "purchase")] == 1
    assert trans[("purchase", "view")] == 1
    anomalies = reg["rolling_zscore_anomaly"].spark(spark, tie_dir).collect()
    assert [r["event_id"] for r in anomalies] == [520]  # spike over var-0 history
