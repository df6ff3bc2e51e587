"""Byte-level golden test for the ClickHouse HTTP wire format (R23).

The sink's contract with a real server is exactly (URL, body) —
`INSERT INTO <table> FORMAT JSONEachRow` in the query string and one
JSON object per line in the body (the HTTP-interface equivalent of the
reference's row-binary batch insert, database.rs:41-99).  No oracle
checks this path, so the exact bytes are pinned here against
tests/golden/clickhouse_wire.json: a representative row per core table
covering string escaping (quotes, backslashes, newlines, tabs,
non-ASCII), NULLs, arrays, 64-bit ints at the boundary, and the raw
u128-as-string column.

If this test fails after an intentional format change, regenerate with:
    python -m tests.test_clickhouse_wire_golden
"""

from __future__ import annotations

import json
import os

from rust_near_indexer_spark.clickhouse_sink import ClickHouseSink

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "clickhouse_wire.json")

# One row per core table (clickhouse/init/01-core-tables.sql), each
# loaded with the characters that break naive JSON/SQL quoting.
WIRE_ROWS: dict[str, list[dict]] = {
    "events": [
        {
            "block_height": 9_223_372_036_854_775_807,  # i64 max survives
            "block_timestamp_ns": 1_738_368_000_123_456_789,
            "block_hash": "H4sh/With+Symbols=",
            "contract_id": "intents.near",
            "execution_status": "SUCCESS",
            "version": "1.0.0",
            "standard": "nep245",
            "index_in_log": 0,
            "event": 'mt_transfer "quoted" \\backslash\\',
            "data": '[{"amounts":["1","2"],"memo":"line1\nline2\ttabbed"}]',
            "related_receipt_id": "r1",
            "related_receipt_receiver_id": "intents.near",
            "related_receipt_predecessor_id": "alice.near",
            "tx_hash": None,  # Nullable(String) → JSON null
            "receipt_index_in_block": 3,
        }
    ],
    "transactions": [
        {
            "block_height": 100,
            "block_timestamp_ns": 1_738_368_000_000_000_000,
            "block_hash": "bh",
            "transaction_hash": "txh",
            "signer_id": "ünïcødé.near",  # non-ASCII → \\uXXXX escapes
            "receiver_id": "受信者.near",
            "actions": '[{"FunctionCall":{"method_name":"ft_transfer","args":""}}]',
        }
    ],
    "receipts": [
        {
            "block_height": 101,
            "block_timestamp_ns": 1_738_368_001_000_000_000,
            "block_hash": "bh2",
            "parent_transaction_hash": None,
            "receipt_id": "r/2",
            "receiver_id": "bob.near",
            "predecessor_id": "alice.near",
            "actions": "[]",
        }
    ],
    "execution_outcomes": [
        {
            "block_height": 102,
            "block_timestamp_ns": 1_738_368_002_000_000_000,
            "block_hash": "bh3",
            "execution_outcome_id": "eo1",
            "parent_transaction_hash": "txh",
            "executor_id": "intents.near",
            "receipt_ids": ["child-1", "child-2"],  # array column
            "status": "FAILURE",
            "logs": '["EVENT_JSON:{\\"standard\\":\\"nep245\\"}"]',
            "tokens_burnt": "340282366920938463463374607431768211455",  # u128 max
            "gas_burnt": 2_428_050_684_171,
        }
    ],
}


def capture_wire() -> dict[str, list[dict]]:
    captured: dict[str, list[dict]] = {}

    def record(url: str, body: bytes) -> None:
        captured.setdefault(table, []).append(
            {"url": url, "body": body.decode("ascii")}
        )

    sink = ClickHouseSink("http://clickhouse:8123", post_fn=record)
    for table, rows in WIRE_ROWS.items():
        sink.write_rows(table, rows)
    return captured


def test_wire_bytes_match_golden():
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    assert capture_wire() == golden


def test_bodies_are_parseable_jsoneachrow():
    """Every body line must round-trip as standalone JSON (what the
    server's JSONEachRow parser requires) — embedded newlines in values
    must be escaped, never literal."""
    for batches in capture_wire().values():
        for b in batches:
            for line in b["body"].split("\n"):
                row = json.loads(line)
                assert isinstance(row, dict)


if __name__ == "__main__":  # regenerate the golden file
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(capture_wire(), f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_PATH}")
