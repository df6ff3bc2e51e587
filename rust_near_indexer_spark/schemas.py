"""Every fixed StructType in the engine — single source of truth.

The reference dual-declares schemas (Rust structs in
indexer-primitives/src/lib.rs:24-91 + ClickHouse DDL in
clickhouse/init/01-core-tables.sql); here each exists once.

Timestamps: the reference keeps raw u64 nanoseconds (lib.rs:28,
DateTime64(9) in ClickHouse).  Spark's TimestampType is µs, so every
table carries canonical ``block_timestamp_ns`` (LongType) plus a derived
µs ``block_timestamp`` — the reference itself compares across stores at
µs precision (scripts/cross-validate-pg.sh:96-99).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


S = StringType()
L = LongType()
D = DoubleType()

# ---------------------------------------------------------------------------
# Input: one row per block (the StreamerMessage shape the extractors
# traverse — indexer-common/src/extractors/transactions.rs:36-40,
# receipts_and_outcomes.rs:60-64, events.rs:24-35; field subset per
# FIXTURES.md §1).
# ---------------------------------------------------------------------------

ACTION = StructType([_f("action_type", S), _f("params", S)])  # params = JSON text

OUTCOME = StructType(
    [
        _f("id", S),
        _f(
            "outcome",
            StructType(
                [
                    _f("executor_id", S),
                    _f("receipt_ids", ArrayType(S)),
                    _f("status", S),  # success_receipt_id|success_value|unknown|failure
                    _f("logs", ArrayType(S)),
                    _f("tokens_burnt", S),  # u128 decimal string (lib.rs:89)
                    _f("gas_burnt", L),
                ]
            ),
        ),
    ]
)

TRANSACTION = StructType(
    [
        _f(
            "transaction",
            StructType(
                [
                    _f("hash", S),
                    _f("signer_id", S),
                    _f("receiver_id", S),
                    _f("actions", ArrayType(ACTION)),
                ]
            ),
        ),
        _f("outcome", StructType([_f("execution_outcome", OUTCOME)])),
    ]
)

RECEIPT = StructType(
    [
        _f("receipt_id", S),
        _f("receiver_id", S),
        _f("predecessor_id", S),
        _f("receipt_kind", S),  # Action | Data | GlobalContractDistribution
        _f("actions", ArrayType(ACTION)),
        _f("data", S),  # JSON text for Data receipts
    ]
)

SHARD = StructType(
    [
        _f(
            "chunk",
            StructType(
                [
                    _f("transactions", ArrayType(TRANSACTION)),
                    _f("receipts", ArrayType(S)),  # ids only (metrics totals)
                ]
            ),
        ),
        _f(
            "receipt_execution_outcomes",
            ArrayType(
                StructType(
                    [
                        _f("execution_outcome", OUTCOME),
                        _f("receipt", RECEIPT),
                    ]
                )
            ),
        ),
    ]
)

BLOCK = StructType(
    [
        _f("block_height", L, False),
        _f("block_hash", S, False),
        _f("block_timestamp_ns", L, False),
        _f("shards", ArrayType(SHARD)),
    ]
)

# ---------------------------------------------------------------------------
# Bronze/core tables (clickhouse/init/01-core-tables.sql).
# Declared logical PKs drive ReplacingMergeTree-style dedup (SURVEY §1.3).
# ---------------------------------------------------------------------------

_COMMON = [
    _f("block_height", L, False),
    _f("block_timestamp_ns", L, False),
    _f("block_hash", S, False),
]

EVENTS = StructType(
    _COMMON
    + [
        _f("contract_id", S),
        _f("execution_status", S),
        _f("version", S),
        _f("standard", S),
        _f("index_in_log", L),
        _f("event", S),
        _f("data", S),
        _f("related_receipt_id", S),
        _f("related_receipt_receiver_id", S),
        _f("related_receipt_predecessor_id", S),
        _f("tx_hash", S),  # Nullable(String) (01-core-tables.sql:18)
        _f("receipt_index_in_block", L),
    ]
)
EVENTS_PK = ("block_height", "related_receipt_id", "index_in_log")

TRANSACTIONS = StructType(
    _COMMON
    + [
        _f("transaction_hash", S),
        _f("signer_id", S),
        _f("receiver_id", S),
        _f("actions", S),  # JSON array text (01-core-tables.sql:37)
    ]
)
TRANSACTIONS_PK = ("block_height", "transaction_hash")

RECEIPTS = StructType(
    _COMMON
    + [
        _f("parent_transaction_hash", S),
        _f("receipt_id", S),
        _f("receiver_id", S),
        _f("predecessor_id", S),
        _f("actions", S),
    ]
)
RECEIPTS_PK = ("block_height", "receipt_id")

EXECUTION_OUTCOMES = StructType(
    _COMMON
    + [
        _f("execution_outcome_id", S),
        _f("parent_transaction_hash", S),
        _f("executor_id", S),
        _f("receipt_ids", ArrayType(S)),
        _f("status", S),
        _f("logs", S),  # JSON array text
        _f("tokens_burnt", S),  # raw u128 string
        _f("gas_burnt", L),
    ]
)
EXECUTION_OUTCOMES_PK = ("block_height", "execution_outcome_id")

# ---------------------------------------------------------------------------
# Dimension: defuse_assets (02-silver-tables.sql:12-22; API shape
# README.md:293-310).
# ---------------------------------------------------------------------------

DEFUSE_ASSETS = StructType(
    [
        _f("blockchain", S),
        _f("contract_address", S),
        _f("decimals", L),
        _f("defuse_asset_id", S),
        _f("price", D),
        _f("price_updated_at_ns", L),
        _f("symbol", S),
    ]
)

# ---------------------------------------------------------------------------
# Event payload schemas (inside events.data — SURVEY §2C).  from_json with
# these is the typed rendering of the MVs' JSON_VALUE / JSONExtract calls.
# ---------------------------------------------------------------------------

NEP245_DATA = ArrayType(
    StructType(
        [
            _f("old_owner_id", S),
            _f("new_owner_id", S),
            _f("owner_id", S),  # mint/burn variant
            _f("token_ids", ArrayType(S)),
            _f("amounts", ArrayType(S)),  # u128 decimal strings
            _f("memo", S),
        ]
    )
)

DIP4_TOKEN_DIFF_DATA = ArrayType(
    StructType(
        [
            _f("account_id", S),
            _f("diff", MapType(S, D)),  # signed float map (02-silver-tables.sql:160)
            _f("intent_hash", S),
            _f("referral", S),
        ]
    )
)

DIP4_TRANSFER_DATA = ArrayType(
    StructType(
        [
            _f("account_id", S),
            _f("receiver_id", S),
            _f("tokens", MapType(S, S)),  # token -> amount string
            _f("memo", S),
            _f("intent_hash", S),
        ]
    )
)

DIP4_PUBLIC_KEY_DATA = StructType([_f("account_id", S), _f("public_key", S)])  # object

DIP4_INTENTS_EXECUTED_DATA = ArrayType(
    StructType([_f("account_id", S), _f("intent_hash", S)])
)

DIP4_FEE_CHANGED_DATA = StructType([_f("old_fee", S), _f("new_fee", S)])  # object

# Default accounts of interest (indexer-clickhouse/src/config.rs:52-55).
ACCOUNTS_OF_INTEREST = ("intents.near", "defuse-alpha.near", "staging-intents.near")
# Production contracts used by silver MVs (02-silver-tables.sql:152 etc.).
PRODUCTION_CONTRACTS = ("defuse-alpha.near", "intents.near")
STAGING_CONTRACT = "staging-intents.near"
