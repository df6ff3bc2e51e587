"""Pure-Python block-by-block simulator of the reference bronze dataflow.

This is the *independent oracle implementation* for the Spark pipeline in
``plans/``: it executes the complete bronze semantics (R5–R21, R26 of
SURVEY §2A) imperatively, in the reference's own execution shape — one
block at a time in height order, transactions first (state seed), then
receipts/outcomes, then events (indexer-clickhouse/src/handlers/mod.rs:66-139)
— with a dict-based two-tier correlation cache standing in for Redis
(indexer-common/src/cache/redis.rs).

``scripts/make_fixture.py`` runs it over the deterministic fixture stream
and commits the outputs as golden parquet; the driver's correctness gate
then hash-compares the Spark pipeline against those goldens — the
cross-validate.sh:103-153 golden-output method, with this simulator
playing the production instance.

Deviations shared with the Spark formulation (documented in plans/state.py):
- wall-clock TTL becomes a block-height distance bound (write W readable
  at read M iff W ≤ M ≤ W + ttl_blocks);
- potential→main promotion does not refresh the TTL (no observable effect
  on well-formed chains — each receipt executes exactly once).
"""

from __future__ import annotations

import json

from . import schemas

# The 12 Action variants (indexer-primitives/src/lib.rs:93-108); unknown
# variants are dropped (filter_map semantics, extractors/transactions.rs:126-128).
KNOWN_ACTION_TYPES = frozenset(
    (
        "CreateAccount",
        "DeployContract",
        "FunctionCall",
        "Transfer",
        "Stake",
        "AddKey",
        "DeleteKey",
        "DeleteAccount",
        "Delegate",
        "DeployGlobalContract",
        "UseGlobalContract",
        "DeterministicStateInit",
    )
)

EVENT_JSON_PREFIX = "EVENT_JSON:"  # extractors/events.rs:7

_STATUS = {
    "SuccessReceiptId": "success_receipt_id",
    "SuccessValue": "success_value",
    "Failure": "failure",
    "Unknown": "unknown",
}


def canonical_status(s: str | None) -> str | None:
    """R21 enum→string (extractors/events.rs:235-246)."""
    return _STATUS.get(s, s)


def _of_interest(accounts, *ids) -> bool:
    """any_account_id_of_interest (indexer-common/src/lib.rs:11-18)."""
    return any(i in accounts for i in ids if i is not None)


def _compact(obj) -> str:
    return json.dumps(obj, separators=(",", ":"), sort_keys=True)


def actions_json(actions) -> str:
    """R12 tagged-union encode: '[{"action_type":X,"params":raw}]'
    (indexer-primitives/src/lib.rs:93-160); unknown variants dropped."""
    if actions is None:
        return "[]"
    parts = [
        '{"action_type":"%s","params":%s}'
        % (a["action_type"], a["params"] if a.get("params") is not None else "null")
        for a in actions
        if a.get("action_type") in KNOWN_ACTION_TYPES
    ]
    return "[" + ",".join(parts) + "]"


def receipt_actions(rc) -> str:
    """R15 ReceiptEnumView projection (receipts_and_outcomes.rs:195-225)."""
    kind = rc.get("receipt_kind")
    if kind == "Action":
        return actions_json(rc.get("actions"))
    if kind == "Data":
        return rc.get("data") if rc.get("data") is not None else "null"
    return ""


class _Cache:
    """Two-tier receipt→tx mapping with block-distance TTL (R16–R19)."""

    def __init__(self, ttl_blocks: int):
        self.ttl = ttl_blocks
        self.main: dict[str, tuple[str, int]] = {}
        self.potential: dict[str, tuple[str, int]] = {}

    def write(self, receipt_id: str, tx_hash: str, height: int, to_main: bool):
        (self.main if to_main else self.potential)[receipt_id] = (tx_hash, height)

    def _get(self, store, receipt_id, height):
        hit = store.get(receipt_id)
        if hit is None:
            return None
        tx_hash, write_h = hit
        if write_h <= height <= write_h + self.ttl:
            return tx_hash
        return None  # expired (R19)

    def lookup(self, receipt_id, height, *, potential_ok: bool):
        """main first, then potential (find_parent_tx_hash,
        receipts_and_outcomes.rs:258-328).  The events path passes
        potential_ok only for receipts touching accounts of interest
        (events.rs:143-213)."""
        hit = self._get(self.main, receipt_id, height)
        if hit is not None:
            return hit
        if potential_ok:
            return self._get(self.potential, receipt_id, height)
        return None


def run_bronze_sim(
    blocks: list[dict],
    accounts: tuple = schemas.ACCOUNTS_OF_INTEREST,
    ttl_blocks: int = 50,
    block_end: int | None = None,
    events_only: bool = False,
) -> dict[str, list[dict]]:
    """Run the full bronze dataflow; returns the four tables as row dicts.

    Mirrors handle_streamer_message (handlers/mod.rs:66-139): per block,
    transactions seed state first; receipts/outcomes and events then read
    it.  block_end = R5 bounded stop; events_only = R26.
    """
    cache = _Cache(ttl_blocks)
    events: list[dict] = []
    txs: list[dict] = []
    receipts: list[dict] = []
    outcomes: list[dict] = []

    for b in sorted(blocks, key=lambda x: x["block_height"]):
        h = b["block_height"]
        if block_end is not None and h > block_end:
            continue
        common = {
            "block_height": h,
            "block_timestamp_ns": b["block_timestamp_ns"],
            "block_hash": b["block_hash"],
        }

        # flatten (R7/R8): chunk transactions + outcomes across shards in
        # shard order; outcome position = receipt_index_in_block (events.rs:24-29)
        flat_txs, flat_outs = [], []
        for shard in b.get("shards") or []:
            chunk = shard.get("chunk")
            if chunk is not None:
                flat_txs.extend(chunk.get("transactions") or [])
            flat_outs.extend(shard.get("receipt_execution_outcomes") or [])

        # 1. transactions (R10/R11/R12/R13/R17)
        for t in flat_txs:
            tx = t["transaction"]
            eo = t["outcome"]["execution_outcome"]
            first_ids = eo["outcome"].get("receipt_ids") or []
            interest = _of_interest(accounts, tx["signer_id"], tx["receiver_id"])
            if first_ids:
                # seed: first receipt only (extractors/transactions.rs:89-95)
                cache.write(first_ids[0], tx["hash"], h, to_main=interest)
            if interest and not events_only:
                txs.append(
                    {
                        **common,
                        "transaction_hash": tx["hash"],
                        "signer_id": tx["signer_id"],
                        "receiver_id": tx["receiver_id"],
                        "actions": actions_json(tx.get("actions")),
                    }
                )
                outcomes.append(
                    {
                        **common,
                        "execution_outcome_id": eo["id"],
                        "parent_transaction_hash": tx["hash"],
                        "executor_id": eo["outcome"]["executor_id"],
                        "receipt_ids": eo["outcome"].get("receipt_ids"),
                        "status": canonical_status(eo["outcome"]["status"]),
                        "logs": _compact(eo["outcome"].get("logs") or []),
                        "tokens_burnt": eo["outcome"]["tokens_burnt"],
                        "gas_burnt": eo["outcome"]["gas_burnt"],
                    }
                )

        # 2. receipts & outcomes (R14/R15/R16/R18)
        for oc in flat_outs:
            eo = oc["execution_outcome"]
            rc = oc["receipt"]
            tx_hash = cache.lookup(rc["receipt_id"], h, potential_ok=True)
            if tx_hash is None:
                continue  # drop-on-miss (receipts path)
            interest = _of_interest(accounts, rc["receiver_id"], rc["predecessor_id"])
            # child chaining: all spawned receipts map to the same parent
            # tx; tier by the outcome's receipt interest
            # (set_many_receipts/:165-171, set_many_potentials/:186-191)
            for child in eo["outcome"].get("receipt_ids") or []:
                cache.write(child, tx_hash, h, to_main=interest)
            if interest and not events_only:
                outcomes.append(
                    {
                        **common,
                        "execution_outcome_id": eo["id"],
                        "parent_transaction_hash": tx_hash,
                        "executor_id": eo["outcome"]["executor_id"],
                        "receipt_ids": eo["outcome"].get("receipt_ids") or [],
                        "status": canonical_status(eo["outcome"]["status"]),
                        "logs": _compact(eo["outcome"].get("logs") or []),
                        "tokens_burnt": eo["outcome"]["tokens_burnt"],
                        "gas_burnt": eo["outcome"]["gas_burnt"],
                    }
                )
                receipts.append(
                    {
                        **common,
                        "parent_transaction_hash": tx_hash,
                        "receipt_id": rc["receipt_id"],
                        "receiver_id": rc["receiver_id"],
                        "predecessor_id": rc["predecessor_id"],
                        "actions": receipt_actions(rc),
                    }
                )

        # 3. events (R9/R20/R21 + R16 events-path reads)
        for idx, oc in enumerate(flat_outs):
            eo = oc["execution_outcome"]
            rc = oc["receipt"]
            if not _of_interest(accounts, eo["outcome"]["executor_id"]):
                continue  # fast executor filter (events.rs:112-115)
            for i, log in enumerate(eo["outcome"].get("logs") or []):
                lt = log.strip()
                if not lt.startswith(EVENT_JSON_PREFIX):
                    continue
                if "dip4" not in lt and "nep245" not in lt:
                    continue  # raw-substring standard filter (events.rs:138-141)
                try:
                    obj = json.loads(lt[len(EVENT_JSON_PREFIX) :])
                except ValueError:
                    continue  # malformed → drop with warn (events.rs:126-136)
                if not isinstance(obj, dict):
                    continue
                version, standard = obj.get("version"), obj.get("standard")
                event, data = obj.get("event"), obj.get("data")
                if version is None or standard is None or event is None or data is None:
                    continue  # EventJson requires all four fields (lib.rs:44-50)
                receipt_interest = _of_interest(
                    accounts, rc["receiver_id"], rc["predecessor_id"]
                )
                tx_hash = cache.lookup(
                    rc["receipt_id"], h, potential_ok=receipt_interest
                )
                if tx_hash is None:
                    continue  # unresolved event dropped (events.rs:206-213)
                events.append(
                    {
                        **common,
                        "contract_id": eo["outcome"]["executor_id"],
                        "execution_status": canonical_status(eo["outcome"]["status"]),
                        "version": version,
                        "standard": standard,
                        "index_in_log": i,
                        "event": event,
                        "data": _compact(data),
                        "related_receipt_id": rc["receipt_id"],
                        "related_receipt_receiver_id": rc["receiver_id"],
                        "related_receipt_predecessor_id": rc["predecessor_id"],
                        "tx_hash": tx_hash,
                        "receipt_index_in_block": idx,
                    }
                )

    out = {"events": events}
    if not events_only:
        out["transactions"] = txs
        out["receipts"] = receipts
        out["execution_outcomes"] = outcomes
    return out
