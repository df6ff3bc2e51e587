"""defuse_assets ingest job: API payload parse, append, dedup-on-read."""

from __future__ import annotations

import json

from rust_near_indexer_spark import assets_job


def _payload(price: float) -> str:
    return json.dumps(
        {
            "items": [
                {
                    "blockchain": "near",
                    "contract_address": "usdc.near",
                    "decimals": 6,
                    "defuse_asset_id": "nep141:usdc.near",
                    "price": price,
                    "price_updated_at": "2025-02-19T01:00:00Z",
                    "symbol": "USDC",
                },
                {
                    "blockchain": "aurora",
                    "contract_address": "aurora",
                    "decimals": 18,
                    "defuse_asset_id": "nep141:aurora",
                    "price": 0.12,
                    "price_updated_at": "2025-02-19T01:00:00Z",
                    "symbol": "AURORA",
                },
            ]
        }
    )


def test_parse_explodes_items(spark):
    df = assets_job.parse_assets_payload(spark, _payload(1.0))
    rows = {r["defuse_asset_id"]: r for r in df.collect()}
    assert set(rows) == {"nep141:usdc.near", "nep141:aurora"}
    assert rows["nep141:usdc.near"]["decimals"] == 6
    # 2025-02-19T01:00:00Z in ns
    assert rows["nep141:usdc.near"]["price_updated_at_ns"] == 1739926800 * 10**9


def test_refresh_appends_and_dedups(spark, tmp_path):
    path = str(tmp_path / "assets")
    n = assets_job.refresh_assets(spark, path, lambda: _payload(1.0), ingest_seq=1)
    assert n == 2
    # same PK re-ingested with a newer price: latest ingest wins
    assets_job.refresh_assets(spark, path, lambda: _payload(1.5), ingest_seq=2)
    final = {r["defuse_asset_id"]: r for r in assets_job.read_assets(spark, path).collect()}
    assert len(final) == 2
    assert final["nep141:usdc.near"]["price"] == 1.5
