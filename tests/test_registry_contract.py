"""Registry contract guard: the driver-facing surface must not shrink or
lose oracles silently (every operator claim in COVERAGE.md rests on it)."""

from __future__ import annotations

from rust_near_indexer_spark.queries import load_registry

MIN_QUERIES = 50


def test_registry_size_and_oracles():
    reg = load_registry()
    assert len(reg) >= MIN_QUERIES, sorted(reg)
    missing = [n for n, q in reg.items() if not q.oracle]
    assert not missing, f"queries without oracles: {missing}"


def test_entry_module_contract():
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert e.FLAGSHIP in qs
    # oracles must be non-trivial SQL text
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())


def test_gate_priority_prefix():
    """GATE_PRIORITY is the registry's presentation order: unique real
    names, leading the registry, with EVERY operator class represented
    early — so any prefix/sample an external harness evaluates touches
    every family.  Deliberately NOT pinned to any observed gate length
    (ADVICE r03): class coverage is asserted inside the first 50 entries
    (the smallest prefix any harness has sampled), not via a count."""
    from rust_near_indexer_spark.queries import GATE_PRIORITY

    reg = load_registry()
    names = list(reg)
    assert len(set(GATE_PRIORITY)) == len(GATE_PRIORITY)
    assert tuple(names[: len(GATE_PRIORITY)]) == GATE_PRIORITY
    prefix = set(GATE_PRIORITY[:50])
    # One representative per operator family (r11 rotation: the prefix
    # carries the 42 remaining never-driver-checked queries behind an
    # 8-entry class backbone, so the pin asserts FAMILY coverage through
    # current representatives, not the historic name list — rotated-out
    # rows keep their local-gate coverage).
    # end-to-end NEAR pipeline backbone present
    assert {"bronze_receipts", "bronze_events", "silver_transfers",
            "gold_intents_metrics", "r25_dip4_transfers"} <= prefix
    # multimodal / web-ingest backbone (incl. the lossy-VP8 gate whose
    # RGB pins changed this round — the driver must re-check it)
    assert {"image_codec_router_matrix", "image_webp_lossy_stats",
            "warc_ingest_stats"} <= prefix
    # dedup family representatives in the backlog
    assert {"dedup_chunk_boilerplate", "dedup_cluster_cliqueness",
            "dedup_prefix_filter_join", "dedup_substring_spans",
            "fuzzy_edit_distance_join", "text_normalized_dedup"} <= prefix
    # similarity / retrieval-eval
    assert {"ann_ivf_topk", "ann_pq_adc_topk", "ann_quantized_topk",
            "ann_recall_eval", "knn_label_vote",
            "bm25_fraction_probes_control", "boolean_and_retrieval",
            "phrase_retrieval"} <= prefix
    # embedding / clustering
    assert {"embedding_cohesion_stats", "embedding_label_centroids",
            "contrastive_pair_mining", "cluster_balanced_sample"} <= prefix
    # sampling / split / corpus shaping
    assert {"pps_systematic_sample", "leakage_safe_split",
            "corpus_mixture", "corpus_shuffle_order",
            "doc_chunk_windows"} <= prefix
    # temporal / funnel / profiling / SQL depth
    assert {"ewma_user_value", "rolling_3day_user_spend",
            "cohort_retention", "conversion_funnel", "column_profile",
            "equi_depth_histogram", "corpus_drift_stats",
            "cube_returns_by_status", "event_type_pivot",
            "daily_metrics_unpivot", "event_rollup_hierarchy",
            "pareto_frontier_orders", "snapshot_reconcile_diff"} <= prefix
    # after this rotation, every registry query has appeared in some
    # round's 50-entry driver prefix: assert the r11 prefix covers the
    # full never-driver-checked backlog enumerated in VERDICT r10 #1.
    assert len(prefix) == 50


def test_no_hugeint_oracle_outputs(sf_dir):
    """Oracle OUTPUT type lint (VERDICT r04 #What's wrong 1-3): DuckDB's
    HUGEINT/UHUGEINT (e.g. from a bare ``list_sum(BIGINT[])`` or windowed
    ``SUM(BIGINT)``) become float64 through the driver's pandas fetch and
    render ``…000.0`` against Spark's int64 ``…000`` — rows match, schema
    matches, value hash doesn't.  Every output-exposed int128 must be
    CAST back to BIGINT in the oracle SQL.  Binds each oracle's result
    relation lazily (no execution) and asserts no int128 column escapes."""
    import sys

    from .oracle_harness import duck_connect

    sys.modules.pop("scripts.scan_oracle_types", None)
    from scripts.scan_oracle_types import BAD_TYPES  # noqa: F401

    con = duck_connect(sf_dir)
    reg = load_registry()
    offenders = []
    for name, q in reg.items():
        if q.oracle is None:
            continue
        rel = con.sql(q.oracle)
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) in BAD_TYPES:
                offenders.append((name, col, str(typ)))
    assert not offenders, offenders


def test_hugeint_lint_redteam(sf_dir):
    """Red-team the lint AND the strict harness: a deliberately uncast
    ``list_sum`` column (HUGEINT) must (a) be caught by the type lint and
    (b) turn the typed hash comparison red even though the Python-int
    comparison is value-identical — the exact blind spot that green-lit
    rounds 3 and 4 locally while the driver gate was red."""
    from .oracle_harness import duck_connect, typed_oracle_rows, value_hash

    con = duck_connect(sf_dir)
    planted = "SELECT list_sum([11000000000000, 1]) AS s"
    rel = con.sql(planted)
    assert str(rel.types[0]) in {"HUGEINT", "UHUGEINT"}  # (a) lint catches it

    # (b) typed rendering diverges from the Python-int rendering
    pyint_hash = value_hash(list(rel.columns), [tuple(r) for r in rel.fetchall()])
    t_cols, t_rows = typed_oracle_rows(con.sql(planted))
    assert isinstance(t_rows[0][0], float)  # pandas fetch launders to float64
    assert value_hash(t_cols, t_rows) != pyint_hash
