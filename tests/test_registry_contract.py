"""Registry/driver-contract invariants: keep future rounds honest."""

from __future__ import annotations

from hadoop_map_reduce_spark.plans import REGISTRY

# Tags whose queries are exercised by the oracle-differential test files.
COVERED_TAGS = {
    "reference",
    "relational",
    "llm",
    "streaming",
    "graph",
    "timeseries",  # tests/test_timeseries_queries.py
    "layout",  # tests/test_layout_queries.py
}


def test_every_query_reaches_an_oracle_test():
    uncovered = [
        name for name, q in REGISTRY.items()
        if not (set(q.tags) & COVERED_TAGS)
    ]
    assert not uncovered, (
        f"queries not collected by any oracle test file: {uncovered} — "
        "add a covered tag or a dedicated test"
    )


def test_registry_entries_well_formed():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(REGISTRY)
    for name, q in REGISTRY.items():
        assert q.description.strip(), f"{name}: empty description"
        assert callable(q.fn)
        if q.oracle is None:
            # rows-only checks must be deliberate and explained
            assert "no SQL oracle" in q.description or "rows-only" in q.description, (
                f"{name}: oracle-less query must say why in its description"
            )


def test_verification_window_prioritizes_unverified():
    """The driver oracle-checks only the first 50 queries() entries per
    round; every ORACLED query without a previous driver verdict must
    land in that window (or, if more than 50 pending, fill it), and
    rows-only queries must sit dead last — a window slot spent on one
    can only ever record no_oracle (7 slots wasted in rounds 4–5)."""
    import __spark_entry__ as e
    from hadoop_map_reduce_spark.plans.verification import DRIVER_VERIFIED

    order = list(e.queries())
    assert set(order) == set(REGISTRY)
    unknown = DRIVER_VERIFIED - set(REGISTRY)
    assert not unknown, f"DRIVER_VERIFIED names not in registry: {unknown}"
    pending = [
        n
        for n in order
        if n not in DRIVER_VERIFIED and REGISTRY[n].oracle is not None
    ]
    window = set(order[:50])
    missed = [n for n in pending[:50] if n not in window]
    assert not missed, f"pending queries outside the driver window: {missed}"
    n_rows_only = sum(1 for q in REGISTRY.values() if q.oracle is None)
    tail = order[-n_rows_only:]
    assert all(REGISTRY[n].oracle is None for n in tail), (
        "rows-only queries must be the final queries() entries; tail was "
        f"{tail}"
    )


def test_headline_set_is_stable_and_timed():
    headline = sorted(n for n, q in REGISTRY.items() if q.headline)
    assert headline == [
        # round-11 rotation (VERDICT r10 #6): a served-search timing for
        # the persisted ANN index and a bounded-round PageRank enter the
        # board (additive — every pinned query stays)
        "ann_index_served_search",
        "bigram_count",
        "curation_dsir_score",
        "dedup_containment",
        "dedup_minhash_lsh",
        "dedup_ngram_jaccard",
        "embedding_neardup",
        # round-9 rotation (VERDICT r8 #1): the round-8 operator
        # families enter the regression gate
        "events_rfm_segments",
        "graph_kcore_bounded",
        "graph_pagerank",
        "graph_triangles_hybrid",
        "interval_union_days",
        "join_asof",
        "join_bloom_semi",
        "multimodal_phash_neardup",
        "pack_global_shuffle",
        "pack_write_shards",
        "q18_large_volume",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier",
        "search_hybrid_rrf",
        "sessionization",
        "similarity_topk",
        "subq_large_orders",
        "text_quality",
        "tfidf_top_terms",
    ], "headline set drifted — update BASELINE.md tracked table in sync"


def test_readme_counts_match_registry():
    """README's correctness-contract paragraph states the registry size
    and oracle split; derive them from the registry so the numbers can't
    drift (round-3 ADVICE: the counts went stale twice)."""
    import re
    from pathlib import Path

    total = len(REGISTRY)
    oracled = sum(1 for q in REGISTRY.values() if q.oracle)
    readme = Path(__file__).resolve().parent.parent / "README.md"
    text = readme.read_text()
    m = re.search(
        r"exposes (\d+) named queries \((\d+) with DuckDB\s*\noracles, "
        r"(\d+) rows-only",
        text,
    )
    assert m, "README correctness-contract sentence not found"
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (
        total,
        oracled,
        total - oracled,
    ), "README counts drifted from the registry — update README.md"


def test_no_oracle_returns_hugeint(oracle_sf_dir):
    """Every oracle's FINAL projection must be BIGINT-clean: DuckDB
    widens SUM (even SUM(BIGINT)) to HUGEINT, which the driver-side
    canonicalization sees as a different cell type than Spark's long.
    LIMIT-0 execution reads the declared output types without running
    the query; any HUGEINT column means a missing CAST(... AS BIGINT)
    (round-5b review finding, made structural here)."""
    import duckdb

    from hadoop_map_reduce_spark.plans import REGISTRY

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{oracle_sf_dir}/{t}.parquet')"
        )
    offenders = []
    for name, q in sorted(REGISTRY.items()):
        if not q.oracle:
            continue
        # Relation API, not the DBAPI cursor: cursor descriptions map
        # every integer type to 'NUMBER', hiding exactly the HUGEINT
        # this test exists to catch.
        rel = con.sql(f"SELECT * FROM ({q.oracle}) LIMIT 0")
        hug = [
            c
            for c, t in zip(rel.columns, rel.types)
            if "HUGEINT" in str(t).upper()
        ]
        if hug:
            offenders.append((name, hug))
    assert not offenders, offenders
