"""Driver-contract smoke tests (`__spark_entry__.py`)."""

from __future__ import annotations

import __spark_entry__ as E

from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["s_name", "total_trips", "total_revenue", "avg_quantity"]


def test_queries_and_oracles_consistent(spark):
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    # every non-oracled query is one of the documented hash-based ops
    # Every registered query carries a DuckDB oracle: engine-specific
    # mechanisms (HLL sketches, seeded sampling, xxhash fingerprints,
    # GEMM float ordering) are wrapped in exact-value + bound-boolean
    # contract queries instead of going unchecked.
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()


def test_every_query_runs_and_has_stable_schema(spark):
    qs = E.queries()
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        # column names must be aliased (no auto-generated agg names)
        for c in df.columns:
            assert "(" not in c, f"{name}: unaliased column {c}"


def test_registry_orders_weakest_evidence_first():
    """The driver hash-checks only the FIRST 50 registered queries each
    round; the registry must therefore list every query with no driver
    evidence (brand-new) or no green row (never-green) before any
    already-green query, so the window always covers the weakest
    evidence. This pins the evidence-sort invariant including the
    CORRECTNESS_r*.json self-heal path."""
    from python_nyc_taxi_data_pipeline_spark import registry

    ev = registry._evidence()
    names = list(registry.all_queries())
    weak = {n for n in names if ev.get(n, -1) < 1}
    if not weak:  # everything green — any order is fine
        return
    last_weak = max(names.index(n) for n in weak)
    first_strong = min(
        (names.index(n) for n in names if n not in weak), default=len(names)
    )
    assert last_weak < first_strong, (
        f"weak-evidence query at position {last_weak} after a green one "
        f"at {first_strong}"
    )
    assert len(weak) <= 50, "more unproven queries than the driver window"
