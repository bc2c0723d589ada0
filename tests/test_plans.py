"""Physical-plan invariants for the headline operators.

EXPLAIN.md documents the plans; these assertions keep them true — a
regression that adds a scan, drops a broadcast, or stops pruning columns
fails here instead of silently shipping a slower plan.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = entry_mod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_referential_is_single_scan_broadcast_left_outer(spark):
    plan = _plan(spark, "referential_orphans")
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    # exactly one scan of the fact table (orders); the dim scan is the
    # broadcast build side
    assert plan.count("Scan parquet") == 2


def test_numeric_validation_prunes_columns(spark):
    plan = _plan(spark, "numeric_validation_lineitem")
    # each union branch's scan must read EXACTLY its one validated column
    import re

    schemas = [
        {c.split(":")[0] for c in m.split(",") if c}
        for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    ]
    assert sorted(map(sorted, schemas)) == [["l_discount"], ["l_quantity"]]


def test_rollup_broadcasts_both_dims_single_shuffle(spark):
    plan = _plan(spark, "orders_rollup_by_nation")
    assert plan.count("BroadcastHashJoin") == 2
    # one exchange for the final groupBy plus broadcast exchanges only
    import re

    shuffles = len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning)", plan))
    assert shuffles <= 2  # groupBy + output ordering; no fact-side join shuffle


def test_topk_uses_window_group_limit(spark):
    plan = _plan(spark, "part_topk_by_brand")
    assert "WindowGroupLimit" in plan


def test_wide_aggregates_are_one_pass(spark):
    for name in ("completeness_customer", "text_validation_documents",
                 "profiling_numeric_stats", "pii_scan_documents",
                 "fhir_compliance_orders"):
        plan = _plan(spark, name)
        n_scans = plan.count("Scan parquet")
        assert n_scans <= 2, (name, n_scans)  # ≤2: some profile queries
        # union two single-scan branches; none may rescan per metric
        assert "CartesianProduct" not in plan


def test_similarity_bruteforce_broadcasts_queries(spark):
    plan = _plan(spark, "similarity_topk_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_conversions_consolidated_plan_bounded_scans(spark):
    """The consolidated conversions/datatype/boolean row must stay three
    1-row aggregation branches: at most 3 parquet scans (orders ×2 for
    the shared messy column + lineitem), cross-joined only via
    broadcast of single-row sides — never a data-sized CartesianProduct."""
    plan = _plan(spark, "conversions_validity_orders")
    assert plan.count("Scan parquet") <= 3, plan.count("Scan parquet")
    assert "CartesianProduct" not in plan
