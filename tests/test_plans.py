"""Structural plan audits over the whole gate: no cartesian products, and
scans stay column-pruned. Catches a plan regression even when row-level
results still pass (a cartesian product is 'correct', just 100TB-fatal)."""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _physical_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_no_cartesian_products_in_gate_plans(spark):
    import __spark_entry__ as entry_mod

    offenders = {}
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        plan = _physical_plan(spark, df)
        if "CartesianProduct" in plan:
            offenders[name] = [
                line for line in plan.splitlines() if "Cartesian" in line
            ][:2]
    assert not offenders, f"cartesian products in: {offenders}"


def test_quad_scans_prune_partitions_on_bound_predicate(spark):
    """The predicate-partitioned layout must reach the scan: a bound-p
    pattern shows a PartitionFilters entry on p."""
    import __spark_entry__ as entry_mod

    df = entry_mod.queries()["scan_project"](spark, SF_DIR)
    plan = _physical_plan(spark, df)
    assert "PartitionFilters" in plan
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("p#" in l or "(p" in l or "p =" in l for l in pf_lines), pf_lines
