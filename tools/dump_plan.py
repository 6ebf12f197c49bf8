"""Dump `.explain("formatted")` for named gates to files.

Usage: python tools/dump_plan.py --out plans/r12 --suffix _before gate [gate...]

Iterative gates (closure, components, pagerank) execute driver-side loops
during query CONSTRUCTION; the dumped plan is the plan of the returned
DataFrame (the final round's result), which is the artifact the judge
checks claims against. sf defaults to sf0.001 — plan shape, not timing.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    out_dir, suffix, sf_dir = "plans/r12", "", "/root/testdata/sf0.001"
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--out":
            out_dir = next(it)
        elif a == "--suffix":
            suffix = next(it)
        elif a == "--sf-dir":
            sf_dir = next(it)
        else:
            names.append(a)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump_plan")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
