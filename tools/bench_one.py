"""Time a subset of gates in isolation at an arbitrary SF dir.

Usage: python tools/bench_one.py [--sf-dir DIR] [--runs N] gate [gate ...]

Same session config and noop-sink methodology as bench.py (min of N runs,
default 2), but a fresh JVM per invocation — the tool for (a) isolating
suite-level pressure effects from real per-gate regressions and (b) the
sf1.0 scale probes.  Prints one JSON line {gate: sec, ...}.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 2
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--runs":
            runs = int(next(it))
        else:
            names.append(a)

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("kolibrie_spark-bench-one")
        .config("spark.sql.shuffle.partitions", str(int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    import bench as bench_mod

    qs = entry_mod.queries()
    entry_mod._base_store(spark, sf_dir)  # triplified quads, as bench.py does
    # gate-family machinery warm-up, same as the suite (r11): without it
    # the FIRST gate of this process pays Arrow-pool + numpy-import costs
    # and "fresh-JVM confirmation" numbers read high (analytics_q3 1.86s
    # as gate 1 vs ~1.0 steady)
    bench_mod._machinery_warmup(spark)
    # blocks persisted by setup (the shared base store) must survive the
    # per-gate cleanup — unpersisting a localCheckpointed RDD destroys it
    try:
        _setup_rdd_ids = set(spark.sparkContext._jsc.getPersistentRDDs().keys())
    except Exception:
        _setup_rdd_ids = set()

    def _isolate_gate() -> None:
        """Per-gate isolation, same as bench.py's suite loop (the r7 fix):
        iterative gates leave eagerly-persisted localCheckpoint blocks
        behind, and without dropping them + a GC nudge a later gate in the
        SAME process is timed against a storage layer full of dead blocks
        (VERDICT r10 reproduced text_lm_score at 12.35s as the 4th gate of
        one bench_one process vs 2.20s isolated — this loop lacked the
        suite loop's cleanup)."""
        try:
            for rid, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
                if rid not in _setup_rdd_ids:
                    rdd.unpersist()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    out: dict[str, float] = {}
    for name in names:
        if name.startswith("xw_"):
            # cross-window pseudo-gates live in bench.py, not queries();
            # the xw bench times both paths in one call — min over runs,
            # keep only the requested name
            import bench as bench_mod

            best: dict[str, float] = {}
            for _ in range(runs):
                for k, v in bench_mod._bench_cross_window(spark).items():
                    best[k] = min(best.get(k, float("inf")), v)
            out[name] = best[name]
            print(f"# {name}: {out[name]:.3f}s", file=sys.stderr)
            _isolate_gate()
            continue
        best = float("inf")
        for _ in range(runs):
            t1 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t1)
        out[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)
        _isolate_gate()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
