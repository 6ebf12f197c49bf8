"""Driver-contract sanity: queries()/oracle_sql() stay consistent and the
flagship entry runs on the smoke scale factor."""

import __spark_entry__ as entry_mod


def test_oracle_keys_subset_of_queries():
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    assert oracles <= qs, f"orphan oracles: {oracles - qs}"
    # rows-only (approximate-by-design) entries are the only ones allowed
    # to lack an oracle
    rows_only = qs - oracles
    assert rows_only == {"dedup_simhash", "sim_topk_lsh", "multimodal_features"}


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"flag", "sum_qty", "avg_qty", "min_qty", "max_qty", "cnt"} == set(
        df.columns
    )


def test_bench_queries_exist():
    import bench

    qs = set(entry_mod.queries())
    missing = [q for q in bench.BENCH_QUERIES if q not in qs]
    assert not missing
