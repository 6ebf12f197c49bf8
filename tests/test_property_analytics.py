"""Property-based tests for the session-3 analytics/dedup operators:
randomized inputs checked against independent pure-Python brute-force
implementations (no SQL, no shared code paths)."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# funnel vs brute force
# ---------------------------------------------------------------------------

events_st = st.lists(
    st.tuples(
        st.integers(1, 5),  # uid
        st.integers(0, 50),  # ts
        st.sampled_from(["a", "b", "c", "z"]),
    ),
    min_size=0,
    max_size=60,
)


def _funnel_brute(events, steps):
    out = {}
    for uid in {u for u, _, _ in events}:
        evs = [(t, ty) for u, t, ty in events if u == uid]
        ts = []
        # t1 = min step-1 ts; t_{i+1} = min step-(i+1) ts strictly after t_i
        cand = [t for t, ty in evs if ty == steps[0]]
        if not cand:
            continue
        ts.append(min(cand))
        for step in steps[1:]:
            prev = ts[-1]
            if prev is None:
                ts.append(None)
                continue
            cand = [t for t, ty in evs if ty == step and t > prev]
            ts.append(min(cand) if cand else None)
        out[uid] = tuple(ts)
    return out


@SLOW
@given(events=events_st)
def test_funnel_matches_brute_force(spark, events):
    from kolibrie_spark.operators.analytics import funnel

    df = spark.createDataFrame(
        events, "uid long, ts long, et string"
    ) if events else spark.createDataFrame([], "uid long, ts long, et string")
    got = {
        r["uid"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel(df, "uid", "ts", "et", ["a", "b", "c"]).collect()
    }
    assert got == _funnel_brute(events, ["a", "b", "c"])


# ---------------------------------------------------------------------------
# duplicated-substring removal vs brute force
# ---------------------------------------------------------------------------

docs_st = st.lists(
    st.text(alphabet="abX ", min_size=0, max_size=30),
    min_size=1,
    max_size=12,
)


def _spans_brute(docs, L):
    # windows -> first-occurrence -> covered positions -> stitch
    occs = {}
    for did, text in docs:
        for p in range(len(text) - L + 1):
            occs.setdefault(text[p : p + L], []).append((did, p))
    covered = {did: set() for did, _ in docs}
    for g, locs in occs.items():
        if len(locs) < 2:
            continue
        for did, p in sorted(locs)[1:]:
            covered[did].update(range(p, p + L))
    out = {}
    for did, text in docs:
        keep = [c for i, c in enumerate(text) if i not in covered[did]]
        out[did] = ("".join(keep), len(covered[did]))
    return out


@SLOW
@given(texts=docs_st, L=st.integers(2, 6))
def test_remove_duplicate_spans_matches_brute_force(spark, texts, L):
    from kolibrie_spark.operators.substring import remove_duplicate_spans

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_removed"])
        for r in remove_duplicate_spans(df, "doc_id", "text", span_len=L).collect()
    }
    assert got == _spans_brute(docs, L)


# ---------------------------------------------------------------------------
# paragraph dedup vs brute force
# ---------------------------------------------------------------------------

paras_st = st.lists(
    st.lists(st.sampled_from(["p1", "p2", "p3", ""]), min_size=1, max_size=5),
    min_size=1,
    max_size=10,
)


def _paras_brute(docs):
    first = {}
    for did, paras in docs:
        for i, p in enumerate(paras):
            if p != "" and p not in first:
                first[p] = (did, i)
    out = {}
    for did, paras in docs:
        kept = [
            p
            for i, p in enumerate(paras)
            if p == "" or first[p] == (did, i)
        ]
        out[did] = (
            "\n".join(kept),
            len(paras),
            len(kept),
        )
    return out


@SLOW
@given(doc_paras=paras_st)
def test_dedup_paragraphs_matches_brute_force(spark, doc_paras):
    from kolibrie_spark.operators.paragraphs import dedup_paragraphs

    docs = [(i, "\n".join(ps)) for i, ps in enumerate(doc_paras)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_clean"], r["n_paras"], r["n_kept"])
        for r in dedup_paragraphs(df, "doc_id", "text").collect()
    }
    assert got == _paras_brute([(i, ps) for i, ps in enumerate(doc_paras)])


# ---------------------------------------------------------------------------
# KS drift: statistic bounds and symmetry
# ---------------------------------------------------------------------------


@SLOW
@given(
    a=st.lists(st.integers(0, 20), min_size=1, max_size=40),
    b=st.lists(st.integers(0, 20), min_size=1, max_size=40),
)
def test_ks_drift_bounds_and_symmetry(spark, a, b):
    from kolibrie_spark.operators.profiling import ks_drift

    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v long")
    [r] = ks_drift(df, "g", "v", "a", "b").collect()
    [r2] = ks_drift(df, "g", "v", "b", "a").collect()
    assert 0.0 <= r["d_stat"] <= 1.0
    assert r["d_stat"] == r2["d_stat"]  # |F_a - F_b| is symmetric
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    if sorted(a) == sorted(b):
        assert r["d_stat"] == 0.0
