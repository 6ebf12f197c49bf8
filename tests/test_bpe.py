"""Distributed BPE training vs the textbook pure-Python algorithm."""

import random
from collections import Counter


def _bpe_brute(texts, num_merges, eow="</w>"):
    """Sennrich et al. reference implementation."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[w] += 1
    symd = {w: list(w) + [eow] for w in vocab}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, f in vocab.items():
            s = symd[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        # max count, lexicographically smallest pair on ties
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        if c < 2:
            break
        merges.append((a, b, c))
        for w in symd:
            s, out, i = symd[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            symd[w] = out
    return merges, symd


def test_bpe_simple_known(spark):
    from kolibrie_spark.operators.bpe import train_bpe

    # classic example: 'low' family -> 'lo' or similar early merges
    texts = [
        "low low low low low",
        "lower lower newest newest newest newest newest newest",
        "widest widest widest",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, vocab = train_bpe(df, "text", num_merges=5)
    ref_merges, ref_symd = _bpe_brute(texts, 5)
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got == ref_symd


def test_bpe_matches_brute_on_random_corpus(spark):
    from kolibrie_spark.operators.bpe import train_bpe

    rng = random.Random(71)
    words = ["spark", "spork", "sparkle", "shuffle", "shuffled", "plan",
             "plans", "planner", "scan", "scans"]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(2, 12)))
        for _ in range(60)
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, vocab = train_bpe(df, "text", num_merges=12)
    ref_merges, ref_symd = _bpe_brute(texts, 12)
    assert merges == ref_merges
    got = {r["word"]: list(r["syms"]) for r in vocab.collect()}
    assert got == ref_symd


def test_bpe_deterministic_across_partitionings(spark):
    from kolibrie_spark.operators.bpe import train_bpe

    texts = [(f"token{i % 7} shared words token{i % 3}",) for i in range(40)]
    df = spark.createDataFrame(texts, "text string")
    m1, _ = train_bpe(df, "text", num_merges=6)
    m2, _ = train_bpe(df.repartition(9), "text", num_merges=6)
    assert m1 == m2 and len(m1) == 6


def _encode_brute(text, merges, eow="</w>"):
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    out = []
    for w in text.lower().split():
        s = list(w) + [eow]
        while len(s) > 1:
            cand = [(ranks[(s[i], s[i+1])], i) for i in range(len(s)-1)
                    if (s[i], s[i+1]) in ranks]
            if not cand:
                break
            _, i = min(cand)
            s[i:i+2] = [s[i] + s[i+1]]
        out.extend(s)
    return out


def test_bpe_encode_roundtrip_and_oov(spark):
    from kolibrie_spark.operators.bpe import encode_with_merges, train_bpe

    train_texts = ["low lower lowest low low", "newest newer new news"] * 3
    df = spark.createDataFrame([(t,) for t in train_texts], "text string")
    merges, _ = train_bpe(df, "text", num_merges=8)
    assert len(merges) > 0

    apply_texts = [
        "low lowest newish",     # mix of in-vocab and OOV-ish
        "completely unseen word",
    ]
    adf = spark.createDataFrame([(i, t) for i, t in enumerate(apply_texts)],
                                "i long, text string")
    out = {r["i"]: list(r["bpe_tokens"])
           for r in encode_with_merges(adf, "text", merges).collect()}
    for i, t in enumerate(apply_texts):
        assert out[i] == _encode_brute(t, merges)
    # concatenating tokens (minus EOW markers) recovers the text's chars
    flat = "".join(tok.replace("</w>", "") for tok in out[0])
    assert flat == "lowlowestnewish"


def test_merge_expr_matches_merge_udf(spark):
    """r12 optimization pin: the JVM aggregate merge expression must be
    bit-identical to the Arrow-batched reference scan — randomized
    symbol lists including self-pairs (a,a) where the non-overlapping
    left-to-right advance matters ('a a a' -> 'aa a', never 'a aa')."""
    import random

    from pyspark.sql import functions as F

    from kolibrie_spark.operators.bpe import _merge_expr, _merge_udf

    rng = random.Random(3)
    alphabet = ["a", "b", "c", "ab", "bc", "</w>", "x"]
    rows = [
        ([rng.choice(alphabet) for _ in range(rng.randrange(1, 14))],)
        for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "syms array<string>")
    for a, b in [("a", "b"), ("ab", "c"), ("a", "a"), ("b", "</w>")]:
        got = df.select(_merge_expr(F.col("syms"), a, b).alias("m")).collect()
        ref = df.select(_merge_udf(a, b)(F.col("syms")).alias("m")).collect()
        assert [r.m for r in got] == [r.m for r in ref], (a, b)
    # empty-ish and exact-boundary cases
    edge = spark.createDataFrame(
        [(["a"],), (["a", "a"],), (["a", "a", "a"],), (["b", "a", "a"],)],
        "syms array<string>",
    )
    got = edge.select(_merge_expr(F.col("syms"), "a", "a").alias("m")).collect()
    assert [r.m for r in got] == [["a"], ["aa"], ["aa", "a"], ["b", "aa"]]
