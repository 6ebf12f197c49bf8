"""Fluent curation pipeline — one user-facing surface chaining the
training-data operators (the DataFrame counterpart of ``builder.py``'s
QueryBuilder skin): scrub → quality/repetition filters → decontaminate →
dedup → split → pack, in the order a pretraining data pipeline applies
them.

Each step RECORDS a lazy DataFrame transformation; nothing executes until
``dataframe()`` (or an action on it). The whole chain therefore compiles
into ONE Catalyst plan — filters merge into the scan, projection prunes
columns, and the only shuffles are the ones the individual operators
declare (documented per step below). Steps that need a second pass over
the corpus (dedup's candidate join, contamination's benchmark probe)
still express it inside the same plan.

Example::

    out = (CurationPipeline(docs, id_col="doc_id", text_col="text")
           .scrub_pii()
           .filter_quality(min_score=0.5)
           .filter_repetition(max_dup_3gram=0.2)
           .decontaminate(benchmark_df, n=5, max_containment=0.2)
           .dedup_exact()
           .split_by_group("source", {"train": 0.9, "valid": 0.05, "test": 0.05})
           .dataframe())
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CurationPipeline:
    """Records curation steps over a document DataFrame; ``dataframe()``
    returns the composed lazy result. The id and text column names are
    fixed at construction and tracked through renames the steps make."""

    def __init__(self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"):
        self._df = df
        self.id_col = id_col
        self.text_col = text_col

    def _with(self, df: DataFrame) -> "CurationPipeline":
        out = CurationPipeline(df, self.id_col, self.text_col)
        return out

    def _replace_text(self, expr) -> "CurationPipeline":
        keep = [c for c in self._df.columns if c != self.text_col]
        return self._with(
            self._df.select(*keep, expr.alias(self.text_col))
        )

    # ------------------------------------------------------------- cleaning
    def strip_html(self) -> "CurationPipeline":
        """Drop tags / script+style bodies and decode basic entities (pure
        JVM regexp projection, zero shuffle)."""
        from kolibrie_spark.operators.normalize import strip_html_expr

        return self._replace_text(strip_html_expr(F.col(self.text_col)))

    def normalize_unicode(self) -> "CurationPipeline":
        """NFC-compose (Arrow-batched, ASCII fast path) + canonicalize
        whitespace (JVM). Zero shuffle."""
        from kolibrie_spark.operators.normalize import normalize_expr

        return self._replace_text(normalize_expr(F.col(self.text_col)))

    def dedup_paragraphs(self, sep: str = "\n") -> "CurationPipeline":
        """Corpus-wide exact-paragraph dedup with reassembly (fingerprint
        window + doc re-group); replaces the text column with the cleaned
        form and keeps n_paras/n_kept."""
        from kolibrie_spark.operators.paragraphs import dedup_paragraphs

        cleaned = dedup_paragraphs(
            self._df, self.id_col, self.text_col, sep=sep
        ).withColumnRenamed("text_clean", self.text_col)
        keep = [c for c in self._df.columns if c != self.text_col]
        out = self._df.select(*keep).join(cleaned, on=self.id_col)
        return self._with(out)

    def cap_domains(self, domain_col: str, cap: int) -> "CurationPipeline":
        """At most ``cap`` rows per domain by deterministic hash rank (one
        window, O(cap) per-group state)."""
        from kolibrie_spark.operators.sampling import domain_cap_sample

        return self._with(
            domain_cap_sample(self._df, self.id_col, domain_col, cap)
        )

    def sample_weighted(
        self, weight_col: str, scale: float = 1.0
    ) -> "CurationPipeline":
        """Per-row Bernoulli keep with probability min(1, scale*weight)
        (deterministic hash filter, zero shuffle)."""
        from kolibrie_spark.operators.sampling import weighted_sample

        return self._with(
            weighted_sample(self._df, self.id_col, weight_col, scale)
        )

    def scrub_pii(self) -> "CurationPipeline":
        """Replace the text column with its PII-redacted form (zero
        shuffle; a pure projection — no self-join, the upstream chain is
        evaluated once). Redaction counts are kept as columns."""
        from kolibrie_spark.operators.scrub import scrub_exprs

        scrubbed, counts = scrub_exprs(self.text_col)
        keep = [c for c in self._df.columns if c != self.text_col]
        return self._with(
            self._df.select(
                *keep, scrubbed.alias(self.text_col), *counts
            )
        )

    # -------------------------------------------------------------- filters
    def filter_quality(self, min_score: float = 0.5) -> "CurationPipeline":
        """Keep docs whose composite quality heuristic >= min_score (zero
        shuffle; the score is a column expression)."""
        from kolibrie_spark.operators.textanalysis import quality_score

        return self._with(
            self._df.filter(quality_score(F.col(self.text_col)) >= min_score)
        )

    def filter_repetition(
        self, max_dup_3gram: float = 0.3
    ) -> "CurationPipeline":
        """Drop boilerplate/spam: duplicate-3-gram fraction above the
        threshold (doc-local array arithmetic, zero shuffle)."""
        from kolibrie_spark.operators.textanalysis import dup_ngram_fraction

        return self._with(
            self._df.filter(
                dup_ngram_fraction(F.col(self.text_col), 3) <= max_dup_3gram
            )
        )

    def decontaminate(
        self, benchmark: DataFrame, bench_text_col: str = "text",
        n: int = 5, max_containment: float = 0.2,
    ) -> "CurationPipeline":
        """Drop docs whose n-gram containment against the benchmark set
        exceeds the threshold (broadcast benchmark relation + one
        doc-keyed aggregation)."""
        from kolibrie_spark.operators.contamination import ngram_containment

        cont = ngram_containment(
            self._df, self.id_col, self.text_col, benchmark, bench_text_col, n
        )
        keep = cont.filter(F.col("containment") <= max_containment).select(
            self.id_col
        )
        return self._with(self._df.join(keep, on=self.id_col, how="inner"))

    # ---------------------------------------------------------------- dedup
    def dedup_exact(self) -> "CurationPipeline":
        """One survivor (min id) per exact normalized-text fingerprint.

        Window-min over the fingerprint instead of groupBy+self-join: the
        self-join would evaluate the whole upstream chain (filters,
        scrubbing) TWICE — once per join side; the window computes it once
        and costs the same single hash shuffle."""
        from pyspark.sql.window import Window

        from kolibrie_spark.operators.textanalysis import doc_fingerprint

        w = Window.partitionBy("__fp")
        fp = self._df.withColumn("__fp", doc_fingerprint(F.col(self.text_col)))
        out = (
            fp.withColumn("__keep", F.min(self.id_col).over(w))
            .filter(F.col(self.id_col) == F.col("__keep"))
            .drop("__fp", "__keep")
        )
        return self._with(out)

    def dedup_near(
        self, threshold: float = 0.8, n: int = 3
    ) -> "CurationPipeline":
        """Remove near-duplicates: MinHash+LSH candidate pairs, exact
        Jaccard verify, connected components, keep each cluster's min id.
        The heavy step — banded bucket join + component fixpoint."""
        from kolibrie_spark.operators.dedup import (
            minhash_lsh_pairs,
            near_dup_clusters,
        )

        pairs = minhash_lsh_pairs(
            self._df, self.id_col, self.text_col, n=n, threshold=threshold
        )
        clusters = near_dup_clusters(self._df, pairs, self.id_col)
        keep = clusters.filter(
            F.col("cluster") == F.col(self.id_col)
        ).select(self.id_col)
        return self._with(
            self._df.join(keep, on=self.id_col, how="inner")
        )

    # ---------------------------------------------------------------- split
    def split_by_group(
        self, group_col: str, splits: dict[str, float]
    ) -> "CurationPipeline":
        """Leakage-safe split column (pure hash expression, zero shuffle)."""
        from kolibrie_spark.operators.sampling import group_split

        return self._with(group_split(self._df, group_col, splits))

    def sample_domains(
        self, domain_col: str, alpha: float, target_frac: float
    ) -> "CurationPipeline":
        """Temperature-weighted domain resampling (tiny broadcast aggregate
        + hash filter)."""
        from kolibrie_spark.operators.sampling import domain_mix_sample

        return self._with(
            domain_mix_sample(
                self._df, self.id_col, domain_col, alpha, target_frac
            )
        )

    # ----------------------------------------------------------------- pack
    def pack(self, budget: int, shards: int = 32) -> "CurationPipeline":
        """Sequence-pack the surviving docs (whitespace token counts; one
        sharded window cumsum). Adds shard/token_start/seq_* columns."""
        from kolibrie_spark.operators.packing import pack_sequences
        from kolibrie_spark.operators.textanalysis import token_count

        with_toks = self._df.withColumn(
            "__toks", token_count(F.col(self.text_col)).cast("long")
        )
        return self._with(
            pack_sequences(with_toks, self.id_col, "__toks", budget, shards).drop(
                "__toks"
            )
        )

    # --------------------------------------------------------------- output
    def dataframe(self) -> DataFrame:
        return self._df

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)


def corpus_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
) -> dict[str, DataFrame]:
    """One-call curation report: the profile tables a data lead reads
    before signing off a corpus refresh. Returns lazy DataFrames (each a
    documented single-aggregation plan; nothing executes until shown):

    - ``stats``:   per-domain count/distinct/min/max/mean/stddev of length
    - ``budget``:  per-domain token accounting + largest-first cum share
    - ``langs``:   domain x language cross-tab (heuristic lang-id)
    - ``quality``: per-domain mean Gopher-style quality score
    """
    from kolibrie_spark.operators.profiling import profile_stats, token_budget
    from kolibrie_spark.operators.textanalysis import lang_id, quality_score

    with_len = df.withColumn("__len", F.length(F.col(text_col)))
    return {
        "stats": profile_stats(with_len, domain_col, "__len"),
        "budget": token_budget(df, domain_col, text_col),
        "langs": (
            df.withColumn("__lang", lang_id(F.col(text_col)))
            .groupBy(domain_col)
            .pivot("__lang", ["en", "de", "fr", "es", "zh", "und"])
            .count()
            .na.fill(0)
        ),
        "quality": df.groupBy(domain_col).agg(
            F.avg(quality_score(F.col(text_col))).alias("mean_quality")
        ),
    }
