"""Forward/backward chaining over a facts DataFrame.

Reference algorithms re-expressed as DataFrame plans:
- naive fixpoint (datalog/src/reasoning/materialisation/my_naive.rs:74):
  apply all rules to all facts until no growth;
- semi-naive (semi_naive.rs:89): delta-driven — each round joins the
  last round's delta against the full fact set in every premise position
  (the classic distributed-datalog recipe; lineage is cut with
  localCheckpoint each round so iteration does not stack plans);
- negation-as-failure: LEFT ANTI join against the instantiated negated
  pattern (single stratum, shared/src/rule.rs semantics);
- provenance semirings (shared/src/provenance.rs:18-60): a ``tag`` column
  flows through the joins — ⊗ combines premise tags within a derivation,
  ⊕ merges alternative derivations of the same fact per round;
- backward chaining (reasoning/backward_chaining.rs:150): driver-side
  goal-directed resolution issuing DataFrame probes per subgoal.

Scale notes: each round shuffles on join variables only; the delta is
usually tiny relative to the fact set so Catalyst broadcasts it (AQE);
counts per round are the only driver actions. Iterations are capped.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kolibrie_spark import compare
from kolibrie_spark.reasoner.rule import FilterCondition, Rule, check_rule_safety
from kolibrie_spark.sparql.ast import Iri, Lit, TriplePattern, Var

FACTS_SCHEMA = "s string, p string, o string"
TAGGED_SCHEMA = "s string, p string, o string, tag double"


# ------------------------------------------------------------- semirings
@dataclass(frozen=True)
class Semiring:
    """⊗ combines premises in one derivation; ⊕ merges alternative
    derivations. Mirrors the reference's AddMultProbability (⊗ = product,
    ⊕ = noisy-OR) and MinMaxProbability (⊗ = min, ⊕ = max)."""

    name: str

    def times(self, a: Column, b: Column) -> Column:
        if self.name == "addmult":
            return a * b
        return F.least(a, b)

    def plus_agg(self, col: Column) -> Column:
        if self.name == "addmult":
            # noisy-OR over the group: 1 - prod(1 - t). A tag of exactly 1.0
            # would hit log(0) -> NULL (and sum() skips NULLs, silently
            # dropping the certain derivation), so saturate the group first.
            return F.when(F.max(col) >= 1.0, F.lit(1.0)).otherwise(
                1.0 - F.exp(F.sum(F.log(1.0 - col)))
            )
        return F.max(col)


ADD_MULT = Semiring("addmult")
MIN_MAX = Semiring("minmax")


def _term_value(t) -> str:
    if isinstance(t, Iri) or isinstance(t, Lit):
        return t.value
    raise TypeError(f"not a constant term: {t!r}")


def _scan(facts: DataFrame, pat: TriplePattern, tagged: bool) -> DataFrame:
    df = facts
    out, seen, conds = [], {}, []
    for pos, term in (("s", pat.s), ("p", pat.p), ("o", pat.o)):
        if isinstance(term, Var):
            if term.name in seen:
                conds.append(F.col(pos) == F.col(seen[term.name]))
            else:
                seen[term.name] = pos
                out.append(F.col(pos).alias(term.name))
        else:
            conds.append(F.col(pos) == F.lit(_term_value(term)))
    for c in conds:
        df = df.filter(c)
    if tagged:
        out.append(F.col("tag").alias(f"__tag_{id(pat)}"))
    return df.select(*out) if out else df.select()


def _join_premises(scans: list[DataFrame]) -> DataFrame:
    df = scans[0]
    for nxt in scans[1:]:
        shared = sorted(
            (set(df.columns) & set(nxt.columns)) - {c for c in df.columns if c.startswith("__tag_")}
        )
        df = df.join(nxt, on=shared, how="inner") if shared else df.crossJoin(nxt)
    return df


def _apply_filters(df: DataFrame, filters: list[FilterCondition]) -> DataFrame:
    """Conjunction of conditions; conditions sharing an or_group id came
    from one ``FILTER (a || b)`` and OR together (SPARQL semantics — the
    reference's datalog evaluator drops OR'ed rule filters entirely,
    rules.rs:133-163, which we deliberately do not mirror)."""

    def cond(f: FilterCondition):
        if f.variable not in df.columns:
            return F.lit(False)
        return compare.compare(F.col(f.variable), f.operator, F.lit(f.value))

    groups: dict[int, object] = {}
    for f in filters:
        if f.or_group is None:
            df = df.filter(cond(f))
        else:
            c = cond(f)
            groups[f.or_group] = c if f.or_group not in groups else (groups[f.or_group] | c)
    for c in groups.values():
        df = df.filter(c)
    return df


def _apply_negation(df: DataFrame, facts: DataFrame, rule: Rule) -> DataFrame:
    for pat in rule.negative_premise:
        neg = _scan(facts.select("s", "p", "o"), pat, tagged=False)
        join_vars = sorted(set(df.columns) & set(neg.columns))
        if join_vars:
            df = df.join(neg, on=join_vars, how="left_anti")
        else:
            # ground negated pattern: empty result iff the fact exists
            df = df.join(neg.limit(1), how="left_anti", on=F.lit(True))
    return df


def _instantiate(df: DataFrame, patterns: list[TriplePattern], tag_col: Column | None) -> DataFrame:
    parts = []
    for pat in patterns:
        cols = []
        for pos, term in (("s", pat.s), ("p", pat.p), ("o", pat.o)):
            if isinstance(term, Var):
                cols.append(F.col(term.name).alias(pos))
            else:
                cols.append(F.lit(_term_value(term)).alias(pos))
        if tag_col is not None:
            cols.append(tag_col.alias("tag"))
        parts.append(df.select(*cols))
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


def apply_rule(
    facts: DataFrame,
    rule: Rule,
    semiring: Semiring | None = None,
    delta: DataFrame | None = None,
) -> DataFrame:
    """One rule application. With ``delta``, a semi-naive step: the union
    over premise positions of (delta at position i) ⋈ (facts elsewhere)."""
    tagged = semiring is not None

    def one(pos_delta: int | None) -> DataFrame:
        scans = [
            _scan(delta if (pos_delta is not None and i == pos_delta) else facts, p, tagged)
            for i, p in enumerate(rule.premise)
        ]
        df = _join_premises(scans)
        df = _apply_filters(df, rule.filters)
        df = _apply_negation(df, facts, rule)
        tag = None
        if tagged:
            tag_cols = [c for c in df.columns if c.startswith("__tag_")]
            tag = functools.reduce(semiring.times, [F.col(c) for c in tag_cols])
        return _instantiate(df, rule.conclusion, tag)

    if delta is None:
        return one(None)
    out = one(0)
    for i in range(1, len(rule.premise)):
        out = out.unionByName(one(i))
    return out


# Full annotation IRI: the reference's tag stores encode the predicate as
# http://www.w3.org/ns/prob#value (shared/src/tag_store.rs:94), so reference
# scripts with PREFIX prob: <http://www.w3.org/ns/prob#> match it.
PROB_PREDICATE = "http://www.w3.org/ns/prob#value"


def materialize_tags_as_rdfstar(
    store, tagged_facts: DataFrame, predicate: str = PROB_PREDICATE
) -> None:
    """Write provenance tags into the store as RDF-star annotations:
    ``<< s p o >> prob:value "0.56"`` (reference reasoning.rs:84-93 via
    tag_store.rs:88-111).  `predicate` lets callers emit the explanation
    predicates of encode_as_rdf_star_with_explanation (tag_store.rs:119+,
    e.g. prob:proofCount) from the same (s, p, o, tag) frame."""
    from kolibrie_spark import rdfstar

    qid = rdfstar.qt_id_col(F.col("s"), F.col("p"), F.col("o"))
    quoted = tagged_facts.select(
        qid.alias("qid"),
        F.col("s").alias("qs"),
        F.col("p").alias("qp"),
        F.col("o").alias("qo"),
    )
    store.insert_quoted(quoted)
    annotations = tagged_facts.select(
        qid.alias("s"),
        F.lit(predicate).alias("p"),
        F.col("tag").cast("string").alias("o"),
        F.lit(None).cast("string").alias("g"),
    )
    store.insert(annotations, graphs=[])  # default graph only


class Reasoner:
    """Facts + rules with materialization (reference datalog/src/reasoning.rs)."""

    def __init__(self, spark: SparkSession, facts: DataFrame | None = None):
        self.spark = spark
        self.facts = facts if facts is not None else spark.createDataFrame([], FACTS_SCHEMA)
        # identity of the pristine empty seed: callers that only need to
        # know "was this reasoner ever given facts?" can compare against
        # this instead of paying a take(1) job on an empty RDD (r12)
        self._empty_seed = None if facts is not None else self.facts
        self.rules: list[Rule] = []
        self.constraints: list[Rule] = []

    # -------------------------------------------------------------- input
    def add_triples(self, rows: list[tuple[str, str, str]]) -> None:
        new = self.spark.createDataFrame(rows, FACTS_SCHEMA)
        self.facts = self.facts.unionByName(new).dropDuplicates()

    def add_rule(self, rule: Rule) -> None:
        check_rule_safety(rule)
        self.rules.append(rule)

    def add_constraint(self, rule: Rule) -> None:
        """A constraint is a rule whose conclusion marks a violation
        (reference reasoning.rs:132-186)."""
        self.constraints.append(rule)

    # -------------------------------------------------------- fixpoints
    def materialize_naive(self, max_iter: int = 50) -> DataFrame:
        facts = self.facts.localCheckpoint(eager=True)
        count = facts.count()
        for _ in range(max_iter):
            derived = None
            for rule in self.rules:
                d = apply_rule(facts, rule)
                derived = d if derived is None else derived.unionByName(d)
            if derived is None:
                break
            # lazy mark + count = one action per round (r12, guide §1.2):
            # the count computes every partition, completing the
            # checkpoint in the job that reads convergence
            facts = facts.unionByName(derived).dropDuplicates().localCheckpoint(eager=False)
            new_count = facts.count()
            if new_count == count:
                break
            count = new_count
        self.facts = facts
        return facts

    def materialize(self, max_iter: int = 50) -> DataFrame:
        """Semi-naive fixpoint (the default, like the reference).

        Per round only the (small) delta is checkpointed — the running fact
        set stays a union of checkpointed deltas, so its lineage is bounded
        by the round count without re-materializing the full set each round
        (one full-facts write per iteration saved)."""
        facts = self.facts.localCheckpoint(eager=True)
        delta = facts
        for _ in range(max_iter):
            derived = None
            for rule in self.rules:
                d = apply_rule(facts, rule, delta=delta)
                derived = d if derived is None else derived.unionByName(d)
            if derived is None:
                break
            # lazy mark + count = one action per round (r12, guide §1.2);
            # take(1) would compute only some partitions of a lazily-
            # marked frame and leave the checkpoint half-built, so the
            # emptiness probe is a count()
            new_delta = (
                derived.dropDuplicates()
                .join(facts, on=["s", "p", "o"], how="left_anti")
                .localCheckpoint(eager=False)
            )
            if new_delta.count() == 0:
                break
            facts = facts.unionByName(new_delta)
            delta = new_delta
        self.facts = facts
        return facts

    def infer(self, s: str, p: str, o: str) -> bool:
        return (
            self.facts.filter(
                (F.col("s") == s) & (F.col("p") == p) & (F.col("o") == o)
            ).limit(1).count()
            > 0
        )

    # ---------------------------------------------------------- provenance
    def materialize_with_provenance(
        self, tagged_facts: DataFrame, semiring: Semiring, max_iter: int = 25
    ) -> DataFrame:
        """Tagged fixpoint: (s,p,o,tag). Per round, alternative derivations
        of the same fact merge with ⊕; existing facts keep the ⊕ of old and
        new evidence. Iterates until the fact set stops growing (tag
        saturation beyond max_iter is cut off, like the reference's
        saturating semirings)."""
        facts = tagged_facts.localCheckpoint(eager=True)
        for _ in range(max_iter):
            derived = None
            for rule in self.rules:
                d = apply_rule(facts, rule, semiring=semiring)
                derived = d if derived is None else derived.unionByName(d)
            if derived is None:
                break
            # ⊕ across the round's distinct derivations of one fact (each
            # derivation path appears exactly once per round); a fact already
            # in the store keeps its tag — re-deriving the same paths next
            # round must not re-accumulate evidence (matches the reference's
            # saturating tagged semi-naive, provenance_semi_naive.rs:210-330)
            # lazy mark + count = one action per round (r12, guide §1.2);
            # the running `facts` re-checkpoint below stays EAGER: it has
            # no paired probe and every rule consumes it next round, so a
            # lazy mark there would let sibling stages duplicate its
            # computation before the first persist lands
            new_facts = (
                derived.groupBy("s", "p", "o")
                .agg(semiring.plus_agg(F.col("tag")).alias("tag"))
                .join(facts.select("s", "p", "o"), on=["s", "p", "o"], how="left_anti")
                .localCheckpoint(eager=False)
            )
            if new_facts.count() == 0:
                break
            facts = facts.unionByName(new_facts).localCheckpoint(eager=True)
        return facts

    # ------------------------------------------------------- constraints
    def check_constraints(self) -> DataFrame:
        """Violations: instantiated conclusions of constraint rules."""
        out = None
        for c in self.constraints:
            d = apply_rule(self.facts, c)
            out = d if out is None else out.unionByName(d)
        if out is None:
            return self.spark.createDataFrame([], FACTS_SCHEMA)
        return out.dropDuplicates()

    def repair(self, max_removals: int = 4) -> list[set[tuple[str, str, str]]]:
        """Minimal repairs (reference semi_naive_with_repairs.rs:11 /
        reasoning.rs:132-186): smallest sets of base facts whose removal
        clears every constraint violation. Search runs driver-side over the
        facts that *support* violations (small by construction); candidate
        subsets are re-checked with the DataFrame pipeline."""
        import itertools

        violations = self.check_constraints()
        if violations.isEmpty():
            return []
        # support set: base facts matched by any constraint premise
        support: set[tuple[str, str, str]] = set()
        for c in self.constraints:
            for pat in c.premise:
                rows = _scan(self.facts, pat, tagged=False)
                # recover full triples for matched bindings
                matched = apply_rule(self.facts, Rule(premise=[pat], conclusion=[pat]))
                support |= {tuple(r) for r in matched.dropDuplicates().collect()}
        support_list = sorted(support)
        base = self.facts
        repairs: list[set] = []
        for k in range(1, max_removals + 1):
            for subset in itertools.combinations(support_list, k):
                if any(r <= set(subset) for r in repairs):
                    continue  # supersets of a found repair aren't minimal
                trial = Reasoner(self.spark)
                remove = self.spark.createDataFrame(list(subset), FACTS_SCHEMA)
                trial.facts = base.exceptAll(remove)
                trial.constraints = self.constraints
                if trial.check_constraints().isEmpty():
                    repairs.append(set(subset))
            if repairs:
                break  # all repairs of minimal cardinality found
        return repairs

    def materialize_with_repairs(self, max_iter: int = 50) -> DataFrame:
        """Inconsistency-tolerant materialization (reference
        semi_naive_with_repairs.rs:11): an inconsistent base is first
        replaced by its largest minimal repair (fewest removals,
        deterministic tie-break), then the semi-naive fixpoint runs while
        refusing derived facts that would (re)introduce a constraint
        violation.

        Divergence (documented): the reference admits candidate facts one
        at a time in HashSet iteration order — nondeterministic when two
        new facts violate jointly. Here every derived fact participating
        in a violation is dropped per round: deterministic and
        order-independent."""
        if not self.check_constraints().isEmpty():
            repairs = self.repair()
            if repairs:
                best = sorted(repairs, key=lambda r: (len(r), sorted(r)))[0]
                rm = self.spark.createDataFrame(sorted(best), FACTS_SCHEMA)
                self.facts = self.facts.join(
                    rm, on=["s", "p", "o"], how="left_anti"
                )
        facts = self.facts.localCheckpoint(eager=True)
        delta = facts
        for _ in range(max_iter):
            derived = None
            for rule in self.rules:
                d = apply_rule(facts, rule, delta=delta)
                derived = d if derived is None else derived.unionByName(d)
            if derived is None:
                break
            # lazy mark + count probes (r12, guide §1.2) — same fusion as
            # materialize(); both marks complete inside their count job
            new_delta = (
                derived.dropDuplicates()
                .join(facts, on=["s", "p", "o"], how="left_anti")
                .localCheckpoint(eager=False)
            )
            if new_delta.count() == 0:
                break
            candidate = facts.unionByName(new_delta)
            support = self._violation_support(candidate)
            if support is not None:
                new_delta = new_delta.join(
                    support, on=["s", "p", "o"], how="left_anti"
                ).localCheckpoint(eager=False)
                if new_delta.count() == 0:
                    break
            facts = facts.unionByName(new_delta)
            delta = new_delta
        self.facts = facts
        return facts

    def _violation_support(self, facts: DataFrame) -> DataFrame | None:
        """Facts instantiating any constraint premise within a violation
        binding over ``facts`` (None when there are no constraints)."""
        sup = None
        for c in self.constraints:
            scans = [_scan(facts, p, tagged=False) for p in c.premise]
            df = _join_premises(scans)
            df = _apply_filters(df, c.filters)
            df = _apply_negation(df, facts, c)
            inst = _instantiate(df, c.premise, None)
            sup = inst if sup is None else sup.unionByName(inst)
        return sup.dropDuplicates() if sup is not None else None

    # ------------------------------------------------------------- queries
    def query_abox(
        self, s: str | None = None, p: str | None = None, o: str | None = None
    ) -> list[tuple[str, str, str]]:
        """Triples matching the optional constants (reference
        python/src/py_knowledge_graph.rs::query_abox)."""
        df = self.facts
        for col, val in (("s", s), ("p", p), ("o", o)):
            if val is not None:
                df = df.filter(F.col(col) == val)
        return sorted(tuple(r) for r in df.dropDuplicates().collect())

    def query_with_repairs(self, pattern: TriplePattern) -> list[dict[str, str]]:
        """Inconsistency-tolerant query under IAR semantics (reference
        reasoning/repairs.rs:10): bindings that hold in EVERY minimal
        repair (facts minus one minimal removal set). A consistent store
        degenerates to a plain pattern query."""
        removals = self.repair()
        answer_sets: list[set] = []
        for removal in removals or [set()]:
            facts = self.facts
            if removal:
                rm = self.spark.createDataFrame(sorted(removal), FACTS_SCHEMA)
                facts = facts.join(rm, on=["s", "p", "o"], how="left_anti")
            rows = _scan(facts, pattern, tagged=False).dropDuplicates().collect()
            answer_sets.append({tuple(sorted(r.asDict().items())) for r in rows})
        common = set.intersection(*answer_sets) if answer_sets else set()
        return [dict(t) for t in sorted(common)]

    # -------------------------------------------------- backward chaining
    def backward_chain(
        self, goal: TriplePattern, max_depth: int = 8
    ) -> list[dict[str, str]]:
        """Goal-directed resolution returning bindings
        (reference reasoning/backward_chaining.rs:150). Driver-side control
        with DataFrame probes per subgoal — suitable for selective goals."""
        return self._solve(goal, {}, max_depth)

    def _solve(self, goal: TriplePattern, binding: dict, depth: int) -> list[dict]:
        if depth <= 0:
            return []
        g = self._substitute(goal, binding)
        results: list[dict] = []
        # facts matching the goal
        rows = _scan(self.facts, g, tagged=False).dropDuplicates().collect()
        for row in rows:
            results.append({**binding, **row.asDict()})
        if not any(isinstance(t, Var) for t in (g.s, g.p, g.o)):
            if rows:
                return [dict(binding)]
        # rules whose conclusion unifies with the goal
        for rule in self.rules:
            for concl in rule.conclusion:
                theta = self._unify(concl, g)
                if theta is None:
                    continue
                partials = [theta]
                for prem in rule.premise:
                    nxt: list[dict] = []
                    for b in partials:
                        nxt.extend(self._solve(prem, b, depth - 1))
                    partials = nxt
                    if not partials:
                        break
                for b in partials:
                    out = dict(binding)
                    for t_goal, t_concl in ((g.s, concl.s), (g.p, concl.p), (g.o, concl.o)):
                        if isinstance(t_goal, Var):
                            val = (
                                b.get(t_concl.name)
                                if isinstance(t_concl, Var)
                                else _term_value(t_concl)
                            )
                            if val is not None:
                                out[t_goal.name] = val
                    results.append(out)
        # dedup
        seen, uniq = set(), []
        for r in results:
            k = tuple(sorted(r.items()))
            if k not in seen:
                seen.add(k)
                uniq.append(r)
        return uniq

    @staticmethod
    def _substitute(pat: TriplePattern, binding: dict) -> TriplePattern:
        def sub(t):
            if isinstance(t, Var) and t.name in binding:
                return Lit(binding[t.name])
            return t

        return TriplePattern(sub(pat.s), sub(pat.p), sub(pat.o))

    @staticmethod
    def _unify(concl: TriplePattern, goal: TriplePattern) -> dict | None:
        """Bindings for the rule's variables from the goal's constants."""
        theta: dict[str, str] = {}
        for tc, tg in ((concl.s, goal.s), (concl.p, goal.p), (concl.o, goal.o)):
            if isinstance(tc, Var):
                if not isinstance(tg, Var):
                    val = _term_value(tg)
                    if tc.name in theta and theta[tc.name] != val:
                        return None
                    theta[tc.name] = val
            else:
                if not isinstance(tg, Var) and _term_value(tc) != _term_value(tg):
                    return None
        return theta
