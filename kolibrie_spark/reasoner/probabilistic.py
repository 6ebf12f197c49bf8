"""Probabilistic evaluation over derivation lineages (reference "hybrid"
layer: shared/src/hybrid.rs:375-760 lineage DAG + certified top-k lower
bounds, shared/src/sdd.rs exact weighted model counting;
datalog/src/reasoning/materialisation/hybrid_materialisation.rs:25-177).

Design per SURVEY §2.10: this is compute-on-small-data — seeds are few
(probabilistic ground facts), so lineage tracking and model counting run
driver-side while the deterministic bulk of the data stays in DataFrames.

- Lineage: AND/OR DAG over seed ids, built during forward chaining (each
  derivation = AND of premise lineages; alternative derivations = OR).
- exact(): weighted model counting by enumeration over the involved seed
  variables (exact for correlated derivations — shared seeds are handled
  properly, unlike a noisy-OR approximation). Capped at 25 variables, the
  role the reference's SDD compiler plays at larger scale.
- topk_lower_bound(): probability of the union of the k most probable
  derivation paths, computed exactly over their (small) seed set — a
  certified lower bound that converges to exact() as k grows
  (hybrid.rs top-k escalation semantics).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

from kolibrie_spark.reasoner.rule import Rule
from kolibrie_spark.sparql.ast import Iri, Lit, TriplePattern, Var

Triple = tuple[str, str, str]


@dataclass(frozen=True)
class Seed:
    id: Triple


@dataclass(frozen=True)
class And:
    parts: tuple


@dataclass(frozen=True)
class Or:
    parts: tuple


@dataclass(frozen=True)
class Not:
    """Negation-as-failure over a probabilistic lineage (reference
    LineageNode::Not, hybrid.rs:390): the derivation holds in worlds where
    the negated fact is NOT derivable. Top-k refuses negated lineages
    (NegationRequiresExact); the exact counter handles them via signed
    literals."""

    inner: "Lineage"


Lineage = Seed | And | Or | Not


def _absorb(paths) -> list[frozenset[Triple]]:
    """Dedupe + drop supersets (absorption law for monotone DNF)."""
    uniq = sorted(set(paths), key=len)
    kept: list[frozenset[Triple]] = []
    for p in uniq:
        if not any(q <= p for q in kept):
            kept.append(p)
    return kept


def has_negation(lin: Lineage | None) -> bool:
    if lin is None or isinstance(lin, Seed):
        return False
    if isinstance(lin, Not):
        return True
    return any(has_negation(p) for p in lin.parts)


def _signed_absorb(paths) -> list[frozenset]:
    """Absorption over SIGNED literal sets ((triple, polarity)): drop
    inconsistent paths (v asserted both ways) and supersets."""
    consistent = []
    for p in set(paths):
        vars_ = [v for v, _pol in p]
        if len(vars_) == len(set(vars_)):
            consistent.append(p)
    kept: list[frozenset] = []
    for p in sorted(consistent, key=len):
        if not any(q <= p for q in kept):
            kept.append(p)
    return kept


def signed_paths(lin: Lineage) -> list[frozenset]:
    """DNF over signed literals ((triple, True/False)) — handles Not by
    De Morgan expansion (¬(∨ paths) = ∧ ¬path, distributed back to DNF
    with absorption at every step)."""
    memo: dict[int, list[frozenset]] = {}

    def go(node: Lineage) -> list[frozenset]:
        if isinstance(node, Seed):
            return [frozenset([(node.id, True)])]
        hit = memo.get(id(node))
        if hit is not None:
            return hit
        if isinstance(node, And):
            acc = [frozenset()]
            for part in node.parts:
                acc = _signed_absorb(a | b for a in acc for b in go(part))
            out = acc
        elif isinstance(node, Or):
            collected: list[frozenset] = []
            for part in node.parts:
                collected.extend(go(part))
            out = _signed_absorb(collected)
        else:  # Not
            inner = go(node.inner)
            acc = [frozenset()]
            for p in inner:  # ∧ over ¬path; ¬path = ∨ of flipped literals
                acc = _signed_absorb(
                    a | {(v, not pol)} for a in acc for (v, pol) in p
                )
                if not acc:
                    break
            out = acc
        memo[id(node)] = out
        return out

    return go(lin)


def _paths(lin: Lineage) -> list[frozenset[Triple]]:
    """DNF: each path is the seed set of one derivation.

    Absorption is applied at EVERY And/Or combination step, not just at the
    end — a deep derivation DAG (e.g. a transitive chain, whose fact has
    Catalan-many derivation trees that all collapse to the same seed set)
    would otherwise expand exponentially before dedup. Shared sub-lineages
    are memoized by identity (the evaluator reuses lineage objects)."""
    memo: dict[int, list[frozenset[Triple]]] = {}

    def go(node: Lineage) -> list[frozenset[Triple]]:
        if isinstance(node, Seed):
            return [frozenset([node.id])]
        hit = memo.get(id(node))
        if hit is not None:
            return hit
        if isinstance(node, And):
            acc = [frozenset()]
            for part in node.parts:
                acc = _absorb(a | b for a in acc for b in go(part))
            out = acc
        else:
            collected: list[frozenset[Triple]] = []
            for part in node.parts:
                collected.extend(go(part))
            out = _absorb(collected)
        memo[id(node)] = out
        return out

    return go(lin)


def union_probability(paths: list[frozenset[Triple]], seeds: dict[Triple, float]) -> float:
    """Exact P(path1 ∨ path2 ∨ ...) — delegated to the Shannon-expansion
    weighted model counter (reasoner/hybrid.py), which has no variable-count
    cap (the round-1 25-variable enumeration limit is gone; time/node budgets
    bound the work instead, matching the reference's SDD escalation role)."""
    from kolibrie_spark.reasoner.hybrid import exact_wmc

    return exact_wmc(paths, seeds)


def union_probability_enumerated(
    paths: list[frozenset[Triple]], seeds: dict[Triple, float]
) -> float:
    """Brute-force 2^n enumeration — kept as the differential-test oracle
    for exact_wmc (small variable counts only)."""
    if not paths:
        return 0.0
    vars_ = sorted(set().union(*paths))
    total = 0.0
    for assignment in itertools.product([False, True], repeat=len(vars_)):
        world = dict(zip(vars_, assignment))
        if any(all(world[v] for v in p) for p in paths):
            w = 1.0
            for v, val in world.items():
                w *= seeds[v] if val else 1.0 - seeds[v]
            total += w
    return total


def _cmp_values(lhs: str, op: str, rhs: str) -> bool:
    """Numeric-else-lexical comparison, matching compare.compare."""
    try:
        a, b = float(lhs), float(rhs)
    except (TypeError, ValueError):
        a, b = lhs, rhs
    return {
        "=": a == b, "!=": a != b, "<": a < b,
        "<=": a <= b, ">": a > b, ">=": a >= b,
    }[op]


def _passes_filters(binding: dict, filters) -> bool:
    """Conjunction of plain conditions; same-or_group conditions OR."""
    groups: dict[int, bool] = {}
    for f in filters:
        ok = f.variable in binding and _cmp_values(binding[f.variable], f.operator, f.value)
        if f.or_group is None:
            if not ok:
                return False
        else:
            groups[f.or_group] = groups.get(f.or_group, False) or ok
    return all(groups.values())


class HybridEvaluator:
    """Forward chaining with lineage over probabilistic seeds."""

    def __init__(self, seeds: dict[Triple, float], rules: list[Rule],
                 deterministic_facts: set[Triple] | None = None,
                 exclusive_groups: dict[Triple, int] | None = None):
        self.seeds = dict(seeds)
        self.groups = dict(exclusive_groups or {})
        self.rules = rules
        self.facts: dict[Triple, Lineage | None] = {
            t: Seed(t) for t in seeds
        }
        for t in deterministic_facts or set():
            self.facts.setdefault(t, None)  # None lineage = certain
        self._initial: set[Triple] = set(self.facts)

    def inferred(self) -> list[Triple]:
        """Facts derived by materialize() beyond the seeds/deterministic base."""
        return [t for t in self.facts if t not in self._initial]

    # ------------------------------------------------------ materialization
    def materialize(self, max_iter: int = 20) -> dict[Triple, Lineage | None]:
        for _ in range(max_iter):
            changed = False
            for rule in self.rules:
                for binding, premises, negs in self._match(rule):
                    for concl in rule.conclusion:
                        fact = self._instantiate(concl, binding)
                        if fact is None or fact in self.seeds:
                            continue
                        lin = self._and_of(premises, negs)
                        prev = self.facts.get(fact, "absent")
                        new = self._merge(prev if prev != "absent" else None, lin,
                                          absent=prev == "absent")
                        if prev == "absent" or new != prev:
                            self.facts[fact] = new
                            changed = True
            if not changed:
                break
        return self.facts

    def _and_of(
        self, premises: list[Triple], negs: tuple = ()
    ) -> Lineage | None:
        parts = []
        for t in premises:
            lin = self.facts[t]
            if lin is not None:
                parts.append(lin)
        parts.extend(negs)  # Not(...) parts from probabilistic NAF
        if not parts:
            return None  # all premises certain
        if len(parts) == 1:
            return parts[0]
        return And(tuple(parts))

    @staticmethod
    def _merge(old: Lineage | None, new: Lineage | None, absent: bool) -> Lineage | None:
        if absent:
            return new
        if old is None or new is None:
            return None  # a certain derivation wins
        olds = old.parts if isinstance(old, Or) else (old,)
        if new in olds:
            return old
        return Or(tuple(olds) + (new,))

    def _match(self, rule: Rule):
        """All bindings of the positive premise over current facts, with the
        premise instances that support each binding."""
        results: list[tuple[dict, list[Triple]]] = [({}, [])]
        fact_list = list(self.facts.keys())
        for pat in rule.premise:
            nxt = []
            for binding, used in results:
                for t in fact_list:
                    b2 = self._unify_fact(pat, t, binding)
                    if b2 is not None:
                        nxt.append((b2, used + [t]))
            results = nxt
            if not results:
                return []
        # FILTER conditions prune bindings with the numeric-else-lexical
        # comparison the SPARQL layer uses (the reference's datalog
        # evaluator coerces non-numeric operands to 0.0 and skips OR'ed
        # conditions, rules.rs:133-163 — not mirrored)
        if rule.filters:
            results = [
                (b, used) for b, used in results if _passes_filters(b, rule.filters)
            ]
        # negation-as-failure: a negated match on a CERTAIN fact kills the
        # binding (reference deterministic view); a match on a
        # PROBABILISTIC fact contributes a Not(lineage) part instead — the
        # derivation holds only in worlds where that fact is absent
        # (reference LineageNode::Not)
        out = []
        for binding, used in results:
            ok = True
            negs: list[Not] = []
            for neg in rule.negative_premise:
                inst = self._instantiate(neg, binding)
                if inst is not None and inst in self.facts:
                    lin = self.facts[inst]
                    if lin is None:
                        ok = False
                        break
                    negs.append(Not(lin))
            if ok:
                out.append((binding, used, tuple(negs)))
        return out

    @staticmethod
    def _unify_fact(pat: TriplePattern, fact: Triple, binding: dict) -> dict | None:
        b = dict(binding)
        for term, val in zip((pat.s, pat.p, pat.o), fact):
            if isinstance(term, Var):
                if b.get(term.name, val) != val:
                    return None
                b[term.name] = val
            elif isinstance(term, (Iri, Lit)):
                if term.value != val:
                    return None
            else:
                return None
        return b

    @staticmethod
    def _instantiate(pat: TriplePattern, binding: dict) -> Triple | None:
        out = []
        for term in (pat.s, pat.p, pat.o):
            if isinstance(term, Var):
                if term.name not in binding:
                    return None
                out.append(binding[term.name])
            else:
                out.append(term.value)
        return tuple(out)

    # ----------------------------------------------------------- queries
    def probability(self, fact: Triple) -> float:
        """Exact probability (the reference's escalated-exact path);
        negated lineages go through the signed-literal DNF."""
        from kolibrie_spark.reasoner.hybrid import exact_wmc

        if fact not in self.facts:
            return 0.0
        lin = self.facts[fact]
        if lin is None:
            return 1.0
        paths = signed_paths(lin) if has_negation(lin) else _paths(lin)
        return exact_wmc(paths, self.seeds, groups=self.groups or None)

    def proof_count(self, fact: Triple) -> int:
        """Number of distinct derivations (DNF clauses after absorption) —
        the WMC tag store's prob:proofCount (tag_store.rs:119-143,
        ``formula.len()``).  Certain facts have 0 explicit proofs."""
        lin = self.facts.get(fact)
        if lin is None:
            return 0
        return len(signed_paths(lin) if has_negation(lin) else _paths(lin))

    def model_count(self, fact: Triple) -> int:
        """Number of satisfying assignments of the lineage over its own
        seed variables — the SDD tag store's prob:proofCount
        (tag_store.rs:186-240, ``enumerate_models(sdd_id).len()``)."""
        lin = self.facts.get(fact)
        if lin is None:
            return 0
        paths = signed_paths(lin) if has_negation(lin) else [
            frozenset((t, True) for t in p) for p in _paths(lin)
        ]
        vars_ = sorted({v for p in paths for (v, _pol) in p})
        if len(vars_) > 24:
            raise ValueError(
                f"model_count over {len(vars_)} seed vars would enumerate "
                f"2^{len(vars_)} assignments; use probability() instead"
            )
        count = 0
        for mask in range(1 << len(vars_)):
            assign = {v: bool(mask >> i & 1) for i, v in enumerate(vars_)}
            if any(all(assign[v] == pol for (v, pol) in p) for p in paths):
                count += 1
        return count

    def topk_lower_bound(self, fact: Triple, k: int = 3) -> float:
        """Certified lower bound from the k most probable derivations
        (hybrid.rs top-k path); equals exact() once k covers all paths."""
        if fact not in self.facts:
            return 0.0
        lin = self.facts[fact]
        if lin is None:
            return 1.0
        if has_negation(lin):
            # negation requires exact (reference NegationRequiresExact);
            # the exact value is trivially a certified lower bound
            return self.probability(fact)
        paths = _paths(lin)

        def path_prob(p: frozenset[Triple]) -> float:
            v = 1.0
            for t in p:
                v *= self.seeds[t]
            return v

        top = sorted(paths, key=path_prob, reverse=True)[:k]
        return union_probability(top, self.seeds)

    def evaluate(self, fact: Triple, config=None, clock=None):
        """Full hybrid escalation (reference evaluate_hybrid,
        hybrid.rs:1415-1589): certified top-k at growing k, then exact WMC
        under budgets. Returns a HybridResult."""
        import time as _time

        from kolibrie_spark.reasoner.hybrid import (
            HybridConfig,
            HybridResult,
            evaluate_hybrid,
        )

        cfg = config or HybridConfig()
        clk = clock or _time.monotonic
        if fact not in self.facts:
            return HybridResult(
                "Exact", "NoAlert" if cfg.threshold > 0 else "Alert",
                "top-k-exhausted", 0.0,
            )
        return evaluate_hybrid(
            self.facts[fact], self.seeds, cfg, clk, groups=self.groups or None
        )
