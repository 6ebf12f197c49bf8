"""Hybrid probabilistic evaluation: certified top-k lower bounds escalating
to exact weighted model counting under budgets.

Reference semantics: shared/src/hybrid.rs:375-760 (lineage DAG, best-first
proof enumeration, HybridConfig, escalation controller), shared/src/sdd.rs
(exact WMC compiler), kolibrie/src/parser.rs:2845-3095 (PROB(...) grammar),
shared/src/hybrid.rs:1591-1650 (RDF-star result annotations).

Public-knowledge algorithms, re-implemented from scratch:

- **Proof enumeration** — best-first search over the AND/OR lineage with an
  admissible upper bound (product of seed probabilities of the partial
  proof), subsumption pruning, and residual frontier mass for certified
  intervals.
- **Exact WMC** — Shannon expansion over the DNF proof set with
  memoization and independent-component factorization (for a monotone DNF,
  variable-disjoint components combine as 1 - prod(1 - P_c)). This plays
  the role of the reference's SDD compiler: exact for correlated proofs
  (shared seeds), with *time and node budgets* instead of a variable-count
  cap.
- **Escalation policy** (matching hybrid.rs evaluate_hybrid_controlled):
  run top-k at growing k; stop early when the frontier is exhausted
  (Exact), the lower bound crosses the threshold (Alert), or the interval
  upper bound falls below it (NoAlert); keep growing k only while the
  bound is within band_epsilon of the threshold or still climbing by at
  least marginal_gain_floor; then fall through to exact WMC under its own
  budgets. Reason strings mirror the reference's (``exact-sdd`` here means
  "the exact counter", which for us is the memoized Shannon expansion).
"""

from __future__ import annotations

import math
import re
import time
from dataclasses import dataclass, field, replace

Triple = tuple[str, str, str]


# ------------------------------------------------------------------ config
@dataclass
class HybridConfig:
    """Mirrors shared/src/hybrid.rs:661-689 (defaults included)."""

    threshold: float = 0.5
    threshold_policy: str = "explicit"  # "explicit" | "auto:cost"
    band_epsilon: float = 0.02
    marginal_gain_floor: float = 1e-4
    k_initial: int = 8
    k_max: int = 64
    k_growth: int = 2
    topk_budget_ms: float = 25.0
    sdd_budget_ms: float = 250.0
    sdd_node_budget: int = 100_000

    def validate(self) -> None:
        if not (math.isfinite(self.threshold) and 0.0 <= self.threshold <= 1.0):
            raise ValueError("threshold must be in [0, 1]")
        if not (math.isfinite(self.band_epsilon) and 0.0 <= self.band_epsilon <= 1.0):
            raise ValueError("band_epsilon must be in [0, 1]")
        if self.marginal_gain_floor < 0.0:
            raise ValueError("marginal_gain_floor must be non-negative")
        if self.k_initial < 1 or self.k_max < self.k_initial:
            raise ValueError("need 1 <= k_initial <= k_max")
        if self.k_growth < 2:
            raise ValueError("k_growth must be at least 2")
        if self.topk_budget_ms <= 0 or self.sdd_budget_ms <= 0 or self.sdd_node_budget < 2:
            raise ValueError("budgets must be positive")


# ------------------------------------------------------------ PROB grammar
@dataclass
class ProbAnnotation:
    """Parsed ``PROB(provenance=..., threshold=..., ...)`` rule annotation
    (reference query.rs:292-299 + parser.rs:2932-3095). ``combination``
    keeps the legacy alias (``combination=`` and ``provenance=`` are the
    same key)."""

    combination: str = "independent"
    threshold: float | None = None
    confidence: float | None = None
    hybrid_config: HybridConfig | None = None


_HYBRID_KEYS = {
    "combination", "provenance", "threshold", "band_epsilon", "marginal_floor",
    "k_initial", "k_max", "k_growth", "topk_budget_ms", "sdd_budget_ms",
    "node_budget",
}


def _split_top_level_commas(text: str) -> list[str]:
    depth, start, out = 0, 0, []
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            if depth == 0:
                raise ValueError("unbalanced parentheses in PROB(...)")
            depth -= 1
        elif ch == "," and depth == 0:
            piece = text[start:i].strip()
            if not piece:
                raise ValueError("empty PROB(...) entry")
            out.append(piece)
            start = i + 1
    if depth != 0:
        raise ValueError("unbalanced parentheses in PROB(...)")
    tail = text[start:].strip()
    if tail:
        out.append(tail)
    elif text.strip():
        raise ValueError("trailing comma in PROB(...)")
    return out


def _parse_hybrid_threshold(value: str) -> tuple[float, str]:
    """Explicit float, or ``auto:cost(fp=...,fn=...)`` → fp/(fp+fn) with the
    cost-ratio policy (parser.rs:2897-2930)."""
    try:
        t = float(value)
    except ValueError:
        t = None
    if t is not None:
        if math.isfinite(t) and 0.0 <= t <= 1.0:
            return t, "explicit"
        raise ValueError("hybrid threshold must be in [0, 1]")
    m = re.fullmatch(r"auto:cost\((.*)\)", value.strip())
    if m is None:
        raise ValueError(f"bad hybrid threshold {value!r}")
    fp = fn = None
    for pair in _split_top_level_commas(m.group(1)):
        key, _, raw = pair.partition("=")
        v = float(raw.strip())
        if not math.isfinite(v) or v < 0.0:
            raise ValueError("auto:cost values must be non-negative")
        if key.strip() == "fp" and fp is None:
            fp = v
        elif key.strip() == "fn" and fn is None:
            fn = v
        else:
            raise ValueError(f"bad auto:cost key {key.strip()!r}")
    if fp is None or fn is None or fp + fn <= 0.0:
        raise ValueError("auto:cost needs fp and fn with fp+fn > 0")
    return fp / (fp + fn), "auto:cost"


def parse_prob_annotation(text: str) -> tuple[ProbAnnotation, str]:
    """Parse a leading ``PROB ( key=value, ... )``; returns (annotation,
    rest-of-text). Raises ValueError on malformed annotations."""
    m = re.match(r"\s*PROB\s*\(", text)
    if m is None:
        raise ValueError("expected PROB(")
    depth, i = 1, m.end()
    while i < len(text) and depth:
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise ValueError("unterminated PROB(")
    body, rest = text[m.end() : i - 1], text[i:]

    raw: dict[str, str] = {}
    unknown: list[str] = []
    ann = ProbAnnotation()
    for pair in _split_top_level_commas(body):
        key, eq, value = pair.partition("=")
        key, value = key.strip(), value.strip()
        if not eq or not key or not value or key in raw:
            raise ValueError(f"bad PROB entry {pair!r}")
        raw[key] = value
        if key in ("combination", "provenance"):
            ann.combination = value
        elif key == "confidence":
            try:
                ann.confidence = float(value)
            except ValueError:
                raise ValueError(f"bad PROB confidence {value!r}") from None
            if not math.isfinite(ann.confidence):
                raise ValueError(f"bad PROB confidence {value!r}")
        elif key not in _HYBRID_KEYS:
            unknown.append(key)

    # a typoed key (e.g. 'thresold=0.9') must not silently change rule
    # semantics — reject for EVERY combination, not just hybrid
    if unknown:
        raise ValueError(f"unknown PROB key(s): {', '.join(sorted(unknown))}")

    if "threshold" in raw:
        if ann.combination == "hybrid":
            ann.threshold, policy = _parse_hybrid_threshold(raw["threshold"])
        else:
            ann.threshold = float(raw["threshold"])
            if not math.isfinite(ann.threshold):
                raise ValueError("threshold must be finite")
            policy = "explicit"
    else:
        policy = "explicit"

    if ann.combination == "hybrid":
        if unknown or ann.confidence is not None:
            raise ValueError("PROB(provenance=hybrid) allows only hybrid keys")
        if ann.threshold is None:
            raise ValueError("PROB(provenance=hybrid) requires a threshold")
        cfg = HybridConfig(threshold=ann.threshold, threshold_policy=policy)
        for key, attr, typ in (
            ("band_epsilon", "band_epsilon", float),
            ("marginal_floor", "marginal_gain_floor", float),
            ("k_initial", "k_initial", int),
            ("k_max", "k_max", int),
            ("k_growth", "k_growth", int),
            ("topk_budget_ms", "topk_budget_ms", float),
            ("sdd_budget_ms", "sdd_budget_ms", float),
            ("node_budget", "sdd_node_budget", int),
        ):
            if key in raw:
                setattr(cfg, attr, typ(raw[key]))
        cfg.validate()
        ann.hybrid_config = cfg
    return ann, rest


# ----------------------------------------------------------- rule validation
def validate_hybrid_rules(rules) -> None:
    """Reject predicate dependency cycles before lineage materialization —
    deliberately conservative, like the reference
    (hybrid_materialisation.rs:79-133). Raises ValueError (message contains
    'recursion') on a cycle or a non-constant premise/conclusion predicate."""
    from kolibrie_spark.sparql.ast import Var

    graph: dict[str, set[str]] = {}
    for rule in rules:
        def pred_of(pat):
            if isinstance(pat.p, Var):
                raise ValueError(
                    f"variable predicate ?{pat.p.name} prevents acyclic "
                    "dependency analysis"
                )
            return pat.p.value

        heads = [pred_of(p) for p in rule.conclusion]
        bodies = [pred_of(p) for p in list(rule.premise) + list(rule.negative_premise)]
        for b in bodies:
            for h in heads:
                graph.setdefault(b, set()).add(h)
                graph.setdefault(h, set())

    visiting: set[str] = set()
    visited: set[str] = set()

    def visit(node: str) -> bool:
        if node in visited:
            return False
        if node in visiting:
            return True
        visiting.add(node)
        if any(visit(child) for child in graph.get(node, ())):
            return True
        visiting.discard(node)
        visited.add(node)
        return False

    for node in list(graph):
        if visit(node):
            raise ValueError(
                f"unsupported recursion: predicate dependency cycle includes {node!r}"
            )


# -------------------------------------------------------- proof enumeration
def _proof_probability(proof: frozenset, seeds: dict) -> float:
    v = 1.0
    for t in proof:
        v *= seeds[t]
    return v


def enumerate_proofs(lin, seeds: dict, cap: int, deadline: float | None, clock):
    """Best-first enumeration of minimal proofs (seed sets) of the AND/OR
    lineage, most probable first (hybrid.rs:984-1075).

    Returns (proofs, residual) where residual is the certified mass left on
    the frontier: 0.0 when exhausted, a clamped float when capped, or None
    when the deadline was hit (interval unknown)."""
    import heapq

    from kolibrie_spark.reasoner.probabilistic import And, Or, Seed

    seq = 0
    # heap entries: (-upper_bound, seq, pending_nodes, proof)
    frontier = [(-1.0, seq, [lin], frozenset())]
    emitted: list[frozenset] = []
    seen: set = set()  # (proof, pending-ids) states already expanded
    while frontier:
        if deadline is not None and clock() >= deadline:
            return emitted, None
        neg_upper, _, pending, proof = heapq.heappop(frontier)
        state_key = (proof, tuple(id(n) for n in pending))
        if state_key in seen:
            continue  # shared sub-lineages produce identical states
        seen.add(state_key)
        if not pending:
            if any(e <= proof for e in emitted):
                continue  # subsumed by an already-emitted (cheaper) proof
            emitted[:] = [e for e in emitted if not proof <= e]
            emitted.append(proof)
            if len(emitted) == cap:
                residual = min(1.0, max(0.0, sum(-u for u, *_ in frontier)))
                return emitted, residual
            continue
        node = pending[-1]
        rest = pending[:-1]
        if isinstance(node, Seed):
            p2 = proof | {node.id}
            seq += 1
            heapq.heappush(
                frontier, (-_proof_probability(p2, seeds), seq, rest, p2)
            )
        elif isinstance(node, And):
            seq += 1
            heapq.heappush(
                frontier, (neg_upper, seq, rest + list(reversed(node.parts)), proof)
            )
        elif isinstance(node, Or):
            for part in node.parts:
                seq += 1
                heapq.heappush(frontier, (neg_upper, seq, rest + [part], proof))
        else:
            raise TypeError(f"unknown lineage node {node!r}")
    return emitted, 0.0


# ----------------------------------------------------------------- exact WMC
class WmcBudgetExceeded(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason  # "sdd-budget" | "sdd-node-budget"


def _norm_lit(l):
    """Normalize a literal: plain seed triples become (triple, True);
    (triple, bool) pairs pass through — exact_wmc accepts both plain DNF
    paths (monotone lineages) and SIGNED paths from
    probabilistic.signed_paths (lineages with Not nodes)."""
    if isinstance(l, tuple) and len(l) == 2 and isinstance(l[1], bool):
        return l
    return (l, True)


def exact_wmc(
    paths: list[frozenset],
    seeds: dict,
    deadline: float | None = None,
    node_budget: int | None = None,
    clock=time.monotonic,
    groups: dict | None = None,
) -> float:
    """Exact P(path₁ ∨ path₂ ∨ ...) for independent seeds — correct for
    correlated paths (shared variables). Shannon expansion with memoization
    plus independent-component factorization; no variable-count cap, the
    budgets bound the work instead (the reference's SDD compiler role).

    Literals may be plain seed triples or signed ``(triple, polarity)``
    pairs (negation-as-failure lineages, reference LineageNode::Not —
    P(¬v) = 1 - P(v) with full correlation handling).

    ``groups`` maps seed → exclusive-group id (reference
    SeedKind::ExclusiveGroup, sdd.rs annotated-disjunction encoding):
    members of one group are mutually exclusive with EXACTLY ONE chosen —
    branching selects a member (weight p_m, other members false) or, with
    residual mass 1 - Σ p_present, a member no path references."""
    from kolibrie_spark.reasoner.probabilistic import _signed_absorb

    signed = [frozenset(_norm_lit(l) for l in p) for p in paths]
    kept = _signed_absorb(signed)
    if not kept:
        return 0.0
    if frozenset() in kept:
        return 1.0

    memo: dict[frozenset, float] = {}
    nodes = 0

    def _absorbed(ps) -> frozenset:
        return frozenset(_signed_absorb(ps))

    def _cond(pset, var, value: bool):
        """Condition the DNF on var=value: satisfied literals vanish,
        contradicted literals kill their path. Returns (paths, sat) where
        sat means some path became empty (formula true)."""
        out = set()
        for p in pset:
            if (var, not value) in p:
                continue  # contradicted literal → path false
            p2 = p - {(var, value)}
            if not p2:
                return None, True
            out.add(p2)
        return _absorbed(out), False

    def solve(pset: frozenset) -> float:
        nonlocal nodes
        if not pset:
            return 0.0
        if frozenset() in pset:
            return 1.0
        cached = memo.get(pset)
        if cached is not None:
            return cached
        nodes += 1
        if node_budget is not None and nodes > node_budget:
            raise WmcBudgetExceeded("sdd-node-budget")
        if deadline is not None and nodes % 64 == 0 and clock() >= deadline:
            raise WmcBudgetExceeded("sdd-budget")

        # independent components: variable-disjoint path groups are
        # independent events → P(∨ all) = 1 - prod(1 - P_component)
        comps = _components(pset)
        if len(comps) > 1:
            out = 1.0
            for comp in comps:
                out *= 1.0 - solve(frozenset(comp))
            out = 1.0 - out
            memo[pset] = out
            return out

        # Shannon on the most shared variable
        counts: dict = {}
        for p in pset:
            for v, _pol in p:
                counts[v] = counts.get(v, 0) + 1
        var = max(counts, key=lambda v: (counts[v], v))

        if groups and var in groups:
            # exclusive branch: exactly one member of the group holds
            gid = groups[var]
            members = sorted({v for v in counts if groups.get(v) == gid})
            referenced = set(members)
            out = 0.0
            for m in members:
                cond = set()
                sat = False
                for p in pset:
                    p2 = set()
                    dead = False
                    for (v, pol) in p:
                        if groups.get(v) != gid:
                            p2.add((v, pol))
                        elif v == m:
                            if not pol:  # ¬m while m chosen → false
                                dead = True
                                break
                        else:  # another member: false under choice m
                            if pol:
                                dead = True
                                break
                    if dead:
                        continue
                    if not p2:
                        sat = True
                        break
                    cond.add(frozenset(p2))
                out += seeds[m] * (1.0 if sat else solve(_absorbed(cond)))
            residual = 1.0 - sum(seeds[m] for m in members)
            if residual > 1e-15:
                # an unreferenced member was chosen: every referenced
                # member is false — positive literals die, negated ones hold
                cond = set()
                sat = False
                for p in pset:
                    p2 = {
                        (v, pol) for (v, pol) in p if groups.get(v) != gid
                    }
                    if any(
                        pol for (v, pol) in p if groups.get(v) == gid
                    ):
                        continue
                    if not p2:
                        sat = True
                        break
                    cond.add(frozenset(p2))
                out += residual * (1.0 if sat else solve(_absorbed(cond)))
            out = min(1.0, max(0.0, out))
            memo[pset] = out
            return out

        pv = seeds[var]
        pos, sat = _cond(pset, var, True)
        p_true = 1.0 if sat else solve(pos)
        neg, sat = _cond(pset, var, False)
        p_false = 1.0 if sat else solve(neg)
        out = pv * p_true + (1.0 - pv) * p_false
        memo[pset] = out
        return out

    def _components(pset: frozenset) -> list[list[frozenset]]:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        plist = list(pset)
        for i in range(len(plist)):
            parent[i] = i
        var_owner: dict = {}
        for i, p in enumerate(plist):
            for v, _pol in p:
                # exclusive-group members are dependent even without a
                # shared variable — key them by group so their paths merge
                key = ("__grp", groups[v]) if groups and v in groups else v
                if key in var_owner:
                    ra, rb = find(var_owner[key]), find(i)
                    if ra != rb:
                        parent[ra] = rb
                else:
                    var_owner[key] = i
        comps_out: dict = {}
        for i, p in enumerate(plist):
            comps_out.setdefault(find(i), []).append(p)
        return list(comps_out.values())

    return solve(frozenset(kept))


# ------------------------------------------------------------------ results
@dataclass
class HybridResult:
    """Mirrors HybridProbabilityResult (hybrid.rs:839-930): status ∈
    {Exact, Bounded, NeedsExact}, decision ∈ {Alert, NoAlert,
    Indeterminate}, reference reason strings."""

    status: str
    decision: str
    reason: str
    probability: float | None = None
    lower: float | None = None
    upper: float | None = None
    metrics: dict = field(default_factory=dict)

    def interval(self) -> tuple[float, float] | None:
        if self.status == "Exact":
            return (self.probability, self.probability)
        if self.lower is not None and self.upper is not None:
            return (self.lower, self.upper)
        return None

    def value(self) -> float:
        """Best point estimate (exact value or certified lower bound)."""
        if self.probability is not None:
            return self.probability
        return self.lower or 0.0


def wmc_gradient(
    paths: list[frozenset],
    seeds: dict,
    groups: dict | None = None,
    deadline: float | None = None,
    node_budget: int | None = None,
    clock=time.monotonic,
) -> dict:
    """∂ exact_wmc / ∂ p_seed for every seed the lineage references —
    the differentiable-WMC primitive behind neural fact seeding
    (reference shared/src/diff_sdd.rs:15-46 wmc_gradient; changes.txt
    0.2.0 items 36/42/91).

    exact_wmc is MULTILINEAR in each independent seed's probability, so
    the derivative is exact from two conditioned evaluations:
    ``WMC(p_v=1) − WMC(p_v=0)`` (the reference's VarKind::Independent
    arm).  For an exclusive-group member the annotated disjunction gives
    ``WMC = Σ_m p_m·P(φ|m) + (1−Σp)·P(φ|none)``, hence
    ``∂/∂p_v = P(φ|v) − P(φ|none)`` — conditioned by steering the group
    weights (v=1/others=0, then all=0 for the residual branch).  The
    reference's ExclusiveGroup arm returns only the A_v term because its
    SDD encoding has an explicit exactly-one selector with no residual
    mass; ours carries the none-branch, so the exact derivative keeps
    both terms.  Gradients below 1e-15 are dropped, as there
    (diff_sdd.rs:42-44)."""
    referenced = {_norm_lit(l)[0] for p in paths for l in p}
    kw = dict(deadline=deadline, node_budget=node_budget, clock=clock, groups=groups)
    grads: dict = {}
    for v in referenced:
        if groups and v in groups:
            gid = groups[v]
            members = [m for m, g in groups.items() if g == gid]
            chosen = dict(seeds)
            for m in members:
                chosen[m] = 0.0
            chosen[v] = 1.0
            a_v = exact_wmc(paths, chosen, **kw)
            none = dict(seeds)
            for m in members:
                none[m] = 0.0
            grad = a_v - exact_wmc(paths, none, **kw)
        else:
            hi = dict(seeds)
            hi[v] = 1.0
            lo = dict(seeds)
            lo[v] = 0.0
            grad = exact_wmc(paths, hi, **kw) - exact_wmc(paths, lo, **kw)
        if abs(grad) > 1e-15:
            grads[v] = grad
    return grads


def _decide(p: float, threshold: float) -> str:
    return "Alert" if p >= threshold else "NoAlert"


def _lineage_seeds(lin, out: set) -> set:
    from kolibrie_spark.reasoner.probabilistic import And, Not, Or, Seed

    if isinstance(lin, Seed):
        out.add(lin.id)
    elif isinstance(lin, Not):
        _lineage_seeds(lin.inner, out)
    elif isinstance(lin, (And, Or)):
        for part in lin.parts:
            _lineage_seeds(part, out)
    return out


def evaluate_hybrid(
    lin,
    seeds: dict,
    config: HybridConfig,
    clock=time.monotonic,
    groups: dict | None = None,
) -> HybridResult:
    """The escalation controller (hybrid.rs:1415-1589): growing-k certified
    top-k, then exact WMC under budgets. Lineages touching an
    exclusive-group seed skip the top-k stage (the proof-mass bound assumes
    independence) and go straight to exact — the reference's
    ExclusivityRequiresExact policy (hybrid.rs:1185,1451)."""
    config.validate()
    metrics: dict = {
        "k_used": 0,
        "exact_used": False,
        "frontier_exhausted": False,
        "cap_hit": False,
        "marginal_gain": 0.0,
        "effective_threshold": config.threshold,
        "threshold_policy": config.threshold_policy,
        "interval_width": None,
        "wmc_nodes": 0,
    }
    if lin is None:  # certain fact (no probabilistic lineage)
        return HybridResult(
            "Exact", _decide(1.0, config.threshold), "top-k-exhausted", 1.0,
            metrics=metrics,
        )

    from kolibrie_spark.reasoner.probabilistic import has_negation, signed_paths

    topk_start = clock()
    topk_deadline = topk_start + config.topk_budget_ms / 1000.0
    lower = None
    last_interval = None
    k = config.k_initial
    negated = has_negation(lin)
    supported_topk = not negated and not (
        groups and any(s in groups for s in _lineage_seeds(lin, set()))
    )
    while supported_topk:
        proofs, residual = enumerate_proofs(lin, seeds, k + 1, topk_deadline, clock)
        if residual is None:  # deadline hit mid-enumeration
            break
        retained = proofs[:k]
        try:
            wmc = exact_wmc(
                retained, seeds, topk_deadline, config.sdd_node_budget, clock
            )
        except WmcBudgetExceeded:
            break
        lower = wmc
        metrics["k_used"] = len(retained)
        frontier_exhausted = residual == 0.0 and len(proofs) <= k
        metrics["frontier_exhausted"] = frontier_exhausted
        metrics["cap_hit"] = len(proofs) > k or not frontier_exhausted
        if len(proofs) > k:
            try:
                with_probe = exact_wmc(
                    proofs[: k + 1], seeds, topk_deadline,
                    config.sdd_node_budget, clock,
                )
                metrics["marginal_gain"] = max(0.0, with_probe - wmc)
            except WmcBudgetExceeded:
                metrics["marginal_gain"] = 0.0
        else:
            metrics["marginal_gain"] = 0.0
        probe_mass = sum(_proof_probability(p, seeds) for p in proofs[k:])
        upper = min(1.0, max(wmc, wmc + probe_mass + residual))
        last_interval = (wmc, upper)
        metrics["interval_width"] = upper - wmc

        if frontier_exhausted:
            metrics["topk_latency_s"] = clock() - topk_start
            return HybridResult(
                "Exact", _decide(wmc, config.threshold), "top-k-exhausted",
                wmc, metrics=metrics,
            )
        if wmc >= config.threshold:
            metrics["topk_latency_s"] = clock() - topk_start
            return HybridResult(
                "Bounded", "Alert", "lower-bound-crossed-threshold",
                lower=wmc, upper=upper, metrics=metrics,
            )
        if upper < config.threshold:
            metrics["topk_latency_s"] = clock() - topk_start
            return HybridResult(
                "Bounded", "NoAlert", "upper-bound-below-threshold",
                lower=wmc, upper=upper, metrics=metrics,
            )
        near = abs(config.threshold - wmc) <= config.band_epsilon
        climbing = metrics["marginal_gain"] >= config.marginal_gain_floor
        if k >= config.k_max or (not near and not climbing) or clock() >= topk_deadline:
            break
        k = min(k * config.k_growth, config.k_max)
    metrics["topk_latency_s"] = clock() - topk_start

    # --------------------------------------------- exact (SDD-role) stage
    sdd_start = clock()
    sdd_deadline = sdd_start + config.sdd_budget_ms / 1000.0
    try:
        from kolibrie_spark.reasoner.probabilistic import _paths

        paths = signed_paths(lin) if negated else _paths(lin)
        probability = exact_wmc(
            paths, seeds, sdd_deadline, config.sdd_node_budget, clock, groups=groups
        )
        metrics["exact_used"] = True
        metrics["interval_width"] = 0.0
        metrics["sdd_latency_s"] = clock() - sdd_start
        return HybridResult(
            "Exact", _decide(probability, config.threshold), "exact-sdd",
            probability, metrics=metrics,
        )
    except WmcBudgetExceeded as e:
        metrics["exact_used"] = True
        metrics["sdd_latency_s"] = clock() - sdd_start
        return HybridResult(
            "NeedsExact", "Indeterminate", e.reason,
            lower=last_interval[0] if last_interval else lower,
            upper=last_interval[1] if last_interval else None,
            metrics=metrics,
        )


# ------------------------------------------------- RDF-star result encoding
PROB_NS = "http://www.w3.org/ns/prob#"


def annotate_results_rdfstar(store, results: dict[Triple, HybridResult]) -> None:
    """Write hybrid results into the store as RDF-star annotations
    (hybrid.rs:1591-1650 encode_hybrid_results_as_rdf_star): exact values
    and lower bounds deliberately use different predicates."""
    from pyspark.sql import functions as F

    from kolibrie_spark import rdfstar

    if not results:
        return
    rows = []
    for (s, p, o), r in results.items():
        anns = [
            ("status", r.status),
            ("decision", r.decision),
            ("reason", r.reason),
            ("kUsed", str(r.metrics.get("k_used", 0))),
            ("exactUsed", str(bool(r.metrics.get("exact_used"))).lower()),
            ("effectiveThreshold", repr(r.metrics.get("effective_threshold"))),
            ("thresholdPolicy", r.metrics.get("threshold_policy", "explicit")),
        ]
        if r.status == "Exact":
            anns.append(("value", repr(r.probability)))
        if r.lower is not None:
            anns.append(("lowerBound", repr(r.lower)))
        if r.upper is not None:
            anns.append(("upperBound", repr(r.upper)))
        for key, val in anns:
            rows.append((s, p, o, PROB_NS + key, val))
    spark = store.spark
    df = spark.createDataFrame(
        rows, "qs string, qp string, qo string, ap string, av string"
    )
    qid = rdfstar.qt_id_col(F.col("qs"), F.col("qp"), F.col("qo"))
    store.insert_quoted(df.select(qid.alias("qid"), "qs", "qp", "qo").dropDuplicates())
    store.insert(
        df.select(
            qid.alias("s"),
            F.col("ap").alias("p"),
            F.col("av").alias("o"),
            F.lit(None).cast("string").alias("g"),
        )
    )
