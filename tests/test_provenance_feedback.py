"""End-to-end port of the reference's provenance → neural → reasoning
feedback loop (kolibrie/examples/sparql_syntax/ml_train/
provenance_feedback_loop.rs), all five stages:

1. static sensor facts + probabilistic evidence seeds;
2. the two PROB(combination=sdd) risk rules run as ONE shared-lineage
   batch (execute_sdd_rule_batch parity) producing riskSignal facts with
   prob:value and prob:proofCount RDF-star annotations;
3. the SPARQL-star feature query over those annotations, materialized as
   numeric feature triples;
4. MODEL / NEURAL RELATION / TRAIN program (IRI output labels) trained on
   goldResponse, predictions materialized as predictedResponse facts;
5. the classical :OpenDispatchCase feedback rule joining riskSignal +
   predictedResponse against the dispatch policy.

Expected numbers are the exact lineage probabilities: sensor s1 risk =
P((t ∧ p) ∨ (h ∧ p)) = 0.95·(1 − 0.10·0.15) = 0.93575 with three
satisfying models; monitors (s4–s6) have a single conjunction proof.
"""

from __future__ import annotations

import pytest

from kolibrie_spark import SparqlEngine

EX = "http://example.org/"
PROB = "http://www.w3.org/ns/prob#"

SENSORS = {
    # id: (temp_prob, hr_prob, pressure_prob, gold_response)
    "s1": (0.90, 0.85, 0.95, "dispatch"),
    "s2": (0.88, 0.82, 0.92, "dispatch"),
    "s3": (0.86, 0.78, 0.94, "dispatch"),
    "s4": (0.58, None, 0.75, "monitor"),
    "s5": (None, 0.63, 0.72, "monitor"),
    "s6": (0.52, None, 0.78, "monitor"),
}


def _expected_risk(t, h, p):
    if t is not None and h is not None:
        return p * (1.0 - (1.0 - t) * (1.0 - h))
    return p * (t if t is not None else h)


def _seed(spark):
    e = SparqlEngine(spark)
    static = [
        (f"{EX}dispatchPolicy", f"{EX}requiredRisk", f"{EX}high"),
        (f"{EX}dispatchPolicy", f"{EX}requiredResponse", f"{EX}dispatch"),
    ]
    for sid, (t, h, p, gold) in SENSORS.items():
        s = f"{EX}sensor/{sid}"
        static += [(s, f"{EX}type", f"{EX}Sensor"), (s, f"{EX}goldResponse", f"{EX}{gold}")]
        if t is not None:
            e.add_tagged_triple(s, f"{EX}tempEvidence", "true", t)
        if h is not None:
            e.add_tagged_triple(s, f"{EX}hrEvidence", "true", h)
        e.add_tagged_triple(s, f"{EX}pressureEvidence", "true", p)
    e.add_triples(static)
    return e


RISK_RULES = [
    f"""PREFIX ex: <{EX}>

RULE :RiskFromTempPressure PROB(combination=sdd) :-
CONSTRUCT {{
    ?sensor ex:riskSignal ex:high .
}}
WHERE {{
    ?sensor ex:tempEvidence true .
    ?sensor ex:pressureEvidence true .
}}""",
    f"""PREFIX ex: <{EX}>

RULE :RiskFromHrPressure PROB(combination=sdd) :-
CONSTRUCT {{
    ?sensor ex:riskSignal ex:high .
}}
WHERE {{
    ?sensor ex:hrEvidence true .
    ?sensor ex:pressureEvidence true .
}}""",
]

FEATURE_QUERY = f"""PREFIX ex: <{EX}>
PREFIX prob: <{PROB}>

SELECT ?sensor ?riskProb ?proofCount WHERE {{
    << ?sensor ex:riskSignal ex:high >> prob:value ?riskProb .
    << ?sensor ex:riskSignal ex:high >> prob:proofCount ?proofCount .
}}
ORDER BY ?sensor"""


def test_provenance_feedback_loop(spark):
    e = _seed(spark)

    # --- [2/5] shared-lineage SDD rule batch
    inferred = e.register_rule_batch(RISK_RULES)
    assert {s for (s, _, _) in inferred} == {
        f"{EX}sensor/{sid}" for sid in SENSORS
    }

    # --- [3/5] SPARQL-star inspection of prob:value / prob:proofCount
    rows = e.execute(FEATURE_QUERY)
    assert len(rows) == 6  # ONE combined annotation pair per sensor
    feats = {}
    for sensor, risk_prob, proof_count in rows:
        sid = sensor.rsplit("/", 1)[1]
        t, h, p, _ = SENSORS[sid]
        assert float(risk_prob) == pytest.approx(_expected_risk(t, h, p))
        # sdd proofCount = satisfying models: 3 when both evidence paths
        # exist ((1,0),(0,1),(1,1) x pressure), 1 for a single conjunction
        assert int(proof_count) == (3 if t is not None and h is not None else 1)
        feats[sensor] = (risk_prob, proof_count)
        e.add_triples(
            [
                (sensor, f"{EX}riskProbFeature", risk_prob),
                (sensor, f"{EX}proofCountFeature", proof_count),
            ]
        )

    # --- [4/5] neural relation trained on the gold responses
    program = f"""
PREFIX ex: <{EX}>
PREFIX prob: <{PROB}>

MODEL "response_model" {{
    ARCH MLP {{ HIDDEN [8, 4] }}
    OUTPUT EXCLUSIVE {{ <{EX}monitor>, <{EX}dispatch> }}
}}

NEURAL RELATION ex:predictedResponse USING MODEL "response_model" {{
    INPUT {{
        ?sensor ex:type ex:Sensor .
        ?sensor ex:riskProbFeature ?riskProb .
        ?sensor ex:proofCountFeature ?proofCount .
    }}
    FEATURES {{ ?riskProb, ?proofCount }}
}}

TRAIN NEURAL RELATION ex:predictedResponse {{
    DATA {{
        ?sensor ex:goldResponse ?label .
    }}
    LABEL ?label
    TARGET {{ ?sensor ex:predictedResponse ?label }}
    LOSS cross_entropy
    OPTIMIZER adam
    LEARNING_RATE 0.1
    EPOCHS 120
    BATCH_SIZE 3
}}
"""
    assert e.execute_query(program) is None
    predictions = dict(
        e.execute(
            f"PREFIX ex: <{EX}> SELECT ?sensor ?predicted WHERE "
            "{ ?sensor ex:predictedResponse ?predicted }"
        )
    )
    # risk ~0.9/proofs 3 vs risk ~0.44/proofs 1 is linearly separable:
    # the trained relation must reproduce the gold responses
    for sid, (_, _, _, gold) in SENSORS.items():
        assert predictions[f"{EX}sensor/{sid}"] == f"{EX}{gold}"

    # --- [5/5] classical feedback rule over predictions + policy
    e.register_rule(
        f"""PREFIX ex: <{EX}>

RULE :OpenDispatchCase :-
CONSTRUCT {{
    ?sensor ex:dispatchCase ex:open .
}}
WHERE {{
    ?sensor ex:riskSignal ?risk .
    ?sensor ex:predictedResponse ?response .
    ex:dispatchPolicy ex:requiredRisk ?risk .
    ex:dispatchPolicy ex:requiredResponse ?response .
}}"""
    )
    e.materialize()
    cases = sorted(
        r[0]
        for r in e.execute(
            f"PREFIX ex: <{EX}> SELECT ?sensor WHERE "
            "{ ?sensor ex:dispatchCase ex:open } ORDER BY ?sensor"
        )
    )
    assert cases == [f"{EX}sensor/s{i}" for i in (1, 2, 3)]
