"""End-to-end port of the reference's full-combination workflow
(kolibrie/examples/sparql_syntax/combination/full_combination.rs): the
same 8-tick two-office workload driving, together,

- the comfort RULE (temp > 25 → comfortLevel "uncomfortable",
  define_comfort_rule, full_combination.rs:130-143) on the store;
- the registered RSTREAM window query (full_combination.rs:42-56) fed the
  per-tick sensor triples;
- an ML temperature prediction over (temp, humidity, occupancy) via
  ML.PREDICT — a deterministic stand-in for the reference's sklearn
  pickle models (setup_ml_model), since the decision thresholds, not the
  weights, are the scenario;
- the reference's fusion thresholds (run_combined_workflow:245-252):
  ACTIVATE COOLING iff temp > 25 or predicted > 26, PREPARE COOLING iff
  predicted > 24, else NORMAL.

Workload (run_combined_workflow:156-163): for time 0..7 and room index
idx ∈ {0: Office1, 1: Office2} — temp = 20 + 2·t + 2·idx,
humidity = 50 + 2·t, occupancy = 5 + t + idx.
"""

import pytest

from kolibrie_spark import SparqlEngine

EX = "http://example.org/"

COMFORT_RULE = """PREFIX ex: <http://example.org/>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>

RULE :ComfortLevelRule :-
CONSTRUCT {
    ?sensor ex:comfortLevel "uncomfortable" .
}
WHERE {
    ?sensor ex:temperature ?temp .
    FILTER(?temp > 25)
}
"""

RSP_QUERY = """
PREFIX ex: <http://example.org/>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>

REGISTER RSTREAM <http://out/comfort> AS
SELECT ?room ?temp ?comfort
FROM NAMED WINDOW :tempWindow ON :sensorStream [RANGE 60 STEP 10]
WHERE {
    WINDOW :tempWindow {
        ?sensor ex:hasRoom ?room ;
               ex:temperature ?temp ;
               ex:comfortLevel ?comfort .
    }
}
"""


def _workload():
    for t in range(8):
        for idx, room in enumerate(["Office1", "Office2"]):
            temp = 20.0 + 2.0 * t + 2.0 * idx
            humidity = 50.0 + 2.0 * t
            occupancy = 5 + t + idx
            yield t, room, temp, humidity, occupancy


def test_full_combination_workflow(spark):
    from kolibrie_spark.streaming.engine import RSPEngine

    engine = SparqlEngine(spark)
    # ontology (setup_knowledge_base)
    engine.add_triples(
        [
            (f"{EX}Office1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", f"{EX}Room"),
            (f"{EX}Office2", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", f"{EX}Room"),
        ]
    )
    engine.register_rule(COMFORT_RULE)
    # deterministic stand-in for the sklearn model fleet: predict the next
    # temperature as current + 1 (the thresholds are what the scenario tests)
    engine.register_model("temp_predictor", lambda X: X.iloc[:, 0] + 1.0)

    alerts = []
    rsp = RSPEngine(spark, RSP_QUERY, consumer=lambda row: alerts.append(row))

    for t, room, temp, humidity, occupancy in _workload():
        sensor = f"{EX}Sensor_{room}"
        triples = [
            (sensor, f"{EX}hasRoom", f"{EX}{room}"),
            (sensor, f"{EX}temperature", f"{temp:g}"),
            (sensor, f"{EX}humidity", f"{humidity:g}"),
            (sensor, f"{EX}occupancy", str(occupancy)),
        ]
        engine.add_triples(triples)
        for tr in triples:
            rsp.add(tr, t)
        engine.materialize()

    # --- database side: the rule fired exactly for readings > 25
    comfort = {
        row[0]
        for row in engine.execute(
            "PREFIX ex: <http://example.org/> "
            "SELECT ?sensor WHERE { ?sensor ex:comfortLevel \"uncomfortable\" }"
        )
    }
    # Office1 crosses 25 at t=3 (26), Office2 at t=2 (26) — both end hot
    assert comfort == {f"{EX}Sensor_Office1", f"{EX}Sensor_Office2"}

    # --- stream side, faithful to the example: the window pattern also
    # requires ex:comfortLevel, which is never pushed to the stream, so the
    # registered query NEVER emits (the reference's consumer prints no
    # stream alerts for the same reason)
    assert alerts == []

    # --- ML side: ML.PREDICT over each reading joins temp/humidity/occupancy
    rows = engine.execute_query(
        """PREFIX ex: <http://example.org/>
ML.PREDICT(MODEL "temp_predictor",
  INPUT {
    SELECT ?temp ?humidity ?occupancy
    WHERE {
      ?sensor ex:temperature ?temp .
      ?sensor ex:humidity ?humidity .
      ?sensor ex:occupancy ?occupancy .
    }
  },
  OUTPUT ?predicted)"""
    ).collect()
    assert rows  # per-sensor accumulated readings
    for row in rows:
        assert float(row.predicted) == pytest.approx(float(row.temp) + 1.0)

    # --- fusion thresholds (run_combined_workflow:245-252), recomputed on
    # the workload exactly as the reference's loop does
    actions = {}
    for t, room, temp, humidity, occupancy in _workload():
        predicted = temp + 1.0
        if temp > 25.0 or predicted > 26.0:
            act = "ACTIVATE COOLING"
        elif predicted > 24.0:
            act = "PREPARE COOLING"
        else:
            act = "NORMAL"
        actions[(t, room)] = act
    assert actions[(0, "Office1")] == "NORMAL"
    assert actions[(2, "Office1")] == "PREPARE COOLING"  # temp 24, pred 25
    assert actions[(3, "Office1")] == "ACTIVATE COOLING"  # temp 26
    assert actions[(1, "Office2")] == "PREPARE COOLING"  # temp 24
    assert actions[(2, "Office2")] == "ACTIVATE COOLING"  # temp 26
    assert sum(a == "ACTIVATE COOLING" for a in actions.values()) == 11
