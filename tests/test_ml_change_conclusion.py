"""Port of kolibrie/examples/sparql_syntax/combination/
combination_ml_change_conclusion.rs — dynamic traffic rules whose
CONSTRUCT conclusions are bound by the ML.PREDICT OUTPUT variable
(create_ml_enhanced_triples, lines 439-505), updated on the fly across
the example's four scenarios."""

from __future__ import annotations

import pytest

from kolibrie_spark import SparqlEngine
from kolibrie_spark.rdfio import parse_into
from kolibrie_spark.store import QuadStore

EX = "http://example.org/traffic#"

TRAFFIC_XML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://example.org/traffic#">
  <rdf:Description rdf:about="http://example.org/traffic#HighwayA1">
    <ex:avgVehicleSpeed>45.0</ex:avgVehicleSpeed>
    <ex:vehicleCount>120</ex:vehicleCount>
    <ex:roadType>highway</ex:roadType>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/traffic#CityRoadB2">
    <ex:avgVehicleSpeed>25.0</ex:avgVehicleSpeed>
    <ex:vehicleCount>85</ex:vehicleCount>
    <ex:roadType>city</ex:roadType>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/traffic#DowntownC3">
    <ex:avgVehicleSpeed>15.0</ex:avgVehicleSpeed>
    <ex:vehicleCount>200</ex:vehicleCount>
    <ex:roadType>downtown</ex:roadType>
  </rdf:Description>
</rdf:RDF>"""

EMERGENCY_XML = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://example.org/traffic#">
  <rdf:Description rdf:about="http://example.org/traffic#HighwayA1">
    <ex:emergencyVehicles>2</ex:emergencyVehicles>
    <ex:weatherCondition>rain</ex:weatherCondition>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/traffic#CityRoadB2">
    <ex:emergencyVehicles>0</ex:emergencyVehicles>
    <ex:weatherCondition>clear</ex:weatherCondition>
  </rdf:Description>
  <rdf:Description rdf:about="http://example.org/traffic#DowntownC3">
    <ex:emergencyVehicles>1</ex:emergencyVehicles>
    <ex:weatherCondition>fog</ex:weatherCondition>
  </rdf:Description>
</rdf:RDF>"""


def _select(e, query):
    return sorted(tuple(r) for r in e.execute(query))


def test_ml_bound_conclusions_across_scenarios(spark):
    store = QuadStore(spark)
    parse_into(store, TRAFFIC_XML, fmt="rdfxml")
    e = SparqlEngine(spark, store)
    # deterministic congestion stand-in: level = count / speed
    e.register_model(
        "congestion_model", lambda X: (X.iloc[:, 1] / X.iloc[:, 0]).round(2)
    )

    # --- Scenario 1: parameterless rule, conclusion object = ML output
    derived = e.register_rule(
        """PREFIX ex: <http://example.org/traffic#>
RULE :DetectCongestion :-
    CONSTRUCT {
        ?road ex:congestionLevel ?level .
    }
    WHERE {
        ?road ex:avgVehicleSpeed ?speed ;
              ex:vehicleCount ?count .
    }
    ML.PREDICT(MODEL "congestion_model",
        INPUT {
            SELECT ?road ?avgSpeed ?maxCount
            WHERE {
                ?road ex:avgVehicleSpeed ?avgSpeed ;
                      ex:vehicleCount ?maxCount .
            }
        },
        OUTPUT ?level
    )"""
    )
    assert len(derived) == 3  # every road got an ML-bound congestion level
    got = _select(
        e,
        f"PREFIX ex: <{EX}> SELECT ?road ?level "
        "WHERE { ?road ex:congestionLevel ?level . }",
    )
    assert got == [
        (f"{EX}CityRoadB2", "3.4"),     # 85 / 25
        (f"{EX}DowntownC3", "13.33"),   # 200 / 15
        (f"{EX}HighwayA1", "2.67"),     # 120 / 45
    ]

    # --- Scenario 2: enhanced rule — WHERE filter gates BOTH the constant
    # alert conclusion and the ML-bound one (speed < 30 drops HighwayA1)
    derived2 = e.register_rule(
        """PREFIX ex: <http://example.org/traffic#>
RULE :DetectCongestionWithSeverity :-
    CONSTRUCT {
        ?road ex:congestionLevel ?level ;
              ex:trafficAlert "Congestion detected" .
    }
    WHERE {
        ?road ex:avgVehicleSpeed ?speed ;
              ex:vehicleCount ?count .
        FILTER (?speed < 30)
    }
    ML.PREDICT(MODEL "congestion_model",
        INPUT {
            SELECT ?road ?avgSpeed ?maxCount
            WHERE {
                ?road ex:avgVehicleSpeed ?avgSpeed ;
                      ex:vehicleCount ?maxCount .
                FILTER (?avgSpeed < 30)
            }
        },
        OUTPUT ?level
    )"""
    )
    alerts = _select(
        e,
        f"PREFIX ex: <{EX}> SELECT ?road ?alert "
        "WHERE { ?road ex:trafficAlert ?alert . }",
    )
    assert alerts == [
        (f"{EX}CityRoadB2", "Congestion detected"),
        (f"{EX}DowntownC3", "Congestion detected"),
    ]
    assert all(s != f"{EX}HighwayA1" for (s, _, _) in derived2)

    # --- Scenario 3: new data + classical rules on the fly
    parse_into(store, EMERGENCY_XML, fmt="rdfxml")
    e.register_rule(
        """PREFIX ex: <http://example.org/traffic#>
RULE :EmergencyPriority :-
    CONSTRUCT {
        ?road ex:priorityLevel "HIGH" ;
              ex:clearanceRequired "true" .
    }
    WHERE {
        ?road ex:emergencyVehicles ?count .
        FILTER (?count > 0)
    }"""
    )
    e.register_rule(
        """PREFIX ex: <http://example.org/traffic#>
RULE :WeatherAwareCongestion :-
    CONSTRUCT {
        ?road ex:weatherImpact "HIGH" ;
              ex:adjustedCongestionLevel ?level .
    }
    WHERE {
        ?road ex:congestionLevel ?level ;
              ex:weatherCondition ?weather .
        FILTER (?weather = "rain" || ?weather = "fog")
    }"""
    )
    e.materialize()
    assert _select(
        e, f"PREFIX ex: <{EX}> SELECT ?road WHERE {{ ?road ex:priorityLevel \"HIGH\" . }}"
    ) == [(f"{EX}DowntownC3",), (f"{EX}HighwayA1",)]
    weather_adj = _select(
        e,
        f"PREFIX ex: <{EX}> SELECT ?road ?level "
        "WHERE { ?road ex:adjustedCongestionLevel ?level . }",
    )
    # rain (HighwayA1) + fog (DowntownC3) carry their scenario-1 levels over
    assert weather_adj == [
        (f"{EX}DowntownC3", "13.33"),
        (f"{EX}HighwayA1", "2.67"),
    ]

    # --- Scenario 4: incident rule — compound filter, ML output reused as
    # the estimated delay; only DowntownC3 (speed 15 < 20, count 200 > 100)
    derived4 = e.register_rule(
        """PREFIX ex: <http://example.org/traffic#>
RULE :IncidentResponse :-
    CONSTRUCT {
        ?road ex:incidentStatus "ACTIVE" ;
              ex:recommendedAction "REROUTE" ;
              ex:estimatedDelay ?delay .
    }
    WHERE {
        ?road ex:avgVehicleSpeed ?speed ;
              ex:vehicleCount ?count .
        FILTER (?speed < 20)
        FILTER (?count > 100)
    }
    ML.PREDICT(MODEL "congestion_model",
        INPUT {
            SELECT ?road ?avgSpeed ?maxCount
            WHERE {
                ?road ex:avgVehicleSpeed ?avgSpeed ;
                      ex:vehicleCount ?maxCount .
                FILTER (?avgSpeed < 20)
            }
        },
        OUTPUT ?delay
    )"""
    )
    assert {(s, p, o) for (s, p, o) in derived4} == {
        (f"{EX}DowntownC3", f"{EX}incidentStatus", "ACTIVE"),
        (f"{EX}DowntownC3", f"{EX}recommendedAction", "REROUTE"),
        (f"{EX}DowntownC3", f"{EX}estimatedDelay", "13.33"),
    }
