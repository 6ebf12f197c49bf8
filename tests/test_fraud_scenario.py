"""End-to-end port of the reference's neuro-symbolic fraud-detection
scenario (kolibrie/examples/real_scenario/fraud_detection_system.rs):

  pass-1 datalog rules (raw features → symbolic flags, rule strings
  verbatim) → numeric flag write-back → ML.PREDICT over the 14-feature
  INPUT contract → pass-2 rules (ML score → flags) → fusion thresholds
  (fuse_decision, ported verbatim) → per-transaction verdicts.

The transport shell (MQTT/SSE/TCP demo plumbing) is out of scope; the
decision pipeline — which is the scenario — runs end-to-end on the Spark
engine with a deterministic stand-in model."""

import pytest

from kolibrie_spark import SparqlEngine
from kolibrie_spark.store import QuadStore

EX = "http://fraud.example.org/"

# pass-1 rule strings copied verbatim from fraud_detection_system.rs
RULE_VELOCITY = """PREFIX ex: <http://fraud.example.org/>
RULE :SuspiciousVelocity :-
CONSTRUCT { ?tx ex:suspiciousFlag ex:highVelocity . }
WHERE { ?tx ex:velocity1h ?vel . FILTER(?vel > 5) }"""

RULE_AMOUNT = """PREFIX ex: <http://fraud.example.org/>
RULE :SuspiciousAmount :-
CONSTRUCT { ?tx ex:suspiciousFlag ex:largeAmount . }
WHERE { ?tx ex:amount ?amt . FILTER(?amt > 1000) }"""

RULE_MERCH = """PREFIX ex: <http://fraud.example.org/>
RULE :HighMerchantRisk :-
CONSTRUCT { ?tx ex:suspiciousFlag ex:highMerchantRisk . }
WHERE { ?tx ex:merchantRisk ?mr . FILTER(?mr > 70) }"""

RULE_FOREIGN = """PREFIX ex: <http://fraud.example.org/>
RULE :ForeignHighRisk :-
CONSTRUCT { ?tx ex:suspiciousFlag ex:foreignHighRisk . }
WHERE { ?tx ex:isForeign ?isF . ?tx ex:merchantRisk ?mr .
FILTER(?isF > 0) FILTER(?mr > 70) }"""

RULE_HIGH_RISK = """PREFIX ex: <http://fraud.example.org/>
RULE :HighRisk :-
CONSTRUCT { ?tx ex:riskLevel ex:high . }
WHERE { ?tx ex:amount ?amt . ?tx ex:velocity1h ?vel .
FILTER(?amt > 1000) FILTER(?vel > 5) }"""

RULE_WINDOW = """PREFIX ex: <http://fraud.example.org/>
RULE :HighWindowActivity :-
CONSTRUCT { ?tx ex:suspiciousFlag ex:highWindowActivity . }
WHERE { ?tx ex:windowVelocity ?wvel . FILTER(?wvel > 7) }"""

# pass-2 rules (read the ML score back from RDF)
RULE_ML_ALERT = """PREFIX ex: <http://fraud.example.org/>
RULE :MLAssistedAlert :-
CONSTRUCT { ?tx ex:suspiciousFlag ex:mlAssistedAlert . }
WHERE { ?tx ex:mlFraudScore ?score . ?tx ex:velocity1h ?vel .
FILTER(?score > 40) FILTER(?vel > 3) }"""

RULE_HISTORY = """PREFIX ex: <http://fraud.example.org/>
RULE :HistoricalPattern :-
CONSTRUCT { ?tx ex:suspiciousFlag ex:historicalPattern . }
WHERE { ?tx ex:recentFraudCount ?cnt . FILTER(?cnt > 4) }"""


def fuse_decision(fraud_score: float, flags: set) -> str:
    """fuse_decision ported verbatim (fraud_detection_system.rs:1151)."""
    high_risk = "risk:high" in flags
    any_suspicious = bool(flags)
    if fraud_score > 0.80:
        return "FRAUD"
    if fraud_score > 0.50 and high_risk:
        return "FRAUD"
    if high_risk:
        return "SUSPICIOUS"
    if fraud_score > 0.60 or any_suspicious:
        return "REVIEW"
    return "CLEAR"


# (tx_id, amount, hour, dow, merchantRisk, velocity1h, distanceKm,
#  isForeign, cardPresent, windowVelocity, recentFraudCount)
TXS = [
    ("T1", 3900, 11, 2, 10, 1, 5, 0, 1, 0, 0),   # huge amount → ML-only FRAUD
    ("T2", 2400, 3, 6, 40, 6, 80, 0, 0, 0, 0),   # risk:high + mid score → FRAUD
    ("T3", 1100, 14, 3, 20, 6, 12, 0, 1, 0, 0),  # risk:high, low score → SUSPICIOUS
    ("T4", 100, 9, 1, 80, 1, 3, 0, 1, 0, 0),     # merchant-risk flag → REVIEW
    ("T5", 100, 10, 4, 10, 1, 2, 0, 1, 0, 0),    # nothing → CLEAR
    ("T6", 1900, 22, 5, 30, 4, 200, 0, 0, 0, 0), # ML-assisted alert fires (pass-2)
    ("T7", 150, 8, 2, 15, 1, 4, 0, 1, 0, 5),     # fraud history → REVIEW
    ("T8", 200, 7, 0, 90, 2, 900, 1, 0, 8, 0),   # foreign high-risk + window
]

EXPECTED = {
    "T1": "FRAUD",
    "T2": "FRAUD",
    "T3": "SUSPICIOUS",
    "T4": "REVIEW",
    "T5": "CLEAR",
    "T6": "REVIEW",
    "T7": "REVIEW",
    "T8": "REVIEW",
}

FEATURES = [
    ("amount", 1), ("hourOfDay", 2), ("dayOfWeek", 3), ("merchantRisk", 4),
    ("velocity1h", 5), ("distanceKm", 6), ("isForeign", 7),
    ("cardPresent", 8), ("windowVelocity", 9), ("recentFraudCount", 10),
]

FLAG_WRITEBACK = {
    "highVelocity": "flagHighVelocity",
    "largeAmount": "flagLargeAmount",
    "highMerchantRisk": "flagHighMerchantRisk",
    "foreignHighRisk": "flagForeignHighRisk",
}


def _flags_of(engine) -> dict:
    out: dict[str, set] = {}
    for tx, flag in engine.execute(
        f"SELECT ?tx ?f WHERE {{ ?tx <{EX}suspiciousFlag> ?f }}"
    ):
        out.setdefault(tx.rsplit("/", 1)[1], set()).add(flag.rsplit("/", 1)[1])
    for tx, _lvl in engine.execute(
        f"SELECT ?tx ?l WHERE {{ ?tx <{EX}riskLevel> <{EX}high> }}"
    ):
        out.setdefault(tx.rsplit("/", 1)[1], set()).add("risk:high")
    return out


def test_fraud_detection_pipeline(spark):
    store = QuadStore(spark)
    quads = []
    for row in TXS:
        tx_uri = f"{EX}tx/{row[0]}"
        for fname, idx in FEATURES:
            quads.append((tx_uri, f"{EX}{fname}", str(row[idx]), None))
    store.add_quads(quads)
    e = SparqlEngine(spark, store)

    # ---- pass 1: symbolic rules on raw features (strings verbatim)
    for r in (RULE_VELOCITY, RULE_AMOUNT, RULE_MERCH, RULE_FOREIGN,
              RULE_HIGH_RISK, RULE_WINDOW):
        e.register_rule(r)
    e.materialize()
    flags_p1 = _flags_of(e)
    assert flags_p1["T2"] >= {"highVelocity", "largeAmount", "risk:high"}
    assert flags_p1["T8"] >= {"highMerchantRisk", "foreignHighRisk",
                              "highWindowActivity"}
    assert "T5" not in flags_p1

    # ---- numeric flag write-back (write_numeric_flags_to_db parity):
    # every pass-1 flag becomes a 0/1 feature column for the ML input
    fb = []
    for row in TXS:
        tx_uri = f"{EX}tx/{row[0]}"
        fl = flags_p1.get(row[0], set())
        for flag_name, pred in FLAG_WRITEBACK.items():
            fb.append((tx_uri, f"{EX}{pred}", "1" if flag_name in fl else "0", None))
        fb.append((tx_uri, f"{EX}flagRiskHigh", "1" if "risk:high" in fl else "0", None))
    store.add_quads(fb)

    # ---- ML.PREDICT over the 14-feature contract (deterministic
    # stand-in for the trained model: score = amount / 4000, 0..1)
    e.register_model("fraud_predictor", lambda X: X["amt"] / 4000.0)
    scored = e.ml_predict(
        'ML.PREDICT(MODEL "fraud_predictor", INPUT { '
        "SELECT ?tx ?amt ?hour ?dow ?mRisk ?vel ?dist ?isF ?cp ?fHv ?fLa ?fHmr ?fFhr ?fRh ?cnt "
        "WHERE { "
        f"?tx <{EX}amount> ?amt . ?tx <{EX}hourOfDay> ?hour . "
        f"?tx <{EX}dayOfWeek> ?dow . ?tx <{EX}merchantRisk> ?mRisk . "
        f"?tx <{EX}velocity1h> ?vel . ?tx <{EX}distanceKm> ?dist . "
        f"?tx <{EX}isForeign> ?isF . ?tx <{EX}cardPresent> ?cp . "
        f"?tx <{EX}flagHighVelocity> ?fHv . ?tx <{EX}flagLargeAmount> ?fLa . "
        f"?tx <{EX}flagHighMerchantRisk> ?fHmr . ?tx <{EX}flagForeignHighRisk> ?fFhr . "
        f"?tx <{EX}flagRiskHigh> ?fRh . ?tx <{EX}recentFraudCount> ?cnt "
        "} }, OUTPUT ?score)"
    )
    scores = {
        r["tx"].rsplit("/", 1)[1]: float(r["score"]) for r in scored.collect()
    }
    assert len(scores) == len(TXS)  # all 14 features present for every tx
    assert scores["T1"] == pytest.approx(0.975)

    # write the score back (0-100 integer, the reference's parse-safe
    # convention) so pass-2 rules can read it symbolically
    store.add_quads(
        [
            (f"{EX}tx/{t}", f"{EX}mlFraudScore", str(int(s * 100)), None)
            for t, s in scores.items()
        ]
    )

    # ---- pass 2: rules over the ML output
    e.register_rule(RULE_ML_ALERT)
    e.register_rule(RULE_HISTORY)
    e.materialize()
    flags = _flags_of(e)
    assert "mlAssistedAlert" in flags["T6"]   # score 47 > 40, vel 4 > 3
    assert "historicalPattern" in flags["T7"]  # recentFraudCount 5 > 4
    assert "mlAssistedAlert" not in flags.get("T5", set())

    # ---- fusion: exact verdict parity with fuse_decision
    verdicts = {
        row[0]: fuse_decision(scores[row[0]], flags.get(row[0], set()))
        for row in TXS
    }
    assert verdicts == EXPECTED
