"""Datalog reasoner: forward chaining (naive + semi-naive) as iterative
DataFrame joins, negation-as-failure, provenance semirings, backward
chaining, N3-logic rules. Reference: /root/reference/datalog/.
"""

from kolibrie_spark.reasoner.rule import FilterCondition, Rule, check_rule_safety
from kolibrie_spark.reasoner.fixpoint import Reasoner
from kolibrie_spark.reasoner.hierarchy import (
    HierarchicalRule,
    ReasoningHierarchy,
    ReasoningLevel,
)
from kolibrie_spark.reasoner.closure import ancestors_via_closure, transitive_closure
from kolibrie_spark.reasoner.n3_parser import parse_n3_rules
from kolibrie_spark.reasoner.to_dot import to_dot

__all__ = [
    "Rule",
    "FilterCondition",
    "check_rule_safety",
    "Reasoner",
    "HierarchicalRule",
    "ReasoningHierarchy",
    "ReasoningLevel",
    "parse_n3_rules",
    "to_dot",
    "transitive_closure",
    "ancestors_via_closure",
]
