"""RSP-QL streaming layer: C-SPARQL windows (S2R), per-window query (R2R),
RSTREAM/ISTREAM/DSTREAM (R2S), report strategies, multi-window sync policies,
and the Structured Streaming compilation for scale.
"""

from kolibrie_spark.streaming.engine import RSPEngine
from kolibrie_spark.streaming.r2s import DStream, IStream, RStream
from kolibrie_spark.streaming.s2r import CSparqlWindow, ReportStrategy, Tick

__all__ = [
    "RSPEngine",
    "RStream",
    "IStream",
    "DStream",
    "CSparqlWindow",
    "ReportStrategy",
    "Tick",
]
