"""Fixed schemas for the quad store and streaming events.

The reference's data model is four u32 ids behind a dictionary
(``shared/src/dataset_index.rs:17-29`` in /root/reference). We keep terms as
plain strings: parquet dictionary encoding + Tungsten give us the compression
the reference's dictionary provides, without a global id-assignment bottleneck
at 100 TB (a distributed dictionary would serialize ingest; strings shard
freely and join/hash fine).
"""

from pyspark.sql.types import (
    StructField,
    StructType,
    StringType,
    TimestampType,
)

# One universal fact table. g IS NULL means the default graph
# (reference: GraphId::Default, shared/src/dataset_index.rs:17-29).
QUADS_SCHEMA = StructType(
    [
        StructField("s", StringType(), False),
        StructField("p", StringType(), False),
        StructField("o", StringType(), False),
        StructField("g", StringType(), True),
    ]
)

# Named-graph catalog: graph identity exists independently of content —
# empty named graphs are real (reference dataset_index.rs:414-459).
GRAPHS_SCHEMA = StructType([StructField("g", StringType(), False)])

# RDF-star surrogate table (reference shared/src/quoted_triple_store.rs:14-33
# keeps (s,p,o) <-> id with the high bit marking quoted-triple ids; we use a
# deterministic content hash prefixed "qt:" so the same quoted triple gets
# the same id on every executor with no coordination).
QUOTED_SCHEMA = StructType(
    [
        StructField("qid", StringType(), False),
        StructField("qs", StringType(), False),
        StructField("qp", StringType(), False),
        StructField("qo", StringType(), False),
    ]
)

# Streaming events: a timestamped quad on a named stream
# (reference rsp_engine.rs:773-811 pushes (stream_iri, triple, ts)).
EVENTS_SCHEMA = StructType(
    [
        StructField("s", StringType(), False),
        StructField("p", StringType(), False),
        StructField("o", StringType(), False),
        StructField("g", StringType(), True),
        StructField("stream", StringType(), False),
        StructField("event_time", TimestampType(), False),
    ]
)

QT_PREFIX = "qt:"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
