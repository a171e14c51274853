"""Schema constants.

The reference's entire data model is one Java record:
``record PageEvent(String name, String user, Date date, long duration)``
(reference: src/main/java/org/example/kafkastreamsspringcloudstreamtp1/
events/PageEvent.java:5). Schemas here are explicit StructTypes — the
reference's schema is compile-time fixed, so ours is too (never
``inferSchema`` on a stream; Kafka values arrive as bytes and are parsed
with ``from_json(value, PAGE_EVENT_SCHEMA)``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Wire-format schema of the reference's PageEvent JSON payload.
PAGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("user", T.StringType()),
        T.StructField("date", T.TimestampType()),
        T.StructField("duration", T.LongType()),
    ]
)

# The driver fixture `events` table — the PageEvent stream analog
# (FIXTURES.md §1: event_type<->name, user_id<->user, ts<->date,
# value<->duration).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# Schema of the `props` JSON column (exercises from_json).
PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])
