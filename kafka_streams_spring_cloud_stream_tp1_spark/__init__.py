"""PySpark-native analytics engine with the query and data-processing
capabilities of ``latifaja/kafka-streams-spring-cloud-stream-tp1``.

The reference is a Kafka-Streams/Spring-Cloud-Stream demo app whose one
real query is "page views per 5-second tumbling window" (see SURVEY.md).
This package re-expresses that capability surface — and the north-star
extensions (relational operators, dedup, similarity search, text
analysis) — Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for the streaming runtime.

Layout:
    schemas      — StructType constants (PageEvent analog et al.)
    session      — tuned SparkSession builder
    sources/     — batch table loaders, synthetic rate generator, Kafka wrappers
    operators/   — composable DataFrame -> DataFrame builders
    plans/       — the query registry (name -> builder + DuckDB oracle SQL)
    streaming/   — streaming topology: sources -> ops -> sinks, count-store
"""

__version__ = "0.1.0"
