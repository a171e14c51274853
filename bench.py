"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], print ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query executes end-to-end into a `noop` sink — full plan runs
(scan -> shuffle -> agg), nothing funnels through the driver, so the
number measures engine throughput rather than collect() serialization.
One untimed warm-up of the flagship amortizes JVM/codegen warmup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kafka_streams_spring_cloud_stream_tp1_spark.plans import queries_map
    from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    builders = queries_map()

    # warm-up: JVM JIT + codegen + parquet footer caches (untimed)
    builders["q_windowed_count"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # warm the Arrow/Python-worker path too — otherwise the first
    # pandas-UDF query pays daemon spawn + Arrow init and the
    # attribution lands on whichever query sorts first
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # Registration order (the driver's correctness order), NOT sorted:
    # Spark's cache manager shares identical cached subplans across
    # queries in the session, so iteration order decides attribution —
    # e.g. q_dedup_ngram_jaccard's PPJoin pair table is reused by
    # q_dedup_clusters. Registration order runs each producer before
    # its consumers, so every entry reflects that query's own cost
    # (alphabetical order ran the consumer first and billed it for the
    # producer's whole pipeline). See BASELINE.md "Bench protocol".
    timings: dict[str, float] = {}
    for name in builders:
        t0 = time.perf_counter()
        builders[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    out = {
        "metric": "total_query_time",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
