"""Audit every registered query's physical plan and print the report.

Usage: python tools/plan_audit.py [sf_dir]

Prints one JSON line per query plus an aggregate summary; exits
non-zero if a hard invariant (cartesian product, row-at-a-time
Python) is violated anywhere in the registry.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_spring_cloud_stream_tp1_spark.plans.audit import (
    audit_registry,
    audit_to_rows,
)
from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    # execute_bnl: queries with a BroadcastNestedLoopJoin additionally
    # run so each build side's numOutputRows materializes into
    # bnl_build_rows_max — the mechanized boundedness audit
    feats = audit_registry(spark, sf_dir, execute_bnl=True)
    rows = audit_to_rows(feats)
    for r in rows:
        print(json.dumps(r))
    summary = {
        "n_queries": len(rows),
        "total_exchanges": sum(r["exchanges"] for r in rows),
        "queries_with_cartesian": [r["name"] for r in rows if r["cartesian"]],
        "queries_with_batch_eval_python": [
            r["name"] for r in rows if r["batch_eval_python"]
        ],
        "queries_with_pickled_udtf": [
            r["name"] for r in rows if r["pickled_udtf"]
        ],
        "queries_with_global_sort": [r["name"] for r in rows if r["global_sorts"]],
        "arrow_python_queries": sum(1 for r in rows if r["arrow_python_nodes"]),
        "max_exchanges": max(rows, key=lambda r: r["exchanges"])["name"],
        "bnl_build_rows_max": max(
            (r["bnl_build_rows_max"] for r in rows if r["bnl_build_rows_max"]),
            default=0,
        ),
    }
    print(json.dumps({"summary": summary}))
    spark.stop()
    bad = (
        summary["queries_with_cartesian"]
        or summary["queries_with_batch_eval_python"]
        or summary["queries_with_pickled_udtf"]
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
