"""Mechanical cross-family rot spot-check (VERDICT r11 #5).

Each round the judge hand-picked ~20 cross-family queries and re-ran
the driver protocol at sf0.01 to catch silent rot between rounds;
this tool makes that check a committed, seeded, reproducible gate —
the sf0.01 sibling of ``tools/run_soak.py`` (which value-checks the
FULL registry at sf0.1).

Protocol fidelity: like the external driver, the Spark session is a
PLAIN ``SparkSession.builder`` with no engine tuning — the engine must
set its own defensive confs (nanos timestamps etc.) inside
``load_table``. Oracle-backed queries are value-checked via the same
``tests/oracle_harness.py::compare_query`` the pytest suite uses
(hashable-schema guard, −0.0 guard, HUGEINT guard, normalized value
compare); rows-only queries get the driver's weaker executes-and-
counts check.

Sampling is seeded and stratified: the registry is sorted by name,
shuffled with ``random.Random(seed)``, and the first ``n`` taken —
so a given (seed, registry) pair always re-checks the same slice,
and rotating the seed per round walks the whole surface.

Usage:

    python tools/rot_check.py [--n 20] [--seed ROUND] \
        [--sf-dir /root/testdata/sf0.01] > ROT_CHECK_rN.log

Exits non-zero on any mismatch or crash.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from kafka_streams_spring_cloud_stream_tp1_spark.plans.registry import (
        _ensure_loaded,
        _ordered_specs,
    )
    from tests.oracle_harness import compare_query, duckdb_conn

    _ensure_loaded()
    specs = sorted(_ordered_specs(), key=lambda s: s.name)
    rng = random.Random(args.seed)
    rng.shuffle(specs)
    sample = specs[: args.n]

    # plain session, like the external driver — no engine tuning here
    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(args.sf_dir)

    t00 = time.time()
    fails = []
    for spec in sample:
        t0 = time.time()
        row = {"query": spec.name}
        try:
            if spec.oracle is not None:
                compare_query(spark, con, spec.builder, spec.oracle, args.sf_dir)
                row["result"] = "match"
            else:
                row["result"] = "rows_only"
                row["rows"] = spec.builder(spark, args.sf_dir).count()
        except Exception as exc:
            row["result"] = "FAIL"
            row["detail"] = repr(exc)[:400]
            fails.append(spec.name)
        row["sec"] = round(time.time() - t0, 2)
        print(json.dumps(row), flush=True)

    summary = {
        "n_sampled": len(sample),
        "seed": args.seed,
        "sf_dir": args.sf_dir,
        "fails": fails,
        "total_sec": round(time.time() - t00, 1),
    }
    print(json.dumps(summary))
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
