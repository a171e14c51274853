"""Full-registry sf0.1 soak: every oracle-backed query compared
against DuckDB at sf0.1 in ONE session (rows-only queries counted).

The pre-snapshot gate the sf0.01 driver window can't replace — it
finds value/tie-break divergences that only materialize at 10× the
fixture density (r5: q_scd2_history same-date ties; r7:
q_random_projection −0.0). ~35 min on local[32].

Usage: setsid nohup python tools/run_soak.py > /tmp/soak.log 2>&1 &
(the plain session needs driver memory for ~230 queries of
accumulated broadcast state; 6g is the measured-safe setting)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_spring_cloud_stream_tp1_spark.plans.registry import _ordered_specs
from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark
from tests.oracle_harness import compare_query, duckdb_conn


def verify_log(path: str) -> int:
    """Coverage gate (VERDICT r09 #2): the committed SOAK_rN.log must
    contain a result line for EVERY query registered at HEAD, and no
    FAIL lines — a soak that ran before the last query landed (the
    r9 snapshot covered 240 of 243) passes silently without this."""
    with open(path) as fh:
        log = fh.read()
    missing = [
        s.name
        for s in _ordered_specs()
        if f" MATCH {s.name} " not in log and f" rows-only {s.name}:" not in log
    ]
    n_fail = log.count("] FAIL ")
    ok = not missing and n_fail == 0 and "FAILS: []" in log
    print(
        f"soak-log gate {path}: {len(_ordered_specs()) - len(missing)}/"
        f"{len(_ordered_specs())} covered, {n_fail} FAIL lines -> "
        f"{'OK' if ok else 'STALE/RED'}"
    )
    if missing:
        print("missing:", missing)
    return 0 if ok else 1


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--verify-log":
        return verify_log(sys.argv[2])
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="soak", extra_conf={"spark.driver.memory": "6g"})
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(sf)
    fails: list[str] = []
    t00 = time.time()
    for i, spec in enumerate(_ordered_specs()):
        t0 = time.time()
        try:
            if spec.oracle is None:
                n = spec.builder(spark, sf).count()
                print(f"[{i + 1}] rows-only {spec.name}: {n}", flush=True)
            else:
                compare_query(spark, con, spec.builder, spec.oracle, sf)
                print(f"[{i + 1}] MATCH {spec.name} {time.time() - t0:.1f}s", flush=True)
        except Exception as ex:
            fails.append(spec.name)
            print(f"[{i + 1}] FAIL {spec.name}: {ex!r}"[:300], flush=True)
    print(f"SOAK DONE in {(time.time() - t00) / 60:.1f} min; FAILS: {fails}", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
