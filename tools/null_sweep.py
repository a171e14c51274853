"""Full-registry NULL-injection sweep (VERDICT r10 #4).

Rebuilds the sf0.001 fixture with NULLs injected into every nullable
column that real web-scale corpora lose (text/lang/source on
documents; value/event_type/ts/event_id on events) on deterministic
modular slices, then drives EVERY registered query against it:

- every query must SURVIVE (NULL in => NULL/dropped row out, never a
  task failure) — a crash is a scale bug, the 100 TB run WILL contain
  that row;
- every oracle-backed query is additionally VALUE-CHECKED against its
  DuckDB oracle on the same NULL-injected tables, pinning the
  Spark-vs-DuckDB NULL contracts (group levels, null-safe joins,
  window order) per query family.

Known, documented divergence classes are listed in
``DOCUMENTED_DIVERGENCES`` with the contract note that excuses them;
anything else is a FAIL. Usage:

    python tools/null_sweep.py > NULL_SWEEP_rN.log

Exits non-zero on any crash or undocumented divergence.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = "/root/testdata/sf0.001"

# query -> why a cross-engine mismatch on the NULL-injected fixture is
# the documented contract rather than a bug. Keep this list SHORT and
# specific; an empty dict is the goal state.
DOCUMENTED_DIVERGENCES: dict[str, str] = {}


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    con.execute(
        f"""COPY (SELECT doc_id,
                CASE WHEN doc_id % 10 = 7 THEN NULL ELSE text END AS text,
                CASE WHEN doc_id % 13 = 5 THEN NULL ELSE lang END AS lang,
                CASE WHEN doc_id % 11 = 3 THEN NULL ELSE source END AS source,
                * EXCLUDE (doc_id, text, lang, source)
            FROM read_parquet('{SF}/documents.parquet'))
            TO '{out}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT * REPLACE (
                CASE WHEN event_id % 10 = 7 THEN NULL ELSE value END AS value,
                CASE WHEN event_id % 13 = 5 THEN NULL ELSE event_type END
                    AS event_type,
                CASE WHEN event_id % 17 = 3 THEN NULL ELSE ts END AS ts)
            FROM read_parquet('{SF}/events.parquet'))
            TO '{out}/events.parquet' (FORMAT PARQUET)"""
    )
    for t in (
        "region nation customer supplier part orders lineitem embeddings"
    ).split():
        con.execute(
            f"""COPY (SELECT * FROM read_parquet('{SF}/{t}.parquet'))
                TO '{out}/{t}.parquet' (FORMAT PARQUET)"""
        )
    con.close()


def main() -> int:
    from kafka_streams_spring_cloud_stream_tp1_spark.plans.registry import (
        _ensure_loaded,
        _ordered_specs,
    )
    from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark
    from tests.oracle_harness import compare_query, duckdb_conn

    out = tempfile.mkdtemp(prefix="null_sweep_fixture_")
    build_fixture(out)
    _ensure_loaded()
    specs = _ordered_specs()
    spark = get_spark(app_name="null_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_conn(out)

    t00 = time.time()
    crashes, diverges, documented = [], [], []
    for spec in specs:
        t0 = time.time()
        row = {"query": spec.name}
        try:
            if spec.oracle is not None:
                compare_query(spark, con, spec.builder, spec.oracle, out)
                row["result"] = "match"
            else:
                n = spec.builder(spark, out).count()
                row["result"] = "rows_only"
                row["rows"] = n
        except AssertionError as exc:
            if spec.name in DOCUMENTED_DIVERGENCES:
                row["result"] = "documented_divergence"
                row["contract"] = DOCUMENTED_DIVERGENCES[spec.name]
                documented.append(spec.name)
            else:
                row["result"] = "DIVERGE"
                row["detail"] = str(exc)[:400]
                diverges.append(spec.name)
        except Exception as exc:
            row["result"] = "CRASH"
            row["detail"] = repr(exc)[:400]
            crashes.append(spec.name)
        row["sec"] = round(time.time() - t0, 2)
        print(json.dumps(row), flush=True)

    oracle_names = {s.name for s in specs if s.oracle is not None}
    summary = {
        "n_queries": len(specs),
        # only oracle-backed outcomes count toward n_match; a crash in a
        # rows-only query must not deflate the oracle tally (ADVICE r11)
        "n_match": len(oracle_names)
        - len([d for d in diverges if d in oracle_names])
        - len([d for d in documented if d in oracle_names])
        - len([c for c in crashes if c in oracle_names]),
        "oracle_crashes": [c for c in crashes if c in oracle_names],
        "crashes": crashes,
        "divergences": diverges,
        "documented_divergences": documented,
        "total_sec": round(time.time() - t00, 1),
        "fixture_slices": "documents: text%10=7, lang%13=5, source%11=3; "
        "events: value%10=7, event_type%13=5, ts%17=3",
    }
    print(json.dumps(summary))
    spark.stop()
    return 1 if (crashes or diverges) else 0


if __name__ == "__main__":
    raise SystemExit(main())
