"""Dump `.explain("formatted")` for named queries to text files.

The optimization-round deliverable (`plans/r12/<query>_before.txt` /
`..._after.txt`) wants the committed physical plan for every query a
round touched, so plan-shape claims in OPTIMIZATION_r12.md are
checkable without running Spark.

Usage:

    python tools/explain_dump.py --out plans/r12 --suffix before q_a q_b ...
    python tools/explain_dump.py --out plans/r12 --suffix after --all-touched plans/r12/touched.txt

Plans are captured at sf0.001 by default: the plan SHAPE (exchanges,
join strategies, pushed filters, codegen spans) is scale-independent
for these queries, and the fixture keeps the dump fast. Queries whose
strategy branches on a measured count (the dedup verify switch) pick
the same branch at every committed SF, so the dumped shape is the
bench shape too.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_streams_spring_cloud_stream_tp1_spark.plans import queries_map
from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--all-touched", help="file with one query name per line")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    names = list(args.names)
    if args.all_touched:
        with open(args.all_touched) as fh:
            names += [ln.strip() for ln in fh if ln.strip() and not ln.startswith("#")]
    if not names:
        ap.error("no query names given")

    os.makedirs(args.out, exist_ok=True)
    spark = get_spark(app_name="explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    builders = queries_map()
    for name in dict.fromkeys(names):  # dedupe, keep order
        df = builders[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
