"""Keep BENCH_STEADY.json honest: detect and re-measure stale entries.

VERDICT r07 #3: steady-state entries were carried forward unmeasured
across rounds, so the bench_diff noise floor could reference plans
that no longer exist (q_dedup_simhash_hamming's entry predated the r7
rewrite of that operator). Commit-based staleness is too coarse (every
round touches plans/*); instead each steady entry records a
FINGERPRINT of the query's optimized logical plan — normalized of
expression ids and literal paths — in ``BENCH_STEADY_META.json``. An
entry is stale exactly when the query's plan changed since its steady
time was measured.

Usage:
    python tools/steady_refresh.py --check            # list stale/missing, exit 1 if any
    python tools/steady_refresh.py --refresh          # re-measure stale+missing via bench.py --single
    python tools/steady_refresh.py --refresh q_a q_b  # re-measure just these (+ fingerprint update)

Fingerprint normalization: strips `#NNN` expression ids, `plan_id=`,
the sf_dir path (so sf0.001 fingerprints match any sf), and cache/
checkpoint RDD ids. Queries whose builders eagerly materialize
(localCheckpoint(eager=True) pipelines) execute at sf0.001 during
fingerprinting — tiny by construction.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEADY = os.path.join(REPO, "BENCH_STEADY.json")
META = os.path.join(REPO, "BENCH_STEADY_META.json")
FP_SF = "/root/testdata/sf0.001"


def _sort_brackets(line: str) -> str:
    """Canonicalize every bracketed list on a line by sorting its
    elements (innermost-first, so nested lists normalize too). Used
    ONLY on distinct-aggregate-rewrite lines: Spark's
    RewriteDistinctAggregates orders the struct(gN) grouping columns
    by expression id, whose PARITY depends on how many expressions the
    session allocated before the query — same plan, flipped order
    (observed: q_chi_square's fingerprint alternated between two
    values with session history, keeping it permanently 'stale')."""
    while True:
        m = re.search(r"\[([^\[\]]*)\]", line)
        if not m:
            return line
        parts = sorted(
            # bare integers on these lines are gid literals — their
            # value tracks the same session-dependent assignment as
            # the struct order, so they normalize away with it
            "n" if p.strip().isdigit() else p.strip()
            for p in m.group(1).split(",")
        )
        line = line[: m.start()] + "<" + "|".join(parts) + ">" + line[m.end():]


def _normalize(plan: str) -> str:
    plan = re.sub(r"#\d+", "#x", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=x", plan)
    # lambda variables (x_3) and grouping ids (gid#x = 2) carry
    # session-global counters — same plan, different numbering
    plan = re.sub(r"\blambda [A-Za-z]+_\d+", "lambda v", plan)
    plan = re.sub(r"\bgid#x = \d+", "gid#x = n", plan)
    plan = re.sub(r"ExistingRDD\[[^\]]*\]", "ExistingRDD[x]", plan)
    plan = re.sub(r"/[^ ,\]\)]*sf[0-9.]+[a-z0-9]*", "<sf_dir>", plan)
    plan = re.sub(r"Statistics\([^)]*\)", "Statistics(x)", plan)
    plan = "\n".join(
        _sort_brackets(ln) if "gid#x" in ln else ln for ln in plan.split("\n")
    )
    return plan


def fingerprints() -> dict[str, str]:
    """name -> sha256 of the normalized optimized plan at FP_SF."""
    from kafka_streams_spring_cloud_stream_tp1_spark.plans import shared
    from kafka_streams_spring_cloud_stream_tp1_spark.plans.registry import (
        queries_map,
    )
    from kafka_streams_spring_cloud_stream_tp1_spark.session import get_spark

    spark = get_spark(app_name="steady_fingerprint")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, str] = {}
    for name, build in queries_map().items():
        try:
            # fingerprint from a COLD cache state: the optimizer
            # substitutes InMemoryRelation for any fragment another
            # query cached earlier in the session, which made the
            # hash depend on registry ITERATION ORDER, not the plan
            spark.catalog.clearCache()
            shared._CACHE.clear()
            df = build(spark, FP_SF)
            plan = df._jdf.queryExecution().optimizedPlan().toString()
            out[name] = hashlib.sha256(_normalize(plan).encode()).hexdigest()[:16]
        except Exception as exc:  # a broken builder is loudly visible
            out[name] = f"ERROR:{type(exc).__name__}"
            print(f"fingerprint failed for {name}: {exc!r}", file=sys.stderr)
    spark.stop()
    return out


def _fresh_single(name: str, sf_dir: str) -> float:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--single", name],
        capture_output=True,
        text=True,
        timeout=900,
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
    )
    return float(proc.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--refresh", action="store_true")
    ap.add_argument(
        "--seed",
        action="store_true",
        help="stamp the CURRENT fingerprint onto entries that have a "
        "steady value but no meta yet, WITHOUT re-measuring — one-time "
        "migration for legacy entries whose plans are known-unchanged",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    steady = json.load(open(STEADY)) if os.path.exists(STEADY) else {}
    meta = json.load(open(META)) if os.path.exists(META) else {}
    fps = fingerprints()

    stale = sorted(
        n
        for n, fp in fps.items()
        if not fp.startswith("ERROR")
        and (n not in steady or meta.get(n) != fp)
    )
    gone = sorted(set(steady) - set(fps))
    if args.names:
        targets = [n for n in args.names if n in fps]
    else:
        targets = stale

    print(
        json.dumps(
            {
                "n_queries": len(fps),
                "n_stale_or_missing": len(stale),
                "stale_or_missing": stale,
                "entries_for_removed_queries": gone,
            }
        )
    )
    if args.check:
        return 1 if stale or gone else 0

    if args.seed:
        seeded = [
            n for n in fps if n in steady and n not in meta and not fps[n].startswith("ERROR")
        ]
        for n in seeded:
            meta[n] = fps[n]
        with open(META, "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"seeded {len(seeded)} legacy entries into {META}")
        return 0

    if args.refresh:
        for n in gone:
            steady.pop(n, None)
            meta.pop(n, None)
        for i, n in enumerate(targets):
            try:
                t = _fresh_single(n, args.sf_dir)
            except Exception as exc:
                print(f"refresh failed for {n}: {exc!r}", file=sys.stderr)
                continue
            steady[n] = round(t, 4)
            meta[n] = fps[n]
            print(f"[{i + 1}/{len(targets)}] {n}: {t:.3f}s", flush=True)
        # queries that are fresh-by-plan but lack a meta entry inherit
        # the current fingerprint WITHOUT re-measuring only when named
        # explicitly; otherwise they were in `stale` and measured above
        with open(STEADY, "w") as f:
            json.dump(steady, f, indent=1, sort_keys=True)
            f.write("\n")
        with open(META, "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {STEADY} and {META}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
