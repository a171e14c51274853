"""Measure per-query core scaling on a scale corpus (SCALE_r13 lane).

VERDICT r12 item 2: the sf0.1 fixtures are single-row-group files of
5 000 rows, so the driver's 8-vs-32-core bench ratios sit at ~1 — the
lane cannot distinguish serial plans from overhead floors. This tool
runs each named query on an N× `build_scale_corpus.py --generate`
corpus at two core counts in BACK-TO-BACK fresh JVMs (tight pairing —
the host is co-tenant noisy, so distance-in-time is the enemy), each
measured as min-of-2 in its own session (`bench.py --single`
protocol), and records seconds + the low/high-core ratio per query.

A CPU-bound plan should show ratio ≫ 1 (ideal = cores_hi/cores_lo);
an overhead- or serial-bound plan shows ~1. Results land in
SCALE_r13.json (committed) for the optimization-round record.

Usage:
    python tools/scale_core_ratio.py --sf-dir /tmp/sf0.1x10u \
        --out SCALE_r13.json [--cores-hi 32] [--cores-lo 8] q_a q_b ...
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def single(name: str, sf_dir: str, cpus: int) -> float:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    bench = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py")
    proc = subprocess.run(
        [sys.executable, bench, "--single", name],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"{name} cpus={cpus} failed: {proc.stderr[-500:]}")
    return float(proc.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", default="SCALE_r13.json")
    ap.add_argument("--cores-hi", type=int, default=32)
    ap.add_argument("--cores-lo", type=int, default=8)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    results = {}
    for name in args.names:
        t0 = time.time()
        hi = single(name, args.sf_dir, args.cores_hi)
        lo = single(name, args.sf_dir, args.cores_lo)
        ratio = round(lo / hi, 2) if hi > 0 else None
        results[name] = {
            f"c{args.cores_hi}_sec": hi,
            f"c{args.cores_lo}_sec": lo,
            "lo_over_hi": ratio,
        }
        print(json.dumps({name: results[name]}), flush=True)
        _ = time.time() - t0
    payload = {
        "sf_dir": args.sf_dir,
        "cores_hi": args.cores_hi,
        "cores_lo": args.cores_lo,
        "protocol": "per query: fresh-JVM --single min-of-2 at cores_hi, "
        "then immediately at cores_lo (tight pairing against host noise)",
        "queries": results,
    }
    with open(args.out, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
